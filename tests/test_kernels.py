"""FEM kernel oracles: strain gather, residual scatter, stencil assembly vs
a naive dense assembly written independently with numpy loops."""

import jax.numpy as jnp
import numpy as np
import pytest

from macroc_tpu.constitutive.elastic import elastic_matrix
from macroc_tpu.config import MaterialParams
from macroc_tpu.fem.element import NODE_OFFSETS, NPE, b_matrix
from macroc_tpu.fem.kernels import (
    assemble_residual,
    assemble_stencil,
    compute_strains,
    element_stiffness,
    gather_element_dofs,
)
from macroc_tpu.ops.stencil import stencil_matvec, stencil_to_dense


def naive_element_stiffness(B, C, wg):
    """Independent quadruple-loop element stiffness (the reference's
    assembly.c:94-99 algorithm, written from the math)."""
    Ae = np.zeros((NPE * 3, NPE * 3))
    Bf = B.reshape(8, 6, NPE * 3)  # (gp, v, dof)
    for gp in range(8):
        Ae += Bf[gp].T @ C @ Bf[gp] * wg
    return Ae


def naive_global_dense(nx, ny, nz, B, C, wg):
    """Assemble the dense global matrix element by element (numpy oracle)."""
    N = nx * ny * nz
    A = np.zeros((3 * N, 3 * N))
    Ae = naive_element_stiffness(B, C, wg)

    def gid(i, j, k):
        # C-order node id, consistent with stencil_to_dense / reshape(-1)
        return (i * ny + j) * nz + k

    for i in range(nx - 1):
        for j in range(ny - 1):
            for k in range(nz - 1):
                nodes = [gid(i + o[0], j + o[1], k + o[2]) for o in NODE_OFFSETS]
                dofs = np.concatenate([[3 * n, 3 * n + 1, 3 * n + 2] for n in nodes])
                A[np.ix_(dofs, dofs)] += Ae
    return A


@pytest.fixture(scope="module")
def setup():
    nx, ny, nz = 4, 3, 3
    B = b_matrix((1.0, 1.0, 1.0))
    C = elastic_matrix(MaterialParams())
    wg = 0.37
    return nx, ny, nz, B, C, wg


def test_gather_shapes(setup):
    nx, ny, nz, B, C, wg = setup
    u = jnp.arange(nx * ny * nz * 3, dtype=jnp.float64).reshape(nx, ny, nz, 3)
    u8 = gather_element_dofs(u)
    assert u8.shape == (nx - 1, ny - 1, nz - 1, 8, 3)
    # element (1,0,1) node 6 (+1,+1,+1) dof 2 == u[2,1,2,2]
    assert u8[1, 0, 1, 6, 2] == u[2, 1, 2, 2]


def test_strains_match_manual(setup):
    nx, ny, nz, B, C, wg = setup
    rng = np.random.default_rng(1)
    u = rng.normal(size=(nx, ny, nz, 3))
    eps = np.asarray(compute_strains(jnp.asarray(u), jnp.asarray(B)))
    # manual strain for element (2,1,0), gp 5
    ue = np.array([u[2 + o[0], 1 + o[1], 0 + o[2]] for o in NODE_OFFSETS])
    expect = np.einsum("vnd,nd->v", B[5], ue)
    assert np.allclose(eps[2, 1, 0, 5], expect, atol=1e-12)


def test_residual_constant_stress_interior_zero(setup):
    """Patch test: a spatially constant stress field is in equilibrium — the
    assembled internal force must vanish at all interior nodes."""
    nx, ny, nz, B, C, wg = setup
    sigma0 = np.array([1.0, -2.0, 0.5, 0.3, -0.7, 1.1])
    stress = jnp.broadcast_to(
        jnp.asarray(sigma0), (nx - 1, ny - 1, nz - 1, 8, 6)
    )
    f = np.asarray(assemble_residual(stress, jnp.asarray(B), wg, (nx, ny, nz)))
    assert np.allclose(f[1:-1, 1:-1, 1:-1], 0.0, atol=1e-12)
    # ... and must NOT vanish on the boundary (sanity)
    assert np.abs(f[0]).max() > 1e-3


def test_element_stiffness_vs_naive(setup):
    nx, ny, nz, B, C, wg = setup
    ctan = jnp.broadcast_to(jnp.asarray(C), (1, 1, 1, 8, 6, 6))
    Ae = np.asarray(element_stiffness(ctan, jnp.asarray(B), wg))[0, 0, 0]
    Ae = Ae.reshape(24, 24)
    expect = naive_element_stiffness(B, C, wg)
    assert np.allclose(Ae, expect, atol=1e-9)
    # symmetry + positive semidefinite (6 rigid-body zero modes)
    assert np.allclose(Ae, Ae.T, atol=1e-9)
    w = np.linalg.eigvalsh(expect)
    assert w[0] > -1e-6 * abs(w[-1])


def test_stencil_assembly_vs_dense(setup):
    nx, ny, nz, B, C, wg = setup
    ctan = jnp.broadcast_to(
        jnp.asarray(C), (nx - 1, ny - 1, nz - 1, 8, 6, 6)
    )
    A27 = assemble_stencil(ctan, jnp.asarray(B), wg, (nx, ny, nz))
    dense = stencil_to_dense(A27)
    expect = naive_global_dense(nx, ny, nz, B, C, wg)
    assert np.allclose(dense, expect, atol=1e-8)


def test_stencil_matvec_vs_dense(setup):
    nx, ny, nz, B, C, wg = setup
    rng = np.random.default_rng(2)
    # random per-element tangents (breaks homogeneity — stresses indexing)
    ctan_r = rng.normal(size=(nx - 1, ny - 1, nz - 1, 8, 6, 6))
    ctan_r = ctan_r + np.swapaxes(ctan_r, -1, -2)  # symmetric blocks
    A27 = assemble_stencil(jnp.asarray(ctan_r), jnp.asarray(B), wg, (nx, ny, nz))
    dense = stencil_to_dense(A27)
    x = rng.normal(size=(nx, ny, nz, 3))
    y = np.asarray(stencil_matvec(A27, jnp.asarray(x)))
    expect = (dense @ x.reshape(-1)).reshape(nx, ny, nz, 3)
    assert np.allclose(y, expect, atol=1e-9)


def test_assemble_stencil_soa_matches_aos():
    """assemble_stencil_soa (the TPU-fast x-slab-blocked SoA assembly used
    by the solver) must equal to_soa(assemble_stencil) exactly, including
    an uneven final slab; same for the SoA BC elimination."""
    import jax.numpy as jnp

    from macroc_tpu import bc as bc_mod
    from macroc_tpu.config import BC_BENDING, MacroConfig
    from macroc_tpu.fem.element import b_matrix
    from macroc_tpu.fem.kernels import assemble_stencil, assemble_stencil_soa
    from macroc_tpu.grid import make_grid
    from macroc_tpu.ops.stencil_pallas import to_soa

    rng = np.random.default_rng(12)
    shape = (6, 4, 5)  # nex=5: blocks of 2 leave an uneven final slab
    ne = tuple(n - 1 for n in shape)
    ctan = jnp.asarray(rng.normal(size=ne + (8, 6, 6)))
    ctan = ctan + jnp.swapaxes(ctan, -1, -2)  # symmetric blocks
    B = jnp.asarray(b_matrix((0.7, 1.1, 0.9)))
    wg = 0.123
    A_aos = assemble_stencil(ctan, B, wg, shape)
    A_soa = assemble_stencil_soa(ctan, B, wg, shape, block=2)
    np.testing.assert_allclose(
        np.asarray(to_soa(A_aos)), np.asarray(A_soa), rtol=1e-13, atol=1e-13
    )

    cfg = MacroConfig(nx=shape[0], ny=shape[1], nz=shape[2],
                      lx=2.0, ly=1.0, lz=1.5, bc_type=BC_BENDING,
                      dtype="float64")
    bc = bc_mod.build_bc(make_grid(cfg, 1), cfg, jnp.float64)
    np.testing.assert_allclose(
        np.asarray(to_soa(bc_mod.apply_bc_stencil(A_aos, bc))),
        np.asarray(bc_mod.apply_bc_stencil_soa(A_soa, bc)),
        rtol=1e-13, atol=1e-13,
    )


def test_assemble_stencil_flat_matches_aos():
    """The flat (nx,ny,nz,243) assembly + BC elimination + matvec + jacobi
    pipeline (the micro-RVE TPU form) must match the AoS (…,27,3,3) one."""
    import jax.numpy as jnp

    from macroc_tpu.bc import BCData, apply_bc_stencil, apply_bc_stencil_flat
    from macroc_tpu.fem.element import b_matrix
    from macroc_tpu.fem.kernels import assemble_stencil, assemble_stencil_flat
    from macroc_tpu.ops.stencil import stencil_matvec, stencil_matvec_flat
    from macroc_tpu.solve.precond import jacobi_precond, jacobi_precond_flat

    rng = np.random.default_rng(2)
    shape = (4, 3, 5)
    ne = tuple(n - 1 for n in shape)
    B = jnp.asarray(b_matrix((1.0, 1.1, 0.9)))
    ctan = jnp.asarray(rng.normal(size=ne + (8, 6, 6)))
    ctan = ctan + jnp.swapaxes(ctan, -1, -2) + 10.0 * jnp.eye(6)

    A = assemble_stencil(ctan, B, 0.125, shape)
    Af = assemble_stencil_flat(ctan, B, 0.125, shape)
    np.testing.assert_allclose(
        np.asarray(Af), np.asarray(A.reshape(shape + (243,))), rtol=1e-13
    )

    mask = jnp.asarray(rng.random(shape + (3,)) > 0.7)
    bc = BCData(mask=mask, val_unit=jnp.zeros(shape + (3,)))
    Ae = apply_bc_stencil(A, bc)
    Afe = apply_bc_stencil_flat(Af, bc)
    np.testing.assert_allclose(
        np.asarray(Afe), np.asarray(Ae.reshape(shape + (243,))), rtol=1e-13
    )

    x = jnp.asarray(rng.normal(size=shape + (3,)))
    np.testing.assert_allclose(
        np.asarray(stencil_matvec_flat(Afe, x)),
        np.asarray(stencil_matvec(Ae, x)),
        rtol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(jacobi_precond_flat(Afe)(x)),
        np.asarray(jacobi_precond(Ae)(x)),
        rtol=1e-12,
    )


def test_assemble_stencil_soa_conv_matches_slab():
    """The one-shot MXU conv formulation of the stencil assembly must match
    the slab SoA assembly exactly (same contraction, different schedule)."""
    import jax.numpy as jnp

    from macroc_tpu.fem.element import b_matrix
    from macroc_tpu.fem.kernels import (
        assemble_stencil_soa,
        assemble_stencil_soa_conv,
        assemble_stencil_soa_conv2,
        assemble_stencil_soa_v2,
    )

    rng = np.random.default_rng(9)
    B = jnp.asarray(b_matrix((1.0, 1.1, 0.9)))
    ct = jnp.asarray(rng.normal(size=(5, 4, 3, 8, 6, 6)))
    a_slab = np.asarray(assemble_stencil_soa(ct, B, 0.125, (6, 5, 4)))
    for fn in (assemble_stencil_soa_conv, assemble_stencil_soa_conv2,
               assemble_stencil_soa_v2):
        a = np.asarray(fn(ct, B, 0.125, (6, 5, 4)))
        np.testing.assert_allclose(a, a_slab, rtol=1e-12, atol=1e-12
                                   * np.abs(a_slab).max(), err_msg=fn.__name__)


def test_assemble_stencil_soa_mxu_matches_slab():
    """The Pallas-combine MXU assembly (the single-device TPU default,
    ops/assembly_pallas.py) must match the slab assembly — interpret mode
    on CPU; odd extents exercise the z-rotate wrap and padding."""
    import jax.numpy as jnp

    from macroc_tpu.fem.element import b_matrix
    from macroc_tpu.fem.kernels import assemble_stencil_soa
    from macroc_tpu.ops.assembly_pallas import assemble_stencil_soa_mxu

    rng = np.random.default_rng(10)
    B = jnp.asarray(b_matrix((1.0, 1.1, 0.9)))
    for shape in ((6, 5, 4), (9, 9, 9), (5, 2, 2)):
        ne = tuple(n - 1 for n in shape)
        ct = jnp.asarray(rng.normal(size=ne + (8, 6, 6)))
        a_slab = np.asarray(assemble_stencil_soa(ct, B, 0.125, shape))
        a = np.asarray(
            assemble_stencil_soa_mxu(ct, B, 0.125, shape, interpret=True)
        )
        np.testing.assert_allclose(
            a, a_slab, rtol=1e-12, atol=1e-12 * np.abs(a_slab).max(),
            err_msg=str(shape),
        )
