"""Boundary-condition oracles: global index sets vs the reference's BC
definitions (bcs.c), symmetric elimination equivalence, operator-form BC."""

import jax.numpy as jnp
import numpy as np
import pytest

from macroc_tpu import bc as bc_mod
from macroc_tpu.config import BC_BENDING, BC_CIRCLE, MacroConfig, MaterialParams
from macroc_tpu.constitutive.elastic import elastic_matrix
from macroc_tpu.fem.element import b_matrix
from macroc_tpu.fem.kernels import assemble_stencil, matfree_matvec
from macroc_tpu.grid import make_grid
from macroc_tpu.ops.stencil import stencil_matvec
from macroc_tpu.solve import cg_solve, jacobi_precond


def test_bending_mask_counts():
    cfg = MacroConfig(nx=6, ny=4, nz=5, bc_type=BC_BENDING)
    g = make_grid(cfg, 1)
    bc = bc_mod.build_bc(g, cfg, jnp.float64)
    mask = np.asarray(bc.mask)
    # both x-faces fully fixed, all 3 dofs (bcs.c:71-83)
    assert mask.sum() == 2 * 4 * 5 * 3
    assert mask[0].all() and mask[-1].all()
    assert not mask[1:-1].any()
    # face x=LX drives dof y to U, others zero
    val = np.asarray(bc.val_unit)
    assert (val[-1, :, :, 1] == 1).all()
    assert (val[-1, :, :, 0] == 0).all()
    assert (val[0] == 0).all()


def test_circle_mask_geometry():
    # fine grid, rad large enough to contain nodes
    cfg = MacroConfig(
        nx=21, ny=3, nz=21, lx=10.0, ly=1.0, lz=10.0,
        bc_type=BC_CIRCLE, rad=2.0,
    )
    g = make_grid(cfg, 1)
    bc = bc_mod.build_bc(g, cfg, jnp.float64)
    mask = np.asarray(bc.mask)
    val = np.asarray(bc.val_unit)
    # edges at y=0 pinned in all dofs (bcs.c:104-126)
    assert mask[0, 0, :, :].all()
    assert mask[-1, 0, :, :].all()
    assert mask[1:-1, 0, 0, :].all()
    assert mask[1:-1, 0, -1, :].all()
    # interior of face y=0 NOT pinned
    assert not mask[5, 0, 5].any()
    # circle nodes on y=LY: only dof y; the test point has the half-cell
    # shift (bcs.c:132-133)
    dx = dz = 0.5
    hits = 0
    for i in range(21):
        for k in range(21):
            x = 5.0 - (i * dx + dx / 2)
            z = 5.0 - (k * dz + dz / 2)
            inside = x * x + z * z < 4.0
            assert bool(mask[i, 2, k, 1]) == inside
            if inside:
                hits += 1
                assert val[i, 2, k, 1] == 1.0
                assert not mask[i, 2, k, 0] and not mask[i, 2, k, 2]
    assert hits > 0


def test_apply_bc_on_u_and_res():
    cfg = MacroConfig(nx=5, ny=3, nz=4, bc_type=BC_BENDING)
    g = make_grid(cfg, 1)
    bc = bc_mod.build_bc(g, cfg, jnp.float64)
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.normal(size=(5, 3, 4, 3)))
    U = -0.37
    u2 = np.asarray(bc_mod.apply_bc_on_u(U, u, bc))
    assert np.allclose(u2[0], 0.0)
    assert np.allclose(u2[-1, :, :, 1], U)
    assert np.allclose(u2[-1, :, :, 0], 0.0)
    assert np.allclose(u2[1:-1], np.asarray(u)[1:-1])
    b = jnp.asarray(rng.normal(size=(5, 3, 4, 3)))
    b2 = np.asarray(bc_mod.apply_bc_on_res(b, bc))
    assert np.allclose(b2[0], 0.0) and np.allclose(b2[-1], 0.0)
    assert np.allclose(b2[1:-1], np.asarray(b)[1:-1])


def test_matfree_bc_operator_equals_bc_stencil():
    """The on-the-fly BC-eliminated operator must act identically to the
    assembled BC-eliminated stencil (on any vector)."""
    cfg = MacroConfig(
        nx=4, ny=3, nz=3, lx=3, ly=2, lz=2,
        bc_type=BC_BENDING, ref_b_quirk=False,
    )
    g = make_grid(cfg, 1)
    bc = bc_mod.build_bc(g, cfg, jnp.float64)
    B = jnp.asarray(b_matrix(g.spacing))
    C = elastic_matrix(MaterialParams())
    shape = (g.nx, g.ny, g.nz)
    ne = (g.nx - 1, g.ny - 1, g.nz - 1)
    ctan = jnp.broadcast_to(jnp.asarray(C), ne + (8, 6, 6))
    A27 = bc_mod.apply_bc_stencil(
        assemble_stencil(ctan, B, g.wg, shape), bc
    )
    op_mf = bc_mod.bc_operator(matfree_matvec(ctan, B, g.wg, shape), bc)
    rng = np.random.default_rng(5)
    for _ in range(3):
        x = jnp.asarray(rng.normal(size=shape + (3,)))
        y1 = np.asarray(stencil_matvec(A27, x))
        y2 = np.asarray(op_mf(x))
        assert np.allclose(y1, y2, atol=1e-9)
