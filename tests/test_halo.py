"""Explicit shard_map halo exchange vs global-array semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from functools import partial
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from macroc_tpu.parallel.halo import (
    halo_exchange,
    halo_fold_add,
    shmap_stencil_matvec,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


def make_mesh():
    import numpy as _np

    return Mesh(_np.asarray(jax.devices()[:8]).reshape(2, 2, 2), ("x", "y", "z"))


def test_halo_exchange_matches_pad():
    """shard_map halo exchange must reproduce global zero-padding + slice."""
    mesh = make_mesh()
    rng = np.random.default_rng(0)
    g = jnp.asarray(rng.normal(size=(3, 8, 8, 8)))

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=P(None, "x", "y", "z"),
        out_specs=P(None, "x", "y", "z"),
    )
    def grab_center(x):
        xe = halo_exchange(x, dims=(1, 2, 3))
        # center of the extended block is the original block
        return xe[:, 1:-1, 1:-1, 1:-1]

    out = grab_center(g)
    assert np.allclose(np.asarray(out), np.asarray(g))

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=P(None, "x", "y", "z"),
        out_specs=P(None, "x", "y", "z"),
    )
    def shifted(x):
        xe = halo_exchange(x, dims=(1, 2, 3))
        # +1 shift in every dim through the halo
        return xe[:, 2:, 2:, 2:][:, :4, :4, :4]

    out = np.asarray(shifted(g))
    gp = np.pad(np.asarray(g), ((0, 0), (0, 1), (0, 1), (0, 1)))
    expect = gp[:, 1:, 1:, 1:]
    assert np.allclose(out, expect)


def test_fold_add_matches_overlap_sum():
    """Reverse fold must equal the global overlap-add of extended blocks."""
    mesh = make_mesh()
    rng = np.random.default_rng(1)
    g = jnp.asarray(rng.normal(size=(3, 8, 8, 8)))

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=P(None, "x", "y", "z"),
        out_specs=P(None, "x", "y", "z"),
    )
    def roundtrip(x):
        xe = halo_exchange(x, dims=(1, 2, 3))
        return halo_fold_add(xe, dims=(1, 2, 3))

    out = np.asarray(roundtrip(g))
    # Sequential box-stencil exchange exports a node once per neighboring
    # shard it lands in (faces, edges AND diagonal corners — the later axis
    # rounds forward already-received halos); the fold returns every copy.
    # So each node comes back multiplied by prod_dims(2 if the node sits on
    # an internal shard boundary along that dim else 1).
    gn = np.asarray(g)
    mult = np.ones((8, 8, 8))
    for dim in range(3):
        sl = [slice(None)] * 3
        sl[dim] = [3, 4]  # internal boundary planes of the 2-way split
        mult[tuple(sl)] *= 2.0
    assert np.allclose(out, gn * mult[None])


def test_shmap_matvec_matches_global():
    from macroc_tpu.ops.stencil_pallas import stencil_matvec_soa

    mesh = make_mesh()
    rng = np.random.default_rng(2)
    A = jnp.asarray(rng.normal(size=(27, 3, 3, 8, 8, 8)))
    x = jnp.asarray(rng.normal(size=(3, 8, 8, 8)))
    y_ref = np.asarray(stencil_matvec_soa(A, x))
    y = np.asarray(shmap_stencil_matvec(mesh, A, x))
    assert np.allclose(y, y_ref, atol=1e-10)


def test_shmap_matvec_pallas_matches_global():
    """The sharded Pallas SpMV (shard_map + ppermute halo + halo-form
    kernel, interpret mode) must match the global jnp oracle — the
    multi-chip composition VERDICT r1 flagged as never tested."""
    from macroc_tpu.ops.stencil_pallas import stencil_matvec_soa

    mesh = make_mesh()
    rng = np.random.default_rng(7)
    A = jnp.asarray(rng.normal(size=(27, 3, 3, 8, 8, 8)), dtype=jnp.float32)
    x = jnp.asarray(rng.normal(size=(3, 8, 8, 8)), dtype=jnp.float32)
    y_ref = np.asarray(stencil_matvec_soa(A, x))
    y = np.asarray(
        shmap_stencil_matvec(
            mesh, A, x, kernel="pallas", tile=(4, 8, 128), interpret=True
        )
    )
    rel = float(np.max(np.abs(y - y_ref)) / np.max(np.abs(y_ref)))
    assert rel < 1e-5, rel


@pytest.mark.parametrize("kernel", ["jnp", "pallas"])
@pytest.mark.parametrize("overlap", [False, True])
def test_shmap_matvec_overlap_modes(kernel, overlap):
    """The halo/compute-OVERLAP form (interior from local data + boundary
    shell recomputed from exchanged halos, SURVEY.md §5.7) must equal both
    the naive exchange-then-compute form and the global oracle, for both
    the jnp and (interpret-mode) Pallas kernels."""
    from macroc_tpu.ops.stencil_pallas import stencil_matvec_soa

    mesh = make_mesh()
    rng = np.random.default_rng(9)
    A = jnp.asarray(rng.normal(size=(27, 3, 3, 8, 8, 8)), dtype=jnp.float32)
    x = jnp.asarray(rng.normal(size=(3, 8, 8, 8)), dtype=jnp.float32)
    y_ref = np.asarray(stencil_matvec_soa(A, x))
    y = np.asarray(
        shmap_stencil_matvec(
            mesh, A, x, kernel=kernel, tile=(4, 8, 128),
            interpret=True, overlap=overlap,
        )
    )
    rel = float(np.max(np.abs(y - y_ref)) / np.max(np.abs(y_ref)))
    assert rel < 1e-5, rel


def test_shmap_matvec_overlap_degenerate_mesh():
    """Overlap mode with 1-node-deep local blocks (8-way split of an
    8-extent dim): every local node is on the shell."""
    from jax.sharding import Mesh
    from macroc_tpu.ops.stencil_pallas import stencil_matvec_soa

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(1, 1, 8),
                ("x", "y", "z"))
    rng = np.random.default_rng(10)
    A = jnp.asarray(rng.normal(size=(27, 3, 3, 4, 4, 8)))
    x = jnp.asarray(rng.normal(size=(3, 4, 4, 8)))
    y_ref = np.asarray(stencil_matvec_soa(A, x))
    y = np.asarray(shmap_stencil_matvec(mesh, A, x, overlap=True))
    assert np.allclose(y, y_ref, atol=1e-10)


@pytest.mark.parametrize("halo", [(1, 1, 1), (2, 1, 3)])
def test_ghosted_blocks_layout(halo):
    """ghosted_blocks must produce, per mesh coordinate, the halo-extended
    window of the global array (zeros beyond the boundary) — the PETSc
    local-ghosted-vector layout used by gather-free VTU output."""
    from macroc_tpu.parallel.halo import ghosted_blocks

    mesh = make_mesh()
    rng = np.random.default_rng(3)
    nx, ny, nz = 8, 6, 8
    a = jnp.asarray(rng.normal(size=(nx, ny, nz, 3)))
    b = jnp.asarray(rng.normal(size=(nx, ny, nz)))
    ga, gb = ghosted_blocks(mesh, (a, b), halo=halo)

    s = (nx // 2, ny // 2, nz // 2)
    ext = tuple(s[d] + 2 * halo[d] for d in range(3))
    assert ga.shape[:3] == tuple(2 * ext[d] for d in range(3))
    for arr, g in ((a, ga), (b, gb)):
        ap = np.pad(
            np.asarray(arr),
            [(halo[d], halo[d]) for d in range(3)]
            + [(0, 0)] * (arr.ndim - 3),
        )
        gh = np.asarray(g)
        for ci in range(2):
            for cj in range(2):
                for ck in range(2):
                    block = gh[
                        ci * ext[0]:(ci + 1) * ext[0],
                        cj * ext[1]:(cj + 1) * ext[1],
                        ck * ext[2]:(ck + 1) * ext[2],
                    ]
                    want = ap[
                        ci * s[0]:ci * s[0] + ext[0],
                        cj * s[1]:cj * s[1] + ext[1],
                        ck * s[2]:ck * s[2] + ext[2],
                    ]
                    np.testing.assert_array_equal(block, want)


def test_exchange_width_exceeding_extent_raises():
    from macroc_tpu.parallel.halo import ghosted_blocks

    mesh = make_mesh()
    a = jnp.zeros((8, 8, 8))
    with pytest.raises(ValueError, match="halo width"):
        ghosted_blocks(mesh, (a,), halo=(5, 1, 1))


def test_shmap_assemble_matches_global():
    """Distributed stencil assembly (per-device kernel + high-plane fold,
    parallel/halo.py::shmap_assemble_stencil) must equal the global
    single-block assembly — with the slab assembler AND with the MXU+Pallas
    assembler in interpret mode (the multi-chip composition that keeps the
    fast assembler engaged, VERDICT r4 #1)."""
    from functools import partial as _partial

    from macroc_tpu.fem.element import b_matrix
    from macroc_tpu.fem.kernels import assemble_stencil_soa
    from macroc_tpu.ops.assembly_pallas import assemble_stencil_soa_mxu
    from macroc_tpu.parallel.halo import shmap_assemble_stencil

    mesh = make_mesh()
    nx = ny = nz = 8  # node shape divisible by the (2,2,2) mesh
    rng = np.random.default_rng(7)
    B = jnp.asarray(b_matrix((0.5, 0.5, 0.5)))
    wg = 0.5**3 / 8.0
    # node-shaped GP storage: trailing element slot per dim inactive/zero
    ctan_ns = np.zeros((nx, ny, nz, 8, 6, 6))
    ctan_ns[:-1, :-1, :-1] = rng.normal(size=(nx - 1, ny - 1, nz - 1, 8, 6, 6))
    # symmetrize per-GP blocks (what a real tangent looks like)
    ctan_ns = jnp.asarray((ctan_ns + ctan_ns.transpose(0, 1, 2, 3, 5, 4)) / 2)

    A_ref = assemble_stencil_soa(
        ctan_ns[:-1, :-1, :-1], B, wg, (nx, ny, nz)
    )

    A_slab = shmap_assemble_stencil(
        mesh, ctan_ns, B, wg, assemble_stencil_soa
    )
    np.testing.assert_allclose(
        np.asarray(A_slab), np.asarray(A_ref), rtol=1e-12, atol=1e-12
    )

    A_mxu = shmap_assemble_stencil(
        mesh, ctan_ns, B, wg,
        _partial(assemble_stencil_soa_mxu, xblock=16, interpret=True),
    )
    np.testing.assert_allclose(
        np.asarray(A_mxu), np.asarray(A_ref), rtol=1e-10, atol=1e-10
    )


def test_shmap_assemble_unsplit_axis():
    """A z-preserving (2,2,1)-style decomposition (what the nz%128 kernel-
    eligibility tiebreak produces at flagship shapes): the unsplit axis
    crops the inactive trailing element slot instead of folding."""
    from macroc_tpu.fem.element import b_matrix
    from macroc_tpu.fem.kernels import assemble_stencil_soa
    from macroc_tpu.parallel.halo import shmap_assemble_stencil

    mesh = Mesh(
        np.asarray(jax.devices()[:4]).reshape(2, 2, 1), ("x", "y", "z")
    )
    nx, ny, nz = 6, 4, 5
    rng = np.random.default_rng(8)
    B = jnp.asarray(b_matrix((0.5, 0.25, 1.0)))
    wg = 0.5 * 0.25 * 1.0 / 8.0
    ctan_ns = np.zeros((nx, ny, nz, 8, 6, 6))
    ctan_ns[:-1, :-1, :-1] = rng.normal(size=(nx - 1, ny - 1, nz - 1, 8, 6, 6))
    ctan_ns = jnp.asarray(ctan_ns)

    A_ref = assemble_stencil_soa(
        ctan_ns[:-1, :-1, :-1], B, wg, (nx, ny, nz)
    )
    A_out = shmap_assemble_stencil(
        mesh, ctan_ns, B, wg, assemble_stencil_soa
    )
    np.testing.assert_allclose(
        np.asarray(A_out), np.asarray(A_ref), rtol=1e-12, atol=1e-12
    )
