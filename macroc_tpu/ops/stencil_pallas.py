"""Pallas TPU kernel for the 27-point 3x3-block stencil SpMV.

Layout: the stencil matrix is kept in structure-of-arrays form
    A_soa : (27, 3, 3, nx, ny, nz)
so each (offset o, row-dof d, col-dof e) coefficient is a contiguous 3D
volume whose minor dims (ny-tile, nz-tile) map onto TPU (sublane, lane).
The vector is (3, nx, ny, nz) (+1 zero halo on each spatial face).

SpMV is then 27*9 = 243 elementwise multiply-adds of 3D volumes against
shifted windows of the input — pure VPU work, HBM-bandwidth bound.  The
kernel tiles the node volume; per tile:

  1. DMA the (3, TX+2, TY+2, TZ+2) halo window of the padded x from HBM
     into VMEM scratch (x is read 27x from VMEM but only 1x from HBM);
  2. accumulate y[d] += A[o,d,e] * shift(x[e], off(o)) with the offset loop
     unrolled (static shifts compile to cheap lane/sublane rotates);
  3. write the (3, TX, TY, TZ) output tile.

The A tiles stream through the normal Pallas pipeline (double-buffered
automatically), so the kernel sustains close to the HBM roofline:
~ (27*9 + ~6)*4 bytes/node/matvec.

nnz accounting for the north-star metric: 243 stored coefficients per node.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from macroc_tpu.fem.kernels import STENCIL_OFFSETS


def to_soa(A27: jax.Array) -> jax.Array:
    """(nx,ny,nz,27,3,3) -> (27,3,3,nx,ny,nz)."""
    return jnp.transpose(A27, (3, 4, 5, 0, 1, 2))


def from_soa(A_soa: jax.Array) -> jax.Array:
    """(27,3,3,nx,ny,nz) -> (nx,ny,nz,27,3,3)."""
    return jnp.transpose(A_soa, (3, 4, 5, 0, 1, 2))


def x_to_soa(x: jax.Array) -> jax.Array:
    """(nx,ny,nz,3) -> (3,nx,ny,nz)."""
    return jnp.transpose(x, (3, 0, 1, 2))


def x_from_soa(xs: jax.Array) -> jax.Array:
    return jnp.transpose(xs, (1, 2, 3, 0))


def stencil_matvec_soa(A_soa: jax.Array, x_soa: jax.Array) -> jax.Array:
    """jnp reference implementation on the SoA layout (used as the oracle
    for the Pallas kernel and as the CPU/interpret fallback)."""
    _, _, _, nx, ny, nz = A_soa.shape
    xp = jnp.pad(x_soa, ((0, 0), (1, 1), (1, 1), (1, 1)))
    y = jnp.zeros_like(x_soa)
    for o, (di, dj, dk) in enumerate(STENCIL_OFFSETS):
        xw = xp[:, 1 + di:1 + di + nx, 1 + dj:1 + dj + ny, 1 + dk:1 + dk + nz]
        # y[d] += sum_e A[o,d,e] * xw[e]
        y = y + jnp.einsum("dexyz,exyz->dxyz", A_soa[o], xw)
    return y


# halo padding of the x buffer: DMA windows must be aligned to the TPU
# (sublane=8, lane=128) tiling, so the +-1 halo is over-fetched to a full
# aligned ring: 1 node in x (untiled dim, arbitrary slicing is legal),
# 8 nodes in y, 128 nodes in z.
_HX, _HY, _HZ = 1, 8, 128


def _spmv_kernel(A_ref, xp_hbm, y_ref, xv, sem, *, TX, TY, TZ):
    i = pl.program_id(0)
    j = pl.program_id(1)
    k = pl.program_id(2)

    # aligned halo window: true node (i*TX+p) lives at padded x-index
    # i*TX+p+_HX, so the window starting at (i*TX, j*TY, k*TZ) holds the
    # tile plus a full halo ring; offsets and sizes are tiling-aligned.
    dma = pltpu.make_async_copy(
        xp_hbm.at[
            :,
            pl.ds(i * TX, TX + 2 * _HX),
            pl.ds(j * TY, TY + 2 * _HY),
            pl.ds(k * TZ, TZ + 2 * _HZ),
        ],
        xv,
        sem,
    )
    dma.start()
    dma.wait()

    acc = [jnp.zeros((TX, TY, TZ), jnp.float32) for _ in range(3)]
    for o, (di, dj, dk) in enumerate(STENCIL_OFFSETS):
        oi = int(di) + _HX
        oj = int(dj) + _HY
        ok = int(dk) + _HZ
        for e in range(3):
            # unaligned compute loads are legal (Mosaic lowers them to
            # sublane/lane rotates); only DMA slices must be aligned
            xw = xv[e, oi:oi + TX, oj:oj + TY, ok:ok + TZ]
            for d in range(3):
                acc[d] = acc[d] + A_ref[o, d, e] * xw
    y_ref[:] = jnp.stack(acc, axis=0).astype(y_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tile",))
def stencil_matvec_pallas_v1(
    A_soa: jax.Array,
    x_soa: jax.Array,
    tile: Tuple[int, int, int] = (4, 8, 128),
) -> jax.Array:
    """y_soa = A @ x on TPU via the Pallas stencil kernel.

    A_soa: (27,3,3,nx,ny,nz); x_soa: (3,nx,ny,nz).  Grid dims are padded to
    tile multiples internally (zero blocks are harmless).
    """
    _, _, _, nx, ny, nz = A_soa.shape
    TX, TY, TZ = tile
    if TY % 8 or TZ % 128:
        raise ValueError("tile (TY, TZ) must be multiples of (8, 128)")
    px = (-nx) % TX
    py = (-ny) % TY
    pz = (-nz) % TZ
    if px or py or pz:
        A_soa = jnp.pad(
            A_soa, ((0, 0), (0, 0), (0, 0), (0, px), (0, py), (0, pz))
        )
    # aligned-halo padded x: true node (i,j,k) at (i+_HX, j+_HY, k+_HZ)
    xp = jnp.pad(
        x_soa,
        ((0, 0), (_HX, _HX + px), (_HY, _HY + py), (_HZ, _HZ + pz)),
    )
    NX, NY, NZ = nx + px, ny + py, nz + pz
    grid = (NX // TX, NY // TY, NZ // TZ)

    kernel = functools.partial(_spmv_kernel, TX=TX, TY=TY, TZ=TZ)
    y = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (27, 3, 3, TX, TY, TZ),
                lambda i, j, k: (0, 0, 0, i, j, k),
                memory_space=pltpu.VMEM,
            ),
            # x stays in HBM; the kernel DMAs aligned halo windows itself
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(
            (3, TX, TY, TZ),
            lambda i, j, k: (0, i, j, k),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((3, NX, NY, NZ), x_soa.dtype),
        scratch_shapes=[
            pltpu.VMEM(
                (3, TX + 2 * _HX, TY + 2 * _HY, TZ + 2 * _HZ), x_soa.dtype
            ),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 243 * NX * NY * NZ,
            bytes_accessed=(243 + 6) * NX * NY * NZ * 4,
            transcendentals=0,
        ),
    )(A_soa, xp)
    if px or py or pz:
        y = y[:, :nx, :ny, :nz]
    return y


# --------------------------------------------------------------------------- #
# v2 kernel: offset-plane reduction dim + prefetched x windows.
#
# The v1 kernel's gap to the roofline is (a) the x halo window over-fetch —
# the aligned ring costs ~(TX+2)(TY+16)(TZ+256)/(TX*TY*TZ) * 12 bytes/node,
# ~16% of ideal traffic at tile (4,8,128) — and (b) the blocking in-kernel
# x DMA.  v2 fixes both:
#
#   - a 4th (innermost) grid dimension g in {0,1,2} splits the 27 offsets
#     into the three x-planes di = g-1 (the offset table is ordered
#     o = (di+1)*9 + (dj+1)*3 + (dk+1), so offsets [9g, 9g+9) share di and
#     their (dj,dk) shifts are the same static 3x3 set for every g; the
#     only g-dependent index is the x-window slice start, which lands on an
#     UNTILED dim where dynamic starts are free address arithmetic);
#   - the A block per grid step is 9/27 of v1's, so the spatial tile can be
#     larger at the same (double-buffered) VMEM, amortizing the halo ring
#     over more nodes (measured on v5e @128^3: (4,16,128) is the sweet spot,
#     188.7 Gnnz/s = 94.4% of the HBM roofline; (4,24,128) regresses 4x —
#     its A+scratch footprint spills the double-buffered VMEM budget);
#   - the x window is fetched once per spatial tile into a 2-slot scratch,
#     and the NEXT tile's window is prefetched right after — the DMA
#     overlaps the current tile's 3 compute steps instead of stalling them;
#   - the output block index is independent of g, so Pallas keeps the y
#     tile resident in VMEM across the three visits and writes it back once.
# --------------------------------------------------------------------------- #


def _x_window_dma(xp_hbm, xv, sems, slot, i, j, k, TX, TY, TZ):
    return pltpu.make_async_copy(
        xp_hbm.at[
            :,
            pl.ds(i * TX, TX + 2 * _HX),
            pl.ds(j * TY, TY + 2 * _HY),
            pl.ds(k * TZ, TZ + 2 * _HZ),
        ],
        xv.at[slot],
        sems.at[slot],
    )


def _spmv_kernel_v2(A_ref, xp_hbm, y_ref, xv, sems, *, TX, TY, TZ):
    i = pl.program_id(0)
    j = pl.program_id(1)
    k = pl.program_id(2)
    g = pl.program_id(3)
    gy = pl.num_programs(1)
    gz = pl.num_programs(2)
    t = (i * gy + j) * gz + k  # linear spatial-tile id
    one = jnp.int32(1)
    slot = jax.lax.rem(t, jnp.int32(2))

    @pl.when(g == 0)
    def _():
        @pl.when(t == 0)
        def _():  # first tile has no prefetcher — fetch synchronously
            _x_window_dma(xp_hbm, xv, sems, slot, i, j, k, TX, TY, TZ).start()

        _x_window_dma(xp_hbm, xv, sems, slot, i, j, k, TX, TY, TZ).wait()

        nt = pl.num_programs(0) * gy * gz

        @pl.when(t + one < nt)
        def _():  # prefetch the next tile's window into the other slot
            t1 = t + one
            k1 = jax.lax.rem(t1, jnp.int32(gz))
            j1 = jax.lax.rem(t1 // jnp.int32(gz), jnp.int32(gy))
            i1 = t1 // jnp.int32(gy * gz)
            _x_window_dma(
                xp_hbm, xv, sems, one - slot, i1, j1, k1, TX, TY, TZ
            ).start()

    # offsets [9g, 9g+9) all have di = g-1: true node i*TX+p reads padded-x
    # index (i*TX+p) + _HX + di = window-local p + g  ->  x-slice start = g,
    # a dynamic start on an untiled dim (free); (dj,dk) are static.
    acc = [jnp.zeros((TX, TY, TZ), y_ref.dtype) for _ in range(3)]
    for m in range(9):
        dj, dk = m // 3 - 1, m % 3 - 1
        oj = dj + _HY
        ok = dk + _HZ
        for e in range(3):
            xw = xv[slot, e, pl.ds(g, TX), oj:oj + TY, ok:ok + TZ]
            for d in range(3):
                acc[d] = acc[d] + A_ref[m, d, e] * xw
    contrib = jnp.stack(acc, axis=0)

    @pl.when(g == 0)
    def _():
        y_ref[:] = contrib

    @pl.when(g > 0)
    def _():
        y_ref[:] = y_ref[:] + contrib


@functools.partial(jax.jit, static_argnames=("tile", "interpret", "halo"))
def stencil_matvec_pallas(
    A_soa: jax.Array,
    x_soa: jax.Array,
    tile: Tuple[int, int, int] = (4, 16, 128),
    interpret: bool = False,
    halo: bool = False,
) -> jax.Array:
    """y_soa = A @ x on TPU via the v2 Pallas stencil kernel.

    A_soa: (27,3,3,nx,ny,nz); x_soa: (3,nx,ny,nz).  Grid dims are padded to
    tile multiples internally (zero blocks are harmless).  ``interpret``
    runs the kernel in the Pallas interpreter (CPU testing).

    ``halo=True``: x_soa is (3,nx+2,ny+2,nz+2) — already carrying a 1-node
    halo per face (neighbor data from a shard_map ppermute exchange, zeros
    at the global boundary).  This is the per-device form used inside
    parallel/halo.py::shmap_stencil_matvec.
    """
    _, _, _, nx, ny, nz = A_soa.shape
    TX, TY, TZ = tile
    if TY % 8 or TZ % 128:
        raise ValueError("tile (TY, TZ) must be multiples of (8, 128)")
    px = (-nx) % TX
    py = (-ny) % TY
    pz = (-nz) % TZ
    if px or py or pz:
        A_soa = jnp.pad(
            A_soa, ((0, 0), (0, 0), (0, 0), (0, px), (0, py), (0, pz))
        )
    # Padded-x layout: true node i lives at index i+_H per dim.  With
    # halo=True the input already holds true node -1 at index 0, so the
    # alignment pad shrinks by one on each side.
    h = 1 if halo else 0
    xp = jnp.pad(
        x_soa,
        (
            (0, 0),
            (_HX - h, _HX - h + px),
            (_HY - h, _HY - h + py),
            (_HZ - h, _HZ - h + pz),
        ),
    )
    NX, NY, NZ = nx + px, ny + py, nz + pz
    grid = (NX // TX, NY // TY, NZ // TZ, 3)

    kernel = functools.partial(_spmv_kernel_v2, TX=TX, TY=TY, TZ=TZ)
    y = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (9, 3, 3, TX, TY, TZ),
                lambda i, j, k, g: (g, 0, 0, i, j, k),
                memory_space=pltpu.VMEM,
            ),
            # x stays in HBM; the kernel DMAs aligned halo windows itself
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(
            (3, TX, TY, TZ),
            lambda i, j, k, g: (0, i, j, k),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((3, NX, NY, NZ), x_soa.dtype),
        scratch_shapes=[
            pltpu.VMEM(
                (2, 3, TX + 2 * _HX, TY + 2 * _HY, TZ + 2 * _HZ),
                x_soa.dtype,
            ),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(
                "arbitrary", "arbitrary", "arbitrary", "arbitrary",
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 243 * NX * NY * NZ,
            bytes_accessed=(243 + 6) * NX * NY * NZ * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(A_soa, xp)
    if px or py or pz:
        y = y[:, :nx, :ny, :nz]
    return y
