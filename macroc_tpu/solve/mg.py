"""Geometric multigrid preconditioner for the 27-point block-stencil system.

The reference caps out at CG+Jacobi (PCJACOBI, src/init.c:155), whose
iteration count grows ~O(n) with grid size (200+ iterations at 128^3).
A vertex-centered geometric V-cycle brings that down to O(10) — the single
biggest end-to-end win available for the Newton-step metric, and a natural
fit for the structured grid:

  - coarsening: coarse nodes = fine nodes at even indices (any extent >= 3;
    odd tails clamp to the nearest parent);
  - coarse operators by REDISCRETIZATION: coarse per-GP tangents are the
    volume average of the 8 child elements' tangents, assembled with the
    same batched stencil assembly on the coarse grid (Galerkin-equivalent
    for this discretization up to O(1) constants — fine for a
    preconditioner, and far cheaper than a stencil RAP);
  - Dirichlet masks sampled at coarse nodes; coarse rows eliminated the
    same way as fine (unit diagonal);
  - smoother: damped block-Jacobi (3x3 nodal blocks), symmetric V(nu,nu)
    arrangement with R = P^T, so the V-cycle is a FIXED SPD operator and
    legal as a PCG preconditioner;
  - everything is shifted-slice/gather arithmetic on (3,nx,ny,nz) SoA
    fields — shards with the same P('x','y','z') layout as the rest of the
    solver.

All level operators are built once per Newton iteration (per assembled
Jacobian), outside the CG loop.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from macroc_tpu.fem.element import b_for
from macroc_tpu.fem.kernels import DIAG_OFFSET, assemble_stencil_soa
from macroc_tpu.ops.stencil_pallas import stencil_matvec_soa
from macroc_tpu.solve.precond import _inv3x3


def coarse_size(n: int) -> int:
    """Flexible vertex coarsening: coarse node i <-> fine node min(2i, n-1).

    ODD fine extents give the classic 2:1 nesting.  EVEN extents keep the
    LAST fine node as an extra coarse node (one short interval at the high
    end): dropping it loses the entire high Dirichlet face from every
    coarse level, which was measured to degrade PCG from a flat 6 its to
    36+ (grids like 128 are even)."""
    return n // 2 + 1


def coarse_positions(n_f: int) -> np.ndarray:
    """Fine index of each coarse node."""
    return np.minimum(2 * np.arange(coarse_size(n_f)), n_f - 1)


def _interp_tables(n_f: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(left parent, right parent, left weight) per fine index — linear
    interpolation between the bracketing coarse nodes of coarse_positions."""
    n_c = coarse_size(n_f)
    fpos = coarse_positions(n_f)
    li = np.empty(n_f, np.int64)
    ri = np.empty(n_f, np.int64)
    wl = np.empty(n_f, np.float64)
    for i in range(n_f):
        if i == n_f - 1:
            li[i] = ri[i] = n_c - 1
            wl[i] = 1.0
        elif i % 2 == 0:
            li[i] = ri[i] = i // 2
            wl[i] = 1.0
        else:
            l, r = i // 2, min(i // 2 + 1, n_c - 1)
            li[i], ri[i] = l, r
            wl[i] = 1.0 if l == r else (fpos[r] - i) / (fpos[r] - fpos[l])
    return li, ri, wl


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MGLevel:
    A_soa: jax.Array       # (27,3,3,nx,ny,nz)
    inv_diag: jax.Array    # (nx,ny,nz,3,3) inverse nodal blocks
    bc_mask: jax.Array     # (3,nx,ny,nz) bool (SoA layout)


def _prolong_dim(u: jax.Array, dim: int, n_f: int) -> jax.Array:
    """1D trilinear prolongation along spatial dim (1..3 of (3,...))."""
    li, ri, wl = _interp_tables(n_f)
    ul = jnp.take(u, jnp.asarray(li), axis=dim)
    ur = jnp.take(u, jnp.asarray(ri), axis=dim)
    w = jnp.asarray(wl, u.dtype).reshape(
        (1,) * dim + (n_f,) + (1,) * (u.ndim - dim - 1)
    )
    return w * ul + (1.0 - w) * ur


def _restrict_dim(r: jax.Array, dim: int, n_f: int) -> jax.Array:
    """Exact transpose of _prolong_dim (so R = P^T)."""
    li, ri, wl = _interp_tables(n_f)
    n_c = coarse_size(n_f)
    w = jnp.asarray(wl, r.dtype).reshape(
        (1,) * dim + (n_f,) + (1,) * (r.ndim - dim - 1)
    )
    shape = r.shape[:dim] + (n_c,) + r.shape[dim + 1:]
    out = jnp.zeros(shape, r.dtype)
    idx_l = jnp.asarray(li)
    idx_r = jnp.asarray(ri)
    # scatter-adds along one axis with static index arrays
    out = out.at[(slice(None),) * dim + (idx_l,)].add(w * r)
    out = out.at[(slice(None),) * dim + (idx_r,)].add((1.0 - w) * r)
    return out


def prolong(u_c: jax.Array, fine_shape: Tuple[int, int, int]) -> jax.Array:
    for d, n_f in enumerate(fine_shape):
        u_c = _prolong_dim(u_c, d + 1, n_f)
    return u_c


def restrict(r_f: jax.Array) -> jax.Array:
    for d in range(3):
        r_f = _restrict_dim(r_f, d + 1, r_f.shape[d + 1])
    return r_f


def _coarsen_elem_dim(x: jax.Array, dim: int, n_f_nodes: int) -> jax.Array:
    """Average element pairs along one dim (coarse element j's children are
    the fine elements between coarse nodes j and j+1 — two for regular
    intervals, one for an even extent's short tail interval).

    Implemented with static-index takes, never a pad/reshape of the fine
    tensor: a reshape that repacks the (...,8,6,6) minor dims forces an XLA
    layout copy whose (8,128) tiling pads 6->8 x 6->128, a ~16x memory
    blowup (37 GB at 128^3, OOMs a v5e)."""
    f_el = x.shape[dim]
    nc_el = coarse_size(n_f_nodes) - 1
    ia = np.minimum(2 * np.arange(nc_el), f_el - 1)
    ib = np.minimum(ia + 1, f_el - 1)
    xa = jnp.take(x, jnp.asarray(ia), axis=dim)
    xb = jnp.take(x, jnp.asarray(ib), axis=dim)
    return 0.5 * (xa + xb)


def coarsen_ctan(ctan: jax.Array) -> jax.Array:
    """Volume-average fine element tangents (nex,ney,nez,8,6,6) into coarse
    elements (children per coarse_positions intervals)."""
    for dim in range(3):
        ctan = _coarsen_elem_dim(ctan, dim, ctan.shape[dim] + 1)
    return ctan


def _sample_coarse(mask: jax.Array) -> jax.Array:
    """Sample a (3,nx,ny,nz) node mask at the coarse node positions."""
    for dim in (1, 2, 3):
        idx = coarse_positions(mask.shape[dim])
        mask = jnp.take(mask, jnp.asarray(idx), axis=dim)
    return mask


def build_hierarchy(
    ctan: jax.Array,
    bc_mask_soa: jax.Array,
    spacing: Tuple[float, float, float],
    ref_quirk: bool,
    max_levels: int = 10,
    min_extent: int = 3,
    A0_soa: jax.Array | None = None,
) -> List[MGLevel]:
    """Level list from fine per-GP tangents (cropped element shape).

    Level 0's operator is assembled here too (identical to the CG operator
    construction in problem.linear_solve) so the hierarchy is
    self-contained; pass the already-assembled fine operator as ``A0_soa``
    to reuse it (saves a duplicate ~2 GB assembly at 128^3 — XLA CSE
    usually dedupes it, but don't rely on that)."""
    from macroc_tpu import bc as bc_mod

    levels: List[MGLevel] = []
    dtype = ctan.dtype
    cur_ctan = ctan
    cur_mask = bc_mask_soa
    cur_spacing = tuple(spacing)
    wg0 = spacing[0] * spacing[1] * spacing[2] / 8.0
    lev = 0
    while True:
        ne = cur_ctan.shape[:3]
        shape = tuple(n + 1 for n in ne)
        if ref_quirk:
            # Quirk family: B is spacing-independent (unit element), so the
            # level operator scales purely with wg.  Rediscretizing with
            # wg_l = 8^l wg0 makes coarse operators 4x too stiff per level
            # relative to the Galerkin RAP (whose scale grows ~2^l, like the
            # true-FEM family where A_l ~ wg_l/h_l^2 ~ h_l): the coarse
            # correction is then ~4x too small per level and PCG degrades
            # with depth (measured: 21 its @17^3 / 35 @33^3 vs a flat 6 with
            # consistent scaling).  Use wg_l = 2^l wg0 — for isotropic
            # spacing this equals the true-FEM hierarchy times the constant
            # h0^2, and PCG is invariant to constant scaling of M.
            wg = wg0 * (2.0 ** lev)
        else:
            wg = cur_spacing[0] * cur_spacing[1] * cur_spacing[2] / 8.0
        if lev == 0 and A0_soa is not None:
            A_soa = A0_soa
        else:
            B = jnp.asarray(b_for(cur_spacing, ref_quirk), dtype=dtype)
            mask_aos = jnp.moveaxis(cur_mask, 0, -1)  # (nx,ny,nz,3)
            A_soa = bc_mod.apply_bc_stencil_soa(
                assemble_stencil_soa(cur_ctan, B, wg, shape),
                bc_mod.BCData(
                    mask=mask_aos, val_unit=jnp.zeros(shape + (3,), dtype)
                ),
            )
        inv_diag = _inv3x3(jnp.moveaxis(A_soa[DIAG_OFFSET], (0, 1), (-2, -1)))
        levels.append(MGLevel(A_soa=A_soa, inv_diag=inv_diag, bc_mask=cur_mask))

        if len(levels) >= max_levels or min(shape) <= min_extent:
            break
        nxt = tuple(coarse_size(n) for n in shape)
        if min(nxt) < 2 or nxt == shape:
            break
        cur_ctan = coarsen_ctan(cur_ctan)
        cur_mask = _sample_coarse(cur_mask)
        cur_spacing = tuple(2 * h for h in cur_spacing)
        lev += 1
    return levels


def _smooth(level: MGLevel, x: jax.Array, b: jax.Array, nu: int,
            omega: float, mv) -> jax.Array:
    """nu damped block-Jacobi sweeps: x += w D^-1 (b - A x).

    Unrolled Python loop (nu is small and static): under jit XLA unrolls a
    fori_loop of this size anyway, and avoiding an eager `scan` sidesteps a
    CPU-thunk deserialization segfault in this jaxlib's persistent cache."""
    for _ in range(nu):
        r = b - mv(level.A_soa, x)
        dz = jnp.einsum("xyzde,exyz->dxyz", level.inv_diag, r)
        x = x + omega * dz
    return x


def make_mg_preconditioner(
    levels: List[MGLevel], nu: int = 2, omega: float = 0.6,
    coarse_sweeps: int = 20, mv_for=None,
):
    # omega: 0.6 measured best for block-Jacobi on hex elasticity; 0.8
    # makes the V-cycle near-indefinite and PCG crawls (51 its vs 11 at
    # 9^3) — keep damping <= ~2/3.
    """Fixed symmetric V(nu,nu)-cycle closure z = M^{-1} r for PCG.

    mv_for(level) -> matvec(A_soa, x) lets the caller pick a per-level SpMV
    kernel (Pallas on large fine levels, fused jnp on small coarse ones —
    the V-cycle spends ~85% of its matvec bytes on level 0, so the fine
    level must use the roofline kernel).  Default: jnp everywhere.
    """
    n_levels = len(levels)
    mvs = [
        stencil_matvec_soa if mv_for is None else mv_for(lv) for lv in levels
    ]

    def vcycle(l: int, r: jax.Array) -> jax.Array:
        level = levels[l]
        if l == n_levels - 1:
            return _smooth(
                level, jnp.zeros_like(r), r, coarse_sweeps, omega, mvs[l]
            )
        x = _smooth(level, jnp.zeros_like(r), r, nu, omega, mvs[l])
        res = r - mvs[l](level.A_soa, x)
        rc = restrict(res)
        # coarse Dirichlet rows carry no error
        rc = jnp.where(levels[l + 1].bc_mask, 0.0, rc)
        ec = vcycle(l + 1, rc)
        corr = prolong(ec, r.shape[1:])
        corr = jnp.where(level.bc_mask, 0.0, corr)
        x = x + corr
        return _smooth(level, x, r, nu, omega, mvs[l])

    return lambda r: vcycle(0, r)
