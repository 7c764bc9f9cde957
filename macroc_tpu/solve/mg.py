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
from macroc_tpu.fem.kernels import DIAG_OFFSET, assemble_stencil
from macroc_tpu.ops.stencil_pallas import stencil_matvec_soa, to_soa
from macroc_tpu.solve.precond import _inv3x3


def coarse_size(n: int) -> int:
    """Vertex-centered coarse extent: coarse node i <-> fine node 2i."""
    return (n - 1) // 2 + 1


def _interp_tables(n_f: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(left parent, right parent, left weight) per fine index, with odd
    tails clamped to the nearest existing parent."""
    n_c = coarse_size(n_f)
    li = np.empty(n_f, np.int64)
    ri = np.empty(n_f, np.int64)
    wl = np.empty(n_f, np.float64)
    for i in range(n_f):
        if i % 2 == 0:
            li[i] = ri[i] = i // 2
            wl[i] = 1.0
        else:
            l, r = i // 2, min(i // 2 + 1, n_c - 1)
            li[i], ri[i] = l, r
            wl[i] = 1.0 if l == r else 0.5
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


def coarsen_ctan(ctan: jax.Array) -> jax.Array:
    """Volume-average fine element tangents (nex,ney,nez,8,6,6) into coarse
    elements ((n_c-1) per dim, each the mean of its <=8 children; odd tails
    use the available children)."""
    ne = ctan.shape[:3]
    nc = tuple(coarse_size(n + 1) - 1 for n in ne)
    # pad fine elements so every coarse element has 2 children per dim
    pads = [(0, 2 * c - f) for f, c in zip(ne, nc)]
    cp = jnp.pad(ctan, pads + [(0, 0)] * 3, mode="edge")
    cp = cp.reshape(
        (nc[0], 2, nc[1], 2, nc[2], 2) + ctan.shape[3:]
    )
    return cp.mean(axis=(1, 3, 5))


def _sample_even(mask: jax.Array) -> jax.Array:
    return mask[:, ::2, ::2, ::2]


def build_hierarchy(
    ctan: jax.Array,
    bc_mask_soa: jax.Array,
    spacing: Tuple[float, float, float],
    ref_quirk: bool,
    max_levels: int = 10,
    min_extent: int = 3,
) -> List[MGLevel]:
    """Level list from fine per-GP tangents (cropped element shape).

    Level 0's operator is assembled here too (identical to the CG operator
    construction in problem.linear_solve) so the hierarchy is
    self-contained.
    """
    from macroc_tpu import bc as bc_mod

    levels: List[MGLevel] = []
    dtype = ctan.dtype
    cur_ctan = ctan
    cur_mask = bc_mask_soa
    cur_spacing = tuple(spacing)
    while True:
        ne = cur_ctan.shape[:3]
        shape = tuple(n + 1 for n in ne)
        wg = cur_spacing[0] * cur_spacing[1] * cur_spacing[2] / 8.0
        B = jnp.asarray(b_for(cur_spacing, ref_quirk), dtype=dtype)
        A27 = assemble_stencil(cur_ctan, B, wg, shape)
        mask_aos = jnp.moveaxis(cur_mask, 0, -1)  # (nx,ny,nz,3)
        A27 = bc_mod.apply_bc_stencil(
            A27,
            bc_mod.BCData(
                mask=mask_aos, val_unit=jnp.zeros(shape + (3,), dtype)
            ),
        )
        A_soa = to_soa(A27)
        inv_diag = _inv3x3(jnp.moveaxis(A_soa[DIAG_OFFSET], (0, 1), (-2, -1)))
        levels.append(MGLevel(A_soa=A_soa, inv_diag=inv_diag, bc_mask=cur_mask))

        if len(levels) >= max_levels or min(shape) <= min_extent:
            break
        nxt = tuple(coarse_size(n) for n in shape)
        if min(nxt) < 2 or nxt == shape:
            break
        cur_ctan = coarsen_ctan(cur_ctan)
        cur_mask = _sample_even(cur_mask)
        cur_spacing = tuple(2 * h for h in cur_spacing)
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
