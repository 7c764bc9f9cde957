"""Geometric multigrid preconditioner for the 27-point block-stencil system.

The reference caps out at CG+Jacobi (PCJACOBI, src/init.c:155), whose
iteration count grows ~O(n) with grid size (200+ iterations at 128^3).
A vertex-centered geometric V-cycle brings that down to O(10) — the single
biggest end-to-end win available for the Newton-step metric, and a natural
fit for the structured grid:

  - coarsening: coarse nodes = fine nodes at even indices (any extent >= 3;
    odd tails clamp to the nearest parent).  Coarsening is PER-DIMENSION
    (semicoarsening): a dim is only coarsened while its extent exceeds
    ``min_extent``, so pancake grids — the reference's signature ny=3
    default (macroc.h:44-46), production 50x3x50
    (scripts/launch_jobs.sh:13) — coarsen x/z while y stays fixed, instead
    of falling back to Jacobi;
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
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from macroc_tpu.fem.element import b_matrix
from macroc_tpu.fem.kernels import (
    DIAG_OFFSET,
    STENCIL_OFFSETS,
    assemble_stencil_soa,
    offset_index,
)
from macroc_tpu.ops.stencil_pallas import stencil_matvec_soa


def _inv3x3_soa(D: jax.Array) -> jax.Array:
    """Inverse of per-node 3x3 blocks in SoA layout D (3,3,nx,ny,nz) ->
    (3,3,nx,ny,nz), via the adjugate — nine elementwise plane products,
    no layout change.  (Routing through (nx,ny,nz,3,3) + linalg costs
    ~650 MB of relayout copies per hierarchy build at 128^3: the (3,3)
    minors tile-pad, and every smoother application then re-transposes.)"""
    a, b, c = D[0, 0], D[0, 1], D[0, 2]
    d, e, f = D[1, 0], D[1, 1], D[1, 2]
    g, h, i = D[2, 0], D[2, 1], D[2, 2]
    A = e * i - f * h
    Dd = f * g - d * i
    G = d * h - e * g
    det = a * A + b * Dd + c * G
    r0 = jnp.stack([A, c * h - b * i, b * f - c * e])
    r1 = jnp.stack([Dd, a * i - c * g, c * d - a * f])
    r2 = jnp.stack([G, b * g - a * h, a * e - b * d])
    return jnp.stack([r0, r1, r2]) / det


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


def _interp_tables_k(n_f: int, order: int) -> Tuple[np.ndarray, np.ndarray]:
    """General parent/weight tables: (idx (n_f, K), w (n_f, K)).

    order=1: the linear tables above (K=2).  order=3: cubic Lagrange
    through the 4 nearest coarse nodes (K=4; exact at coarse positions,
    one-sided windows at the ends, handles the irregular even-extent tail
    spacing automatically).  Cubic transfers matter for SEMICOARSENED
    pancake hierarchies: the thin plate's low-energy transverse bending
    modes make the x/z problem biharmonic-like (4th order), for which
    linear P+R sit exactly at the borderline m_P + m_R = 2m of the mesh-
    principle and the V-cycle degrades with grid size (measured 19 its
    @33x3x33 -> 40 @65x3x65 linear); cubic satisfies the principle."""
    n_c = coarse_size(n_f)
    fpos = coarse_positions(n_f)
    if order == 1 or n_c < 4:
        li, ri, wl = _interp_tables(n_f)
        idx = np.stack([li, ri], axis=1)
        w = np.stack([wl, 1.0 - wl], axis=1)
        return idx, w
    assert order == 3
    idx = np.zeros((n_f, 4), np.int64)
    w = np.zeros((n_f, 4), np.float64)
    for i in range(n_f):
        hit = np.where(fpos == i)[0]
        if hit.size:
            idx[i, 0] = hit[0]
            w[i, 0] = 1.0
            continue
        j = int(np.searchsorted(fpos, i)) - 1  # fpos[j] < i < fpos[j+1]
        s = min(max(j - 1, 0), n_c - 4)
        xs = fpos[s:s + 4].astype(np.float64)
        for a in range(4):
            L = 1.0
            for c in range(4):
                if c != a:
                    L *= (i - xs[c]) / (xs[a] - xs[c])
            idx[i, a] = s + a
            w[i, a] = L
    return idx, w


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MGLevel:
    A_soa: jax.Array       # (27,3,3,nx,ny,nz)
    inv_diag: jax.Array    # (3,3,nx,ny,nz) inverse nodal blocks (SoA)
    bc_mask: jax.Array     # (3,nx,ny,nz) bool (SoA layout)
    # LINE smoother along the uncoarsened thin dim of a semicoarsened
    # hierarchy: dense inverse of the block-tridiagonal line operator,
    # (n_perp_a, n_perp_b, 3*n_d, 3*n_d).  None -> point block-Jacobi.
    line_inv: Optional[jax.Array] = None
    line_dim: int = dataclasses.field(
        default=-1, metadata=dict(static=True)
    )


def _build_line_inv(A_soa: jax.Array, d: int) -> jax.Array:
    """Dense inverse of the line operator along spatial dim ``d``.

    The line operator T couples each (perp_a, perp_b) column's nodes through
    the stencil offsets with zero displacement in the two perpendicular
    dims (block-tridiagonal, 3x3 dof blocks).  Extents along d are small by
    construction (a dim is only line-smoothed because it could not be
    coarsened), so a dense batched inverse of the (3n, 3n) columns is
    cheap and fully vectorizes.  T inherits symmetry and the eliminated
    Dirichlet rows (unit diagonal) from A, so omega*T^{-1} is a legal SPD
    V-cycle smoother exactly like the block-Jacobi it replaces."""
    n = A_soa.shape[3 + d]
    perp = [i for i in range(3) if i != d]
    na, nb = A_soa.shape[3 + perp[0]], A_soa.shape[3 + perp[1]]
    M = jnp.zeros((na, nb, 3 * n, 3 * n), A_soa.dtype)
    for delta in (-1, 0, 1):
        off = [0, 0, 0]
        off[d] = delta
        o = offset_index(*off)
        # (na, nb, n, 3row, 3col)
        blk = jnp.transpose(A_soa[o], (perp[0] + 2, perp[1] + 2, d + 2, 0, 1))
        for j in range(n):
            k = j + delta
            if 0 <= k < n:
                M = M.at[:, :, 3 * j:3 * j + 3, 3 * k:3 * k + 3].set(
                    blk[:, :, j]
                )
    return jnp.linalg.inv(M)


def _line_apply(line_inv: jax.Array, d: int, r: jax.Array) -> jax.Array:
    """z = T^{-1} r for the line operator along dim d; r is (3,nx,ny,nz)."""
    perp = [i for i in range(3) if i != d]
    fwd = (perp[0] + 1, perp[1] + 1, d + 1, 0)
    rc = jnp.transpose(r, fwd)  # (na, nb, n, 3)
    na, nb, n = rc.shape[:3]
    z = jnp.einsum(
        "abij,abj->abi", line_inv, rc.reshape(na, nb, n * 3)
    ).reshape(na, nb, n, 3)
    inv_perm = tuple(int(i) for i in np.argsort(fwd))
    return jnp.transpose(z, inv_perm)


def _prolong_dim(
    u: jax.Array, dim: int, n_f: int, order: int = 1
) -> jax.Array:
    """1D prolongation along spatial dim (1..3 of (3,...)).

    Identity when the dim was not coarsened (semicoarsening)."""
    if u.shape[dim] == n_f:
        return u
    idx, w = _interp_tables_k(n_f, order)
    out = None
    for a in range(idx.shape[1]):
        ua = jnp.take(u, jnp.asarray(idx[:, a]), axis=dim)
        wa = jnp.asarray(w[:, a], u.dtype).reshape(
            (1,) * dim + (n_f,) + (1,) * (u.ndim - dim - 1)
        )
        out = wa * ua if out is None else out + wa * ua
    return out


def _restrict_dim(
    r: jax.Array, dim: int, n_c: int, order: int = 1
) -> jax.Array:
    """Exact transpose of _prolong_dim (so R = P^T).

    ``n_c`` is the target coarse extent: identity when equal to the fine
    extent (semicoarsened-out dim), else it must be coarse_size(fine)."""
    n_f = r.shape[dim]
    if n_c == n_f:
        return r
    assert n_c == coarse_size(n_f), (n_c, n_f)
    idx, w = _interp_tables_k(n_f, order)
    shape = r.shape[:dim] + (n_c,) + r.shape[dim + 1:]
    out = jnp.zeros(shape, r.dtype)
    for a in range(idx.shape[1]):
        wa = jnp.asarray(w[:, a], r.dtype).reshape(
            (1,) * dim + (n_f,) + (1,) * (r.ndim - dim - 1)
        )
        # scatter-add along one axis with static index arrays
        out = out.at[(slice(None),) * dim + (jnp.asarray(idx[:, a]),)].add(
            wa * r
        )
    return out


def prolong(
    u_c: jax.Array, fine_shape: Tuple[int, int, int], order: int = 1
) -> jax.Array:
    for d, n_f in enumerate(fine_shape):
        u_c = _prolong_dim(u_c, d + 1, n_f, order)
    return u_c


def restrict(
    r_f: jax.Array,
    coarse_shape: Tuple[int, int, int] | None = None,
    order: int = 1,
) -> jax.Array:
    """Restrict to ``coarse_shape`` (defaults to coarsening every dim)."""
    if coarse_shape is None:
        coarse_shape = tuple(coarse_size(r_f.shape[d + 1]) for d in range(3))
    for d in range(3):
        r_f = _restrict_dim(r_f, d + 1, coarse_shape[d], order)
    return r_f


def _coarsen_elem_dim(x: jax.Array, dim: int, n_f_nodes: int) -> jax.Array:
    """Average element pairs along one dim (coarse element j's children are
    the fine elements between coarse nodes j and j+1 — two for regular
    intervals, one for an even extent's short tail interval).

    Implemented as a contraction with a constant (nc_el, f_el) restriction
    matrix (rows = 0.5/0.5 on each child pair; the even-extent tail's
    single child gets 0.5+0.5 on itself) — an MXU dot_general whose batch
    dims are everything else, bit-identical to explicit pair averaging.
    Measured at 128^3 L1 (r5): einsum ~15-18 ms for the whole chain vs
    jnp.take-gathers 61.6 ms (95% of the hierarchy build), pair-split
    reshape+sum 39 ms, reduce_window 66 ms, stride-2 slicing 59 ms.  Do
    NOT substitute a pad/reshape of the (8,6,6) minor dims — the layout
    copy tile-pads them 16x (37 GB at 128^3)."""
    f_el = x.shape[dim]
    nc_el = coarse_size(n_f_nodes) - 1
    ia = np.minimum(2 * np.arange(nc_el), f_el - 1)
    ib = np.minimum(ia + 1, f_el - 1)
    R = np.zeros((nc_el, f_el), np.float64)
    np.add.at(R, (np.arange(nc_el), ia), 0.5)
    np.add.at(R, (np.arange(nc_el), ib), 0.5)
    L = "abcdefgh"[: x.ndim]
    sub = f"Z{L[dim]},{L}->{L[:dim]}Z{L[dim + 1:]}"
    # tf32 passes for f32 inputs: coarse operators are preconditioner-only
    # (1e-6 relative error; cube hierarchies cast them to bf16 anyway) and
    # the restriction matmul is MXU-pass-count-bound.  f64 (CPU tests) is
    # unaffected by matmul-precision settings.
    prec = "tensorfloat32" if x.dtype == jnp.float32 else "highest"
    with jax.default_matmul_precision(prec):
        return jnp.einsum(sub, jnp.asarray(R, x.dtype), x)


def coarsen_ctan(
    ctan: jax.Array, coarsen: Tuple[bool, bool, bool] = (True, True, True)
) -> jax.Array:
    """Volume-average fine element tangents (nex,ney,nez,8,6,6) into coarse
    elements (children per coarse_positions intervals); dims with
    ``coarsen[d]`` False pass through (semicoarsening)."""
    for dim in range(3):
        if coarsen[dim]:
            ctan = _coarsen_elem_dim(ctan, dim, ctan.shape[dim] + 1)
    return ctan


def _sample_coarse(
    mask: jax.Array, coarsen: Tuple[bool, bool, bool] = (True, True, True)
) -> jax.Array:
    """Sample a (3,nx,ny,nz) node mask at the coarse node positions."""
    for dim in (1, 2, 3):
        if coarsen[dim - 1]:
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
    assemble_fn=None,
) -> List[MGLevel]:
    """Level list from fine per-GP tangents (cropped element shape).

    Coarsening is per-dimension: a dim coarsens while its extent exceeds
    ``min_extent`` (semicoarsening).  Cubes reproduce the round-2 isotropic
    hierarchy bit-for-bit; pancake grids — the reference's ny=3 default,
    production 50x3x50 — coarsen x/z while y stays put, so MG applies to
    the shapes the reference actually runs instead of Jacobi fallback.

    Quirk-family scaling: the quirk fine operator (unit-element B, real-
    volume wg, assembly.c:198) equals (8 wg0) x the TRUE-FEM operator of a
    UNIT-spacing grid, and PCG is invariant to constant scaling of M — so
    the Galerkin-consistent hierarchy is the true-FEM rediscretized
    hierarchy of that virtual unit grid, scaled by 8 wg0.  We carry a
    virtual spacing starting at (1,1,1) that doubles only along coarsened
    dims; for isotropic coarsening this reduces exactly to the round-2 rule
    wg_l = 2^l wg0 (b_matrix(2h) = b_matrix(h)/2, both power-of-two exact),
    and for semicoarsening it produces the correct anisotropic coarse
    operators (uncoarsened-dim coupling stiffens 4x per level relative to
    coarsened dims) that no single scalar wg rule can express.

    Level 0's operator is assembled here too (identical to the CG operator
    construction in problem.linear_solve) so the hierarchy is
    self-contained; pass the already-assembled fine operator as ``A0_soa``
    to reuse it (saves a duplicate ~2 GB assembly at 128^3 — XLA CSE
    usually dedupes it, but don't rely on that).  ``assemble_fn`` overrides
    the per-level stencil assembler (the caller passes the measured-best
    form — e.g. the MXU+Pallas assembler on single-device TPU)."""
    from macroc_tpu import bc as bc_mod

    if assemble_fn is None:
        assemble_fn = assemble_stencil_soa

    levels: List[MGLevel] = []
    dtype = ctan.dtype
    cur_ctan = ctan
    cur_mask = bc_mask_soa
    wg0 = spacing[0] * spacing[1] * spacing[2] / 8.0
    # rediscretization spacing: virtual unit grid for the quirk family
    # (see docstring), the real grid spacing otherwise
    cur_spacing = (1.0, 1.0, 1.0) if ref_quirk else tuple(spacing)
    fine_shape = tuple(n + 1 for n in ctan.shape[:3])
    # Semicoarsened pancake hierarchy: exactly one thin dim (never deeply
    # coarsenable) -> smooth with exact LINE solves along it.  Coarse
    # levels stiffen 4x per level in the uncoarsened dim, where point
    # block-Jacobi can't damp the strongly coupled error (measured on
    # 50x3x50 quirk/circle: 232 PCG its point-smoothed vs O(10) with
    # line smoothing); cube grids keep the point smoother unchanged.
    thin = [d for d in range(3) if fine_shape[d] <= 2 * min_extent + 1]
    line_dim = thin[0] if len(thin) == 1 else -1
    lev = 0
    while True:
        ne = cur_ctan.shape[:3]
        shape = tuple(n + 1 for n in ne)
        vol = cur_spacing[0] * cur_spacing[1] * cur_spacing[2]
        wg = wg0 * vol if ref_quirk else vol / 8.0
        if lev == 0 and A0_soa is not None:
            A_soa = A0_soa
        else:
            B = jnp.asarray(b_matrix(cur_spacing), dtype=dtype)
            mask_aos = jnp.moveaxis(cur_mask, 0, -1)  # (nx,ny,nz,3)
            A_soa = bc_mod.apply_bc_stencil_soa(
                assemble_fn(cur_ctan, B, wg, shape),
                bc_mod.BCData(
                    mask=mask_aos, val_unit=jnp.zeros(shape + (3,), dtype)
                ),
            )
        inv_diag = _inv3x3_soa(A_soa[DIAG_OFFSET])
        line_inv = (
            _build_line_inv(A_soa, line_dim) if line_dim >= 0 else None
        )
        levels.append(
            MGLevel(
                A_soa=A_soa,
                inv_diag=inv_diag,
                bc_mask=cur_mask,
                line_inv=line_inv,
                line_dim=line_dim,
            )
        )

        if len(levels) >= max_levels:
            break
        do = tuple(n > min_extent for n in shape)
        if not any(do):
            break
        cur_ctan = coarsen_ctan(cur_ctan, do)
        cur_mask = _sample_coarse(cur_mask, do)
        cur_spacing = tuple(
            2.0 * h if c else h for h, c in zip(cur_spacing, do)
        )
        lev += 1
    return levels


def _rb_mask(level: MGLevel, color: int) -> jax.Array:
    """Checkerboard mask over the two dims perpendicular to the line dim,
    broadcastable against (3, nx, ny, nz)."""
    d = level.line_dim
    sp = level.A_soa.shape[-3:]
    perp = [i for i in range(3) if i != d]
    ia = np.arange(sp[perp[0]])
    ib = np.arange(sp[perp[1]])
    grid = (ia[:, None] + ib[None, :]) % 2 == color
    shape = [1, 1, 1]
    shape[perp[0]] = sp[perp[0]]
    shape[perp[1]] = sp[perp[1]]
    return jnp.asarray(grid.reshape([1] + shape))


def _smooth(level: MGLevel, x: jax.Array, b: jax.Array, nu: int,
            omega: float, mv, reverse: bool = False) -> jax.Array:
    """nu smoothing sweeps.

    Cube levels: damped point block-Jacobi, x += w D^-1 (b - A x).
    Semicoarsened pancake levels: red-black LINE Gauss-Seidel along the
    thin dim — per half-sweep, exact line solves on one checkerboard
    color of the perpendicular plane (omega is ignored; GS needs no
    damping).  ``reverse`` flips the color order so post-smoothing is the
    adjoint of pre-smoothing and the V-cycle stays SPD (symmetric
    Gauss-Seidel argument).

    Unrolled Python loop (nu is small and static): under jit XLA unrolls a
    fori_loop of this size anyway, and avoiding an eager `scan` sidesteps a
    CPU-thunk deserialization segfault in this jaxlib's persistent cache."""
    if level.line_dim >= 0:
        colors = (1, 0) if reverse else (0, 1)
        masks = {c: _rb_mask(level, c) for c in (0, 1)}
        for _ in range(nu):
            for c in colors:
                r = b - mv(level.A_soa, x)
                dz = _line_apply(level.line_inv, level.line_dim, r)
                x = x + jnp.where(masks[c], dz, 0.0)
        return x
    for _ in range(nu):
        r = b - mv(level.A_soa, x)
        dz = jnp.einsum("dexyz,exyz->dxyz", level.inv_diag, r)
        x = x + omega * dz
    return x


def _dense_from_soa(A_soa: jax.Array) -> jax.Array:
    """Materialize a small stencil operator as a dense (3N, 3N) matrix
    (N = nx*ny*nz), row/col index = node*3 + dof.  Only for the coarsest
    MG level (N <= a few hundred)."""
    nx, ny, nz = A_soa.shape[-3:]
    n = nx * ny * nz * 3
    D = jnp.zeros((n, n), A_soa.dtype)
    for o, (di, dj, dk) in enumerate(STENCIL_OFFSETS):
        sr = (slice(max(0, -di), nx - max(0, di)),
              slice(max(0, -dj), ny - max(0, dj)),
              slice(max(0, -dk), nz - max(0, dk)))
        sc = (slice(max(0, di), nx - max(0, -di)),
              slice(max(0, dj), ny - max(0, -dj)),
              slice(max(0, dk), nz - max(0, -dk)))
        rows = np.arange(nx * ny * nz).reshape(nx, ny, nz)[sr].reshape(-1)
        cols = np.arange(nx * ny * nz).reshape(nx, ny, nz)[sc].reshape(-1)
        blk = A_soa[o][:, :, sr[0], sr[1], sr[2]].reshape(3, 3, -1)
        for d in range(3):
            for e in range(3):
                D = D.at[rows * 3 + d, cols * 3 + e].add(blk[d, e])
    return D


def make_mg_preconditioner(
    levels: List[MGLevel], nu: int = 2, omega: float = 0.6,
    coarse_sweeps: int = 20, mv_for=None, coarse_direct: bool = True,
    transfer_order: Optional[int] = None,
):
    # omega: 0.6 measured best for block-Jacobi on hex elasticity; 0.8
    # makes the V-cycle near-indefinite and PCG crawls (51 its vs 11 at
    # 9^3) — keep damping <= ~2/3.
    """Fixed symmetric V(nu,nu)-cycle closure z = M^{-1} r for PCG.

    mv_for(level) -> matvec(A_soa, x) lets the caller pick a per-level SpMV
    kernel (Pallas on large fine levels, fused jnp on small coarse ones —
    the V-cycle spends ~85% of its matvec bytes on level 0, so the fine
    level must use the roofline kernel).  Default: jnp everywhere.

    coarse_direct=True solves the coarsest level EXACTLY with a
    precomputed dense inverse (<= a few hundred dofs).  An inexact
    (Jacobi-swept) coarse solve leaves the near-null-space modes of
    weakly-constrained problems — the reference's circle BC pins only a
    radius-1 patch plus the y=0 edges — underresolved, and the PCG count
    then grows with problem size (measured on 50x3x50 quirk/circle:
    41 -> 11 its).  Falls back to ``coarse_sweeps`` smoother sweeps.
    """
    n_levels = len(levels)
    mvs = [
        stencil_matvec_soa if mv_for is None else mv_for(lv) for lv in levels
    ]
    coarse_inv = (
        jnp.linalg.inv(
            # reduced-precision hierarchies (mg_dtype) still invert in
            # >= f32 (linalg.inv has no bf16 path; the result is cast back)
            _dense_from_soa(levels[-1].A_soa).astype(
                jnp.promote_types(levels[-1].A_soa.dtype, jnp.float32)
            )
        ).astype(levels[-1].A_soa.dtype)
        if coarse_direct
        else None
    )
    if transfer_order is None:
        # cubic transfers on semicoarsened pancake hierarchies (see
        # _interp_tables_k: thin-plate bending is biharmonic-like and
        # linear P is order-borderline there); linear on cubes (optimal
        # for the 2nd-order bulk problem and cheaper).
        transfer_order = 3 if levels[0].line_dim >= 0 else 1

    def vcycle(l: int, r: jax.Array) -> jax.Array:
        level = levels[l]
        if l == n_levels - 1:
            if coarse_inv is not None:
                csh = r.shape  # (3, nx, ny, nz)
                rflat = jnp.moveaxis(r, 0, -1).reshape(-1)
                z = coarse_inv @ rflat
                return jnp.moveaxis(
                    z.reshape(csh[1], csh[2], csh[3], 3), -1, 0
                )
            return _smooth(
                level, jnp.zeros_like(r), r, coarse_sweeps, omega, mvs[l]
            )
        x = _smooth(level, jnp.zeros_like(r), r, nu, omega, mvs[l])
        res = r - mvs[l](level.A_soa, x)
        rc = restrict(res, levels[l + 1].A_soa.shape[-3:], transfer_order)
        # coarse Dirichlet rows carry no error
        rc = jnp.where(levels[l + 1].bc_mask, 0.0, rc)
        ec = vcycle(l + 1, rc)
        corr = prolong(ec, r.shape[1:], transfer_order)
        corr = jnp.where(level.bc_mask, 0.0, corr)
        x = x + corr
        return _smooth(level, x, r, nu, omega, mvs[l], reverse=True)

    return lambda r: vcycle(0, r)
