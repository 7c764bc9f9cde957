"""Dirichlet boundary conditions as masks + value fields.

The reference builds per-rank Dirichlet index lists from the DMDA
local-to-global map with -1 sentinels ignored by VecSetValues
(src/bcs.c:154-338, init.c:100-101) and eliminates Jacobian rows/columns
with MatZeroRowsColumns (bcs.c:341-347).  On a structured grid the same
information is a boolean node-dof mask plus a unit-load value field — both
dense (nx, ny, nz, 3) arrays built once on the host; application is pure
`where`, sharding-transparent, and exactly reproduces the global union of
the reference's per-rank ghost-surface writes.

Two BC cases (macroc.h:58; default BC_CIRCLE, init.c:64):

  BC_BENDING (bcs.c:61-91, 198-251):
    - face x=0:   all 3 dofs fixed to 0
    - face x=LX:  dofs (x,z) fixed to 0, dof y driven to U

  BC_CIRCLE (bcs.c:94-146, 254-338):
    - the 4 edges of face y=0 (x=0, x=LX along z; z=0, z=LZ along interior
      x): all 3 dofs fixed to 0
    - face y=LY nodes with (lx/2 - (x_i + dx/2))^2 + (lz/2 - (z_k + dz/2))^2
      < rad^2: dof y driven to U (bcs.c:128-138; note the reference's
      half-cell offset in the circle test — replicated)

Jacobian elimination is symmetric (rows + columns zeroed, unit diagonal),
matching MatZeroRowsColumns(A, ..., 1.0, NULL, NULL).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from macroc_tpu.config import BC_BENDING, BC_CIRCLE, MacroConfig
from macroc_tpu.fem.kernels import DIAG_OFFSET, N_STENCIL, STENCIL_OFFSETS
from macroc_tpu.grid import StructuredGrid3D


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BCData:
    """mask: True where the dof is Dirichlet; val_unit: prescribed value per
    unit load factor U (so value(U) = val_unit * U; fixed-zero dofs have
    val_unit == 0)."""

    mask: jax.Array      # (nx, ny, nz, 3) bool
    val_unit: jax.Array  # (nx, ny, nz, 3) dtype


def build_bc(grid: StructuredGrid3D, cfg: MacroConfig, dtype=jnp.float32) -> BCData:
    nx, ny, nz = grid.nx, grid.ny, grid.nz
    mask = np.zeros((nx, ny, nz, 3), dtype=bool)
    val = np.zeros((nx, ny, nz, 3), dtype=np.float64)

    if cfg.bc_type == BC_BENDING:
        mask[0, :, :, :] = True              # face x = 0, all dofs = 0
        mask[nx - 1, :, :, :] = True         # face x = LX
        val[nx - 1, :, :, 1] = 1.0           # dof y driven to U
    elif cfg.bc_type == BC_CIRCLE:
        # 4 edges at y = 0, all dofs = 0
        mask[0, 0, :, :] = True              # x=0 edge, along z
        mask[nx - 1, 0, :, :] = True         # x=LX edge, along z
        mask[1:nx - 1, 0, 0, :] = True       # z=0 edge, interior x
        mask[1:nx - 1, 0, nz - 1, :] = True  # z=LZ edge, interior x
        # circle on face y = LY, dof y = U
        i = np.arange(nx)
        k = np.arange(nz)
        x = grid.lx / 2.0 - (i * grid.dx + grid.dx / 2.0)
        z = grid.lz / 2.0 - (k * grid.dz + grid.dz / 2.0)
        inside = (x[:, None] ** 2 + z[None, :] ** 2) < cfg.rad**2
        mask[:, ny - 1, :, 1] |= inside
        val[:, ny - 1, :, 1] = np.where(inside, 1.0, val[:, ny - 1, :, 1])
    else:
        raise ValueError(f"unknown bc_type {cfg.bc_type}")

    return BCData(mask=jnp.asarray(mask), val_unit=jnp.asarray(val, dtype=dtype))


def apply_bc_on_u(U, u: jax.Array, bc: BCData) -> jax.Array:
    """Insert prescribed values into u (reference: apply_bc_on_u, bcs.c:29-45)."""
    return jnp.where(bc.mask, bc.val_unit * U, u)


def apply_bc_on_res(b: jax.Array, bc: BCData) -> jax.Array:
    """Zero residual entries at Dirichlet dofs (bcs.c:350-362)."""
    return jnp.where(bc.mask, jnp.zeros((), dtype=b.dtype), b)


def neighbor_mask27(mask: jax.Array) -> jax.Array:
    """(nx,ny,nz,27,3): Dirichlet mask of the neighbor at each stencil offset
    (False outside the domain)."""
    nx, ny, nz = mask.shape[:3]
    mp = jnp.pad(mask, ((1, 1), (1, 1), (1, 1), (0, 0)))
    cols = [
        mp[1 + di:1 + di + nx, 1 + dj:1 + dj + ny, 1 + dk:1 + dk + nz, :]
        for (di, dj, dk) in STENCIL_OFFSETS
    ]
    return jnp.stack(cols, axis=3)


def apply_bc_stencil(A27: jax.Array, bc: BCData) -> jax.Array:
    """Symmetric Dirichlet elimination on the stencil matrix: zero the rows
    and columns of constrained dofs and put 1 on the diagonal — the
    MatZeroRowsColumns(.., 1.0, NULL, NULL) equivalent (bcs.c:341-347)."""
    mask = bc.mask
    zero = jnp.zeros((), dtype=A27.dtype)
    # rows: A27[p, o, d, :] = 0 where mask[p, d]
    A27 = jnp.where(mask[:, :, :, None, :, None], zero, A27)
    # cols: A27[p, o, :, e] = 0 where the o-neighbor of p has mask[., e]
    nmask = neighbor_mask27(mask)
    A27 = jnp.where(nmask[:, :, :, :, None, :], zero, A27)
    # unit diagonal at constrained dofs
    eye = jnp.eye(3, dtype=A27.dtype)
    add = eye * mask[..., :, None].astype(A27.dtype)
    A27 = A27.at[..., DIAG_OFFSET, :, :].add(add)
    return A27


def apply_bc_stencil_flat(Af: jax.Array, bc: BCData) -> jax.Array:
    """apply_bc_stencil on the FLAT block layout Af (nx,ny,nz,243), entry
    j = o*9 + d*3 + e (fem.kernels.assemble_stencil_flat) — the micro-RVE
    form that avoids (...,27,3,3) materializations inside nested loops."""
    mask = bc.mask
    sp = mask.shape[:3]
    zero = jnp.zeros((), dtype=Af.dtype)
    # rows: entries with d constrained at p -> j%9 // 3 == d pattern
    row = jnp.tile(jnp.repeat(mask, 3, axis=-1), (1, 1, 1, N_STENCIL))
    Af = jnp.where(row, zero, Af)
    # cols: entries with e constrained at the o-neighbor -> j%3 == e
    nm = neighbor_mask27(mask)  # (nx,ny,nz,27,3)
    col = jnp.broadcast_to(
        nm[:, :, :, :, None, :], sp + (N_STENCIL, 3, 3)
    ).reshape(sp + (N_STENCIL * 9,))
    Af = jnp.where(col, zero, Af)
    # unit diagonal at constrained dofs: j = 9*DIAG_OFFSET + 4*d
    d0 = 9 * DIAG_OFFSET
    return Af.at[..., d0:d0 + 9:4].add(mask.astype(Af.dtype))


def apply_bc_stencil_soa(A_soa: jax.Array, bc: BCData) -> jax.Array:
    """apply_bc_stencil on the SoA layout (27,3,3,nx,ny,nz) — avoids two
    2 GB layout transposes at 128^3 when the operator is assembled
    directly in SoA (assemble_stencil_soa)."""
    mask = jnp.moveaxis(bc.mask, -1, 0)  # (3,nx,ny,nz)
    nx, ny, nz = mask.shape[1:]
    zero = jnp.zeros((), dtype=A_soa.dtype)
    # rows: A[o, d, :, p] = 0 where mask[d, p]
    A_soa = jnp.where(mask[None, :, None], zero, A_soa)
    # cols: A[o, :, e, p] = 0 where the o-neighbor of p has mask[e, .]
    mp = jnp.pad(mask, ((0, 0), (1, 1), (1, 1), (1, 1)))
    nmask = jnp.stack(
        [
            mp[:, 1 + di:1 + di + nx, 1 + dj:1 + dj + ny, 1 + dk:1 + dk + nz]
            for (di, dj, dk) in STENCIL_OFFSETS
        ],
        axis=0,
    )  # (27,3,nx,ny,nz)
    A_soa = jnp.where(nmask[:, None], zero, A_soa)
    # unit diagonal at constrained dofs
    eye = jnp.eye(3, dtype=A_soa.dtype)
    add = eye[:, :, None, None, None] * mask[:, None].astype(A_soa.dtype)
    return A_soa.at[DIAG_OFFSET].add(add)


def bc_operator(matvec, bc: BCData):
    """Wrap a matvec with on-the-fly symmetric Dirichlet elimination (for the
    matrix-free operator path): y = x on constrained dofs, A restricted to
    free dofs elsewhere."""

    def op(x):
        x0 = jnp.where(bc.mask, jnp.zeros((), dtype=x.dtype), x)
        y = matvec(x0)
        return jnp.where(bc.mask, x, y)

    return op
