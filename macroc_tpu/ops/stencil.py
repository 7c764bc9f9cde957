"""27-point 3x3-block stencil operator (structured-grid BSR) — jnp path.

This is the TPU-native replacement for PETSc MATAIJ + MatMult: on a
structured grid the Jacobian's sparsity is a static 27-point node stencil
with 3x3 dof blocks, so the matrix is a dense array A27 (nx,ny,nz,27,3,3)
and SpMV is a stencil contraction — no index arrays, no gathers.

y[p, d] = sum_o sum_e A27[p, o, d, e] * x[p + off(o), e]

Out-of-domain neighbor blocks are structurally zero (assembly never writes
them), so padding x with zeros gives exact semantics.

A Pallas VMEM-tiled version of this kernel lives in ops/stencil_pallas.py;
this jnp version is the reference implementation and the autodiff-friendly
fallback.  nnz per matvec = nnodes * 27 * 9 (minus boundary zeros) — the
BSR-SpMV north-star metric counts these.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from macroc_tpu.fem.kernels import DIAG_OFFSET, STENCIL_OFFSETS


def stencil_matvec(A27: jax.Array, x: jax.Array) -> jax.Array:
    """y = A @ x for the 27-point block stencil.

    A27: (nx, ny, nz, 27, 3, 3);  x, y: (nx, ny, nz, 3).
    """
    nx, ny, nz = x.shape[:3]
    xp = jnp.pad(x, ((1, 1), (1, 1), (1, 1), (0, 0)))
    y = jnp.zeros_like(x)
    for o, (di, dj, dk) in enumerate(STENCIL_OFFSETS):
        xn = xp[1 + di:1 + di + nx, 1 + dj:1 + dj + ny, 1 + dk:1 + dk + nz, :]
        y = y + jnp.einsum("xyzde,xyze->xyzd", A27[:, :, :, o], xn)
    return y


def stencil_matvec_flat(Af: jax.Array, x: jax.Array) -> jax.Array:
    """y = A @ x with the stencil in FLAT block layout Af (nx,ny,nz,243)
    (entry j = o*9 + d*3 + e; see fem.kernels.assemble_stencil_flat).
    The per-offset (3,3) blocks are sliced out of the 243-minor lazily, so
    no (...,27,3,3) tensor ever materializes."""
    nx, ny, nz = x.shape[:3]
    xp = jnp.pad(x, ((1, 1), (1, 1), (1, 1), (0, 0)))
    y = jnp.zeros_like(x)
    for o, (di, dj, dk) in enumerate(STENCIL_OFFSETS):
        xn = xp[1 + di:1 + di + nx, 1 + dj:1 + dj + ny, 1 + dk:1 + dk + nz, :]
        blk = Af[:, :, :, o * 9:(o + 1) * 9].reshape(nx, ny, nz, 3, 3)
        y = y + jnp.einsum("xyzde,xyze->xyzd", blk, xn)
    return y


def stencil_to_dense(A27) -> "np.ndarray":
    """Expand the stencil matrix to a dense (3N, 3N) numpy array with node
    ordering matching C-order flattening of (nx,ny,nz,...) arrays (so
    ``dense @ x.reshape(-1)`` is exactly the stencil matvec).  Testing/debug
    only — the oracle for comparing against directly assembled matrices."""
    import numpy as np

    A27 = np.asarray(A27)
    nx, ny, nz = A27.shape[:3]
    N = nx * ny * nz
    dense = np.zeros((3 * N, 3 * N), dtype=A27.dtype)

    def gid(i, j, k):
        return (i * ny + j) * nz + k

    for i in range(nx):
        for j in range(ny):
            for k in range(nz):
                for o, (di, dj, dk) in enumerate(STENCIL_OFFSETS):
                    ii, jj, kk = i + di, j + dj, k + dk
                    if not (0 <= ii < nx and 0 <= jj < ny and 0 <= kk < nz):
                        continue
                    r, c = gid(i, j, k), gid(ii, jj, kk)
                    dense[3 * r:3 * r + 3, 3 * c:3 * c + 3] += A27[i, j, k, o]
    return dense


def stencil_diag(A27: jax.Array) -> jax.Array:
    """Point diagonal (nx,ny,nz,3) — Jacobi preconditioner input
    (PCJACOBI equivalent, reference: src/init.c:155)."""
    d = A27[..., DIAG_OFFSET, :, :]
    return jnp.stack([d[..., 0, 0], d[..., 1, 1], d[..., 2, 2]], axis=-1)


def stencil_diag_blocks(A27: jax.Array) -> jax.Array:
    """3x3 diagonal blocks (nx,ny,nz,3,3) — block-Jacobi input."""
    return A27[..., DIAG_OFFSET, :, :]
