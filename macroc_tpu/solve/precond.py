"""Preconditioners for the Krylov solvers.

The reference uses PCJACOBI (src/init.c:155).  We provide Jacobi (point
diagonal), block-Jacobi over the 3x3 dof blocks (a TPU-friendly upgrade —
same memory traffic, better clustering for elasticity), and identity.
All are closures ``z = M^{-1} r`` over (nx,ny,nz,3) fields.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from macroc_tpu.ops.stencil import stencil_diag, stencil_diag_blocks


def identity_precond():
    return lambda r: r


def jacobi_precond(A27: jax.Array):
    """z = r / diag(A).  Matches PCJACOBI on the assembled operator."""
    inv_diag = 1.0 / stencil_diag(A27)

    def apply(r):
        return r * inv_diag

    return apply


def block_jacobi_precond(A27: jax.Array):
    """z = D_block^{-1} r with D_block the 3x3 nodal diagonal blocks.

    The blocks are SPD for an SPD operator; a batched explicit 3x3 inverse
    (cofactor form) is cheaper than LU at this size and fully vectorizes.
    """
    D = stencil_diag_blocks(A27)
    inv = _inv3x3(D)

    def apply(r):
        return jnp.einsum("xyzde,xyze->xyzd", inv, r)

    return apply


def jacobi_precond_flat(Af: jax.Array):
    """Jacobi preconditioner from the FLAT block layout (nx,ny,nz,243):
    the diagonal entries live at j = 9*DIAG_OFFSET + 4*d."""
    from macroc_tpu.fem.kernels import DIAG_OFFSET

    d0 = 9 * DIAG_OFFSET
    inv_diag = 1.0 / Af[..., d0:d0 + 9:4]

    def apply(r):
        return r * inv_diag

    return apply


def jacobi_precond_soa(A_soa: jax.Array):
    """Jacobi preconditioner in SoA layout: A_soa (27,3,3,nx,ny,nz),
    vectors (3,nx,ny,nz)."""
    from macroc_tpu.fem.kernels import DIAG_OFFSET

    d = A_soa[DIAG_OFFSET]  # (3,3,nx,ny,nz)
    inv = 1.0 / jnp.stack([d[0, 0], d[1, 1], d[2, 2]], axis=0)

    def apply(r):
        return r * inv

    return apply


def block_jacobi_precond_soa(A_soa: jax.Array):
    """Block-Jacobi (3x3 nodal blocks) in SoA layout."""
    from macroc_tpu.fem.kernels import DIAG_OFFSET

    D = jnp.moveaxis(A_soa[DIAG_OFFSET], (0, 1), (-2, -1))  # (nx,ny,nz,3,3)
    inv = _inv3x3(D)

    def apply(r):
        return jnp.einsum("xyzde,exyz->dxyz", inv, r)

    return apply


def _inv3x3(m: jax.Array) -> jax.Array:
    """Batched closed-form 3x3 inverse; m: (..., 3, 3)."""
    a, b, c = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    d, e, f = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    g, h, i = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    co00 = e * i - f * h
    co01 = c * h - b * i
    co02 = b * f - c * e
    co10 = f * g - d * i
    co11 = a * i - c * g
    co12 = c * d - a * f
    co20 = d * h - e * g
    co21 = b * g - a * h
    co22 = a * e - b * d
    det = a * co00 + b * co10 + c * co20
    adj = jnp.stack(
        [
            jnp.stack([co00, co01, co02], axis=-1),
            jnp.stack([co10, co11, co12], axis=-1),
            jnp.stack([co20, co21, co22], axis=-1),
        ],
        axis=-2,
    )
    return adj / det[..., None, None]
