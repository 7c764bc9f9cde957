"""Preconditioned conjugate gradients with PETSc KSP semantics.

Replaces KSPCG + KSPConvergedDefault (reference: src/init.c:146-157,
src/assembly.c:179-192).  Semantics replicated:

  - zero initial guess (KSPSolve default);
  - left Jacobi-style preconditioning with the *preconditioned* residual
    norm ||M^{-1} r||_2 monitored (PETSc KSPCG's default norm type);
  - KSPConvergedDefault tests: converged when
        rnorm <= max(rtol * rnorm_0, abstol)
    diverged when rnorm >= dtol * rnorm_0 or its >= maxits, with rnorm_0
    the iteration-0 (preconditioned) residual norm;
  - reference tolerances (rtol, abstol, dtol, maxits) =
    (1e-5, 1e-50, 1e4, 10000) (init.c:147-149).

Implemented as a single lax.while_loop so an entire KSPSolve is one fused
device program — every iteration is one stencil SpMV + two dots + three
axpys, with cross-device psums inserted automatically under SPMD sharding
(these dots are the only mesh-wide collectives in the hot path, mirroring
the CG allreduces in the reference's PETSc run).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

# PETSc KSPConvergedReason values (for log parity)
KSP_CONVERGED_RTOL = 2
KSP_CONVERGED_ATOL = 3
KSP_DIVERGED_ITS = -3
KSP_DIVERGED_DTOL = -4


#: KSPConvergedReason value -> PETSc enum name (for -ksp_converged_reason)
KSP_REASON_NAMES = {
    2: "CONVERGED_RTOL",
    3: "CONVERGED_ATOL",
    -3: "DIVERGED_ITS",
    -4: "DIVERGED_DTOL",
}


class KSPResult(NamedTuple):
    x: jax.Array
    its: jax.Array      # iteration count (int32)
    rnorm: jax.Array    # final monitored residual norm
    reason: jax.Array   # KSPConvergedReason (int32)
    # per-iteration residual-norm history (record_trace entries, nan-padded;
    # index 0 = rnorm0) — populated only when requested (-ksp_monitor)
    trace: jax.Array | None = None


def _dot(a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.sum(a * b)


def cg_solve(
    matvec: Callable[[jax.Array], jax.Array],
    b: jax.Array,
    precond: Callable[[jax.Array], jax.Array] | None = None,
    *,
    rtol: float = 1.0e-5,
    abstol: float = 1.0e-50,
    dtol: float = 1.0e4,
    maxits: int = 10000,
    norm_type: str = "preconditioned",
    record_trace: int = 0,
) -> KSPResult:
    """Solve A x = b by PCG.  b is any array; matvec/precond map like-shaped
    arrays.  Returns a KSPResult whose fields are traced scalars.

    ``record_trace`` > 0 additionally records the monitored residual norm
    of every iteration into KSPResult.trace (shape (record_trace,), nan-
    padded) — the data behind PETSc's -ksp_monitor output."""
    if precond is None:
        precond = lambda r: r
    use_pnorm = norm_type == "preconditioned"

    r0 = b  # x0 = 0
    z0 = precond(r0)
    rz0 = _dot(r0, z0)
    rnorm0 = jnp.sqrt(_dot(z0, z0)) if use_pnorm else jnp.sqrt(_dot(r0, r0))
    x0 = jnp.zeros_like(b)

    tol = jnp.maximum(rtol * rnorm0, abstol)
    # Converged already at iteration 0 (e.g. b == 0)?
    reason0 = jnp.where(
        rnorm0 <= tol,
        jnp.where(rnorm0 <= abstol, KSP_CONVERGED_ATOL, KSP_CONVERGED_RTOL),
        0,
    ).astype(jnp.int32)

    trace0 = None
    if record_trace:
        trace0 = jnp.full((record_trace,), jnp.nan, b.dtype).at[0].set(rnorm0)

    def cond(carry):
        reason, its = carry[7], carry[5]
        return jnp.logical_and(reason == 0, its < maxits)

    def body(carry):
        x, r, z, p, rz, its, rnorm, reason, trace = carry
        q = matvec(p)
        alpha = rz / _dot(p, q)
        x = x + alpha * p
        r = r - alpha * q
        z = precond(r)
        rz_new = _dot(r, z)
        beta = rz_new / rz
        p = z + beta * p
        rnorm = jnp.sqrt(_dot(z, z)) if use_pnorm else jnp.sqrt(_dot(r, r))
        its = its + 1
        new_reason = jnp.where(
            rnorm <= tol,
            jnp.where(rnorm <= abstol, KSP_CONVERGED_ATOL, KSP_CONVERGED_RTOL),
            jnp.where(rnorm >= dtol * rnorm0, KSP_DIVERGED_DTOL, 0),
        ).astype(jnp.int32)
        if trace is not None:
            trace = trace.at[jnp.minimum(its, record_trace - 1)].set(rnorm)
        return (x, r, z, p, rz_new, its, rnorm, new_reason, trace)

    init = (x0, r0, z0, z0, rz0, jnp.int32(0), rnorm0, reason0, trace0)
    x, r, z, p, rz, its, rnorm, reason, trace = jax.lax.while_loop(
        cond, body, init
    )
    reason = jnp.where(
        jnp.logical_and(reason == 0, its >= maxits), KSP_DIVERGED_ITS, reason
    ).astype(jnp.int32)
    return KSPResult(x=x, its=its, rnorm=rnorm, reason=reason, trace=trace)
