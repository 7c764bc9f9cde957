"""Restarted GMRES with PETSc KSP semantics (left preconditioning).

The reference's KSP is runtime-switchable via -ksp_type (KSPSetFromOptions,
src/init.c:156); GMRES(30) is PETSc's default ksp_type and the recommended
solver for the larger/nonsymmetric configurations, so we provide it next to
CG.  Same convergence rules as solve/cg.py (KSPConvergedDefault with the
preconditioned residual norm, PETSc's GMRES default).

Structure: an outer lax.while_loop over restart cycles; each cycle runs a
fixed ``restart``-step Arnoldi process (lax.fori_loop) with Givens rotations
maintaining the residual-norm estimate, masking iterations after convergence
(no dynamic shapes — TPU-friendly).  The basis is stored flattened
(restart+1, N) so orthogonalization is one (j+1, N) @ (N,) matvec on the MXU.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from macroc_tpu.solve.cg import (
    KSP_CONVERGED_ATOL,
    KSP_CONVERGED_RTOL,
    KSP_DIVERGED_DTOL,
    KSP_DIVERGED_ITS,
    KSPResult,
)


def gmres_solve(
    matvec: Callable[[jax.Array], jax.Array],
    b: jax.Array,
    precond: Callable[[jax.Array], jax.Array] | None = None,
    *,
    rtol: float = 1.0e-5,
    abstol: float = 1.0e-50,
    dtol: float = 1.0e4,
    maxits: int = 10000,
    restart: int = 30,
    record_trace: int = 0,
) -> KSPResult:
    """``record_trace`` > 0 records per-iteration residual norms into
    KSPResult.trace (see cg_solve) — the -ksp_monitor data."""
    if precond is None:
        precond = lambda r: r

    shape = b.shape
    dtype = b.dtype
    N = b.size
    m = restart

    def M(v_flat):
        return precond(v_flat.reshape(shape)).reshape(-1)

    def A(v_flat):
        return matvec(v_flat.reshape(shape)).reshape(-1)

    b_flat = b.reshape(-1)
    z0 = M(b_flat)
    rnorm0 = jnp.linalg.norm(z0)
    tol = jnp.maximum(rtol * rnorm0, abstol)
    reason0 = jnp.where(
        rnorm0 <= tol,
        jnp.where(rnorm0 <= abstol, KSP_CONVERGED_ATOL, KSP_CONVERGED_RTOL),
        0,
    ).astype(jnp.int32)

    tiny = jnp.asarray(1e-30, dtype)
    trace0 = None
    if record_trace:
        trace0 = jnp.full((record_trace,), jnp.nan, dtype).at[0].set(rnorm0)

    def cycle(carry):
        x, its, rnorm, reason, trace = carry
        # residual of current iterate, preconditioned
        r = M(b_flat - A(x))
        beta = jnp.linalg.norm(r)

        Vm = jnp.zeros((m + 1, N), dtype)
        Vm = Vm.at[0].set(jnp.where(beta > tiny, r / beta, 0.0))
        H = jnp.zeros((m + 1, m), dtype)
        cs = jnp.zeros((m,), dtype)
        sn = jnp.zeros((m,), dtype)
        g = jnp.zeros((m + 1,), dtype).at[0].set(beta)

        def arnoldi(j, st):
            Vm, H, cs, sn, g, its, rnorm, reason, trace = st
            active = reason == 0

            w = M(A(Vm[j]))
            # classical Gram-Schmidt with a full re-orthogonalization pass
            # (CGS2): the second projection recovers the orthogonality that
            # single-pass CGS loses on ill-conditioned systems, with the
            # same loss bound as modified GS (Giraud/Langou/Rozloznik 2005)
            # but as two batched (j+1,N) matvecs instead of MGS's
            # sequential per-vector chain — the TPU-friendly form.  Rows
            # > j of Vm are zero and contribute nothing.
            h = Vm @ w
            w = w - Vm.T @ h
            h2 = Vm @ w
            w = w - Vm.T @ h2
            h = h + h2
            hnext = jnp.linalg.norm(w)
            Vm = Vm.at[j + 1].set(
                jnp.where(active & (hnext > tiny), w / jnp.maximum(hnext, tiny), Vm[j + 1])
            )
            hcol = h.at[j + 1].set(hnext)

            # apply previous Givens rotations to the new column
            def rot(i, hc):
                t = cs[i] * hc[i] + sn[i] * hc[i + 1]
                hc = hc.at[i + 1].set(-sn[i] * hc[i] + cs[i] * hc[i + 1])
                return hc.at[i].set(t)

            hcol = jax.lax.fori_loop(0, j, rot, hcol)
            # new rotation annihilating hcol[j+1]
            denom = jnp.sqrt(hcol[j] ** 2 + hcol[j + 1] ** 2)
            c = jnp.where(denom > tiny, hcol[j] / jnp.maximum(denom, tiny), 1.0)
            s = jnp.where(denom > tiny, hcol[j + 1] / jnp.maximum(denom, tiny), 0.0)
            hcol = hcol.at[j].set(denom).at[j + 1].set(0.0)

            gj = g[j]
            g_new = g.at[j].set(c * gj).at[j + 1].set(-s * gj)
            new_rnorm = jnp.abs(g_new[j + 1])

            new_reason = jnp.where(
                new_rnorm <= tol,
                jnp.where(new_rnorm <= abstol, KSP_CONVERGED_ATOL, KSP_CONVERGED_RTOL),
                jnp.where(new_rnorm >= dtol * rnorm0, KSP_DIVERGED_DTOL, 0),
            ).astype(jnp.int32)
            new_reason = jnp.where(
                (its + 1 >= maxits) & (new_reason == 0), KSP_DIVERGED_ITS, new_reason
            ).astype(jnp.int32)

            H = jnp.where(active, H.at[:, j].set(hcol), H)
            cs = jnp.where(active, cs.at[j].set(c), cs)
            sn = jnp.where(active, sn.at[j].set(s), sn)
            g = jnp.where(active, g_new, g)
            its = jnp.where(active, its + 1, its)
            rnorm = jnp.where(active, new_rnorm, rnorm)
            reason = jnp.where(active, new_reason, reason)
            if trace is not None:
                idx = jnp.minimum(its, record_trace - 1)
                trace = jnp.where(
                    active, trace.at[idx].set(new_rnorm), trace
                )
            return (Vm, H, cs, sn, g, its, rnorm, reason, trace)

        Vm, H, cs, sn, g, its, rnorm, reason, trace = jax.lax.fori_loop(
            0, m, arnoldi, (Vm, H, cs, sn, g, its, rnorm, reason, trace)
        )

        # back-substitution on the full m x m triangular system; columns that
        # never ran are zero — use a guarded solve on the leading block.
        # Number of performed columns this cycle:
        Hd = jnp.diagonal(H[:m, :m])
        ran = jnp.abs(Hd) > 0
        Hsafe = H[:m, :m] + jnp.diag(jnp.where(ran, 0.0, 1.0))
        y = jax.scipy.linalg.solve_triangular(
            Hsafe, jnp.where(ran, g[:m], 0.0), lower=False
        )
        x = x + Vm[:m].T @ y
        return (x, its, rnorm, reason, trace)

    def cond(carry):
        _, its, _, reason, _ = carry
        return jnp.logical_and(reason == 0, its < maxits)

    x0 = jnp.zeros((N,), dtype)
    x, its, rnorm, reason, trace = jax.lax.while_loop(
        cond, cycle, (x0, jnp.int32(0), rnorm0, reason0, trace0)
    )
    return KSPResult(
        x=x.reshape(shape), its=its, rnorm=rnorm, reason=reason, trace=trace
    )
