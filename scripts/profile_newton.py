"""Phase budget of the fused 128^3 converged Newton step (VERDICT r4 #4).

Times each phase of MacroProblem.time_step in isolation with the
loop-differenced methodology (the only reliable one through the axon
tunnel; see bench.py::_timed_loop) and prints a breakdown table to check
into BASELINE.md.  Phases:

  homogenize+residual   strains -> J2 radial return -> force assembly -> BC
  assembly              per-GP ctan -> BC-eliminated SoA stencil (mxu form)
  hierarchy             MG level build given the fine operator (coarsen,
                        coarse assemblies, 3x3 diag inverses, coarse dense
                        inverse)
  spmv                  one fine-level Pallas matvec
  vcycle                one V(1,1) application (all levels)
  cg_solve              the full PCG run to rtol 1e-5
  step                  the fused end-to-end time step

Run: python scripts/profile_newton.py [n]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def timed_loop(body, args, n_lo=2, n_hi=12, reps=3):
    import numpy as np

    def mk(N):
        @jax.jit
        def run(*a):
            y = jax.lax.fori_loop(0, N, lambda i, w: body(*a[:-1], w), a[-1])
            return jnp.sum(y)

        return run

    cs = {}
    for N in (n_lo, n_hi):
        cs[N] = mk(N).lower(*args).compile()
        float(cs[N](*args))
    samples = []
    for _ in range(reps):
        ts = {}
        for N in (n_lo, n_hi):
            t0 = time.perf_counter()
            float(cs[N](*args))
            ts[N] = time.perf_counter() - t0
        samples.append((ts[n_hi] - ts[n_lo]) / (n_hi - n_lo))
    return float(np.median(samples))


def main(n=128):
    from macroc_tpu.config import BC_BENDING, MacroConfig
    from macroc_tpu.problem import MacroProblem
    from macroc_tpu.utils.cache import setup_runtime
    from macroc_tpu import bc as bc_mod

    setup_runtime()
    print(f"Phase budget, {n}^3 j2/MG/f32:", flush=True)
    cfg = MacroConfig(
        nx=n, ny=n, nz=n, lx=4.0, ly=4.0, lz=4.0,
        bc_type=BC_BENDING, dtype="float32", constitutive="j2",
        newton_max_its=1, ksp_maxits=10000, ksp_rtol=1e-5, pc_type="mg",
    )
    p = MacroProblem(cfg, n_devices=1)
    u, state = p.init_fields()
    U = jnp.asarray(-0.01, p.dtype)
    u = bc_mod.apply_bc_on_u(U, u, p.bc)
    emask = p.elem_mask[..., None]

    res = {}

    def rec(name, v):
        res[name] = v
        print(f"  {name:24s} {v * 1e3:9.1f} ms", flush=True)

    # --- fused step FIRST (smallest resident set: u + state only) ---
    def step(u, state, w):
        u2, s2, diag = p.time_step(u * (1.0 + w * 1e-30), state, U)
        return jnp.sum(u2[0, 0, 0]) * 1e-30 + w

    rec("step(total)", timed_loop(
        step, (u, state, jnp.zeros((), p.dtype)), n_lo=2, n_hi=6
    ))

    # --- homogenize + residual ---
    def hom_res(u, state, w):
        b, norm, hom = p.residual(u * (1.0 + w * 1e-30), state)
        return norm * 1e-30 + w

    rec("homogenize+residual", timed_loop(
        hom_res, (u, state, jnp.zeros((), p.dtype))
    ))

    # materialized inputs for the downstream phases
    @jax.jit
    def get_parts(u, state):
        b, norm, hom = p.residual(u, state)
        ctan_ns = hom.ctan * emask[..., None, None]
        return b, ctan_ns

    b, ctan_ns = jax.block_until_ready(get_parts(u, state))

    # --- assembly (the solver's operator construction incl. BC) ---
    from functools import partial

    from macroc_tpu.fem.kernels import assemble_stencil_soa
    from macroc_tpu.ops.assembly_pallas import assemble_stencil_soa_mxu

    on_tpu = jax.default_backend() == "tpu"
    asm = (
        partial(assemble_stencil_soa_mxu, xblock=16)
        if on_tpu
        else assemble_stencil_soa
    )

    def assembly(ct, w):
        A = bc_mod.apply_bc_stencil_soa(
            asm(ct[:-1, :-1, :-1] * (1.0 + w * 1e-30), p.B, p.grid.wg,
                p.node_shape),
            p.bc,
        )
        return jnp.sum(A[13, 0, 0, 0, 0]) * 1e-30 + w

    rec("assembly", timed_loop(assembly, (ctan_ns, jnp.zeros((), p.dtype))))

    @jax.jit
    def get_A(ct):
        return bc_mod.apply_bc_stencil_soa(
            asm(ct[:-1, :-1, :-1], p.B, p.grid.wg, p.node_shape), p.bc
        )

    A_soa = jax.block_until_ready(get_A(ctan_ns))

    # --- hierarchy build ---
    from macroc_tpu.solve.mg import build_hierarchy, make_mg_preconditioner

    bc_mask_soa = jnp.moveaxis(p.bc.mask, -1, 0)

    def hier(ct, A, w):
        lv = build_hierarchy(
            ct[:-1, :-1, :-1] * (1.0 + w * 1e-30), bc_mask_soa,
            p.grid.spacing, cfg.ref_b_quirk, A0_soa=A, assemble_fn=asm,
        )
        return jnp.sum(lv[-1].A_soa[13, 0, 0, 0, 0]) * 1e-30 + w

    rec("hierarchy", timed_loop(
        hier, (ctan_ns, A_soa, jnp.zeros((), p.dtype))
    ))

    # --- spmv + vcycle ---
    from macroc_tpu.ops.stencil_pallas import (
        stencil_matvec_pallas,
        stencil_matvec_soa,
        x_to_soa,
    )

    b_soa = x_to_soa(b)

    def spmv(A, v, w):
        mv = stencil_matvec_pallas if on_tpu else stencil_matvec_soa
        return jnp.sum(mv(A, v * (1.0 + w * 1e-30))[0, 0, 0]) * 1e-30 + w

    rec("spmv", timed_loop(
        spmv, (A_soa, b_soa, jnp.zeros((), p.dtype)), n_lo=5, n_hi=55
    ))

    import dataclasses as _dc

    @jax.jit
    def get_levels(ct, A):
        lv = build_hierarchy(
            ct[:-1, :-1, :-1], bc_mask_soa, p.grid.spacing,
            cfg.ref_b_quirk, A0_soa=A, assemble_fn=asm,
        )
        if on_tpu and lv[0].line_dim < 0:
            lv = [
                _dc.replace(
                    l, A_soa=l.A_soa.astype(jnp.bfloat16),
                    inv_diag=l.inv_diag.astype(jnp.bfloat16),
                )
                for l in lv
            ]
        return lv

    levels = jax.block_until_ready(get_levels(ctan_ns, A_soa))

    def mv_for(level):
        lnz = level.A_soa.shape[-1]
        if on_tpu and lnz >= 128 and lnz % 128 == 0:
            return stencil_matvec_pallas
        return stencil_matvec_soa

    def vcycle(levels, r, w):
        M = make_mg_preconditioner(
            levels, nu=cfg.mg_nu, omega=cfg.mg_omega,
            coarse_sweeps=cfg.mg_coarse_sweeps, mv_for=mv_for,
            coarse_direct=cfg.mg_coarse_direct,
        )
        return jnp.sum(M(r * (1.0 + w * 1e-30))[0, 0, 0]) * 1e-30 + w

    rec("vcycle", timed_loop(
        vcycle, (levels, b_soa, jnp.zeros((), p.dtype)), n_lo=2, n_hi=22
    ))
    del levels  # free ~4 GB of level operators before the full solve

    # --- full linear solve (assembly + hierarchy + PCG) ---
    def linsolve(ct, b, w):
        r = p.linear_solve(ct * (1.0 + w * 1e-30), b)
        return jnp.sum(r.x[0, 0, 0]) * 1e-30 + w

    del A_soa
    rec("linear_solve(total)", timed_loop(
        linsolve, (ctan_ns, b, jnp.zeros((), p.dtype)), n_lo=2, n_hi=6
    ))

    known = sum(
        v for k, v in res.items()
        if k in ("homogenize+residual", "linear_solve(total)")
    )
    print(f"  {'sum(hom+linsolve)':24s} {known * 1e3:9.1f} ms")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 128)
