"""Bisect the r3 128^3 Newton-step regression (VERDICT r3 weak #1).

Times the fused converged Newton step (bench.bench_newton_step) across the
two axes that changed in round 3 — the stencil-assembly formulation and the
MG coarse-direct solve — plus standalone assembly-kernel timings, so the
fused-composition cost of each form is visible next to its kernel cost.

Run on the TPU:  python scripts/bisect_newton.py
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from macroc_tpu.utils.cache import setup_runtime

setup_runtime()


def standalone_assembly(n=128, dtype=jnp.float32):
    from bench import _timed_loop
    from macroc_tpu.config import MaterialParams
    from macroc_tpu.constitutive.elastic import elastic_matrix
    from macroc_tpu.fem.element import b_matrix
    from macroc_tpu.fem import kernels as K

    shape = (n, n, n)
    B = jnp.asarray(b_matrix((1.0, 1.0, 1.0)), dtype=dtype)
    C = jnp.asarray(elastic_matrix(MaterialParams()), dtype=dtype)
    ctan = jnp.broadcast_to(C, (n - 1, n - 1, n - 1, 8, 6, 6))
    # materialize ctan the way the fused step sees it (one buffer)
    ctan = jax.jit(lambda c: c * 1.0)(ctan)
    jax.block_until_ready(ctan)

    out = {}
    forms = {
        "slab": K.assemble_stencil_soa,
        "conv": K.assemble_stencil_soa_conv,
        "conv2": K.assemble_stencil_soa_conv2,
    }
    for name, fn in forms.items():
        def body(c, w):
            A = fn(c * (1.0 + w * 1e-30), B, 0.125, shape)
            return jnp.sum(A[13]) * jnp.asarray(1e-30, dtype) + w

        try:
            dt = _timed_loop(body, (ctan, jnp.zeros((), dtype)),
                             n_lo=2, n_hi=8)
            out[name] = dt * 1e3
        except Exception as e:  # noqa: BLE001
            out[name] = f"FAILED: {e}"
        print(f"standalone assembly {name}: {out[name]}", flush=True)
    return out


def fused_step(assembly, coarse_direct, n=128):
    from bench import bench_newton_step
    import dataclasses

    import bench as bench_mod
    from macroc_tpu.config import BC_BENDING, MacroConfig
    from macroc_tpu.problem import MacroProblem

    cfg = MacroConfig(
        nx=n, ny=n, nz=n, lx=4.0, ly=4.0, lz=4.0,
        bc_type=BC_BENDING, dtype="float32", constitutive="j2",
        newton_max_its=1, ksp_maxits=10000, ksp_rtol=1e-5,
        pc_type="mg", assembly=assembly, mg_coarse_direct=coarse_direct,
    )
    problem = MacroProblem(cfg, n_devices=1)
    u, state = problem.init_fields()
    U = jnp.asarray(-0.01, problem.dtype)

    @jax.jit
    def run(u, state, U):
        u2, s2, diag = problem.time_step(u, state, U)
        return jnp.sum(u2) + diag.res_norms[0], diag.ksp_its[0]

    c = run.lower(u, state, U).compile()
    s, its = c(u, state, U)
    float(s)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        s, its = c(u, state, U)
        float(s)
        best = min(best, time.perf_counter() - t0)
    return dict(step_s=best, ksp_its=int(its))


def main():
    results = {"assembly_ms": standalone_assembly()}
    for assembly in ("slab", "conv", "conv2"):
        for cd in (True, False):
            key = f"step_{assembly}_cd{int(cd)}"
            try:
                r = fused_step(assembly, cd)
            except Exception as e:  # noqa: BLE001
                r = {"error": str(e)[:300]}
            results[key] = r
            print(f"{key}: {r}", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
