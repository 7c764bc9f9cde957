"""Measure micro-FE homogenize throughput across preconditioner and
gp_chunk on the TPU (VERDICT r3 next #5).  Prints GP/s per config."""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from macroc_tpu.utils.cache import setup_runtime

setup_runtime()

from macroc_tpu.config import MIC_LAYER_Y, MaterialParams
from macroc_tpu.constitutive.microfe import MicroFEEngine


def rate(precond, chunk, n_gps=1024, micro_n=10, dtype=jnp.float32):
    eng = MicroFEEngine(
        n=micro_n, micro_type=MIC_LAYER_Y,
        mat1=MaterialParams(),
        mat2=MaterialParams(E=1.0e6, nu=0.3, Sy=1.0e4, Ka=1.0e7),
        dtype=dtype, elastic_fastpath=False,
        precond=precond, gp_chunk=chunk,
    )
    eps = jax.random.normal(jax.random.PRNGKey(3), (n_gps, 6), dtype) * 1e-4
    state = eng.init_state((n_gps,))

    def body(eps, state, w):
        r = eng.homogenize(eps * (1.0 + w * 1e-30), state)
        return jnp.sum(r.stress) * jnp.asarray(1e-30, dtype) + w

    args = (eps, state, jnp.zeros((), dtype))
    c = jax.jit(body).lower(*args).compile()
    float(c(*args))  # warm
    t0 = time.perf_counter()
    float(c(*args))
    dt = time.perf_counter() - t0
    return n_gps / dt


if __name__ == "__main__":
    for precond in ("jacobi", "dense_elastic"):
        for chunk in (128, 256, 512):
            try:
                r = rate(precond, chunk)
            except Exception as e:  # noqa: BLE001
                r = f"FAILED: {str(e)[:200]}"
            print(f"{precond} chunk={chunk}: {r}", flush=True)
