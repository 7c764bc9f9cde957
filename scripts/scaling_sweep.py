#!/usr/bin/env python
"""Strong-scaling sweep — the reference's scripts/scala/ equivalent.

The reference measured strong scaling of the 100^3-grid, 10-step problem
over 96-768 MPI ranks with awk-extracted speedups
(scripts/scala/gen_inputs.sh:36-42).  Here: run the fused time step on the
same global problem over increasing device counts and report speedup /
efficiency.  On a single-chip host this uses virtual CPU devices (sharding
semantics + collective counts are real; absolute times are not ICI times) —
on a real slice, run as-is per host with jax.distributed.

Usage:
  python scripts/scaling_sweep.py [--grid 64] [--steps 2] [--devices 1,2,4,8]
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_one(n_devices: int, grid: int, steps: int) -> float:
    """Time `steps` fused steps over n virtual devices in a subprocess
    (XLA_FLAGS must be set before backend init)."""
    code = f"""
import jax, time
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import sys; sys.path.insert(0, {REPO!r})
from macroc_tpu.utils.cache import setup_runtime
setup_runtime()
from macroc_tpu.config import MacroConfig, BC_BENDING
from macroc_tpu.grid import decide_processor_grid
from macroc_tpu.problem import MacroProblem
from macroc_tpu.parallel import make_grid_mesh, shard_problem_fields

n = {n_devices}
px, py, pz = decide_processor_grid(n, {grid}, {grid}, {grid})
cfg = MacroConfig(nx={grid}, ny={grid}, nz={grid}, lx=4.0, ly=4.0, lz=4.0,
                  bc_type=BC_BENDING, dtype="float32",
                  procs_x=px, procs_y=py, procs_z=pz,
                  newton_max_its=1, ksp_maxits=50)
p = MacroProblem(cfg, n_devices=n)
mesh = make_grid_mesh(p.grid, jax.devices()[:n])
u, state = p.init_fields()
u, state = shard_problem_fields(mesh, u, state)
step = jax.jit(p.time_step)
U = jnp.asarray(-0.01, p.dtype)
out = step(u, state, U); jax.block_until_ready(out)   # compile
t0 = time.perf_counter()
for _ in range({steps}):
    u2, s2, d = step(u, state, U)
jax.block_until_ready(u2)
print("ELAPSED", (time.perf_counter() - t0) / {steps})
"""
    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={n_devices}"
    ).strip()
    out = subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True, text=True
    )
    for line in out.stdout.splitlines():
        if line.startswith("ELAPSED"):
            return float(line.split()[1])
    raise RuntimeError(f"sweep run failed:\n{out.stderr[-2000:]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", type=int, default=48)
    ap.add_argument("--steps", type=int, default=2)
    ap.add_argument("--devices", type=str, default="1,2,4,8")
    args = ap.parse_args()

    counts = [int(v) for v in args.devices.split(",")]
    results = {}
    for n in counts:
        t = run_one(n, args.grid, args.steps)
        results[n] = t
        base = results[counts[0]]
        speedup = base / t * counts[0]
        eff = speedup / n
        print(
            f"devices={n:<3d} step_time={t * 1e3:8.1f} ms  "
            f"speedup={speedup:5.2f}  efficiency={eff * 100:5.1f} %",
            flush=True,
        )
    print(json.dumps({str(k): v for k, v in results.items()}))


if __name__ == "__main__":
    main()
