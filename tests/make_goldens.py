"""Regenerate golden regression data (tests/goldens/*.json).

The reference's regression oracle is its own logged output, golden-diffed
between code versions (README.md:74-89, tests/compare_test.sh) — the
absolute numbers are self-generated, not published.  Same policy here:
these goldens pin the float64 CPU results of canonical configs; any future
change that shifts residual traces / KSP counts / forces beyond tolerance
is a regression (or a deliberate re-bless via this script).

Run:  python tests/make_goldens.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402

from macroc_tpu.config import MacroConfig, MaterialParams  # noqa: E402
from macroc_tpu.problem import MacroProblem  # noqa: E402

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "goldens")

# Canonical configs: the reference's CTest-style tiny grids (serial, 5 ts,
# tests/CMakeLists.txt:21-32) in both BC cases, elastic and plastic regimes.
CONFIGS = {
    "bending_elastic_5x3x3": MacroConfig(
        nx=5, ny=3, nz=3, lx=4.0, ly=2.0, lz=2.0, bc_type=0,
        ts=5, dtype="float64",
    ),
    "bending_plastic_5x3x3": MacroConfig(
        nx=5, ny=3, nz=3, lx=4.0, ly=2.0, lz=2.0, bc_type=0,
        ts=4, dt=0.15, newton_max_its=10, dtype="float64",
    ),
    "circle_elastic_9x3x9": MacroConfig(
        nx=9, ny=3, nz=9, lx=10.0, ly=1.0, lz=10.0, bc_type=1, rad=2.0,
        ts=4, dt=0.05, dtype="float64",
    ),
    "default_grid_smoke": MacroConfig(ts=2, dtype="float64"),
    # runtime-switchable KSP: -ksp_type gmres through the full Newton path
    # (reference KSPSetFromOptions, src/init.c:156)
    "gmres_circle_9x3x9": MacroConfig(
        nx=9, ny=3, nz=9, lx=10.0, ly=1.0, lz=10.0, bc_type=1, rad=2.0,
        ts=3, dt=0.05, ksp_type="gmres", dtype="float64",
    ),
    # a reference launch line with -micro_mat_2 != mat_1: constitutive
    # "auto" must route to the micro-FE engine (true FE^2 physics) with no
    # extra flags (reference always runs MicroPP, src/init.c:195-216)
    "hetero_micro_fe2_3x2x2": MacroConfig(
        nx=3, ny=2, nz=2, lx=2.0, ly=1.0, lz=1.0, bc_type=0,
        ts=2, dt=0.1, newton_max_its=5, micro_n=4, micro_type=1,
        micro_mat_2=MaterialParams(E=1.0e6, nu=0.3, Sy=5.0e3, Ka=2.0e6),
        dtype="float64",
    ),
}


def run_config(cfg: MacroConfig) -> dict:
    import jax.numpy as jnp

    p = MacroProblem(cfg, n_devices=1)
    u, state = p.init_fields()
    steps = []
    for ts in range(cfg.ts):
        U = cfg.displacement(ts)
        u, state, d = p.time_step_jit(u, state, jnp.asarray(U, p.dtype))
        nhom = int(d.n_homogenize)
        nsol = int(d.n_solves)
        steps.append(
            dict(
                ts=ts,
                U=float(U),
                res_norms=[float(v) for v in np.asarray(d.res_norms)[:nhom]],
                ksp_its=[int(v) for v in np.asarray(d.ksp_its)[:nsol]],
                force=float(d.force),
                f_trial_max=float(d.f_trial_max),
                nl_gps=int(np.asarray(d.non_linear).sum()),
                converged=bool(d.converged),
            )
        )
    u_np = np.asarray(p.unpad_u(u))
    return dict(
        steps=steps,
        u_norm=float(np.linalg.norm(u_np)),
        u_min=float(u_np.min()),
        u_max=float(u_np.max()),
    )


def main():
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for name, cfg in CONFIGS.items():
        print(f"running {name} ...", flush=True)
        data = run_config(cfg)
        path = os.path.join(GOLDEN_DIR, f"{name}.json")
        with open(path, "w") as f:
            json.dump(data, f, indent=1)
        print(f"  wrote {path}")


if __name__ == "__main__":
    main()
