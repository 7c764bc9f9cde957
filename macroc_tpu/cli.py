"""Command-line entry point: ``python -m macroc_tpu [petsc-style flags]``.

Honors the reference's flag names (README.md:48-65 + src/init.c:66-83):
  -da_grid_{x,y,z} -da_processors_{x,y,z} -ts -dt -lx -ly -lz -vtu_freq
  -newton_min_tol -newton_rel_tol -newton_max_its -bc_type
  -micro_n -micro_type -micro_mat_1 -micro_mat_2
  -ksp_type -pc_type -ksp_rtol -ksp_atol -ksp_divtol -ksp_max_it
plus TPU-native extensions (-dtype, -operator, -constitutive,
-checkpoint_freq, -resume...).  Unknown flags are ignored, as PETSc does.
"""

from __future__ import annotations

import sys

import jax

from macroc_tpu.config import parse_cli
from macroc_tpu.driver import Simulation


def main(argv=None):
    import os

    from macroc_tpu.parallel.distributed import maybe_initialize
    from macroc_tpu.utils.cache import setup_runtime

    # Explicit platform override (e.g. MACROC_PLATFORM=cpu for CI/testing):
    # needed because site customization may force a platform list and the
    # JAX_PLATFORMS env var is consumed before we run.
    plat = os.environ.get("MACROC_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)
    # PetscInitialize equivalent (src/main.c:33): bring up the multi-host
    # runtime BEFORE any backend use.  No-op on single-host.
    maybe_initialize()
    setup_runtime()
    argv = sys.argv[1:] if argv is None else argv
    cfg = parse_cli(argv)
    if cfg.dtype == "float64":
        jax.config.update("jax_enable_x64", True)
    n_devices = len(jax.devices())
    sim = Simulation(cfg, n_devices=n_devices)
    sim.run()
    return 0


if __name__ == "__main__":
    sys.exit(main())
