"""Test configuration: run on a virtual 8-device CPU mesh with float64.

Multi-device decomposition paths (the 8-way tests that mirror the
reference's mpirun -np 8 CTest configs, tests/CMakeLists.txt:26-28) run in
CI without TPU hardware via xla_force_host_platform_device_count.  float64
is enabled so numeric oracles compare at reference (double) precision.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# the axon sitecustomize forces jax_platforms="axon,cpu"; override it after
# import so tests always run on the virtual CPU mesh
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from macroc_tpu.utils.cache import setup_runtime  # noqa: E402

setup_runtime()
# The persistent compile cache is DISABLED for the test suite: this
# jaxlib's CPU-thunk serializer segfaults (put_executable_and_time) on the
# batched micro-FE step executables — observed in 4 consecutive full-suite
# runs (r5), each crashing at whichever test first serialized such a
# program while warm reads stayed fine.  CLI/bench/TPU entry points keep
# the cache (setup_runtime); tests pay cold compiles instead of crashing.
jax.config.update("jax_enable_compilation_cache", False)
from jax._src import compilation_cache as _cc  # noqa: E402

_cc.reset_cache()
