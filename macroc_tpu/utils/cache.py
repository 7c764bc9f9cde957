"""Persistent XLA compilation cache helper.

Newton/CG fused steps are large programs; on small hosts their compiles
dominate short runs.  The persistent cache makes repeated test/CLI/bench
invocations reuse compiled executables across processes.
"""

from __future__ import annotations

import os

import jax

_DEFAULT_DIR = os.environ.get(
    "MACROC_JAX_CACHE", os.path.expanduser("~/.cache/macroc_jax_cache")
)


def enable_persistent_cache(path: str | None = None) -> None:
    # Partition by backend: CPU executables cached by a process whose XLA
    # flags differ (e.g. the axon terminal adds --xla_allow_excess_precision)
    # can SEGFAULT at load time ("machine feature +prefer-no-scatter not
    # supported" warnings are the telltale).  A per-backend subdir keeps TPU
    # and CPU artifacts from mixing; JAX's own keying handles the rest.
    base = path or _DEFAULT_DIR
    try:
        backend = jax.default_backend()
    except Exception:
        backend = "unknown"
    full = os.path.join(base, backend)
    os.makedirs(full, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", full)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def setup_runtime(path: str | None = None) -> None:
    """Framework runtime defaults: persistent compile cache + full-f32
    matmul precision.

    TPU float32 einsums default to bf16 MXU passes (~1e-2 relative error),
    which stalls Newton at a residual plateau ~1e-2 of |RES|_0 — observed
    directly on v5e.  FEM assembly/SpMV are precision-critical, so the
    framework runs with jax_default_matmul_precision=highest; a reduced-
    precision path is a deliberate opt-in, not a silent default.
    """
    enable_persistent_cache(path)
    jax.config.update("jax_default_matmul_precision", "highest")
