"""Multi-host initialization.

The reference initializes MPI via PetscInitialize (src/main.c:33).  The
TPU-native equivalent is jax.distributed: one process per host, devices
discovered per process, with the grid mesh laid out so the x axis (the
outermost mesh axis, hence the host-crossing one under jax.make_mesh
device ordering) carries the smallest halo surface across DCN.

Call ``maybe_initialize()`` before any backend use.  It is a no-op unless
multi-host environment variables are present (JAX_COORDINATOR_ADDRESS /
MACROC_COORDINATOR or a recognised cluster env), so single-host runs are
untouched.
"""

from __future__ import annotations

import os
from typing import Optional


def maybe_initialize(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize jax.distributed when configured; returns True if done."""
    import jax

    coordinator = coordinator or os.environ.get(
        "MACROC_COORDINATOR", os.environ.get("JAX_COORDINATOR_ADDRESS")
    )
    if num_processes is None:
        n = os.environ.get("MACROC_NUM_PROCESSES")
        num_processes = int(n) if n else None
    if process_id is None:
        p = os.environ.get("MACROC_PROCESS_ID")
        process_id = int(p) if p else None

    if coordinator is None and num_processes is None:
        # auto-detectable clusters (GKE/TPU pods) — let JAX figure it out
        if os.environ.get("TPU_WORKER_HOSTNAMES") and os.environ.get(
            "MACROC_AUTO_DISTRIBUTED"
        ):
            jax.distributed.initialize()
            return True
        return False

    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def is_primary() -> bool:
    """Rank-0 equivalent for logging/IO (PetscPrintf semantics)."""
    import jax

    return jax.process_index() == 0
