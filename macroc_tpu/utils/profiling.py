"""Profiling & observability.

The reference's profiling story (SURVEY.md §5.1): HPCToolkit traces at
cluster scale, MPI_Wtime elapsed totals, and per-GP micro-solve cost as a
first-class observable for load-imbalance analysis.  TPU-native
equivalents:

  - ``trace(logdir)``: context manager around ``jax.profiler`` producing
    TensorBoard/perfetto traces of the fused device steps;
  - ``PhaseTimer``: named wall-clock phase accumulation (host-side, around
    block_until_ready boundaries) with a report table — the MPI_Wtime
    equivalent;
  - per-GP ``cost`` arrays already flow out of every constitutive engine
    (StepDiagnostics.cost) and into the VTU 'cost' field, matching
    micropp_C_get_sigma_cost3 (reference: src/output.c:179-187).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional

import jax


@contextlib.contextmanager
def trace(logdir: Optional[str]) -> Iterator[None]:
    """jax.profiler trace if a logdir is given, else a no-op."""
    if not logdir:
        yield
        return
    with jax.profiler.trace(logdir):
        yield


class PhaseTimer:
    """Accumulates wall-clock per named phase.

    Use around host-visible boundaries (the device work inside one jit call
    is opaque; time whole steps, IO, checkpointing separately).
    """

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> str:
        lines = ["phase                   total_s      calls    mean_ms"]
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            t, c = self.totals[name], self.counts[name]
            lines.append(f"{name:<22} {t:>9.3f} {c:>10d} {t / c * 1e3:>10.2f}")
        return "\n".join(lines)
