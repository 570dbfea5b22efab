"""Structured run metrics and profiling hooks.

The reference's only observability is $display of the score and FSDB
waveform dumps (reference: src/TriAlign_tb.sv:266-267, 337-353;
src/TriAlign_1cyc.v:352-357).  Here every run can emit a structured record
-- score, cell count, GCUPS, backend, device -- and wrap itself in a
jax.profiler trace for kernel-level inspection.
"""

from __future__ import annotations

import contextlib
import dataclasses
import json
import sys
import time
from typing import Iterator, Optional


@dataclasses.dataclass
class RunMetrics:
    """One alignment run's record.  1 cell-update = one (i,j,k) lattice site
    across all 7 matrices, the reference's headline unit (pic/Result.png)."""

    score: int = 0
    cells: int = 0
    seconds: float = 0.0
    backend: str = ""
    device: str = ""
    shape: tuple = ()
    extra: dict = dataclasses.field(default_factory=dict)

    @property
    def gcups(self) -> float:
        return self.cells / self.seconds / 1e9 if self.seconds > 0 else 0.0

    def to_dict(self) -> dict:
        d = dataclasses.asdict(self)
        d["gcups"] = round(self.gcups, 4)
        return d

    def emit(self, stream=None) -> None:
        print(json.dumps(self.to_dict()), file=stream or sys.stderr, flush=True)


@contextlib.contextmanager
def timed(metrics: RunMetrics) -> Iterator[RunMetrics]:
    t0 = time.perf_counter()
    try:
        yield metrics
    finally:
        metrics.seconds = time.perf_counter() - t0


@contextlib.contextmanager
def profile_trace(log_dir: Optional[str]) -> Iterator[None]:
    """jax.profiler trace wrapper; no-op when log_dir is None."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_summary() -> str:
    import jax

    devs = jax.devices()
    return f"{devs[0].platform}x{len(devs)}:{getattr(devs[0], 'device_kind', '?')}"
