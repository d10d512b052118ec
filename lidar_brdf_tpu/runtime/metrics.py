"""Stage timing harness — the `PipelineMetrics` equivalent.

The reference brackets 10 pipeline stages with chrono timers and reports
mean +/- std over `numExecs` runs with optional first-run discard
(`Utilities/PipelineMetrics.{h,cpp}`, `LiDARSimulation.cpp:292-365`).  Under
XLA there are no kernel-level brackets inside one jit; instead we time whole
jitted stages with `block_until_ready` and offer the same aggregation +
text/file export, plus `jax.profiler` trace hooks for on-device analysis.
"""

from __future__ import annotations

import contextlib
import math
import time
from collections import defaultdict
from dataclasses import dataclass, field

import jax

# Stage names mirror the reference's PipelineMetrics enum
# (`PipelineMetrics.h:19-30`); TRAVERSE_PREP is the host beam-culling pass
# that has no reference counterpart (the GPU traverses per ray instead).
STAGES = ["RAY_BUILDING", "TRAVERSE_PREP", "FIND_COLLISION", "REDUCE",
          "INTENSITY", "READ", "WRITE", "TOTAL"]


@dataclass
class PipelineMetrics:
    """Accumulates per-stage wall times (seconds) across executions."""

    samples: dict = field(default_factory=lambda: defaultdict(list))
    discard_first: bool = False
    footer: str = ""          # free-form summary line (points/s, chunks)

    @contextlib.contextmanager
    def stage(self, name: str, sync=None):
        """Context manager timing one stage; pass a pytree via ``sync`` to
        block on device completion before stopping the clock."""
        t0 = time.perf_counter()
        result = {}
        try:
            yield result
        finally:
            value = result.get("sync", sync)
            if value is not None:
                jax.tree.map(
                    lambda a: a.block_until_ready()
                    if hasattr(a, "block_until_ready") else a, value)
            self.samples[name].append(time.perf_counter() - t0)

    def add(self, other: "PipelineMetrics") -> None:
        for k, v in other.samples.items():
            self.samples[k].extend(v)

    def _kept(self, name):
        s = self.samples.get(name, [])
        return s[1:] if (self.discard_first and len(s) > 1) else s

    def mean(self, name: str) -> float:
        s = self._kept(name)
        return sum(s) / len(s) if s else 0.0

    def std(self, name: str) -> float:
        s = self._kept(name)
        if len(s) < 2:
            return 0.0
        m = self.mean(name)
        return math.sqrt(sum((x - m) ** 2 for x in s) / (len(s) - 1))

    def report(self) -> str:
        lines = []
        for name in sorted(self.samples):
            lines.append(f"{name:14s} {self.mean(name)*1e3:10.3f} ms "
                         f"+- {self.std(name)*1e3:.3f} ms "
                         f"(n={len(self._kept(name))})")
        if self.footer:
            lines.append(self.footer)
        return "\n".join(lines)

    def export(self, path: str) -> None:
        with open(path, "w") as fh:
            fh.write(self.report() + "\n")


@contextlib.contextmanager
def device_trace(log_dir: str):
    """`jax.profiler` trace around a block (TPU timeline analysis)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
