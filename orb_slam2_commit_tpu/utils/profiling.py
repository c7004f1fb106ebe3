"""Per-stage timing + device tracing.

The reference's only observability is wall-clock prints in its example
drivers (Examples/Monocular/mono_tum.cc:83-101,119-127) plus the live GUI
counters (src/FrameDrawer.cc:144-180); SURVEY.md S5 calls out the gap.
This module gives the engine a first-class profiling surface:

  * Profiler — named stage timers (count / total / EMA / min / max)
    recorded by the pipeline (System wires extract/track/keyframe/mapping
    stages); cheap enough to stay always-on.
  * device_trace — context manager around jax.profiler.trace for XLA/TPU
    timeline capture (viewable in TensorBoard / xprof), degrading to a
    no-op when the backend cannot trace (e.g. remote tunnels).
"""

from __future__ import annotations

import contextlib
import threading
import time
from dataclasses import dataclass, field
from typing import Dict, Iterator, Optional


@dataclass
class StageStats:
    count: int = 0
    total_s: float = 0.0
    ema_s: float = 0.0
    min_s: float = float("inf")
    max_s: float = 0.0

    def record(self, dt: float, ema_alpha: float = 0.1) -> None:
        self.count += 1
        self.total_s += dt
        self.ema_s = dt if self.count == 1 else (
            (1.0 - ema_alpha) * self.ema_s + ema_alpha * dt
        )
        self.min_s = min(self.min_s, dt)
        self.max_s = max(self.max_s, dt)

    @property
    def mean_s(self) -> float:
        return self.total_s / max(self.count, 1)


class Profiler:
    """Thread-safe named-stage wall timers."""

    def __init__(self) -> None:
        self._stats: Dict[str, StageStats] = {}
        self._lock = threading.Lock()

    @contextlib.contextmanager
    def timed(self, stage: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.record(stage, time.perf_counter() - t0)

    def record(self, stage: str, dt: float) -> None:
        with self._lock:
            st = self._stats.get(stage)
            if st is None:
                st = self._stats[stage] = StageStats()
            st.record(dt)

    def summary(self) -> Dict[str, Dict[str, float]]:
        with self._lock:
            return {
                k: {
                    "count": float(v.count),
                    "mean_ms": v.mean_s * 1e3,
                    "ema_ms": v.ema_s * 1e3,
                    "min_ms": (0.0 if v.count == 0 else v.min_s * 1e3),
                    "max_ms": v.max_s * 1e3,
                    "total_s": v.total_s,
                }
                for k, v in self._stats.items()
            }

    def report(self) -> str:
        rows = ["stage                  count   mean ms    ema ms    max ms"]
        for k, v in sorted(self.summary().items()):
            rows.append(
                f"{k:22s} {int(v['count']):6d} {v['mean_ms']:9.2f} "
                f"{v['ema_ms']:9.2f} {v['max_ms']:9.2f}"
            )
        return "\n".join(rows)

    def reset(self) -> None:
        with self._lock:
            self._stats.clear()


@contextlib.contextmanager
def device_trace(log_dir: str, enabled: bool = True) -> Iterator[bool]:
    """jax.profiler trace of everything inside the block. Yields whether
    tracing is actually active (backends without profiler support — or a
    second concurrent trace — degrade to a no-op instead of raising)."""
    if not enabled:
        yield False
        return
    try:
        import jax

        jax.profiler.start_trace(log_dir)
        active = True
    except Exception:
        active = False
    try:
        yield active
    finally:
        if active:
            try:
                import jax

                jax.profiler.stop_trace()
            except Exception:
                pass
