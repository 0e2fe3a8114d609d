"""Tracing / profiling / throughput counters.

The reference has no tracing (SURVEY.md §5 — only tqdm bars); this
framework adds first-class observability:
  * :func:`trace` — context manager around ``jax.profiler`` writing a
    TensorBoard-viewable trace;
  * :class:`ThroughputMeter` — rays/s and token/s counters (the
    BASELINE.md metrics);
  * :func:`annotate` — named trace spans inside jitted code regions.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional


@contextlib.contextmanager
def trace(log_dir: str = '/tmp/jax_trace', enabled: bool = True):
    """Capture a jax.profiler trace for the enclosed block."""
    if not enabled:
        yield
        return
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named span visible in profiler timelines (TraceAnnotation)."""
    import jax
    return jax.profiler.TraceAnnotation(name)


@dataclass
class ThroughputMeter:
    """Accumulates per-step timings and derives rays/s + tokens/s."""

    resolution: int = 512
    views_per_step: int = 1
    batch_size: int = 1
    triangle_tokens: int = 0
    _times: List[float] = field(default_factory=list)
    _t0: Optional[float] = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self):
        if self._t0 is None:
            raise RuntimeError('stop() without start()')
        self._times.append(time.perf_counter() - self._t0)
        self._t0 = None

    @contextlib.contextmanager
    def step(self):
        self.start()
        try:
            yield
        finally:
            self.stop()

    @property
    def rays_per_step(self) -> int:
        return self.batch_size * self.views_per_step * self.resolution ** 2

    @property
    def ray_tokens_per_step(self) -> int:
        return self.batch_size * self.views_per_step * (self.resolution // 8) ** 2

    def summary(self, warmup: int = 1) -> Dict[str, float]:
        times = self._times[warmup:] if len(self._times) > warmup else self._times
        if not times:
            return {}
        dt = sum(times) / len(times)
        # median is robust to one-time tails the fixed warmup can't know
        # about (e.g. the first post-compile step blocking on the weight
        # + scene upload through a slow device tunnel); statistics.median
        # averages the two middle samples for even counts — the common
        # 3-batch run has 2 post-warmup windows, and picking the slower
        # one overstated the step time (ADVICE r3 low #4)
        import statistics
        med = statistics.median(times)
        return {
            'steps': len(times),
            'mean_step_s': dt,
            'median_step_s': med,
            'rays_per_s': self.rays_per_step / dt,
            'rays_per_s_median': self.rays_per_step / med,
            'ray_tokens_per_s': self.ray_tokens_per_step / dt,
            'triangle_tokens_per_s': self.batch_size * self.triangle_tokens / dt,
        }
