"""Tracing / profiling hooks.

The reference has only wall-clock prints (SURVEY §5.1); here build waves and
query batches can be annotated for xprof via ``jax.profiler`` trace
annotations, and a lightweight timer registry collects per-phase wall time
for programmatic inspection.

Usage:
    from granne_tpu.utils import trace
    with trace.span("build/layer2/wave"):
        ...
    trace.start_profiler("/tmp/gt_profile")   # view in xprof/tensorboard
    ...
    trace.stop_profiler()
    print(trace.summary())
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax

_times: dict[str, float] = defaultdict(float)
_counts: dict[str, int] = defaultdict(int)


@contextlib.contextmanager
def span(name: str, block: bool = False):
    """Time a region and annotate it in the device trace.

    ``block=True`` waits for device completion so the recorded wall time is
    the device time, not just dispatch time.
    """
    with jax.profiler.TraceAnnotation(name):
        t0 = time.time()
        try:
            yield
        finally:
            if block:
                try:
                    jax.effects_barrier()
                except Exception:
                    pass
            dt = time.time() - t0
            _times[name] += dt
            _counts[name] += 1


def summary() -> dict:
    return {
        name: {"total_s": round(_times[name], 4), "count": _counts[name]}
        for name in sorted(_times)
    }


def reset() -> None:
    _times.clear()
    _counts.clear()


def start_profiler(logdir: str) -> None:
    jax.profiler.start_trace(logdir)


def stop_profiler() -> None:
    jax.profiler.stop_trace()
