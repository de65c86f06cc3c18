"""Device profiling: jax.profiler traces + per-stage device timing.

The TPU equivalent of the reference's step-timing + OTel spans (SURVEY.md
§5.1): `RunMetrics.track_step` already captures host wall-clock per pipeline
phase; this module adds (a) a context manager that captures a full
`jax.profiler` trace (viewable in TensorBoard/XProf) around any region, and
(b) `device_timer` for accurate device-side timings of individual programs
(blocks on the result to exclude async-dispatch illusions).
"""

from __future__ import annotations

import logging
import time
from contextlib import contextmanager
from typing import Any, Callable, Dict, Iterator, Optional

logger = logging.getLogger(__name__)


@contextmanager
def profiler_trace(log_dir: str = "/tmp/radiant_tpu_trace") -> Iterator[None]:
    """Capture a jax.profiler trace of the enclosed region."""
    import jax

    try:
        jax.profiler.start_trace(log_dir)
        started = True
        logger.info("profiler trace -> %s", log_dir)
    except Exception as exc:  # pragma: no cover
        logger.warning("profiler unavailable: %s", exc)
        started = False
    try:
        yield
    finally:
        if started:
            jax.profiler.stop_trace()


@contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region inside a profiler trace (TraceAnnotation)."""
    import jax

    try:
        with jax.profiler.TraceAnnotation(name):
            yield
    except Exception:  # pragma: no cover
        yield


def device_timer(fn: Callable[[], Any], iters: int = 5, warmup: int = 1) -> Dict[str, float]:
    """Median wall time of a device program, forcing full materialization.

    `block_until_ready` can be a no-op through remote-device tunnels, so the
    result is pulled to host via jax.device_get before the clock stops."""
    import jax

    for _ in range(warmup):
        jax.device_get(jax.tree.leaves(fn())[0])
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn()
        jax.device_get(jax.tree.leaves(out)[0])
        times.append(time.perf_counter() - t0)
    times.sort()
    return {
        "median_ms": times[len(times) // 2] * 1000.0,
        "min_ms": times[0] * 1000.0,
        "max_ms": times[-1] * 1000.0,
        "iters": float(iters),
    }
