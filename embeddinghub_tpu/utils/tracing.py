"""Tracing / profiling.

The reference has no distributed tracing — a pprof HTTP server plus
request-id log propagation (SURVEY.md §5).  The TPU-native equivalents:

  * span timers bound to the structured logger's request ids
    (poor-man's tracing, matching the reference's approach);
  * the JAX profiler: :func:`profile` captures an xplane trace viewable
    in TensorBoard/XProf — the TPU answer to pprof for device time.
"""

from __future__ import annotations

import contextlib
import time

from embeddinghub_tpu.featurestore.logging import LOGGER


@contextlib.contextmanager
def span(name: str, **fields):
    """Log a timed span (start not logged; completion carries ms)."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        LOGGER.info(
            "span", span=name, ms=round((time.perf_counter() - t0) * 1e3, 3), **fields
        )


@contextlib.contextmanager
def profile(log_dir: str):
    """Capture a JAX profiler trace (device + host timelines) into
    ``log_dir``.  No-op if the profiler is unavailable on the backend."""
    import jax

    started = False
    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except Exception:  # noqa: BLE001 — profiling is best-effort
        pass
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:  # noqa: BLE001
                pass


def annotate(name: str):
    """Named region visible in xplane traces (TraceAnnotation)."""
    import jax

    return jax.profiler.TraceAnnotation(name)
