"""Tracing / profiling helpers.

Parity with the reference's observability hooks (SURVEY.md §5): cProfile
around every QSM fit (kept, see ``pipeline/qsm/engine.fit_qsm(profile=...)``),
ad-hoc stage timers, and — the TPU equivalent — ``jax.profiler`` traces
viewable in TensorBoard/Perfetto.
"""

from __future__ import annotations

import contextlib
import logging
import time

logger = logging.getLogger("treemorph_tpu.profiling")


@contextlib.contextmanager
def stage_timer(name: str, record: dict | None = None):
    """Host wall-clock timer for pipeline stages (reference Pipeline.py:98,
    173-174 per-cloud timing)."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        logger.info("%s: %.3fs", name, dt)
        if record is not None:
            record[name] = dt


@contextlib.contextmanager
def device_trace(log_dir: str):
    """jax.profiler trace around a block — the TPU counterpart of the
    reference's cProfile dumps. View with TensorBoard or Perfetto."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region for device traces (shows up in the profiler timeline)."""
    import jax

    return jax.profiler.TraceAnnotation(name)
