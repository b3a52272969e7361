"""Profiling / tracing helpers (SURVEY.md §5: the reference consumes
devito operator summaries and the BFM C timer printouts; the TPU-native
equivalents are the PerfSummary objects returned by every solver call plus
the JAX profiler integration below)."""
from __future__ import annotations

import contextlib
import time

__all__ = ["trace", "timed"]


@contextlib.contextmanager
def trace(logdir="/tmp/devito_fwi_tpu_trace"):
    """Capture a JAX profiler trace (viewable in TensorBoard/Perfetto)
    around a block:

        with profiling.trace("/tmp/tr"):
            fwi_obj_multi(...)
    """
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def timed(label, sink=print):
    """Wall-clock a block with a device sync at the end. Through the axon
    TPU tunnel, ``block_until_ready`` can return early — prefer timing
    around code that ends in a real device->host fetch."""
    tic = time.perf_counter()
    try:
        yield
    finally:
        try:
            import jax
            jax.effects_barrier()
        except Exception:
            pass
        sink("%s: %.4f s" % (label, time.perf_counter() - tic))
