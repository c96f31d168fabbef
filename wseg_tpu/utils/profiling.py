"""Profiling hooks (SURVEY.md §5.1): the reference only has wall-clock
Timer+imps logging; here `jax.profiler` traces are one flag away."""

from __future__ import annotations

import contextlib


@contextlib.contextmanager
def trace(logdir: str | None):
    """Capture a jax.profiler trace (viewable in TensorBoard/Perfetto) for
    the duration of the block; no-op when logdir is falsy."""
    if not logdir:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace span, e.g. `with annotate('train_step'): ...`."""
    import jax

    return jax.profiler.TraceAnnotation(name)
