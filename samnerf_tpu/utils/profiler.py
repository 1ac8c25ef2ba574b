"""Wall-clock function profiler + jax trace hooks.

Reference: ``nerfstudio/utils/profiler.py:38-96`` — ``@time_function``
accumulates per-function running means, printed sorted at exit via
``flush_profiler`` (called from ``samnerf/train.py:180,217``).  Adds
``jax_trace`` for XLA-level profiling (the TPU equivalent noted in
SURVEY.md section 5).
"""
from __future__ import annotations

import contextlib
import functools
import time
from typing import Dict

PROFILER_ENABLED = False
_STATS: Dict[str, list] = {}


def enable_profiler(enabled: bool = True):
    global PROFILER_ENABLED
    PROFILER_ENABLED = enabled


def time_function(fn):
    """``profiler.py:38-49``."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        if not PROFILER_ENABLED:
            return fn(*args, **kwargs)
        t0 = time.time()
        out = fn(*args, **kwargs)
        dt = time.time() - t0
        name = fn.__qualname__
        mean, count = _STATS.get(name, (0.0, 0))
        _STATS[name] = [(mean * count + dt) / (count + 1), count + 1]
        return out

    return wrapper


def flush_profiler():
    """Sorted table at exit (``profiler.py:53-85``)."""
    if not _STATS:
        return
    print("Profiler (mean seconds per call):")
    for name, (mean, count) in sorted(_STATS.items(), key=lambda kv: -kv[1][0]):
        print(f"  {name:60s} {mean:10.4f}s  x{count}")


@contextlib.contextmanager
def jax_trace(log_dir: str):
    """XLA profiler trace (view with tensorboard / xprof)."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class DeviceTrace:
    """Context manager around ``jax.profiler`` (the TPU-side complement of
    the wall-clock decorator profiler; SURVEY section 5 'tracing').

    with DeviceTrace("/tmp/trace"):
        train_step(...)
    then inspect with xprof/tensorboard.
    """

    def __init__(self, log_dir: str):
        self.log_dir = str(log_dir)

    def __enter__(self):
        import jax
        jax.profiler.start_trace(self.log_dir)
        return self

    def __exit__(self, *exc):
        import jax
        jax.profiler.stop_trace()
        return False
