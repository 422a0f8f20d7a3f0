"""Tracing / profiling helpers.

The reference requests the GPU TIMESTAMP_QUERY feature but never uses it,
and relies on debug labels for external captures (`SURVEY.md` §5,
`core/src/lib.rs:54`, `core/src/modules.rs:777`). The TPU-native
equivalents, actually wired up:

- `trace(dir)`: context manager around `jax.profiler` producing a
  Perfetto/TensorBoard trace of device execution;
- `annotate(name)`: `jax.named_scope` wrapper so the train/quantize stages
  are labeled inside XLA traces (the analogue of wgpu compute-pass labels);
- `Timer`: wall-clock section timing like the examples' `Instant` prints
  (`core/examples/gif.rs:44-46`).
"""

from __future__ import annotations

import contextlib
import logging
import time

import jax

log = logging.getLogger("kmeans_tpu.profiling")


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace viewable in Perfetto / TensorBoard."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        log.info("profiler trace written to %s", log_dir)


def annotate(name: str):
    """Label a code region in XLA traces (like wgpu pass labels)."""
    return jax.named_scope(name)


class Timer:
    """Wall-clock section timer: `with Timer("reduce") as t: ...`."""

    def __init__(self, name: str = ""):
        self.name = name
        self.elapsed = 0.0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self._t0
        if self.name:
            log.info("%s: %.3fs", self.name, self.elapsed)
        return False
