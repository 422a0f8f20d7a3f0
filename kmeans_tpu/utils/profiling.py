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


# --------------------------------------------------------------------- #
# Per-phase wall-clock attribution (bench honesty: VERDICT r04 task 1)
# --------------------------------------------------------------------- #
#
# The e2e numbers sit above their byte-derived transport floors; this
# recorder decomposes an entry-point call into measured phases
# (host_prep / upload / device / readback / unpack / ...) so the gap is
# attributable instead of folklore. Recording is OFF by default and the
# instrumentation sites in api.py cost one no-op context manager each
# (~1 us) when off.
#
# In recording mode, phase boundaries FORCE device completion with a
# tiny derived readback (`phase_sync`) — `block_until_ready` is
# unreliable over this harness's tunnel (docs/STATUS.md), and without a
# sync every async phase would bill to whichever phase blocks first.
# Each forced sync adds ~one transport round trip that the
# un-instrumented call does not pay; `phases["_syncs"]` counts them so
# readers can discount (bench.py embeds the session call latency next
# to the vector). The phase SUM therefore slightly exceeds the
# un-instrumented e2e; per-phase magnitudes are the signal.

_phase_acc: dict | None = None


@contextlib.contextmanager
def phase(name: str):
    """Accumulate wall-clock into `name` while recording is enabled."""
    global _phase_acc
    if _phase_acc is None:
        yield
        return
    t0 = time.perf_counter()
    try:
        yield
    finally:
        if _phase_acc is not None:
            _phase_acc[name] = (
                _phase_acc.get(name, 0.0) + time.perf_counter() - t0
            )


def phase_sync(*arrays) -> None:
    """Force completion of device arrays (recording mode only): read back
    one element of a jitted slice of each. The probe executable is
    cached per shape/dtype; the readback is the sync point."""
    if _phase_acc is None:
        return
    import numpy as np

    for a in arrays:
        if hasattr(a, "addressable_shards"):
            np.asarray(_probe1(a))
            _phase_acc["_syncs"] = _phase_acc.get("_syncs", 0) + 1


@jax.jit
def _probe1(a):
    return a.reshape(-1)[:1]


@contextlib.contextmanager
def collect_phases(out: dict):
    """Enable phase recording into `out` for the duration of the block.

    Not reentrant and not thread-safe (one global accumulator) — this is
    a bench/diagnostic mode, not a production counter."""
    global _phase_acc
    prev = _phase_acc
    _phase_acc = out
    try:
        yield out
    finally:
        _phase_acc = prev


def recording() -> bool:
    return _phase_acc is not None
