"""Persistent XLA compilation cache.

Every CLI invocation is a fresh process; without a persistent cache each
run would recompile the train/quantize executables (tens of seconds on a
TPU pod-attached compiler). Enabling JAX's on-disk cache makes repeat CLI
runs launch-bound, similar to the reference's ahead-of-time-compiled WGSL
pipelines.
"""

from __future__ import annotations

import os

import jax


def enable_compilation_cache(path: str | None = None) -> None:
    path = path or os.environ.get(
        "KMEANS_TPU_CACHE", os.path.expanduser("~/.cache/kmeans_tpu_xla")
    )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
