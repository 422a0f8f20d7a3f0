"""Smoke tests for the tracing/profiling helpers."""

import jax.numpy as jnp

from kmeans_tpu.utils.profiling import Timer, annotate, trace


def test_timer_and_annotate(tmp_path):
    with Timer("section") as t:
        with annotate("labelled-region"):
            jnp.arange(16).sum().block_until_ready()
    assert t.elapsed > 0


def test_trace_writes_files(tmp_path):
    d = str(tmp_path / "trace")
    with trace(d):
        jnp.ones((8, 8)).sum().block_until_ready()
    import os

    assert any(os.scandir(d))
