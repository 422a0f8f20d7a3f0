"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Mirrors the reference's CI strategy of executing real kernels on a software
backend (SwiftShader/llvmpipe, `.github/workflows/rust.yml:28-76`): here the
JAX CPU backend plays that role, and `xla_force_host_platform_device_count=8`
gives the multi-chip sharding tests 8 virtual devices.

In this environment jax is pre-imported (pinned to the hardware TPU backend)
by a sitecustomize hook whose register() call overrides `JAX_PLATFORMS`, so
we re-pin the platform through `jax.config` — which works as long as no
backend has been initialized yet — and inject the XLA flag before the CPU
client is (lazily) created.
"""

import os
import sys

_FLAG = "--xla_force_host_platform_device_count=8"
if _FLAG not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") + " " + _FLAG).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

_devs = jax.devices()
assert _devs[0].platform == "cpu", _devs
assert len(_devs) == 8, f"expected 8 virtual CPU devices, got {len(_devs)}"

# Pin SMALL loop-form knobs for the interpret-mode kernel tests: the CPU
# XLA compile of a fully-unrolled 200-trip kernel body takes 45+ s per
# executable (vs ~5 s with an 8-trip chunked body), and the production
# cutoffs (256/128) would add ~10 minutes of pure compile time to the
# suite. This is sound because every interpret-mode assertion here is
# loop-form-INDEPENDENT: trip order and per-trip arithmetic are
# identical across rolled/chunked/unrolled forms at the Python level, so
# bit-equality vs the XLA formulas holds for any knob values; the
# form-SPECIFIC behavior (Mosaic FMA contraction, program size,
# performance) exists only on hardware and is validated there
# (tools/exp_unroll*.py, exp_chunk.py — docs/perf.md). Both loop
# branches still execute: kp <= 16 takes the straight-line branch,
# kp > 16 the chunked one. Production values are stashed so tests can
# assert the shipped policy (tests/test_kernels.py).
from kmeans_tpu.ops import kernels as _kernels  # noqa: E402

_kernels.PROD_UNROLL_KNOBS = _kernels.set_loop_knobs(kp_max=16, chunk=8)[:2]
