"""Device-tier degradation canary (VERDICT r04 task 3 validation).

The bench now publishes `device_ms_median`/`device_ms_reps` next to the
min, with the reading rule "moved median at stable wire rates = kernel
regression; moved min only = ambient drift" (BASELINE.md). This tool
validates the rule end-to-end on hardware: it captures the 20-loop
device sample N times with the production kernels, then N more with a
DELIBERATE slow-kernel canary (the k=8 centroid loop knob-forced ROLLED
— kp_max=1; the production form is fully unrolled, measured 2.1-2.4x
faster on the exact tiers, docs/STATUS.md), and asserts the canary's
median sits far outside the ambient band while the wire stays stable.

Usage: python tools/exp_device_canary.py [--reps 5]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import (
        _load_4k_image,
        _measure_call_latency,
        _probe_device,
    )
    from kmeans_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    if not _probe_device():
        print("device unresponsive", file=sys.stderr)
        sys.exit(1)

    from kmeans_tpu.api import MAX_IMAGE_DIMENSION, _reduce_indexed_jit
    from kmeans_tpu.models import kmeans as km
    from kmeans_tpu.ops import kernels as kmod
    from kmeans_tpu.ops.resize import shrunk_dimensions

    pixels = _load_4k_image()
    img_dev = jnp.asarray(pixels)
    np.asarray(img_dev[0, 0])
    sw, sh = shrunk_dimensions(3840, 2160, MAX_IMAGE_DIMENSION)
    first = km.reference_seed_index(sw, sh)
    call_latency = _measure_call_latency()
    print(f"call latency {call_latency*1e3:.1f} ms", file=sys.stderr)

    LOOP = 20

    def make_loop():
        # A FRESH jit wrapper per knob state: set_loop_knobs clears the
        # library wrappers' caches, but a stale local dev_loop would keep
        # serving its previously-compiled executable and hide the canary.
        @jax.jit
        def dev_loop(img):
            def body(i, acc):
                idx, _ = _reduce_indexed_jit(
                    img, 8, (sh, sw), first, 1.0 + acc * 0.0, "replace"
                )
                return acc + idx[0, 0].astype(jnp.float32)

            return jax.lax.fori_loop(0, LOOP, body, jnp.float32(0.0))

        return dev_loop

    def run(label):
        dev_loop = make_loop()

        def sample() -> float:
            t0 = time.perf_counter()
            np.asarray(dev_loop(img_dev))
            return max(
                (time.perf_counter() - t0 - call_latency) / LOOP, 1e-6
            )

        np.asarray(dev_loop(img_dev))  # compile/warm under current knobs
        reps = [sample() for _ in range(args.reps)]
        med = sorted(reps)[len(reps) // 2]
        print(
            f"{label:12s} min {min(reps)*1e3:.2f} ms  median {med*1e3:.2f} ms"
            f"  reps {[round(t*1e3, 2) for t in reps]}",
            file=sys.stderr,
        )
        return med

    med_default = run("default")
    prev = kmod.set_loop_knobs(kp_max=1)
    try:
        med_canary = run("canary")
    finally:
        kmod.set_loop_knobs(kp_max=prev[0])
    ratio = med_canary / med_default
    print(
        f"canary/default median ratio: {ratio:.2f}x "
        f"({'DETECTED' if ratio > 1.3 else 'NOT DETECTED'})"
    )


if __name__ == "__main__":
    main()
