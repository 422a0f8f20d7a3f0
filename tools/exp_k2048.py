"""Hardware experiment: light up (or cap) k > 1024 (VERDICT r04 task 2).

Above INDEXED_MAX_K=1024, `reduce`/`find` fall through to the full-RGBA
`fused_quantize` whose chunked centroid loop had never been compiled
above kp=1024 — and the same program family has a known deterministic
remote-compiler crash at large FULL unrolls (docs/perf.md). `validate_k`
accepts any k >= 1 like the reference (`cli/src/args.rs:160-171`), so
`-c 2048` is a legal input with untested behavior. This measures, at 4K
on the real TPU, for k in (2048, 4096):

    fused_quantize replace  exact + fast   (production knobs:
                                            kp_max=256 -> chunked 128)
    fused_quantize dither   exact
    fit_chunked             ms/iter (the k>512 training fallback), on
                            the 256px shrink (the default train path)

First run (round 5, pre-fix): the SINGLE kernel program at kp=2048
crashed the remote compiler (HTTP 500, tpu_compile_helper exit 1) in
the production chunked form — the evidence behind QUANT_MAX_KP=1024.
After the fix, `fused_quantize` above the cap auto-routes through
`fused_quantize_halves` (N <= 1024-entry halves + argmin merge) and
meld through the row-chunked XLA path, so re-running this tool now
measures the production k>1024 tier (plus the fit_chunked trainer).

Every case runs under a SIGALRM watchdog (default 900 s) so a wedged
remote compile reports instead of hanging the harness.

Usage: python tools/exp_k2048.py [--k 2048 4096] [--budget 900]
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

WIDTH, HEIGHT = 3840, 2160
LOOP = 4


def _timed(f):
    t0 = time.perf_counter()
    f()
    return time.perf_counter() - t0


class _Watchdog:
    def __init__(self, seconds):
        self.seconds = seconds

    def __enter__(self):
        def on_alarm(signum, frame):
            raise TimeoutError(f"watchdog: exceeded {self.seconds}s")

        self._old = signal.signal(signal.SIGALRM, on_alarm)
        signal.alarm(self.seconds)
        return self

    def __exit__(self, *exc):
        signal.alarm(0)
        signal.signal(signal.SIGALRM, self._old)
        return False


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, nargs="+", default=[2048, 4096])
    ap.add_argument("--budget", type=int, default=900)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from kmeans_tpu.models.kmeans import fit_chunked
    from kmeans_tpu.ops import kernels
    from kmeans_tpu.ops.colorspace import srgb8_to_lab, srgb8_to_lab_np
    from kmeans_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    print(f"backend: {jax.default_backend()}", file=sys.stderr)

    rng = np.random.default_rng(7)
    rgba = rng.integers(0, 256, (HEIGHT, WIDTH, 4), dtype=np.uint8)
    rgba[..., 3] = 255
    img = jnp.asarray(rgba)
    np.asarray(img[0, 0])

    base = jnp.zeros(8, jnp.uint8)
    np.asarray(base + np.uint8(255))
    lat = min(
        _timed(lambda i=i: np.asarray(base + np.uint8(i))) for i in range(10)
    )
    print(f"call latency {lat*1e3:.1f} ms", file=sys.stderr)

    results = []

    def quant_case(k, label, mode, fast):
        # production loop form: kp > kp_max rolls into 128-trip unrolled
        # chunks (_chunked_k_loop)
        kernels.set_loop_knobs(kp_max=256, chunk=128)
        pal = rng.integers(0, 256, (k, 3), dtype=np.uint8)
        cents = jnp.asarray(srgb8_to_lab_np(pal))
        thr = jnp.float32(1.0) if mode == "dither" else jnp.float32(0.0)

        def call(img, cents, acc):
            out = kernels.fused_quantize(
                img, cents, thr + acc * 0.0, mode=mode, fast=fast,
            )
            return out, out[0, 0, 0].astype(jnp.float32)

        @jax.jit
        def loop(img, cents):
            def body(i, acc):
                _, tag = call(img, cents, acc)
                return acc + tag

            return jax.lax.fori_loop(0, LOOP, body, jnp.float32(0.0))

        try:
            with _Watchdog(args.budget):
                compile_s = _timed(lambda: np.asarray(loop(img, cents)))
                t = min(
                    _timed(lambda: np.asarray(loop(img, cents)))
                    for _ in range(3)
                )
        except Exception as e:
            r = {"case": label, "error": repr(e)[:300]}
            print(json.dumps(r), flush=True)
            results.append(r)
            return r
        per_call = max((t - lat) / LOOP, 1e-9)
        r = {
            "case": label,
            "ms": round(per_call * 1e3, 2),
            "gpix_s": round(WIDTH * HEIGHT / per_call / 1e9, 3),
            "compile_s": round(compile_s, 1),
        }
        print(json.dumps(r), flush=True)
        results.append(r)
        return r

    def train_case(k):
        # default train path: 256px shrink -> [256*144, 3] Lab pixels
        small = rgba[::9, ::15, :3][:240, :256]
        work = srgb8_to_lab(jnp.asarray(small).reshape(-1, 3))
        label = f"fit_chunked k={k} (256px-class)"
        try:
            with _Watchdog(args.budget):
                c0 = _timed(
                    lambda: np.asarray(
                        fit_chunked(work, k, 0, max_iterations=1)[0]
                    )
                )
                t = min(
                    _timed(
                        lambda: np.asarray(
                            fit_chunked(work, k, 0, max_iterations=8)[0]
                        )
                    )
                    for _ in range(2)
                )
        except Exception as e:
            r = {"case": label, "error": repr(e)[:300]}
            print(json.dumps(r), flush=True)
            results.append(r)
            return r
        r = {
            "case": label,
            "ms_per_iter": round((t - lat) / 8 * 1e3, 2),
            "compile_s": round(c0, 1),
        }
        print(json.dumps(r), flush=True)
        results.append(r)
        return r

    def meld_case(k):
        # meld > QUANT_MAX_KP: the row-chunked XLA meld (the route the
        # api takes — no kernel program exists there).
        from kmeans_tpu.ops.quantize import quantize_image

        pal = rng.integers(0, 256, (k, 3), dtype=np.uint8)
        cents = jnp.asarray(srgb8_to_lab_np(pal))
        label = f"meld k={k} XLA chunked"

        @jax.jit
        def call(img, cents):
            return quantize_image(img, cents, mode="meld")

        try:
            with _Watchdog(args.budget):
                c0 = _timed(lambda: np.asarray(call(img, cents)[0, 0]))
                t = min(
                    _timed(lambda: np.asarray(call(img, cents)[0, 0]))
                    for _ in range(3)
                )
        except Exception as e:
            r = {"case": label, "error": repr(e)[:300]}
            print(json.dumps(r), flush=True)
            results.append(r)
            return r
        r = {
            "case": label,
            "ms": round((t - lat) * 1e3, 2),
            "compile_s": round(c0, 1),
        }
        print(json.dumps(r), flush=True)
        results.append(r)
        return r

    for k in args.k:
        ok = True
        for label, mode, fast in [
            (f"quantize k={k} replace exact", "replace", False),
            (f"quantize k={k} replace fast", "replace", True),
            (f"quantize k={k} dither exact", "dither", False),
        ]:
            r = quant_case(k, label, mode, fast)
            if "error" in r:
                ok = False
                break
        train_case(k)
        meld_case(k)
        if not ok:
            print(f"stopping after k={k} failure", file=sys.stderr)
            break

    print(json.dumps({"results": results}))


if __name__ == "__main__":
    main()
