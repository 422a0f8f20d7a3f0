"""Transport fixed-cost dissection (VERDICT r04 task 1 follow-up).

exp_phases.py attributed the e2e-vs-floor gap to FIXED per-transfer
overheads: the upload chain costs ~2.5 RTTs of fixed latency where the
floor allows 1, independent of size. This experiment measures the
microstructure on hardware:

  a) upload dispatch alone:      t(jnp.asarray(host))        per size
  b) upload + completion:        + tiny derived readback     per size
  c) jit dispatch alone:         t(jit_fn(dev)) (async)
  d) readback, three idioms:     sequential np.asarray / _host_fetch
                                 (copy_to_host_async first) /
                                 jax.device_get((a, b))
  e) host_prep: np.ascontiguousarray(px[..., :3]) at 4K vs C twin
     (if built) vs alternatives.

Each sample min-of-N with fresh derived arrays (host-copy caching,
docs/STATUS.md). Usage: python tools/exp_rtt.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timed(f, reps=5):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        f()
        ts.append(time.perf_counter() - t0)
    return min(ts), ts


def main() -> None:
    import jax
    import jax.numpy as jnp

    from bench import _measure_call_latency, _probe_device
    from kmeans_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    if not _probe_device():
        print("device unresponsive", file=sys.stderr)
        sys.exit(1)

    lat = _measure_call_latency()
    print(f"call latency {lat*1e3:.1f} ms")

    sizes_mb = [0.125, 1.18, 4, 12, 24.9]
    print("\n-- upload: dispatch alone vs dispatch+sync (ms) --")
    for mb in sizes_mb:
        n = int(mb * (1 << 20))
        host = np.zeros(n, np.uint8)
        # warm shape
        d = jnp.asarray(host)
        np.asarray(d[:8])
        del d

        def dispatch():
            host[0] += 1
            return jnp.asarray(host)

        t_disp, _ = timed(lambda: dispatch())
        t_sync, all_s = timed(lambda: np.asarray(dispatch()[:8]))
        print(
            f"{mb:6.2f} MB  dispatch {t_disp*1e3:7.1f}  +sync {t_sync*1e3:7.1f}"
            f"   all {[round(t*1e3) for t in all_s]}"
        )

    print("\n-- jit dispatch alone (cached executable, async) --")
    host = np.zeros((513, 768, 3), np.uint8)
    dev = jnp.asarray(host)
    np.asarray(dev[:1, :1])
    f = jax.jit(lambda a: a.astype(jnp.float32).sum())
    np.asarray(f(dev))  # compile
    t_disp, _ = timed(lambda: f(dev))
    t_sync, _ = timed(lambda: np.asarray(f(dev) + np.float32(time.monotonic())))
    print(f"jit dispatch {t_disp*1e3:.2f} ms, dispatch+fresh sync {t_sync*1e3:.1f} ms")

    print("\n-- readback idioms: words-like [8505,128] i32 (4.15 MB) + [8,4] u8 --")
    big = jnp.zeros((8505, 128), jnp.int32)
    small = jnp.zeros((8, 4), jnp.uint8)
    np.asarray(big[:1, :1]); np.asarray(small[:1, :1])

    def fresh():
        t = np.int32(int(time.monotonic_ns() % 1000))
        return big + t, small + np.uint8(1)

    def seq():
        a, b = fresh()
        return np.asarray(a), np.asarray(b)

    def fetch():
        a, b = fresh()
        a.copy_to_host_async(); b.copy_to_host_async()
        return np.asarray(a), np.asarray(b)

    def devget():
        a, b = fresh()
        return jax.device_get((a, b))

    for name, fn in [("sequential", seq), ("_host_fetch", fetch), ("device_get", devget)]:
        t, all_s = timed(fn)
        print(f"{name:12s} {t*1e3:7.1f} ms   all {[round(t*1e3) for t in all_s]}")

    print("\n-- single big readback (baseline for the pair) --")
    def solo():
        a, _ = fresh()
        return np.asarray(a)
    t, all_s = timed(solo)
    print(f"solo big     {t*1e3:7.1f} ms   all {[round(t*1e3) for t in all_s]}")

    print("\n-- host_prep: RGBA->RGB strip at 4K (33.2 MB in) --")
    rgba = np.random.default_rng(0).integers(0, 256, (2160, 3840, 4), np.uint8)

    t, _ = timed(lambda: np.ascontiguousarray(rgba[..., :3]), reps=7)
    print(f"np.ascontiguousarray(px[...,:3])   {t*1e3:7.1f} ms")
    t, _ = timed(lambda: rgba[..., :3].copy(), reps=7)
    print(f"px[...,:3].copy()                  {t*1e3:7.1f} ms")

    def reshape_strip():
        flat = rgba.reshape(-1, 4)
        out = np.empty((flat.shape[0], 3), np.uint8)
        np.copyto(out, flat[:, :3])
        return out.reshape(rgba.shape[0], rgba.shape[1], 3)

    t, _ = timed(reshape_strip, reps=7)
    print(f"empty+copyto                       {t*1e3:7.1f} ms")

    try:
        from kmeans_tpu.runtime import _imagio

        if hasattr(_imagio, "strip_alpha"):
            def c_strip():
                out = _imagio.strip_alpha(rgba)
                return np.frombuffer(out, np.uint8).reshape(
                    rgba.shape[0], rgba.shape[1], 3
                )

            t, _ = timed(c_strip, reps=7)
            print(f"C strip_alpha                      {t*1e3:7.1f} ms")
    except Exception as e:
        print(f"(no native strip: {e})")


if __name__ == "__main__":
    main()
