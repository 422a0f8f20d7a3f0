"""Per-phase attribution of the flagship e2e reduce (VERDICT r04 task 1).

The bench's e2e numbers sit 1.4-1.8x above their byte-derived transport
floors; this experiment decomposes the gap into measured phases on real
hardware. For the 4K k=8 reduce and the tokyo-scale config workloads it
captures, per rep: host_prep (alpha strip / palette conversion), upload
(host->device wire + staging), device (train+assign wait), readback
(device->host wire), unpack (native gather) — using the api.py phase
recorder whose boundaries force completion with a tiny probe readback
(one transport RTT each, counted in `_syncs`).

Also measures the session's wire rates + call latency the same way
bench.py does, so every phase can be compared against its own byte
floor. Usage: python tools/exp_phases.py [--reps 3] [--skip-4k]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--skip-4k", action="store_true")
    args = ap.parse_args()

    from bench import (
        _load_4k_image,
        _measure_call_latency,
        _measure_wire_rates,
        _probe_device,
    )
    from kmeans_tpu.api import Algorithm, ImageProcessor, ReduceMode
    from kmeans_tpu.image import Image
    from kmeans_tpu.utils import imageio
    from kmeans_tpu.utils.cache import enable_compilation_cache
    from kmeans_tpu.utils.profiling import collect_phases

    enable_compilation_cache()
    if not _probe_device():
        print("device unresponsive", file=sys.stderr)
        sys.exit(1)

    p = ImageProcessor()
    tokyo = imageio.load_image("/root/reference/gfx/tokyo.png")

    print("warmup (tokyo reduce)...", file=sys.stderr)
    p.reduce(8, tokyo)

    call_latency = _measure_call_latency()
    wire_up, wire_down = _measure_wire_rates(call_latency)
    print(
        f"session: call {call_latency*1e3:.1f} ms, "
        f"up {wire_up:.1f} MB/s, down {wire_down:.1f} MB/s",
        file=sys.stderr,
    )

    def capture(name, fn, up_bytes, down_bytes):
        # un-instrumented timing first (best of reps)
        t_plain = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            fn()
            t_plain.append(time.perf_counter() - t0)
        vecs = []
        for _ in range(args.reps):
            ph: dict = {}
            with collect_phases(ph):
                fn()
            vecs.append(ph)
        # best (min-total) vector, phases in ms
        best = min(vecs, key=lambda d: sum(v for k, v in d.items() if k != "_syncs"))
        syncs = best.pop("_syncs", 0)
        best_ms = {k: round(v * 1e3, 1) for k, v in best.items()}
        total = sum(best.values())
        floor = (
            up_bytes / (wire_up * 1e6)
            + down_bytes / (wire_down * 1e6)
            + call_latency
        )
        up_floor = up_bytes / (wire_up * 1e6)
        down_floor = down_bytes / (wire_down * 1e6)
        row = {
            "plain_best_ms": round(min(t_plain) * 1e3, 1),
            "plain_all_ms": [round(t * 1e3, 1) for t in t_plain],
            "phases_ms": best_ms,
            "phases_sum_ms": round(total * 1e3, 1),
            "syncs": syncs,
            "sync_overhead_ms": round(syncs * call_latency * 1e3, 1),
            "floor_ms": round(floor * 1e3, 1),
            "upload_floor_ms": round(up_floor * 1e3, 1),
            "readback_floor_ms": round(down_floor * 1e3, 1),
        }
        print(f"\n=== {name} ===", file=sys.stderr)
        print(json.dumps(row, indent=2), file=sys.stderr)
        return name, row

    from kmeans_tpu.cli import parse_colors
    from kmeans_tpu.utils.packing import pack_bits

    w, h = tokyo.dimensions
    px = w * h
    hex3 = parse_colors("#050505,#ffffff,#ff0000")
    results = dict(
        [
            capture(
                "tokyo reduce c8 replace",
                lambda: p.reduce(8, tokyo),
                px * 3,
                px * pack_bits(8) // 8,
            ),
            capture(
                "tokyo find 3 replace",
                lambda: p.find(tokyo, hex3),
                px * 3,
                px * pack_bits(3) // 8,
            ),
            capture(
                "tokyo palette c8",
                lambda: p.palette(8, tokyo),
                px * 3,
                8 * 8,
            ),
        ]
    )

    if not args.skip_4k:
        pixels = _load_4k_image()
        img4k = Image((3840, 2160), pixels)
        px4 = 3840 * 2160
        print("warmup (4k reduce)...", file=sys.stderr)
        p.reduce(8, img4k)
        name, row = capture(
            "4k reduce c8 replace",
            lambda: p.reduce(8, img4k),
            px4 * 3,
            px4 * pack_bits(8) // 8,
        )
        results[name] = row

    results["_session"] = {
        "call_latency_ms": round(call_latency * 1e3, 1),
        "up_mb_s": round(wire_up, 1),
        "down_mb_s": round(wire_down, 1),
    }
    print(json.dumps(results))


if __name__ == "__main__":
    main()
