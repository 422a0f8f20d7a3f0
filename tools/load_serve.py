"""Serving load test: N parallel clients hammering POST /reduce or /find.

Measures end-to-end requests/sec twice — micro-batching disabled
(window=0, the round-1 serialize-behind-one-lock behavior) and enabled —
and prints one JSON line with both, plus the batcher's launch counters.
Run on the TPU host for the docs/serving.md numbers; for a CPU run set
JAX_PLATFORMS=cpu — honored HERE via jax.config.update, because this
environment's sitecustomize registers a hardware backend and overrides
the env var from inside register() (a bare env wrap silently runs on
the hardware backend).

    python tools/load_serve.py [clients=8] [requests_per_client=4] \
        [window_ms=25] [endpoint=reduce|find|palette|mixed] [size=320x240] \
        [train=256|full] [k=8] [open_rate=0]

`mixed` assigns each client one of the three endpoints round-robin
(concurrent different-key traffic). Every run now also measures and
embeds the session wire rates (up/down MB/s + call latency), so rps
rows carry their transport context.

`open_rate > 0` switches from the closed-loop generator (every client
fires its next request the moment the previous returns — the worst
case for heavy-bucket batching, since batch completion synchronizes
all clients into lockstep and the device idles during their shared
HTTP turnaround) to an OPEN generator: request start times are drawn
from a Poisson process at `open_rate` total requests/sec, split across
the clients, so arrivals stay independent of completions (a thread
that falls behind its schedule fires immediately). Open runs report
achieved rps AND latency percentiles — the metrics that matter for a
rate-driven service.

`train=full` serves with `train_max_size=None` (full-resolution training):
combined with a frame size above 1024x1024 pixels the bucket routes to
the Pallas-accumulator trainer, exercising the HEAVY micro-batch
executables (`_reduce_many_bucketed_heavy_jit` — sequential per-frame
trainings via `lax.map` in ONE launch) instead of the vmapped ones.
"""

from __future__ import annotations

import http.client
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


def test_image(width: int = 320, height: int = 240):
    """The load-test workload image (3 noisy color blobs). Shared with
    tools/exp_heavy_ab.py so the no-HTTP A/B measures the exact same
    frames the server launches."""
    import numpy as np

    from kmeans_tpu.image import Image

    rng = np.random.default_rng(7)
    base = np.array([[220, 50, 40], [40, 200, 70], [60, 70, 220]], np.int32)
    idx = rng.integers(0, 3, (height, width))
    rgb = np.clip(base[idx] + rng.integers(-8, 9, (height, width, 3)), 0, 255)
    rgba = np.concatenate(
        [rgb.astype(np.uint8), np.full((height, width, 1), 255, np.uint8)], -1
    )
    return Image((width, height), rgba)


def _png_body(width: int = 320, height: int = 240):
    from kmeans_tpu.utils.imageio import encode_png_bytes

    return encode_png_bytes(test_image(width, height))


FIND_COLORS = "dc3228,28c846,3c46dc,f0f0f0,101010,c8a028,28b4b4,9632c8"


def _paths(endpoint: str, k: int) -> list[str]:
    """Request path(s) for an endpoint selector; `mixed` round-robins
    all three (distinct batcher keys — the mixed-key concurrency row)."""
    table = {
        "reduce": f"/reduce?k={k}",
        "find": f"/find?colors={FIND_COLORS}",
        "palette": f"/palette?k={k}",
    }
    if endpoint == "mixed":
        return [table["reduce"], table["palette"], table["find"]]
    return [table[endpoint]]


def _run(window_s: float, body: bytes, clients: int, per_client: int,
         endpoint: str = "reduce", train_max_size="default", k: int = 8,
         open_rate: float = 0.0, max_pending: int = 0):
    from kmeans_tpu.serve import create_server

    paths = _paths(endpoint, k)
    processor = None
    if train_max_size != "default":
        from kmeans_tpu.api import ImageProcessor

        processor = ImageProcessor(
            bucketing=True, train_max_size=train_max_size
        )
    # max_pending=0 (default): measuring the BATCHER — the server's
    # backpressure cap would count 503 load-shedding as errors and
    # silently measure the limiter instead. max_pending>0 (round 5):
    # measuring the LIMITER under deliberate overload — 503s become
    # shed-accounting, not errors (VERDICT r04 task 4).
    srv = create_server(
        port=0, processor=processor, batch_window_s=window_s,
        max_pending=max_pending,
    )
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    addr = srv.server_address
    try:
        # Warm every executable out of band so the measurement is
        # steady-state serving, not compiles: the solo path(s) plus every
        # frame-count bucket the batcher can hit (batch sizes vary run to
        # run; each frame bucket is its own executable).
        for path in paths:
            _post(addr, body, path)
        import numpy as np

        from kmeans_tpu.api import ReduceMode
        from kmeans_tpu.utils.bucketing import bucket_frames
        from kmeans_tpu.utils.imageio import decode_image_bytes

        img = decode_image_bytes(body)
        proc = srv.service.processor
        buckets = sorted(
            {bucket_frames(n) for n in range(2, srv.service.batcher.max_batch + 1)}
        )
        eps = (
            ("reduce", "palette", "find") if endpoint == "mixed"
            else (endpoint,)
        )
        for fb in buckets:
            if "reduce" in eps:
                proc.reduce_many([img] * fb, k, ReduceMode.REPLACE)
            if "palette" in eps:
                proc.palette_many([img] * fb, k)
            if "find" in eps:
                colors = np.asarray(
                    [[int(c[0:2], 16), int(c[2:4], 16), int(c[4:6], 16), 255]
                     for c in FIND_COLORS.split(",")], np.uint8,
                )
                proc.find_many([img] * fb, colors, ReduceMode.REPLACE)

        errors = []
        latencies: list[float] = []
        shed: list[float] = []
        lat_lock = threading.Lock()
        # Open mode: one global Poisson schedule split across clients —
        # arrival k+1 fires expovariate(open_rate) after arrival k,
        # INDEPENDENT of when any response comes back. Each client owns
        # every clients-th arrival; a client behind schedule fires
        # immediately (the schedule, not the completions, drives load).
        schedule = None
        if open_rate > 0:
            import random as _random

            rand = _random.Random(417)
            t = 0.0
            schedule = []
            for _ in range(clients * per_client):
                t += rand.expovariate(open_rate)
                schedule.append(t)

        def client(ci):
            # mixed mode: each client sticks to one endpoint (concurrent
            # DIFFERENT-key traffic), round-robined across clients.
            path = paths[ci % len(paths)]
            for ri in range(per_client):
                if schedule is not None:
                    due = t0 + schedule[ri * clients + ci]
                    delay = due - time.perf_counter()
                    if delay > 0:
                        time.sleep(delay)
                    # Open-loop latency counts from the SCHEDULED
                    # arrival, not the actual fire time — a thread that
                    # fell behind schedule fired late because the server
                    # is slow, and that wait is part of the request's
                    # latency (skipping it is the classic
                    # coordinated-omission bug: percentiles look fine
                    # exactly when the server saturates).
                    ts = due
                else:
                    ts = time.perf_counter()
                status = _post(addr, body, path)
                with lat_lock:
                    if status == 200:
                        latencies.append(time.perf_counter() - ts)
                    elif status == 503 and max_pending > 0:
                        shed.append(time.perf_counter() - ts)
                    else:
                        errors.append(status)

        threads = [
            threading.Thread(target=client, args=(ci,))
            for ci in range(clients)
        ]
        # Snapshot the batcher counters so the report covers ONLY the
        # timed phase — the warmup posts above also go through the
        # batcher, and cumulative counts would overstate launches and
        # pad the histogram (round-4 review finding).
        b = srv.service.batcher
        base_batches = b.batches
        base_batched = b.batched_requests
        base_hist = dict(b.batch_sizes)
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        elapsed = time.perf_counter() - t0
        assert not errors, errors
        n = clients * per_client
        lat = sorted(latencies)
        assert lat, "every request was shed - nothing to report"
        hist = {
            size: cnt - base_hist.get(size, 0)
            for size, cnt in sorted(b.batch_sizes.items())
            if cnt - base_hist.get(size, 0) > 0
        }
        result = {
            "window_ms": window_s * 1e3,
            "requests": n,
            "seconds": round(elapsed, 3),
            "rps": round(n / elapsed, 2),
            "device_launches": (
                b.batches - base_batches if window_s > 0 else n
            ),
            "requests_batched": b.batched_requests - base_batched,
            "batch_size_hist": hist,
            "p50_ms": round(lat[len(lat) // 2] * 1e3, 1),
            "p95_ms": round(lat[min(len(lat) - 1, int(len(lat) * 0.95))] * 1e3, 1),
            "p99_ms": round(lat[min(len(lat) - 1, int(len(lat) * 0.99))] * 1e3, 1),
            "max_ms": round(lat[-1] * 1e3, 1),
        }
        if open_rate > 0:
            result["offered_rps"] = open_rate
        if max_pending > 0:
            # Overload accounting: the latency percentiles above are
            # ACCEPTED-only (from scheduled arrival in open mode — a
            # shed request's fast 503 must not flatter the tail);
            # goodput counts only the 200s.
            result["max_pending"] = max_pending
            result["accepted"] = len(lat)
            result["shed_503"] = len(shed)
            result["shed_fraction"] = round(len(shed) / n, 3)
            result["goodput_rps"] = round(len(lat) / elapsed, 2)
            result["rps"] = result["goodput_rps"]
        return result
    finally:
        srv.shutdown()
        srv.server_close()


def _post(addr, body, path="/reduce?k=8") -> int:
    conn = http.client.HTTPConnection(*addr, timeout=600)
    conn.request("POST", path, body)
    resp = conn.getresponse()
    resp.read()
    conn.close()
    return resp.status


def main() -> None:
    clients = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    per_client = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    window_ms = float(sys.argv[3]) if len(sys.argv) > 3 else 25.0
    endpoint = sys.argv[4] if len(sys.argv) > 4 else "reduce"
    assert endpoint in ("reduce", "find", "palette", "mixed"), endpoint
    size = sys.argv[5] if len(sys.argv) > 5 else "320x240"
    w, _, h = size.lower().partition("x")
    train = sys.argv[6] if len(sys.argv) > 6 else "default"
    train_max_size = (
        "default" if train == "default"
        else None if train == "full" else int(train)
    )
    k = int(sys.argv[7]) if len(sys.argv) > 7 else 8
    open_rate = float(sys.argv[8]) if len(sys.argv) > 8 else 0.0
    max_pending = int(sys.argv[9]) if len(sys.argv) > 9 else 0

    body = _png_body(int(w), int(h))
    # Session wire context (round 4): rps rows are meaningless across
    # sessions without the transport rates they were captured at — the
    # r02/r03 heavy rows differed 5.4 vs 3.9 serialized rps on tunnel
    # weather alone. Measured with bench.py's in-run probes.
    import bench as _bench

    call_latency = _bench._measure_call_latency()
    wire_up, wire_down = _bench._measure_wire_rates(call_latency)
    print(
        f"wire: up {wire_up:.1f} MB/s down {wire_down:.1f} MB/s "
        f"latency {call_latency*1e3:.1f} ms", file=sys.stderr,
    )
    serial = _run(
        0.0, body, clients, per_client, endpoint, train_max_size, k,
        open_rate, max_pending,
    )
    print(f"serialized: {serial}", file=sys.stderr)
    batched = _run(
        window_ms / 1e3, body, clients, per_client, endpoint,
        train_max_size, k, open_rate, max_pending,
    )
    print(f"batched:    {batched}", file=sys.stderr)
    print(
        json.dumps(
            {
                "endpoint": endpoint,
                "clients": clients,
                "size": size,
                "train": train,
                "k": k,
                "open_rate": open_rate,
                "wire_up_mb_s": round(wire_up, 1),
                "wire_down_mb_s": round(wire_down, 1),
                "call_latency_ms": round(call_latency * 1e3, 1),
                "serialized_rps": serial["rps"],
                "batched_rps": batched["rps"],
                "speedup": round(batched["rps"] / serial["rps"], 2),
                "serial": serial,
                "batched": batched,
            }
        )
    )


if __name__ == "__main__":
    main()
