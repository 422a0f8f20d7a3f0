"""Overload-regime load test for service backpressure (VERDICT r04 task 4).

Round 4 built bounded backpressure (503 + Retry-After past --max-pending
device-bound requests) and unit-tested the rejection path, but never
drove the regime the feature exists for: offered rate >> capacity with
the limiter ACTIVE. This does, on the heavy bucket, with the open-loop
Poisson generator (latency from scheduled arrival — coordinated
omission is the classic way this measurement lies):

  1. measure session wire rates (the capture's weather context);
  2. measure capacity: closed-loop clients on the heavy workload;
  3. overload run: open-loop at OVERLOAD_X x capacity with
     max_pending=64 (the production default) — publish offered rate,
     goodput, 503 fraction, accepted-request p50/p99;
  4. contrast run: same offered load with max_pending=0 (unlimited
     queue) — the latency collapse backpressure prevents.

The claim under test: with the limiter active, goodput stays ~capacity
and ACCEPTED-request latency stays bounded while the excess is shed;
without it, every request is accepted and the p99 grows with queue
depth. Usage: python tools/exp_overload.py [--requests 160] [--x 3]
[--size 1600x1200] [--k 128] [--train full] [--max-pending 64]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--requests", type=int, default=160)
    ap.add_argument("--x", type=float, default=3.0, help="overload factor")
    ap.add_argument("--size", default="1600x1200")
    ap.add_argument("--k", type=int, default=128)
    ap.add_argument("--train", default="full")
    ap.add_argument("--max-pending", type=int, default=64)
    ap.add_argument("--window-ms", type=float, default=25.0)
    ap.add_argument("--endpoint", default="reduce")
    args = ap.parse_args()

    import bench as _bench
    from tools.load_serve import _png_body, _run

    call_latency = _bench._measure_call_latency()
    wire_up, wire_down = _bench._measure_wire_rates(call_latency)
    print(
        f"wire: up {wire_up:.1f} MB/s down {wire_down:.1f} MB/s "
        f"latency {call_latency*1e3:.1f} ms",
        file=sys.stderr, flush=True,
    )

    w, _, h = args.size.lower().partition("x")
    body = _png_body(int(w), int(h))
    train_max_size = (
        "default" if args.train == "default"
        else None if args.train == "full" else int(args.train)
    )
    window_s = args.window_ms / 1e3

    # Capacity: closed-loop, few clients, no limiter.
    cap = _run(
        window_s, body, 8, 3, args.endpoint, train_max_size, args.k, 0.0, 0
    )
    capacity = cap["rps"]
    print(f"capacity (closed, 8 clients): {cap}", file=sys.stderr, flush=True)

    offered = round(args.x * capacity, 2)
    clients = max(args.max_pending + 16, 48)
    per_client = max(1, round(args.requests / clients))
    print(
        f"overload: offered {offered} rps over {clients} clients x "
        f"{per_client}",
        file=sys.stderr, flush=True,
    )

    limited = _run(
        window_s, body, clients, per_client, args.endpoint, train_max_size,
        args.k, offered, args.max_pending,
    )
    print(f"max_pending={args.max_pending}: {limited}", file=sys.stderr,
          flush=True)

    unlimited = _run(
        window_s, body, clients, per_client, args.endpoint, train_max_size,
        args.k, offered, 0,
    )
    print(f"max_pending=0: {unlimited}", file=sys.stderr, flush=True)

    print(
        json.dumps(
            {
                "endpoint": args.endpoint,
                "size": args.size,
                "k": args.k,
                "train": args.train,
                "wire_up_mb_s": round(wire_up, 1),
                "wire_down_mb_s": round(wire_down, 1),
                "call_latency_ms": round(call_latency * 1e3, 1),
                "capacity_rps": capacity,
                "offered_rps": offered,
                "overload_x": args.x,
                "limited": limited,
                "unlimited": unlimited,
            }
        )
    )


if __name__ == "__main__":
    main()
