"""Hardware probe: is the host<->TPU transport full-duplex? (VERDICT #3)

The flagship reduce is ~>90% wire time at the tunnel's ~30-40 MB/s
(docs/perf.md floor math). Band-pipelining the path can only help if a
device->host readback can proceed WHILE a host->device upload is in
flight. This measures exactly that, with no compiles:

    Tu    = upload 16 MB          (device_put + tiny forced readback)
    Td    = readback 16 MB        (np.asarray of a resident array)
    Tboth = start upload async, immediately read back the resident array,
            then force the upload's completion

full-duplex => Tboth ~ max(Tu, Td); half-duplex => Tboth ~ Tu + Td.
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

MB = 16


def _t():
    return time.perf_counter()


def main() -> None:
    import jax
    import jax.numpy as jnp

    print(f"backend: {jax.default_backend()}", file=sys.stderr)
    host = np.random.default_rng(0).integers(
        0, 255, MB * 1024 * 1024, dtype=np.uint8
    )
    resident = jnp.asarray(host)  # warm allocation on device
    np.asarray(resident[:8])

    # per-call latency
    tiny = jnp.zeros(8, jnp.uint8) + 1
    np.asarray(tiny)
    lat = min(
        (lambda t0: (np.asarray(tiny), _t() - t0)[1])(_t()) for _ in range(8)
    )

    def upload():
        t0 = _t()
        d = jax.device_put(host)
        np.asarray(d[:8])  # force completion (block_until_ready unreliable)
        return _t() - t0

    def readback():
        t0 = _t()
        np.asarray(resident)
        return _t() - t0

    tu = min(upload() for _ in range(3))
    td = min(readback() for _ in range(3))

    def both():
        t0 = _t()
        d = jax.device_put(host)  # async
        np.asarray(resident)  # readback while (hopefully) uploading
        np.asarray(d[:8])  # force upload completion
        return _t() - t0

    tb = min(both() for _ in range(3))

    print(
        json.dumps(
            {
                "mb": MB,
                "latency_ms": round(lat * 1e3, 1),
                "upload_s": round(tu, 3),
                "upload_mb_s": round(MB / tu, 1),
                "readback_s": round(td, 3),
                "readback_mb_s": round(MB / td, 1),
                "both_s": round(tb, 3),
                "sum_s": round(tu + td, 3),
                "max_s": round(max(tu, td), 3),
                "duplex_ratio": round((tu + td - tb) / min(tu, td), 2),
                "verdict": (
                    "full-duplex"
                    if tb < (tu + td) * 0.75
                    else "half-duplex (overlap cannot help)"
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
