"""Hardware probe: is the host<->TPU transport full-duplex? (VERDICT #3)

The flagship reduce is ~>90% wire time at the tunnel's ~30-50 MB/s
(docs/perf.md floor math). Band-pipelining the path can only help if a
device->host readback can proceed WHILE a host->device upload is in
flight. This measures exactly that, with no compiles beyond a tiny add:

    Tu    = upload 16 MB fresh bytes (device_put + 8-byte completion read)
    Td    = read back 16 MB of a FRESHLY device-computed array (JAX
            caches the host copy of an already-fetched Array, so each rep
            derives a new array on device before reading it)
    Tboth = start the upload async, immediately read back a fresh
            resident-derived array, then force the upload's completion

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
N = MB * 1024 * 1024


def _t():
    return time.perf_counter()


def main() -> None:
    import jax
    import jax.numpy as jnp

    print(f"backend: {jax.default_backend()}", file=sys.stderr)
    rng = np.random.default_rng(0)
    hosts = [rng.integers(0, 255, N, dtype=np.uint8) for _ in range(4)]
    resident = jnp.asarray(hosts[0])
    np.asarray((resident + np.uint8(1))[:8])  # warm device + paths

    def fresh_readback(i):
        arr = resident + np.uint8(i)  # derived on device, no host copy
        np.asarray(arr[:8])  # ensure computed before timing the transfer
        t0 = _t()
        np.asarray(arr)
        return _t() - t0

    def upload(i):
        t0 = _t()
        d = jax.device_put(hosts[i])
        np.asarray(d[:8])  # force completion
        return _t() - t0

    tu = min(upload(i) for i in range(1, 4))
    td = min(fresh_readback(i) for i in range(2, 5))

    def both(i):
        arr = resident + np.uint8(100 + i)
        np.asarray(arr[:8])
        t0 = _t()
        d = jax.device_put(hosts[i])  # async upload
        np.asarray(arr)  # 16 MB readback while (hopefully) uploading
        np.asarray(d[:8])  # force upload completion
        return _t() - t0

    tb = min(both(i) for i in range(1, 4))

    print(
        json.dumps(
            {
                "mb": MB,
                "upload_s": round(tu, 3),
                "upload_mb_s": round(MB / tu, 1),
                "readback_s": round(td, 3),
                "readback_mb_s": round(MB / td, 1),
                "both_s": round(tb, 3),
                "sum_s": round(tu + td, 3),
                "max_s": round(max(tu, td), 3),
                "overlap_saved_s": round(tu + td - tb, 3),
                "verdict": (
                    "full-duplex (overlap can hide the readback)"
                    if tb < (tu + td) * 0.75
                    else "half-duplex (overlap cannot help)"
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
