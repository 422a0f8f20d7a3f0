"""Mutation fuzzer for the native codec (`kmeans_tpu/runtime/_imagio.c`).

The serving daemon decodes untrusted request bytes with this codec, so a
crash (segfault/abort) in libpng/libjpeg glue or the hand-written GIF/LZW
decoder is a denial-of-service. This harness:

1. builds small valid PNG / JPEG / GIF payloads with the codec itself,
2. applies random mutations (bit flips, byte splices, truncations,
   length-field corruption),
3. decodes each mutant in a forked worker BATCH (a crash kills the worker,
   not the harness) and reports any batch that died on a signal.

Python exceptions are expected (invalid data must raise ValueError);
process death is the only failure. Run:

    python tools/fuzz_codec.py [iterations] [seed]
"""

from __future__ import annotations

import os
import signal
import struct
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def _seed_corpus() -> list[bytes]:
    from kmeans_tpu.image import Image
    from kmeans_tpu.utils.imageio import (
        encode_gif_bytes,
        encode_png_bytes,
    )
    from kmeans_tpu.runtime import _imagio

    rng = np.random.default_rng(0)
    rgba = rng.integers(0, 256, (13, 17, 4), dtype=np.uint8)
    rgba[..., 3] = 255
    img = Image((17, 13), rgba)
    indexed = Image((16, 16), np.tile(rgba[:2, :2], (8, 8, 1)))
    corpus = [
        encode_png_bytes(img),
        encode_png_bytes(indexed),  # palette PNG path
        _imagio.encode_jpeg(17, 13, rgba.tobytes(), 85),
        encode_gif_bytes([indexed, indexed], delays=[5, 7]),
    ]
    return corpus


def _mutate(data: bytes, rng: np.random.Generator) -> bytes:
    buf = bytearray(data)
    op = rng.integers(0, 5)
    if op == 0 and len(buf) > 1:  # bit flips
        for _ in range(int(rng.integers(1, 8))):
            i = int(rng.integers(0, len(buf)))
            buf[i] ^= 1 << int(rng.integers(0, 8))
    elif op == 1:  # truncate
        buf = buf[: int(rng.integers(0, len(buf) + 1))]
    elif op == 2 and len(buf) > 8:  # corrupt a 4-byte length/dimension field
        i = int(rng.integers(0, len(buf) - 4))
        buf[i : i + 4] = struct.pack(
            ">I", int(rng.choice([0, 1, 0x7FFFFFFF, 0xFFFFFFFF, 1 << 20]))
        )
    elif op == 3 and len(buf) > 2:  # splice a random block
        i = int(rng.integers(0, len(buf)))
        j = int(rng.integers(0, len(buf)))
        n = int(rng.integers(1, 64))
        buf[i : i + n] = buf[j : j + n]
    else:  # append junk
        buf += bytes(rng.integers(0, 256, int(rng.integers(1, 64)), dtype=np.uint8))
    return bytes(buf)


def _decode_all(data: bytes) -> None:
    from kmeans_tpu.runtime import _imagio

    for fn in (_imagio.decode_png, _imagio.decode_jpeg, _imagio.decode_gif):
        try:
            fn(data)
        except Exception:
            pass  # raising is the correct behavior for bad input


def run(iterations: int = 2000, seed: int = 0, batch: int = 100) -> int:
    corpus = _seed_corpus()
    rng = np.random.default_rng(seed)
    failures = 0
    done = 0
    while done < iterations:
        n = min(batch, iterations - done)
        mutants = [
            _mutate(corpus[int(rng.integers(0, len(corpus)))], rng)
            for _ in range(n)
        ]
        pid = os.fork()
        if pid == 0:  # worker
            for m in mutants:
                _decode_all(m)
            os._exit(0)
        _, status = os.waitpid(pid, 0)
        if os.WIFSIGNALED(status):
            failures += 1
            sig = os.WTERMSIG(status)
            print(
                f"CRASH: batch at iteration {done} died on "
                f"{signal.Signals(sig).name}",
                flush=True,
            )
            # Re-run one-by-one to isolate (each in its own fork).
            for i, m in enumerate(mutants):
                p2 = os.fork()
                if p2 == 0:
                    _decode_all(m)
                    os._exit(0)
                _, st2 = os.waitpid(p2, 0)
                if os.WIFSIGNALED(st2):
                    path = f"/tmp/fuzz_crash_{done + i}.bin"
                    with open(path, "wb") as f:
                        f.write(m)
                    print(f"  reproducer written to {path}", flush=True)
        done += n
    print(f"fuzz: {done} mutants, {failures} crashing batch(es)")
    return 1 if failures else 0


if __name__ == "__main__":
    its = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    sd = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    sys.exit(run(its, sd))
