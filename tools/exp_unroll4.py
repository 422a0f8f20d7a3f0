"""Hardware experiment: WHICH loop form matches the XLA twin on device?

tools/exp_unroll3.py found the heavy kernel bodies (cie2000, meld) are
NOT bit-stable across loop forms on hardware — Mosaic contracts FMAs
differently in rolled vs straight-line code — refuting the
"bit-transparent by construction" assumption (which DOES hold, measured,
for the cie94 replace body at k=64/256). Before choosing a per-metric/
mode unroll policy, this measures each form's agreement with the XLA
formula twin (`ops.quantize.quantize_image`) on device at 4K k=64:

    cie94 dither   (fills the exp_unroll2 gap: its dither rows never
                    asserted bit-equality)
    cie94 meld
    cie2000 replace

under rolled (cutoff 16, chunk 1), chunk64, and full unroll. All
comparisons run ON DEVICE (mismatch counts read back as scalars — full
RGBA readbacks through this tunnel would dominate and JAX host-copy
caching can silently poison repeated np.asarray probes). Run ON TPU.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

WIDTH, HEIGHT = 3840, 2160


def main() -> None:
    import jax
    import jax.numpy as jnp

    from kmeans_tpu.ops import kernels
    from kmeans_tpu.ops import quantize as q
    from kmeans_tpu.ops.colorspace import srgb8_to_lab_np
    from kmeans_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    print(f"backend: {jax.default_backend()}", file=sys.stderr)

    rng = np.random.default_rng(7)
    rgba = rng.integers(0, 256, (HEIGHT, WIDTH, 4), dtype=np.uint8)
    rgba[..., 3] = 255
    img = jnp.asarray(rgba)
    np.asarray(img[0, 0])  # settle the upload

    K = 64
    pal = rng.integers(0, 256, (K, 3), dtype=np.uint8)
    cents = jnp.asarray(srgb8_to_lab_np(pal))

    @jax.jit
    def mismatches(a, b):
        return jnp.sum(jnp.any(a != b, axis=-1).astype(jnp.int32))

    cases = [
        ("cie94-dither", "cie94", "dither"),
        ("cie94-meld", "cie94", "meld"),
        ("cie2000-replace", "cie2000", "replace"),
    ]
    settings = [("rolled", 16, 1), ("chunk64", 16, 64), ("full", 256, 128)]

    # XLA twins once per case (device-resident).
    xla_out = {}
    for label, metric, mode in cases:
        thr = q.dither_threshold(cents, None, metric)
        xla_out[label] = q.quantize_image(img, cents, mode=mode, metric=metric)
        np.asarray(xla_out[label][0, 0])  # force
        print(f"xla twin {label} done", file=sys.stderr)

    results = []
    rolled_out = {}
    for sname, kp_max, chunk in settings:
        # cie2000 is pinned rolled in production (UNROLL_*_2000); sweep
        # its loop form too so this script stays reproducible. The helper
        # clears the jit caches (the knobs are not in any cache key).
        kernels.set_loop_knobs(
            kp_max=kp_max, chunk=chunk, kp_max_2000=kp_max, chunk_2000=chunk
        )
        for label, metric, mode in cases:
            thr = q.dither_threshold(cents, None, metric)
            try:
                out = kernels.fused_quantize(
                    img, cents, thr, mode=mode, metric=metric
                )
                n_xla = int(np.asarray(mismatches(out, xla_out[label])))
                if sname == "rolled":
                    rolled_out[label] = out
                    n_rolled = 0
                else:
                    n_rolled = int(np.asarray(mismatches(out, rolled_out[label])))
            except Exception as e:
                r = {"setting": sname, "case": label, "error": repr(e)[:200]}
                results.append(r)
                print(json.dumps(r), flush=True)
                continue
            r = {
                "setting": sname,
                "case": label,
                "mismatch_vs_xla": n_xla,
                "mismatch_vs_rolled": n_rolled,
                "pixels": WIDTH * HEIGHT,
            }
            results.append(r)
            print(json.dumps(r), flush=True)

    print(json.dumps({"all": results}))


if __name__ == "__main__":
    main()
