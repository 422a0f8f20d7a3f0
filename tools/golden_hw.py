"""Hardware golden-parity spot check.

The test suite's conftest forces CPU, so `tests/test_golden.py` never
touches the real chip. This runs the same comparisons against the
reference's committed outputs (`/root/reference/gfx`, produced by its
`samples.sh`) on whatever backend jax registered — on the TPU host that
is the hardware path, making this the per-round re-verification tool
(the strongest end-to-end parity evidence: the reference's own result
images).

Round-4 capture (TPU v5e), all five committed goldens: find replace
0.999997 / dither 0.999995 / dither-apollo 0.999967 pixel-identical;
reduce k=8 mean CIE94 replace 5.9261 vs 5.8756 (ratio 1.0086) and
dither 9.1542 vs 9.1118 (ratio 1.0046), bar <= 1.02 — reduce seeds are
implementation-defined GPU f32, so quality, not bits, is the contract;
see tests/test_golden.py's module docstring. An earlier capture
published 2.29/2.28 — those were mean sqrt(delta-E) from the metric
bug this tool's review fixed; the ratio conclusion was unchanged.

Run on the TPU host: python tools/golden_hw.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

GFX = "/root/reference/gfx"


def main() -> None:
    import jax
    import jax.numpy as jnp

    from kmeans_tpu.api import ImageProcessor, ReduceMode
    from kmeans_tpu.cli import parse_colors
    from kmeans_tpu.ops.colorspace import srgb_to_lab
    from kmeans_tpu.ops.delta_e import distance_cie94
    from kmeans_tpu.utils.imageio import load_image

    if not os.path.isdir(GFX):
        print("reference gfx/ not available", file=sys.stderr)
        return
    print("backend:", jax.devices())
    tokyo = load_image(f"{GFX}/tokyo.png")
    p = ImageProcessor()

    def frac(ours, golden):
        return float((ours.pixels == golden.pixels).all(axis=-1).mean())

    from kmeans_tpu.cli import parse_palette_image

    ok = True
    for mode, name in (
        (ReduceMode.REPLACE, "replace"),
        (ReduceMode.DITHER, "dither"),
    ):
        golden = load_image(f"{GFX}/tokyo-find-{name}-dark-white-red.png")
        ours = p.find(tokyo, parse_colors("#050505,#ffffff,#ff0000"), mode)
        f = frac(ours, golden)
        print(f"find {name}: match {f:.6f}")
        ok &= f > 0.999
    # apollo palette-image dither (the reference's fourth committed
    # golden; same check as tests/test_golden.py:62-74 on CPU).
    golden = load_image(f"{GFX}/tokyo-find-dither-apollo.png")
    apollo = parse_palette_image(f"{GFX}/apollo-1x.png")
    ours = p.find(tokyo, apollo, ReduceMode.DITHER)
    f = frac(ours, golden)
    print(f"find dither apollo: match {f:.6f}")
    ok &= f > 0.999
    # (The reference commits no meld golden — meld parity is covered by
    # the formula tests and the XLA-vs-Pallas bit-equality suite.)

    src = srgb_to_lab(jnp.asarray(tokyo.pixels[..., :3], jnp.float32) / 255.0)

    def mean_err(img):
        # Same metric as tests/test_golden.py: distance_cie94 already
        # returns delta-E (not squared) — no extra sqrt (a sqrt here
        # would compress regressions ~2x and loosen the 1.02 bar).
        q = srgb_to_lab(jnp.asarray(img.pixels[..., :3], jnp.float32) / 255.0)
        return float(distance_cie94(src.reshape(-1, 3), q.reshape(-1, 3)).mean())

    for mode, name in (
        (ReduceMode.REPLACE, "replace"),
        (ReduceMode.DITHER, "dither"),
    ):
        golden = load_image(f"{GFX}/tokyo-reduce-c8-kmeans-{name}.png")
        ours = p.reduce(8, tokyo, reduce_mode=mode)
        e_ours, e_gold = mean_err(ours), mean_err(golden)
        print(
            f"reduce k=8 {name} mean CIE94: ours {e_ours:.4f} golden "
            f"{e_gold:.4f} ratio {e_ours / e_gold:.4f}"
        )
        ok &= e_ours / e_gold <= 1.02
    print("PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
