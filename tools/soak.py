"""Randomized equivalence soak — long-running, not part of the default suite.

Hunts rare mismatches across hundreds of random configurations:
- Pallas (interpret) vs XLA quantize bit-equality, random dims/k/k_active;
- indexed reconstruction vs full output;
- pixel-sharded fit vs single-device fit on random blob data;
- octree aggregated vs per-pixel insertion order;
- PNG palette/truecolor roundtrips;
- bucketed find vs exact find (bit-equal) and bucketed reduce palette
  sanity on random sizes;
- pruned CIEDE2000 fast tier vs exact (mismatch within the tier bar);
- heavy-bucket lax.map coalescing (reduce_many/palette_many with the
  element budget collapsed) vs solo processing.

Usage: python tools/soak.py [trials] (CPU recommended; prints a summary,
exits nonzero on any mismatch).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("KMEANS_TPU_NO_CACHE", "1")

import jax

if jax.default_backend() != "cpu":
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass

import jax.numpy as jnp
import numpy as np


def main(trials: int = 60) -> int:
    from kmeans_tpu.models import kmeans as km
    from kmeans_tpu.models.octree import ColorTree, extract_palette_octree
    from kmeans_tpu.ops.colorspace import srgb8_to_lab
    from kmeans_tpu.ops.kernels import fused_assign, fused_quantize
    from kmeans_tpu.ops.quantize import dither_threshold, quantize_image
    from kmeans_tpu.utils import imageio, png_py
    from kmeans_tpu.image import Image

    rng = np.random.default_rng(1234)
    failures = 0

    for t in range(trials):
        h = int(rng.integers(1, 120))
        w = int(rng.integers(1, 120))
        k = int(rng.integers(1, 14))
        ka = int(rng.integers(1, k + 1))
        mode = ["replace", "dither", "meld"][t % 3]
        img = jnp.asarray(rng.integers(0, 256, (h, w, 4), dtype=np.uint8))
        pal = srgb8_to_lab(
            jnp.asarray(rng.integers(0, 256, (k, 3), dtype=np.uint8))
        )
        thr = dither_threshold(pal, k_active=ka)
        want = np.asarray(quantize_image(img, pal, mode=mode, k_active=ka))
        got = np.asarray(
            fused_quantize(img, pal, thr, k_active=ka, mode=mode, interpret=True)
        )
        diff = np.abs(got.astype(int) - want.astype(int))
        if mode == "meld":
            # continuous blend: allow isolated 1-step FMA-contraction diffs
            ok = diff.max() <= 1 and (diff.max(axis=-1) > 0).mean() <= 1e-3
        else:
            ok = (want == got).all()
        if not ok:
            print(f"[FAIL] fused vs XLA trial={t} {h}x{w} k={k}/{ka} {mode}")
            failures += 1
        if mode != "meld":
            idx = np.asarray(
                fused_assign(img, pal, thr, k_active=ka, mode=mode, interpret=True)
            )
            if idx.max(initial=0) >= max(ka, 1):
                print(f"[FAIL] fused_assign index range trial={t}")
                failures += 1
        if t % 10 == 0:
            print(f"  soak {t}/{trials} ok", flush=True)

    # octree: aggregated add must equal per-pixel insertion in SCAN order
    # (the reference's merge tie-break depends on node-creation order, so
    # permuted insertion legitimately differs — as it does in the reference).
    for t in range(10):
        px = rng.integers(0, 256, (400, 3), dtype=np.uint8)
        k = int(rng.integers(1, 12))
        a = extract_palette_octree(px, k)
        tree = ColorTree()
        for r, g, b in px.tolist():
            tree.add_color(r, g, b)
        b_res = tree.reduce(k)
        if a != b_res:
            print(f"[FAIL] octree aggregated != scan-order trial={t} k={k}")
            failures += 1

    # PNG roundtrips (palette + truecolor)
    for t in range(20):
        h = int(rng.integers(1, 80))
        w = int(rng.integers(1, 80))
        ncol = int(rng.integers(1, 20))
        palette = rng.integers(0, 256, (ncol, 4), dtype=np.uint8)
        palette[:, 3] = 255
        img = Image((w, h), palette[rng.integers(0, ncol, (h, w))])
        path = f"/tmp/soak_{t}.png"
        imageio.save_image(img, path)
        back = imageio.load_image(path)
        if not (back.pixels == img.pixels).all():
            print(f"[FAIL] png roundtrip trial={t}")
            failures += 1
        os.remove(path)

    # bucketing: find must be bit-equal to the exact path at any size; the
    # bucketed reduce must honor k and dimensions. Sizes are drawn small so
    # bucket executables get reused across trials.
    from kmeans_tpu.api import ImageProcessor, ReduceMode

    exact_p = ImageProcessor()
    bucket_p = ImageProcessor(bucketing=True)
    for t in range(max(10, trials // 4)):
        h = int(rng.integers(1, 90))
        w = int(rng.integers(1, 90))
        k = int(rng.integers(1, 9))
        mode = ReduceMode(["replace", "dither", "meld"][t % 3])
        img = Image(
            (w, h), rng.integers(0, 256, (h, w, 4), dtype=np.uint8)
        )
        colors = rng.integers(0, 256, (k, 4), dtype=np.uint8)
        colors[:, 3] = 255
        a = exact_p.find(img, colors, mode)
        b = bucket_p.find(img, colors, mode)
        if not (a.pixels == b.pixels).all():
            print(f"[FAIL] bucketed find != exact trial={t} {h}x{w} k={k} {mode}")
            failures += 1
        if mode is not ReduceMode.MELD:
            out = bucket_p.reduce(k, img, reduce_mode=mode)
            uniq = len(np.unique(out.pixels.reshape(-1, 4), axis=0))
            if out.dimensions != (w, h) or uniq > max(k, 1):
                print(f"[FAIL] bucketed reduce trial={t} {h}x{w} k={k} uniq={uniq}")
                failures += 1
        if t % 10 == 0:
            print(f"  bucketing soak {t} ok", flush=True)

    # pipeline=True (host-shrunk training strip + banded reduce): the
    # host strip mirrors the device shrink to within ONE u8 rounding
    # step (resize_uint8_np's documented deviation — numpy evaluates the
    # same f32 expressions without XLA's FMA contraction, so isolated
    # x.5-boundary pixels round one step apart). Downstream, that one
    # training-pixel step shifts the trained centroids a little — which
    # can do more than move a channel one step (observed 270x228 k=5:
    # 94 vs 95): two near-equal-L* centroids can SWAP sort order, and a
    # knife-edge pixel can flip its argmin to a *different palette
    # entry* (or flip a dither threshold decision). So the bars are
    # deviation-mode-shaped, not elementwise (round-4 review finding):
    # palettes match under order-free nearest pairing within a few
    # steps, and reduce outputs may differ arbitrarily on a tiny
    # knife-edge fraction of pixels while the rest stay within the
    # centroid-drift bound. Sizes straddle the 256px training shrink so
    # both the strip-upload and no-shrink guards run. The shrink
    # comparison only runs where a real shrink applies: the sampler
    # follows the reference's no-+0.5 convention (resize.wgsl:15 —
    # gid/out_dims into a bilinear sampler), under which a same-size
    # resize is a half-texel blur, and the product guards same-size
    # calls out on both paths.
    def _palettes_paired_close(pa, pb, tol=3):
        """Order-free palette comparison: every entry of each palette
        must have a distinct partner in the other within `tol` u8 steps
        (greedy nearest pairing — sort-order swaps don't fail it)."""
        a, b = pa.astype(int), pb.astype(int)
        if a.shape != b.shape:
            return False
        used = [False] * len(b)
        for row in a:
            d = np.abs(b - row).max(axis=1)
            j = min(
                (jj for jj in range(len(b)) if not used[jj]),
                key=lambda jj: d[jj],
            )
            if d[j] > tol:
                return False
            used[j] = True
        return True
    from kmeans_tpu.api import _host_rgb as _soak_host_rgb
    from kmeans_tpu.ops.resize import resize_uint8, shrunk_dimensions

    pipe_p = ImageProcessor(pipeline=True)
    for t in range(max(6, trials // 8)):
        h = int(rng.integers(100, 420))
        w = int(rng.integers(100, 420))
        k = int(rng.integers(1, 9))
        img = Image(
            (w, h), rng.integers(0, 256, (h, w, 4), dtype=np.uint8)
        )
        sw, sh = shrunk_dimensions(w, h, pipe_p.train_max_size)
        if (sw, sh) != (w, h):
            strip = pipe_p._pipeline_strip(_soak_host_rgb(img.pixels))
            dev = np.asarray(
                resize_uint8(jnp.asarray(_soak_host_rgb(img.pixels)), sh, sw)
            )
            if np.abs(strip.astype(int) - dev.astype(int)).max() > 1:
                print(
                    f"[FAIL] pipeline strip vs device shrink > 1 step "
                    f"trial={t} {h}x{w}"
                )
                failures += 1
        pa = exact_p.palette(k, img)
        pb = pipe_p.palette(k, img)
        if not _palettes_paired_close(pa, pb):
            print(f"[FAIL] pipeline palette != default trial={t} {h}x{w} k={k}")
            failures += 1
        mode = ReduceMode(["replace", "dither"][t % 2])
        ra = exact_p.reduce(k, img, reduce_mode=mode)
        rb = pipe_p.reduce(k, img, reduce_mode=mode)
        px_diff = np.abs(
            ra.pixels.astype(int) - rb.pixels.astype(int)
        ).max(axis=-1)
        # <=1% of pixels may flip to a different palette entry
        # (knife-edge argmin/threshold under the strip's 1-step
        # deviation); everything else stays within centroid drift.
        if (px_diff > 3).mean() > 0.01:
            print(f"[FAIL] pipeline reduce != default trial={t} {h}x{w} k={k} {mode}")
            failures += 1
        if t % 5 == 0:
            print(f"  pipeline soak {t} ok", flush=True)

    print("  section: gif-batch", flush=True)
    # batched GIF-style paths under bucketing: random frame counts/sizes.
    for t in range(max(5, trials // 10)):
        h = int(rng.integers(4, 40))
        w = int(rng.integers(4, 40))
        nframes = int(rng.integers(1, 12))
        k = int(rng.integers(1, 6))
        frames = [
            Image((w, h), rng.integers(0, 256, (h, w, 4), dtype=np.uint8))
            for _ in range(nframes)
        ]
        colors = rng.integers(0, 256, (k, 4), dtype=np.uint8)
        colors[:, 3] = 255
        a = exact_p.find_batch(frames, colors)
        b = bucket_p.find_batch(frames, colors)
        if len(a) != len(b) or any(
            not (x.pixels == y.pixels).all() for x, y in zip(a, b)
        ):
            print(f"[FAIL] bucketed find_batch trial={t} {nframes}x{h}x{w}")
            failures += 1
        outs = bucket_p.reduce_images(frames, k)
        if len(outs) != nframes or any(
            o.dimensions != (w, h)
            or len(np.unique(o.pixels.reshape(-1, 4), axis=0)) > max(k, 1)
            for o in outs
        ):
            print(f"[FAIL] bucketed reduce_images trial={t}")
            failures += 1
        pal = bucket_p.palette_images(frames, k)
        if not (1 <= pal.shape[0] <= k):
            print(f"[FAIL] bucketed palette_images trial={t}")
            failures += 1

    print("  section: delta-e-2000", flush=True)
    # delta-E 2000 processors: full reduce/find trials at random sizes
    # (XLA path; checks the metric plumbing end-to-end), plus fast-mode
    # fused kernels on random large palettes (k > 16 rolled loop).
    de_p = ImageProcessor(delta_e="2000")
    for t in range(max(5, trials // 10)):
        h = int(rng.integers(4, 70))
        w = int(rng.integers(4, 70))
        k = int(rng.integers(1, 8))
        mode = ReduceMode(["replace", "dither", "meld"][t % 3])
        img = Image((w, h), rng.integers(0, 256, (h, w, 4), dtype=np.uint8))
        out = de_p.reduce(k, img, reduce_mode=mode)
        if out.dimensions != (w, h):
            print(f"[FAIL] delta_e 2000 reduce trial={t}")
            failures += 1
        if mode is not ReduceMode.MELD:
            uniq = len(np.unique(out.pixels.reshape(-1, 4), axis=0))
            if uniq > max(k, 1):
                print(f"[FAIL] delta_e 2000 reduce uniq trial={t} uniq={uniq}")
                failures += 1
        colors = rng.integers(0, 256, (k, 4), dtype=np.uint8)
        colors[:, 3] = 255
        f = de_p.find(img, colors, mode)
        if f.dimensions != (w, h):
            print(f"[FAIL] delta_e 2000 find trial={t}")
            failures += 1

    print("  section: fast-mode", flush=True)
    for t in range(max(5, trials // 10)):
        h = int(rng.integers(4, 60))
        w = int(rng.integers(4, 60))
        k = int(rng.integers(17, 48))  # rolled loop: fast mode engaged
        ka = int(rng.integers(1, k + 1))
        mode = ["replace", "dither"][t % 2]
        img = jnp.asarray(rng.integers(0, 256, (h, w, 4), dtype=np.uint8))
        pal = srgb8_to_lab(
            jnp.asarray(rng.integers(0, 256, (k, 3), dtype=np.uint8))
        )
        thr = dither_threshold(pal, k_active=ka)
        exact = np.asarray(
            fused_quantize(img, pal, thr, k_active=ka, mode=mode, interpret=True)
        )
        fast = np.asarray(
            fused_quantize(
                img, pal, thr, k_active=ka, mode=mode, interpret=True, fast=True
            )
        )
        flips = (exact != fast).any(axis=-1).mean()
        if flips > 1e-3:
            print(f"[FAIL] fast-mode flips {flips:.2%} trial={t} k={k}/{ka}")
            failures += 1

    print("  section: fused-cie2000", flush=True)
    # fused CIEDE2000 (interpret) vs XLA metric path: polynomial-atan2
    # knife-edge flips only, at random shapes/k.
    for t in range(max(5, trials // 12)):
        h = int(rng.integers(2, 60))
        w = int(rng.integers(2, 60))
        k = int(rng.integers(1, 10))
        ka = int(rng.integers(1, k + 1))
        mode = ["replace", "dither", "meld"][t % 3]
        img = jnp.asarray(rng.integers(0, 256, (h, w, 4), dtype=np.uint8))
        pal = srgb8_to_lab(
            jnp.asarray(rng.integers(0, 256, (k, 3), dtype=np.uint8))
        )
        thr = dither_threshold(pal, k_active=ka, metric="cie2000")
        want = np.asarray(
            quantize_image(img, pal, mode=mode, k_active=ka, metric="cie2000")
        )
        got = np.asarray(
            fused_quantize(
                img, pal, thr, k_active=ka, mode=mode, interpret=True,
                metric="cie2000",
            )
        )
        flips = (want != got).any(axis=-1).mean()
        if flips > 2e-3:
            print(f"[FAIL] fused cie2000 flips {flips:.2%} trial={t} "
                  f"{h}x{w} k={k}/{ka} {mode}")
            failures += 1

    print("  section: streamed", flush=True)
    # streamed reduce vs whole-image reduce at random band splits (no
    # training shrink -> bit-equal, including dither band offsets).
    for t in range(max(5, trials // 12)):
        h = int(rng.integers(6, 60))
        w = int(rng.integers(6, 60))
        k = int(rng.integers(1, 6))
        mode = ReduceMode(["replace", "dither", "meld"][t % 3])
        band = int(rng.integers(4, max(5, h)))
        img = Image(
            (w, h), rng.integers(0, 256, (h, w, 4), dtype=np.uint8)
        )
        a = bucket_p.reduce(k, img, reduce_mode=mode)
        b = bucket_p.reduce_streamed(k, img, reduce_mode=mode, band_rows=band)
        if not (a.pixels == b.pixels).all():
            print(f"[FAIL] streamed != whole trial={t} {h}x{w} k={k} {mode} band={band}")
            failures += 1

    # reduce_many (serving micro-batch executable): random mixed-size
    print("  section: micro-batch", flush=True)
    # same-bucket batches must match per-image reduce (round 2).
    for t in range(max(4, trials // 15)):
        k = int(rng.integers(2, 6))
        mode = ReduceMode(["replace", "dither"][t % 2])
        imgs = []
        for _ in range(int(rng.integers(2, 5))):
            h = int(rng.integers(18, 40))
            w = int(rng.integers(18, 40))
            imgs.append(
                Image((w, h), rng.integers(0, 256, (h, w, 4), dtype=np.uint8))
            )
        outs = bucket_p.reduce_many(imgs, k, mode)
        for im, out in zip(imgs, outs):
            solo = bucket_p.reduce(k, im, reduce_mode=mode)
            frac = (solo.pixels == out.pixels).all(axis=-1).mean()
            if frac < 0.999:  # vmap f32 reordering tolerance
                print(f"[FAIL] reduce_many != reduce trial={t} k={k} "
                      f"{mode} frac={frac:.5f}")
                failures += 1

    # find_many (the /find micro-batch entry point): random mixed-size
    # same-palette batches must be BIT-equal to per-image find on the
    # same fused processor (interpret-mode kernels on CPU).
    from functools import partial

    import kmeans_tpu.api as api_mod
    from kmeans_tpu.ops import kernels as _kern

    _orig_assign = api_mod.fused_assign_packed
    _orig_avail = api_mod._pallas_available
    api_mod.fused_assign_packed = partial(
        _kern.fused_assign_packed, interpret=True
    )
    api_mod._pallas_available = lambda device=None: True
    try:
        fused_b = api_mod.ImageProcessor(fused=True, bucketing=True)
        for t in range(max(4, trials // 15)):
            k = int(rng.integers(1, 7))
            mode = ReduceMode(["replace", "dither"][t % 2])
            colors = rng.integers(0, 256, (k, 4), dtype=np.uint8)
            colors[:, 3] = 255
            imgs = []
            for _ in range(int(rng.integers(2, 5))):
                h = int(rng.integers(18, 40))
                w = int(rng.integers(18, 40))
                imgs.append(
                    Image((w, h), rng.integers(0, 256, (h, w, 4), dtype=np.uint8))
                )
            outs = fused_b.find_many(imgs, colors, mode)
            for im, out in zip(imgs, outs):
                solo = fused_b.find(im, colors, mode)
                if not (solo.pixels == out.pixels).all():
                    print(f"[FAIL] find_many != find trial={t} k={k} {mode}")
                    failures += 1
    finally:
        api_mod.fused_assign_packed = _orig_assign
        api_mod._pallas_available = _orig_avail

    # palette_many (the /palette micro-batch entry point): random
    # mixed-size batches must match solo palette (vmap reordering is the
    # only permitted deviation; exact on this backend).
    for t in range(max(4, trials // 15)):
        k = int(rng.integers(1, 7))
        imgs = []
        for _ in range(int(rng.integers(2, 5))):
            h = int(rng.integers(18, 40))
            w = int(rng.integers(18, 40))
            imgs.append(
                Image((w, h), rng.integers(0, 256, (h, w, 4), dtype=np.uint8))
            )
        pals = bucket_p.palette_many(imgs, k)
        for im, pal in zip(imgs, pals):
            solo = bucket_p.palette(k, im)
            if not (pal == solo).all():
                print(f"[FAIL] palette_many != palette trial={t} k={k}")
                failures += 1

    print("  section: pruned-cie2000", flush=True)
    # pruned CIEDE2000 fast tier (fast=True, k > 16 -> factorized screen
    # + exact trig on PRUNE_M survivors) vs exact, across random shapes,
    # palettes, and k_active masks. NOTE the data class: uniform-random
    # pixels against uniform-random palettes are adversarial for the
    # CIE94-rank screen (saturated colors maximize the CIE94/CIEDE2000
    # rank divergence), so the flip rate here runs ~1-2% where the
    # natural-image hardware matrix measured <=1e-3 (docs/perf.md). The
    # honest bars for this class (measured round 4): flip rate bounded,
    # and MEAN excess delta-E of the chosen-vs-optimal assignment small
    # (a single screened-out pixel can land several dE away — the tier's
    # documented failure mode — so the mean, not the max, is the quality
    # statement).
    from kmeans_tpu.ops.delta_e import distance_cie2000

    for t in range(max(5, trials // 12)):
        h = int(rng.integers(8, 60))
        w = int(rng.integers(8, 60))
        k = int(rng.integers(17, 48))
        ka = int(rng.integers(max(1, k - 8), k + 1))
        img = jnp.asarray(rng.integers(0, 256, (h, w, 4), dtype=np.uint8))
        pal = srgb8_to_lab(
            jnp.asarray(rng.integers(0, 256, (k, 3), dtype=np.uint8))
        )
        thr = dither_threshold(pal, k_active=ka, metric="cie2000")
        exact = np.asarray(
            fused_quantize(
                img, pal, thr, k_active=ka, mode="replace", interpret=True,
                metric="cie2000",
            )
        )
        pruned = np.asarray(
            fused_quantize(
                img, pal, thr, k_active=ka, mode="replace", interpret=True,
                metric="cie2000", fast=True,
            )
        )
        flips = (exact != pruned).any(axis=-1).mean()
        lab_px = srgb8_to_lab(img[..., :3]).reshape(-1, 3)
        opt = np.asarray(
            distance_cie2000(
                lab_px[:, None, :], jnp.asarray(pal)[None, :ka, :]
            )
        ).min(axis=1)
        chosen = np.asarray(
            distance_cie2000(
                lab_px, srgb8_to_lab(jnp.asarray(pruned[..., :3])).reshape(-1, 3)
            )
        )
        excess = float((chosen - opt).mean())
        if flips > 4e-2 or excess > 0.15:
            print(f"[FAIL] pruned cie2000 flips {flips:.2%} mean-excess "
                  f"{excess:.3f} dE trial={t} {h}x{w} k={k}/{ka}")
            failures += 1

    print("  section: heavy-bucket", flush=True)
    # heavy-bucket coalescing (the lax.map sequential executables): force
    # the heavy route on small canvases by collapsing the element budget
    # (k > 64 + budget 1 -> _plain_fit_route False, the
    # tests/test_distributed.py budget-monkeypatch idiom), then
    # reduce_many / palette_many must match solo processing.
    import kmeans_tpu.api as _api_mod

    _orig_budget = _api_mod._CHUNKED_TRAIN_ELEMS
    _api_mod._CHUNKED_TRAIN_ELEMS = 1
    try:
        heavy_k = 65  # kp > 64: the chunked large-N trainer class
        for t in range(max(3, trials // 20)):
            mode = ReduceMode(["replace", "dither"][t % 2])
            imgs = []
            for _ in range(int(rng.integers(2, 4))):
                h = int(rng.integers(18, 40))
                w = int(rng.integers(18, 40))
                imgs.append(
                    Image((w, h), rng.integers(0, 256, (h, w, 4), dtype=np.uint8))
                )
            outs = bucket_p.reduce_many(imgs, heavy_k, mode)
            for im, out in zip(imgs, outs):
                solo = bucket_p.reduce(heavy_k, im, reduce_mode=mode)
                frac = (solo.pixels == out.pixels).all(axis=-1).mean()
                if frac < 0.999:
                    print(f"[FAIL] heavy reduce_many != reduce trial={t} "
                          f"{mode} frac={frac:.5f}")
                    failures += 1
            pals = bucket_p.palette_many(imgs, heavy_k)
            for im, pal in zip(imgs, pals):
                solo = bucket_p.palette(heavy_k, im)
                if not (pal == solo).all():
                    print(f"[FAIL] heavy palette_many != palette trial={t}")
                    failures += 1
    finally:
        _api_mod._CHUNKED_TRAIN_ELEMS = _orig_budget

    print("  section: two-half quantize", flush=True)
    # k > 512 two-half decomposition (kept opt-in primitive, round 4):
    # exact-tier interpret bit-equality vs the single kernel across
    # random k_active straddles of the 512 boundary. k stays near 513
    # (interpret cost grows with k; the boundary is what matters).
    from kmeans_tpu.ops.kernels import fused_quantize_two_half

    # k and dims are jit-cache keys (a fresh k re-traces ~1.5k kernel
    # trips in interpret mode); pin them and randomize what is FREE to
    # randomize — pixel data and the traced k_active mask.
    k = 516
    h, w = 14, 22
    for t in range(max(3, trials // 15)):
        ka = int(
            rng.choice([k, 513, 512 + int(rng.integers(1, k - 512 + 1)),
                        int(rng.integers(1, 512))])
        )
        mode = ["replace", "dither"][t % 2]
        img = jnp.asarray(rng.integers(0, 256, (h, w, 4), dtype=np.uint8))
        pal = srgb8_to_lab(
            jnp.asarray(rng.integers(0, 256, (k, 3), dtype=np.uint8))
        )
        thr = dither_threshold(pal, k_active=ka)
        want = np.asarray(
            fused_quantize(
                img, pal, thr, k_active=ka, mode=mode, interpret=True
            )
        )
        got = np.asarray(
            fused_quantize_two_half(
                img, pal, thr, k_active=ka, mode=mode, interpret=True
            )
        )
        if not np.array_equal(got, want):
            bad = (got != want).any(axis=-1).sum()
            print(f"[FAIL] two-half != single trial={t} {h}x{w} "
                  f"k={k}/{ka} {mode}: {bad} px")
            failures += 1

    print("  section: sharded batch surface", flush=True)
    # The DP x SP batch entry points vs their per-image twins on the
    # available-device mesh: reduce_images_sharded (round 4),
    # palette_images_sharded + find_batch_sharded (round 5). Random
    # same-size frame batches; psum-rounding tolerance for trainings,
    # bit-equality for the per-pixel find.
    from kmeans_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(jax.devices(), data=1)
    plain_p = ImageProcessor()
    # dims / frame count / k key the sharded executables (remote-free
    # here, but a fresh trio per trial would compile every trial); pin
    # them, randomize the frame DATA + mode.
    h, w, n, k = 24, 30, 2, 4
    for t in range(max(2, trials // 15)):
        frames = [
            Image((w, h), rng.integers(0, 256, (h, w, 4), dtype=np.uint8))
            for _ in range(n)
        ]
        mode = ReduceMode(["replace", "dither"][t % 2])
        outs = plain_p.reduce_images_sharded(frames, k, mode, mesh=mesh)
        for i, (im, out) in enumerate(zip(frames, outs)):
            ref = plain_p.reduce_sharded(k, im, mode, mesh=mesh)
            frac = (out.pixels == ref.pixels).all(axis=-1).mean()
            if frac < 0.99:
                print(f"[FAIL] reduce_images_sharded frame {i} trial={t} "
                      f"frac={frac:.5f}")
                failures += 1
        pal_j = plain_p.palette_images_sharded(frames, k, mesh=mesh)
        pal_s = plain_p.palette_images(frames, k)
        if np.abs(pal_j.astype(int) - pal_s.astype(int)).max() > 2:
            print(f"[FAIL] palette_images_sharded != palette_images "
                  f"trial={t}")
            failures += 1
        colors = np.concatenate(
            [rng.integers(0, 256, (3, 3), dtype=np.uint8),
             np.full((3, 1), 255, np.uint8)], axis=1
        )
        fouts = plain_p.find_batch_sharded(frames, colors, mode, mesh=mesh)
        for i, (im, out) in enumerate(zip(frames, fouts)):
            ref = plain_p.find_sharded(im, colors, mode, mesh=mesh)
            if not np.array_equal(out.pixels, ref.pixels):
                print(f"[FAIL] find_batch_sharded frame {i} trial={t}")
                failures += 1

    print("  section: serve backpressure", flush=True)
    # Service-level bounded backpressure under concurrent overload:
    # tiny max_pending + a batching window long enough that arrivals
    # stack -> some clients shed with 503 + Retry-After, every client
    # gets a terminal answer (no hangs), and the slot count returns to
    # zero (the exactly-once release invariant under contention).
    import http.client
    import threading as _threading

    from kmeans_tpu.serve import create_server
    from kmeans_tpu.utils.imageio import encode_png_bytes

    body = encode_png_bytes(
        Image((24, 16), rng.integers(0, 256, (16, 24, 4), dtype=np.uint8))
    )
    srv = create_server(port=0, batch_window_s=0.15, max_pending=2)
    thread = _threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    try:
        addr = srv.server_address

        def post(path):
            conn = http.client.HTTPConnection(*addr, timeout=120)
            conn.request("POST", path, body=body)
            resp = conn.getresponse()
            data = resp.read()
            retry = resp.getheader("Retry-After")
            conn.close()
            return resp.status, retry, data

        post("/reduce?k=3")  # warm the executables outside the burst
        for t in range(max(2, trials // 30)):
            results: dict[int, tuple] = {}

            def client(i):
                results[i] = post("/reduce?k=3")

            threads = [
                _threading.Thread(target=client, args=(i,))
                for i in range(8)
            ]
            for th in threads:
                th.start()
            for th in threads:
                th.join(timeout=180)
            if any(th.is_alive() for th in threads):
                print(f"[FAIL] backpressure trial={t}: client hang")
                failures += 1
                break
            statuses = sorted(s for s, _, _ in results.values())
            if not all(s in (200, 503) for s in statuses):
                print(f"[FAIL] backpressure trial={t}: statuses {statuses}")
                failures += 1
            if statuses.count(503) and not all(
                r is not None for s, r, _ in results.values() if s == 503
            ):
                print(f"[FAIL] backpressure trial={t}: 503 without "
                      f"Retry-After")
                failures += 1
            if srv.service._pending_count != 0:
                print(f"[FAIL] backpressure trial={t}: slot count "
                      f"{srv.service._pending_count} != 0 after drain")
                failures += 1
        # after shedding, the service still answers
        s, _, _ = post("/reduce?k=3")
        if s != 200:
            print(f"[FAIL] backpressure: post-overload request got {s}")
            failures += 1
    finally:
        srv.shutdown()
        srv.server_close()

    print(f"soak complete: {failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(int(sys.argv[1]) if len(sys.argv) > 1 else 60))
