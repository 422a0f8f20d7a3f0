"""Benchmark: end-to-end k-means reduce of a 4K image at k=8 on one TPU chip.

Driver metric (BASELINE.json): "Mpix/s k-means reduce (k=8, assign+update);
end-to-end 4K image wall-clock". Measures the full `reduce` path the way a
user hits it — uint8 RGBA host array in, trained palette (shrink + k-means++
+ Lloyd in Lab) and the quantized uint8 RGBA host array out — then reports
megapixels per second of 4K (3840x2160) wall-clock.

The reference publishes no numbers (BASELINE.md); `vs_baseline` is the
ratio against a measured-class estimate for the wgpu reference on a
discrete GPU: its reduce path serializes k x scan dispatch chains with a
host `device.poll(Wait)` per Lloyd iteration plus init/readback, ~150 ms
end-to-end for 4K at k=8 => ~55 Mpix/s. See BASELINE.md for why this must
be an estimate (the Rust toolchain and a GPU are unavailable here).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

REFERENCE_BASELINE_MPIX_S = 55.0
K = 8
WIDTH, HEIGHT = 3840, 2160
REPS = 5


def _load_4k_image() -> np.ndarray:
    """4K test image: tokyo.png (the reference's benchmark asset) tiled up
    to 3840x2160, or a synthetic gradient if unavailable."""
    tokyo = "/root/reference/gfx/tokyo.png"
    if os.path.exists(tokyo):
        from kmeans_tpu.utils.imageio import load_image

        img = load_image(tokyo).pixels  # [513, 768, 4]
        reps_y = HEIGHT // img.shape[0] + 1
        reps_x = WIDTH // img.shape[1] + 1
        tiled = np.tile(img, (reps_y, reps_x, 1))[:HEIGHT, :WIDTH]
        return np.ascontiguousarray(tiled)
    rng = np.random.default_rng(0)
    y, x = np.mgrid[0:HEIGHT, 0:WIDTH]
    rgb = np.stack(
        [
            (x * 255 // WIDTH),
            (y * 255 // HEIGHT),
            ((x + y) * 255 // (WIDTH + HEIGHT)),
        ],
        axis=-1,
    ).astype(np.uint8)
    noise = rng.integers(-8, 9, rgb.shape)
    rgb = np.clip(rgb.astype(int) + noise, 0, 255).astype(np.uint8)
    return np.concatenate(
        [rgb, np.full((HEIGHT, WIDTH, 1), 255, np.uint8)], axis=-1
    )


def _probe_device(timeout_s: int = 480) -> bool:
    """Tiny upload+readback under a SIGALRM watchdog: the TPU tunnel in this
    harness can wedge (all transfers hang); better to report than to hang."""
    import signal

    def _on_alarm(signum, frame):
        raise TimeoutError

    old = signal.signal(signal.SIGALRM, _on_alarm)
    signal.alarm(timeout_s)
    try:
        import jax.numpy as jnp
        import numpy as onp

        onp.asarray(jnp.asarray(onp.ones(8, onp.uint8)))
        return True
    except TimeoutError:
        return False
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)


def main() -> None:
    import jax.numpy as jnp
    import numpy as onp

    from kmeans_tpu.api import Algorithm, ImageProcessor, ReduceMode
    from kmeans_tpu.image import Image
    from kmeans_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    # The dev-harness tunnel wedges transiently (docs/STATUS.md: 30-70 min
    # observed); one retry after a pause catches a recovering tunnel
    # instead of recording a spurious 0.0.
    responsive = _probe_device()
    if not responsive:
        print("bench: device probe failed, retrying in 240 s", file=sys.stderr)
        time.sleep(240)
        responsive = _probe_device()
    if not responsive:
        print(
            json.dumps(
                {
                    "metric": "kmeans_reduce_4k_k8_e2e",
                    "value": 0.0,
                    "unit": "Mpix/s",
                    "vs_baseline": 0.0,
                    "note": "device unresponsive (harness TPU tunnel wedged); no measurement possible",
                }
            )
        )
        return

    pixels = _load_4k_image()
    image = Image((WIDTH, HEIGHT), pixels)
    processor = ImageProcessor()
    mpix = WIDTH * HEIGHT / 1e6

    def log(msg):
        print(msg, file=sys.stderr, flush=True)

    # Warmup: compile every executable in the path.
    log("bench: warmup/compile ...")
    processor.reduce(K, image, Algorithm.KMEANS, ReduceMode.REPLACE)
    log("bench: warmup done")

    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = processor.reduce(K, image, Algorithm.KMEANS, ReduceMode.REPLACE)
        # .pixels is a host numpy array: the transfer back is included.
        assert out.pixels.shape == (HEIGHT, WIDTH, 4)
        times.append(time.perf_counter() - t0)
    e2e = min(times)
    e2e_mpix_s = mpix / e2e
    log(f"bench: e2e best {e2e*1e3:.0f} ms")

    # Device-side throughput of the same full reduce (train + assign),
    # excluding the dev-harness tunnel transfers (~30-40 MB/s here, vs
    # ~10 GB/s PCIe in the reference's setting): force execution with a
    # single-element readback, subtract the measured call latency.
    from kmeans_tpu.api import (
        MAX_IMAGE_DIMENSION,
        _pallas_available,
        _reduce_indexed_jit,
        _reduce_jit,
    )
    from kmeans_tpu.models import kmeans as km
    from kmeans_tpu.ops.resize import shrunk_dimensions

    img_dev = jnp.asarray(pixels)
    onp.asarray(img_dev[0, 0])
    sw, sh = shrunk_dimensions(WIDTH, HEIGHT, MAX_IMAGE_DIMENSION)
    first = km.reference_seed_index(sw, sh)
    fused = _pallas_available()

    # In-jit loop: N full reduces per dispatch, so the ~30 ms tunnel call
    # latency amortizes away instead of dominating the ~2 ms signal.
    import jax

    LOOP = 20

    @jax.jit
    def dev_loop(img):
        def body(i, acc):
            if fused:
                idx, _ = _reduce_indexed_jit(
                    img, K, (sh, sw), first, 1.0 + acc * 0.0, "replace"
                )
                return acc + idx[0, 0].astype(jnp.float32)
            out, _ = _reduce_jit(
                img, K, (sh, sw), first, 1.0 + acc * 0.0, "replace", False
            )
            return acc + out[0, 0, 0].astype(jnp.float32)

        return jax.lax.fori_loop(0, LOOP, body, jnp.float32(0.0))

    onp.asarray(dev_loop(img_dev))
    loop_t = min((_timed(lambda: onp.asarray(dev_loop(img_dev))) for _ in range(3)))
    device_s = max((loop_t - 0.030) / LOOP, 1e-6)
    log(f"bench: device {device_s*1e3:.2f} ms/reduce ({LOOP}-loop)")

    print(
        json.dumps(
            {
                "metric": "kmeans_reduce_4k_k8_e2e",
                "value": round(e2e_mpix_s, 2),
                "unit": "Mpix/s",
                "vs_baseline": round(e2e_mpix_s / REFERENCE_BASELINE_MPIX_S, 3),
                "device_mpix_s": round(mpix / device_s, 1),
                "device_ms": round(device_s * 1e3, 1),
                "e2e_ms": round(e2e * 1e3, 1),
                "note": "e2e includes this harness's ~30-40MB/s host<->TPU tunnel; device_mpix_s is the on-device train+assign throughput",
            }
        )
    )


def _timed(f) -> float:
    t0 = time.perf_counter()
    f()
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
