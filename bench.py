"""Benchmark: end-to-end k-means reduce of a 4K image at k=8 on one TPU chip.

Driver metric (BASELINE.json): "Mpix/s k-means reduce (k=8, assign+update);
end-to-end 4K image wall-clock". Measures the full `reduce` path the way a
user hits it — uint8 RGBA host array in, trained palette (shrink + k-means++
+ Lloyd in Lab) and the quantized uint8 RGBA host array out — then reports
megapixels per second of 4K (3840x2160) wall-clock.

The reference publishes no numbers (BASELINE.md); `vs_baseline` is the
ratio against a DERIVED estimate of the wgpu reference on a discrete GPU
(the Rust toolchain and a GPU are unavailable here — BASELINE.md carries
the full derivation). Summary of the derivation, counted from the
reference's dispatch structure for this exact workload: the 256px-shrunk
training converges after 17 Lloyd iterations (measured with the identical
protocol, `core/src/modules.rs:764-836`), each iteration costing two
host-synchronized submit+poll(Wait) round trips (modules.rs:790-791,
811-819) plus a mapped convergence readback every 8th; seeding is one
polled chain (modules.rs:1211-1247); the full-res output chain moves
~800 MB of Rgba32Float texture traffic (operations.rs:99-271); 33 MB
uploads/readbacks cross PCIe. At discrete-GPU constants (0.5-1.5 ms per
poll round trip, 250-360 GB/s HBM, 4-8 GB/s effective PCIe) that totals
~45-85 ms => ~100-185 Mpix/s; the published number uses the central
~140 Mpix/s. Both bounds and the sensitivity are in BASELINE.md.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...} with
the on-device throughput, the measured per-call tunnel latency, a
PCIe-transport projection, and the five BASELINE.json config timings.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

REFERENCE_BASELINE_MPIX_S = 140.0  # derived central estimate; BASELINE.md
K = 8
WIDTH, HEIGHT = 3840, 2160
REPS = 5
# Effective PCIe Gen3/4 staging rate used for the transport projection
# (what the same pipeline would see with a locally-attached accelerator,
# instead of this harness's ~30-40 MB/s dev tunnel).
PCIE_GBPS = 6.0


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


def _measure_wire_rates(call_latency: float, mb: int = 12) -> tuple[float, float]:
    """(upload, readback) MB/s of the device transport, measured in-run
    with `mb`-sized buffers; the per-call latency is subtracted from each
    sample. Upload reps perturb the host buffer and force completion with
    a tiny derived readback (`block_until_ready` is unreliable over this
    tunnel — docs/STATUS.md); readback reps read a FRESH derived array
    each time (JAX caches the host copy after the first np.asarray of an
    Array). Best-of-3 each: these feed the e2e floor estimate, which must
    track the wire's capability, not a single transfer's luck."""
    import jax.numpy as jnp
    import numpy as onp

    n = mb * (1 << 20)
    host = onp.zeros(n, onp.uint8)
    dev = jnp.asarray(host)  # warm the transfer path
    onp.asarray(dev[:8])

    # The upload sample chains THREE transport round trips (upload
    # dispatch, eager slice, 8-byte readback); subtracting a single
    # call_latency left ~2 extra RTTs in each sample, so wire_up read
    # low and the degradation-guard floor read high. Baseline the EXACT
    # same chain on a tiny buffer and subtract that instead.
    tiny = onp.zeros(8, onp.uint8)
    onp.asarray(jnp.asarray(tiny)[:8])  # warm the tiny-shape executables
    base_times = []
    for i in range(3):
        tiny[0] = i + 1  # same perturbation discipline as the samples
        base_times.append(_timed(lambda: onp.asarray(jnp.asarray(tiny)[:8])))
    up_base = min(base_times)
    up_times = []
    for i in range(3):
        host[0] = i + 1  # defeat any same-buffer transfer short-circuit
        t = _timed(lambda: onp.asarray(jnp.asarray(host)[:8]))
        up_times.append(max(t - up_base, 1e-6))
    down_times = []
    for i in range(3):
        fresh = dev + onp.uint8(i + 1)
        onp.asarray(fresh[:8])  # ensure the derived array is materialized
        t = _timed(lambda: onp.asarray(fresh))
        down_times.append(max(t - call_latency, 1e-6))
    return mb / min(up_times), mb / min(down_times)


def _measure_call_latency(reps: int = 12) -> float:
    """Per-call roundtrip latency of the device transport, measured in-run
    (round 1 hardcoded 30 ms): the time to dispatch a tiny device
    computation and read its result back, min over `reps`. Each rep uses
    a FRESH result array — JAX caches the host copy after the first
    np.asarray of the same Array, which would otherwise measure a cache
    hit (~0 ms) instead of the transport. This is the constant the
    in-jit loop timing subtracts, so it must come from the same session
    the loop runs in."""
    import jax.numpy as jnp
    import numpy as onp

    base = jnp.zeros(8, jnp.uint8)
    onp.asarray(base + onp.uint8(255))  # warm dispatch + transfer path
    return min(
        _timed(lambda i=i: onp.asarray(base + onp.uint8(i)))
        for i in range(reps)
    )


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

    call_latency = _measure_call_latency()
    log(f"bench: per-call transport latency {call_latency*1e3:.1f} ms")
    wire_up, wire_down = _measure_wire_rates(call_latency)
    log(f"bench: wire up {wire_up:.1f} MB/s, down {wire_down:.1f} MB/s")

    # Device-side throughput of the same full reduce (train + assign),
    # excluding the dev-harness tunnel transfers (~30-40 MB/s here, vs
    # GB/s PCIe in the reference's setting): force execution with a
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

    # In-jit loop: N full reduces per dispatch, so the per-call transport
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

    def device_sample() -> float:
        """One 20-loop in-jit device sample (seconds per reduce)."""
        t = _timed(lambda: onp.asarray(dev_loop(img_dev)))
        return max((t - call_latency) / LOOP, 1e-6)

    # Degradation-proofing the device tier (VERDICT r04 task 3): the
    # single min-of-3 sample published through round 4 could not
    # distinguish a sub-1.5x kernel regression from ambient drift of the
    # shared chip (0.55-0.88 ms observed across identical-code sessions).
    # Sample N times HERE and N more after the config matrix (minutes
    # later), publish min + median + the raw reps. Reading rule
    # (BASELINE.md): moved median at stable wire rates = kernel
    # regression; moved min only = ambient drift.
    device_reps = [device_sample() for _ in range(4)]
    device_s = min(device_reps)
    log(
        f"bench: device {device_s*1e3:.2f} ms/reduce ({LOOP}-loop), "
        f"reps {[round(t*1e3, 2) for t in device_reps]}"
    )

    # Transport projection: the same pipeline behind a locally-attached
    # accelerator (PCIe staging instead of the dev tunnel). Bytes moved by
    # the flagship path: RGB-only upload (3 B/px) + bit-packed index
    # readback (0.5 B/px at k=8).
    up_bytes = WIDTH * HEIGHT * 3
    down_bytes = WIDTH * HEIGHT // 2
    bytes_moved = up_bytes + down_bytes
    pcie_s = device_s + bytes_moved / (PCIE_GBPS * 1e9)
    log(f"bench: PCIe-projected e2e {pcie_s*1e3:.1f} ms")

    # --- e2e capture, degradation-proofed (VERDICT round-2 task 2) ---
    # The e2e number is >90% wire time here, so a transiently-degraded
    # tunnel used to publish its degradation as the score (r02: 846 ms
    # captured while the same code measured 509-569 ms). Guard: compute
    # the session's achievable floor from the wire rates + latency +
    # device time measured IN THIS RUN; while best-of-N exceeds 1.5x that
    # floor, keep measuring with a short backoff (the tunnel recovers on
    # the tens-of-seconds scale) up to a wall-clock budget, re-measuring
    # the wire rates as we go (the floor tracks the BEST observed rates).
    def e2e_floor() -> float:
        return (
            up_bytes / (wire_up * 1e6)
            + down_bytes / (wire_down * 1e6)
            + call_latency
            + device_s
        )

    def one_e2e() -> float:
        t0 = time.perf_counter()
        out = processor.reduce(K, image, Algorithm.KMEANS, ReduceMode.REPLACE)
        # .pixels is a host numpy array: the transfer back is included.
        assert out.pixels.shape == (HEIGHT, WIDTH, 4)
        return time.perf_counter() - t0

    times = [one_e2e() for _ in range(REPS)]
    budget_end = time.monotonic() + 480.0
    while (
        min(times) > 1.5 * e2e_floor() and time.monotonic() < budget_end
    ):
        log(
            f"bench: e2e best {min(times)*1e3:.0f} ms exceeds 1.5x floor "
            f"{e2e_floor()*1e3:.0f} ms — tunnel degraded, re-measuring"
        )
        time.sleep(20)
        u, d = _measure_wire_rates(call_latency)
        wire_up, wire_down = max(wire_up, u), max(wire_down, d)
        times.extend(one_e2e() for _ in range(2))
    e2e = min(times)
    e2e_median = sorted(times)[len(times) // 2]
    e2e_mpix_s = mpix / e2e
    log(
        f"bench: e2e best {e2e*1e3:.0f} ms, median {e2e_median*1e3:.0f} ms "
        f"over {len(times)} reps (floor {e2e_floor()*1e3:.0f} ms)"
    )

    # Per-phase attribution of the headline e2e (VERDICT r04 task 1):
    # one extra rep under the phase recorder. Boundaries force device
    # completion, so sum(phases) exceeds the un-instrumented e2e by
    # ~`_syncs` x call_latency; per-phase magnitudes are the signal.
    try:
        from kmeans_tpu.utils.profiling import collect_phases

        ph: dict = {}
        with collect_phases(ph):
            one_e2e()
        phases_ms = {
            k: (v if k == "_syncs" else round(v * 1e3, 1))
            for k, v in sorted(ph.items())
        }
        log(f"bench: e2e phases {phases_ms}")
    except Exception as e:
        phases_ms = {"error": str(e)}

    # The full BASELINE.json config matrix (reference workloads on
    # tokyo.png) — per-config failures are recorded, not fatal.
    log("bench: config matrix ...")
    try:
        from benchmarks.run_configs import collect_configs

        # Pass the session wire rates so every config row carries its
        # byte-derived transport floor (x_floor separates kernel
        # regressions from tunnel weather — VERDICT round-3 #6).
        configs = collect_configs(
            reps=3,
            wire={
                "up_mb_s": wire_up,
                "down_mb_s": wire_down,
                "call_latency_s": call_latency,
            },
        )
    except Exception as e:  # keep the headline metric alive regardless
        configs = {"error": str(e)}

    # Second half of the device spread capture (minutes after the first:
    # a drifting chip/tunnel shows up as a moved tail, a healthy one as a
    # tight band).
    device_reps.extend(device_sample() for _ in range(3))
    device_s = min(device_reps)
    device_sorted = sorted(device_reps)
    device_median = device_sorted[len(device_sorted) // 2]
    log(
        f"bench: device min {device_s*1e3:.2f} ms, median "
        f"{device_median*1e3:.2f} ms over {len(device_reps)} reps"
    )

    print(
        json.dumps(
            {
                "metric": "kmeans_reduce_4k_k8_e2e",
                "value": round(e2e_mpix_s, 2),
                "unit": "Mpix/s",
                "vs_baseline": round(e2e_mpix_s / REFERENCE_BASELINE_MPIX_S, 3),
                "device_mpix_s": round(mpix / device_s, 1),
                "device_ms": round(device_s * 1e3, 2),
                "device_ms_median": round(device_median * 1e3, 2),
                "device_ms_reps": [round(t * 1e3, 2) for t in device_reps],
                "e2e_ms": round(e2e * 1e3, 1),
                "e2e_median_ms": round(e2e_median * 1e3, 1),
                "e2e_floor_ms": round(e2e_floor() * 1e3, 1),
                "e2e_phases_ms": phases_ms,
                "e2e_reps": len(times),
                "wire_up_mb_s": round(wire_up, 1),
                "wire_down_mb_s": round(wire_down, 1),
                "call_latency_ms": round(call_latency * 1e3, 1),
                "pcie_projected_mpix_s": round(mpix / pcie_s, 1),
                "baseline_mpix_s": REFERENCE_BASELINE_MPIX_S,
                "configs": configs,
                "note": (
                    "e2e includes this harness's ~30-40MB/s host<->TPU "
                    "tunnel; device_mpix_s is the on-device train+assign "
                    "throughput; pcie_projected_mpix_s re-prices the "
                    "measured bytes at a local-accelerator transport; "
                    "baseline derivation in BASELINE.md"
                ),
            }
        )
    )


def _timed(f) -> float:
    t0 = time.perf_counter()
    f()
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
