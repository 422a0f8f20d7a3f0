"""K-means color clustering in CIELAB space — TPU-native.

Reimplements the reference's GPU k-means (`core/src/operations.rs:15-88` and
the WGSL kernels it drives) as pure JAX, with the entire algorithm resident
on device inside `lax.fori_loop` / `lax.while_loop`:

- **Seeding** (`plusplus_init`): farthest-point ("k-means++-style")
  selection, mirroring `core/shaders/plus_plus_init.wgsl:70-187` +
  `kmeans++_calc_diff.wgsl:14-34`. The first centroid is a pseudo-random
  pixel chosen with the reference's `fract(sin(...))` hash
  (plus_plus_init.wgsl:58-60,161-168); subsequent centroids are the pixel
  farthest (max-min CIE94) from the already-chosen set. The reference
  recomputes the min-distance map over all chosen centroids each round
  (calc_diff); we maintain it incrementally — mathematically identical,
  O(N) instead of O(N*k) per round. The reference's decoupled-lookback
  argmax scan collapses to `jnp.argmax`.

- **Lloyd iterations** (`lloyd`): mirrors `ChooseCentroidModule::compute`
  (`core/src/modules.rs:763-871`) + `choose_centroid.wgsl:73-206` +
  `find_centroid.wgsl:15-44`. Each iteration: per-cluster (sum, count)
  accumulation -> new centroid = sum/count (empty clusters keep their old
  value and vote "not converged", choose_centroid.wgsl:185-197) ->
  convergence vote `CIE94(new, old) < threshold` -> re-assignment. The
  reference's per-workgroup Hillis-Steele scan + decoupled lookback (a GPU
  workaround for single-pass global reduction) becomes a one-hot matmul on
  the MXU; the host-driven loop with a `device.poll(Wait)` every iteration
  becomes a `lax.while_loop` with zero host round-trips.

- **Termination**: max 128 iterations, convergence checked at iterations
  8, 16, ... (every 8th, not the zeroth), exactly like
  `core/src/modules.rs:764-766,802-836`.

All functions are shape-static and jit/vmap/shard_map friendly. Cluster
count `k` is a static Python int; a `k_active` array argument (optional)
masks trailing clusters off so a batch of images with different k values can
share one compiled executable (vmap over `k_active`).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from kmeans_tpu.ops.delta_e import metric_fns

MAX_ITERATIONS = 128  # core/src/modules.rs:765
CONVERGENCE_CHECK_EVERY = 8  # core/src/modules.rs:766
LAB_CONVERGENCE = 1.0  # core/src/lib.rs:189-194
RGB_CONVERGENCE = 0.01

_BIG = 3.4e38  # larger than any CIE94^2; plain float so import stays device-free


def reference_seed_index(width: int, height: int) -> int:
    """Flat index of the first seed pixel.

    Reproduces `plus_plus_init.wgsl` `initial` (:161-168) with its
    `rand(seed) = fract(sin(dot(vec2(seed), vec2(12.9898, 78.233))) * 43758.5453)`
    hash (:58-60): x = trunc(W * rand(42)), y = trunc(H * rand(12)).
    Computed host-side in float32 (the GPU's f32 sin of a large argument is
    implementation-defined; any deterministic in-range pixel is equally
    valid as a seed — this is the documented deviation from the reference).
    """

    def rand(seed: float) -> float:
        v = np.float32(seed) * (np.float32(12.9898) + np.float32(78.233))
        s = np.sin(np.float32(v), dtype=np.float32) * np.float32(43758.5453)
        return float(s - np.floor(s))

    x = min(int(width * rand(42.0)), width - 1)
    y = min(int(height * rand(12.0)), height - 1)
    return y * width + x


def _masked_d2(
    pixels: jnp.ndarray,
    centroids: jnp.ndarray,
    valid: jnp.ndarray,
    metric: str = "cie94",
):
    """Squared delta-E from each pixel [N,3] to each centroid [K,3];
    invalid centroids get +inf so they are never selected."""
    _, dist_sq = metric_fns(metric)
    d2 = dist_sq(pixels[:, None, :], centroids[None, :, :])  # [N,K]
    return jnp.where(valid[None, :], d2, _BIG)


def assign_clusters(
    pixels: jnp.ndarray,
    centroids: jnp.ndarray,
    valid: jnp.ndarray | None = None,
    metric: str = "cie94",
) -> jnp.ndarray:
    """Per-pixel argmin over centroids by delta-E — the `find_centroid.wgsl`
    assignment step (CIE94 by default, like every reference kernel).
    `pixels[N,3]`, `centroids[K,3]` -> `[N]` int32."""
    if valid is None:
        valid = jnp.ones(centroids.shape[0], dtype=bool)
    return jnp.argmin(
        _masked_d2(pixels, centroids, valid, metric), axis=1
    ).astype(jnp.int32)


@jax.named_scope("kmeans.plusplus_init")
def plusplus_init(
    pixels: jnp.ndarray,
    k: int,
    first_index,
    k_active: jnp.ndarray | int | None = None,
    weight: jnp.ndarray | None = None,
    metric: str = "cie94",
) -> jnp.ndarray:
    """Farthest-point seeding. `pixels[N,3]` Lab, returns `[k,3]` centroids.

    `first_index` is the flat pixel index of centroid 0 (see
    `reference_seed_index`). With `k_active < k`, trailing centroid rows
    stay at their zero initialization — they are meaningless and must be
    masked out (pass the same `k_active` to every downstream consumer).

    `weight[N]` (optional) marks padding: pixels with weight <= 0 can never
    be selected as seeds (their distance-map entry is pinned to -1, below
    every real pixel's >= 0). Used by the shape-bucketing serving path,
    where images are padded to a static canvas.
    """
    n = pixels.shape[0]
    k_active = jnp.asarray(k if k_active is None else k_active, jnp.int32)
    _, dist_sq = metric_fns(metric)

    c0 = pixels[first_index]
    centroids = jnp.zeros((k, 3), jnp.float32).at[0].set(c0)
    # Min squared-delta-E distance to the chosen set (kmeans++_calc_diff.wgsl:27-31,
    # maintained incrementally instead of recomputed per round).
    dmap = dist_sq(pixels, c0[None, :])
    if weight is not None:
        # Once pinned to -1, the running `minimum` keeps pad entries at -1.
        dmap = jnp.where(weight > 0, dmap, -1.0)

    def body(j, carry):
        centroids, dmap = carry
        idx = jnp.argmax(dmap)  # farthest-point pick (plus_plus_init.wgsl `main`+`pick`)
        new_c = pixels[idx]
        take = j < k_active
        new_c = jnp.where(take, new_c, centroids[j])
        centroids = centroids.at[j].set(new_c)
        dmap = jnp.where(
            take, jnp.minimum(dmap, dist_sq(pixels, new_c[None, :])), dmap
        )
        return centroids, dmap

    if k > 1:
        centroids, _ = jax.lax.fori_loop(1, k, body, (centroids, dmap))
    return centroids


def _update_centroids(
    pixels: jnp.ndarray,
    assign: jnp.ndarray,
    k: int,
    weight: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-cluster (sum, count) via one-hot matmul — the MXU replacement for
    choose_centroid.wgsl's decoupled-lookback scan. Full-f32 precision: the
    default bf16 MXU path would perturb centroid sums enough to flip
    convergence votes. With `weight`, rows are scaled before accumulation
    (0-weight pad pixels contribute exact f32 zeros)."""
    onehot = jax.nn.one_hot(assign, k, dtype=jnp.float32)  # [N,K]
    if weight is not None:
        onehot = onehot * weight[:, None]
    sums = jax.lax.dot_general(
        onehot,
        pixels,
        dimension_numbers=(((0,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )  # [K,3]
    counts = jnp.sum(onehot, axis=0)  # [K]
    return sums, counts


@jax.named_scope("kmeans.lloyd")
def lloyd(
    pixels: jnp.ndarray,
    centroids: jnp.ndarray,
    convergence: float = LAB_CONVERGENCE,
    max_iterations: int = MAX_ITERATIONS,
    k_active: jnp.ndarray | int | None = None,
    weight: jnp.ndarray | None = None,
    metric: str = "cie94",
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Lloyd iterations with the reference's termination protocol.

    Returns (centroids [k,3], iterations_run). Fully device-resident: one
    `lax.while_loop`, no host synchronisation (vs. the reference's
    `device.poll(Wait)` per iteration, `core/src/modules.rs:790-791`).
    `weight[N]` (optional): per-pixel accumulation weight; 0 excludes a
    (pad) pixel from every centroid update.
    """
    k = centroids.shape[0]
    k_active = jnp.asarray(k if k_active is None else k_active, jnp.int32)
    valid = jnp.arange(k) < k_active
    dist, _ = metric_fns(metric)

    assign0 = assign_clusters(pixels, centroids, valid, metric)

    def cond(carry):
        _, _, converged, i = carry
        # Reference checks convergence only at iterations 8, 16, ...
        # (core/src/modules.rs:802-804: `iteration > 0 && iteration % 8 == 0`).
        # `i` counts completed iterations; the last completed one is i-1.
        last = i - 1
        checked = jnp.logical_and(last > 0, last % CONVERGENCE_CHECK_EVERY == 0)
        return jnp.logical_and(
            i < max_iterations, jnp.logical_not(jnp.logical_and(checked, converged))
        )

    def body(carry):
        centroids, assign, _, i = carry
        sums, counts = _update_centroids(pixels, assign, k, weight)
        nonempty = counts > 0
        new_centroids = jnp.where(
            nonempty[:, None], sums / jnp.maximum(counts, 1.0)[:, None], centroids
        )
        # Convergence votes (choose_centroid.wgsl `pick`, :185-197): empty
        # clusters vote 0; inactive (masked) clusters always pass.
        moved = dist(new_centroids, centroids)
        votes = jnp.logical_and(nonempty, moved < convergence)
        converged = jnp.all(jnp.logical_or(votes, jnp.logical_not(valid)))
        assign = assign_clusters(pixels, new_centroids, valid, metric)
        return new_centroids, assign, converged, i + 1

    centroids, _, _, iters = jax.lax.while_loop(
        cond, body, (centroids, assign0, jnp.asarray(False), jnp.int32(0))
    )
    return centroids, iters


@jax.named_scope("kmeans.lloyd_pallas")
def lloyd_pallas(
    pixels: jnp.ndarray,
    centroids: jnp.ndarray,
    convergence: float = LAB_CONVERGENCE,
    max_iterations: int = MAX_ITERATIONS,
    k_active: jnp.ndarray | int | None = None,
    weight: jnp.ndarray | None = None,
    interpret: bool = False,
    metric: str = "cie94",
    fast: bool = False,
    plane_dtype=None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Lloyd loop backed by the Pallas tile accumulator
    (`ops.kernels.lloyd_accumulate`): assignment + per-cluster (sum, count)
    in one bandwidth-floor pass per iteration, no [N, K] one-hot. Same
    termination protocol as `lloyd`; f32 totals differ from the matmul path
    only by summation order. Intended for full-resolution training where
    the one-hot intermediate would dominate HBM. `weight[N]` (optional)
    scales contributions (0 = pad pixel), via the kernel's weight plane.

    `fast=True` engages, for LARGE palettes only (k > 16 — same policy as
    the fused quantize kernels), the factorized CIE94 score or, under
    CIEDE2000, the pruned two-pass tier (factorized-CIE94 screen keeps
    PRUNE_M candidates, exact trig only on survivors — 4.4x/iter over
    the exact tiers at k=128). fast=False cie2000 above
    ACCUM_UNROLL_2000 runs the round-4 chunked-loop EXACT form (seconds
    compiles vs the unrolled accumulator's 130/351 s at k=128/256;
    tools/exp_accum_2000.py). Small-k
    training stays bit-exact even under fast (measured 1.23x/iter at 4K
    k=64 for cie94, no gain at k=8; docs/perf.md). Knife-edge
    assignments may flip / a screened-out true nearest is lost, like
    quantize fast mode.

    `plane_dtype="bfloat16"` stores the Lab training planes half-width
    (half the per-iteration HBM traffic; the kernel up-casts on load and
    accumulates f32). This QUANTIZES the training input — ~0.3 delta-E,
    counts shift ~2e-4 of pixels (docs/perf.md round 2) — so it is
    opt-in and never a default. Measured ms/iter at 4K: k=8 0.543 ->
    0.543 (compute-bound, no gain), k=64 4.46 -> 4.05 exact / 3.46 ->
    3.06 with fast."""
    from kmeans_tpu.ops.kernels import (
        lloyd_accumulate,
        pack_lab_planes,
        pack_plane,
    )

    k = centroids.shape[0]
    fast = bool(fast) and k > 16 and metric in ("cie94", "cie2000")
    k_active = jnp.asarray(k if k_active is None else k_active, jnp.int32)
    valid = jnp.arange(k) < k_active
    dist, _ = metric_fns(metric)
    planes, n_valid = pack_lab_planes(
        pixels, dtype=None if plane_dtype is None else jnp.dtype(plane_dtype)
    )
    weight_planes = None if weight is None else pack_plane(weight)

    def cond(carry):
        _, converged, i = carry
        last = i - 1
        checked = jnp.logical_and(last > 0, last % CONVERGENCE_CHECK_EVERY == 0)
        return jnp.logical_and(
            i < max_iterations, jnp.logical_not(jnp.logical_and(checked, converged))
        )

    def body(carry):
        centroids, _, i = carry
        totals = lloyd_accumulate(
            planes,
            centroids,
            n_valid,
            k_active=k_active,
            weight_planes=weight_planes,
            interpret=interpret,
            metric=metric,
            fast=fast,
        )  # [K, 4]
        sums, counts = totals[:, :3], totals[:, 3]
        nonempty = counts > 0
        new_centroids = jnp.where(
            nonempty[:, None], sums / jnp.maximum(counts, 1.0)[:, None], centroids
        )
        moved = dist(new_centroids, centroids)
        votes = jnp.logical_and(nonempty, moved < convergence)
        converged = jnp.all(jnp.logical_or(votes, jnp.logical_not(valid)))
        return new_centroids, converged, i + 1

    centroids, _, iters = jax.lax.while_loop(
        cond, body, (centroids, jnp.asarray(False), jnp.int32(0))
    )
    return centroids, iters


def derive_restart_seeds(
    n: int,
    first_index,
    restarts: int,
    weight: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Flat seed-pixel indices for `restarts` independent runs: restart 0
    is the caller's reference seed, restarts 1..R-1 stride the flat pixel
    index by the golden ratio (deterministic, documented in
    `fit_restarts`). Shared by the XLA, Pallas, and sharded multi-restart
    trainers so every path derives identical seeds."""
    offs = jnp.floor(
        jnp.arange(restarts, dtype=jnp.float32)
        * jnp.float32(0.6180339887498949)
        * n
    ).astype(jnp.int32)
    seeds = jnp.mod(jnp.asarray(first_index, jnp.int32) + offs, jnp.int32(n))
    if weight is not None:
        # A pad pixel (weight 0) must never seed a run: walk each derived
        # seed forward to the nearest real pixel (restart 0 keeps the
        # caller's reference seed, which callers already point at a real
        # pixel).
        real = weight > 0
        order = jnp.argsort(jnp.logical_not(real))  # real-pixel indices first
        n_real = jnp.sum(real.astype(jnp.int32))
        ranks = jnp.mod(seeds, jnp.maximum(n_real, 1))
        derived = order[ranks]
        seeds = jnp.concatenate([seeds[:1], derived[1:]])
    return seeds


@partial(
    jax.jit,
    static_argnames=("k", "max_iterations", "metric", "restarts"),
)
def fit_restarts(
    pixels: jnp.ndarray,
    k: int,
    first_index,
    restarts: int = 1,
    convergence: float = LAB_CONVERGENCE,
    max_iterations: int = MAX_ITERATIONS,
    k_active: jnp.ndarray | int | None = None,
    weight: jnp.ndarray | None = None,
    metric: str = "cie94",
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """`fit` with `restarts` independent k-means++ seedings, returning the
    run with the lowest within-cluster inertia (sum over pixels of the
    squared delta-E to the nearest active centroid).

    TPU-first extension: all restarts train in ONE vmapped executable and
    the winner is selected on device — the reference runs a single
    deterministic seeding (`plus_plus_init.wgsl:161-168`). Restart 0 uses
    the reference seed exactly; restarts 1..R-1 stride the flat pixel
    index by the golden ratio (deterministic, documented). Each restart's
    trajectory is identical to an individually-run `fit` (JAX's batched
    `while_loop` freezes converged items). Runs on the XLA trainer; with
    full-resolution training this multiplies memory/time by R.
    """
    if restarts <= 1:
        return fit(
            pixels, k, first_index, convergence=convergence,
            max_iterations=max_iterations, k_active=k_active, weight=weight,
            metric=metric,
        )
    seeds = derive_restart_seeds(
        pixels.shape[0], first_index, restarts, weight
    )

    def one(fi):
        return fit(
            pixels, k, fi, convergence=convergence,
            max_iterations=max_iterations, k_active=k_active, weight=weight,
            metric=metric,
        )

    cents_v, iters_v = jax.vmap(one)(seeds)  # [R, k, 3], [R]

    k_act = jnp.asarray(k if k_active is None else k_active, jnp.int32)
    valid = jnp.arange(k) < k_act

    def inertia(cents):
        d2 = _masked_d2(pixels, cents, valid, metric)  # [N, k]
        dmin = jnp.min(d2, axis=1)
        if weight is not None:
            dmin = dmin * weight
        return jnp.sum(dmin)

    best = jnp.argmin(jax.vmap(inertia)(cents_v))
    return cents_v[best], iters_v[best]


@partial(
    jax.jit,
    static_argnames=(
        "k", "max_iterations", "interpret", "metric", "fast", "plane_dtype",
    ),
)
def fit_large(
    pixels: jnp.ndarray,
    k: int,
    first_index,
    convergence: float = LAB_CONVERGENCE,
    max_iterations: int = MAX_ITERATIONS,
    k_active: jnp.ndarray | int | None = None,
    weight: jnp.ndarray | None = None,
    interpret: bool = False,
    metric: str = "cie94",
    fast: bool = False,
    plane_dtype=None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """fit() for large pixel counts: XLA farthest-point seeding (pure
    elementwise + argmax streams, no big intermediates) + Pallas Lloyd.
    With metric="cie2000" the accumulator kernel assigns with the
    polynomial-atan2 CIEDE2000 (zero mismatches vs XLA measured on
    hardware; seeding and convergence use the XLA formula).
    `plane_dtype="bfloat16"` halves the Lloyd loop's per-iteration HBM
    traffic at a documented input-quantization cost (see
    `lloyd_pallas`); seeding always runs f32."""
    centroids = plusplus_init(
        pixels, k, first_index, k_active=k_active, weight=weight,
        metric=metric,
    )
    return lloyd_pallas(
        pixels,
        centroids,
        convergence=convergence,
        max_iterations=max_iterations,
        k_active=k_active,
        weight=weight,
        interpret=interpret,
        metric=metric,
        fast=fast,
        plane_dtype=plane_dtype,
    )


@partial(
    jax.jit,
    static_argnames=(
        "k", "max_iterations", "interpret", "metric", "restarts", "fast",
        "plane_dtype",
    ),
)
def fit_large_restarts(
    pixels: jnp.ndarray,
    k: int,
    first_index,
    restarts: int = 1,
    convergence: float = LAB_CONVERGENCE,
    max_iterations: int = MAX_ITERATIONS,
    k_active: jnp.ndarray | int | None = None,
    weight: jnp.ndarray | None = None,
    interpret: bool = False,
    metric: str = "cie94",
    fast: bool = False,
    plane_dtype: str | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """`fit_large` with `restarts` independent seedings — the Pallas-trainer
    counterpart of `fit_restarts`, so full-resolution multi-restart training
    never pays the XLA path's [N, K] one-hot intermediate.

    Seeds come from `derive_restart_seeds` (identical to `fit_restarts`;
    restart 0 is the reference seed, so restarts=1 is bit-equal to
    `fit_large`). Each restart trains sequentially through the Pallas
    accumulator (unrolled — R is small and HBM holds one run's state at a
    time); its weighted inertia comes from one extra accumulator pass with
    `emit_inertia=True` (squared-delta-E sums per cluster, summed on
    device). Winner = lowest inertia, picked on device like
    `fit_restarts`."""
    if restarts <= 1:
        return fit_large(
            pixels, k, first_index, convergence=convergence,
            max_iterations=max_iterations, k_active=k_active, weight=weight,
            interpret=interpret, metric=metric, fast=fast,
            plane_dtype=plane_dtype,
        )
    from kmeans_tpu.ops.kernels import (
        lloyd_accumulate,
        pack_lab_planes,
        pack_plane,
    )

    seeds = derive_restart_seeds(
        pixels.shape[0], first_index, restarts, weight
    )
    # The inertia (winner-pick) pass always reads f32 planes: the
    # comparison between runs should not inherit the training planes'
    # quantization.
    planes, n_valid = pack_lab_planes(pixels)
    weight_planes = None if weight is None else pack_plane(weight)
    k_act = jnp.asarray(k if k_active is None else k_active, jnp.int32)

    cents_runs, iters_runs, inertia_runs = [], [], []
    for r in range(restarts):
        cents, iters = fit_large(
            pixels, k, seeds[r], convergence=convergence,
            max_iterations=max_iterations, k_active=k_active, weight=weight,
            interpret=interpret, metric=metric, fast=fast,
            plane_dtype=plane_dtype,
        )
        # The winner-pick pass runs EXACT for cie94 (the factor fast form
        # is a rank, not a distance). For cie2000 under fast it keeps the
        # pruned tier: its best_d is the exact squared distance to the
        # pruned-assigned centroid (the inertia of the clustering actually
        # trained), and the exact unrolled cie2000 kernel would otherwise
        # re-introduce the 130/351 s k=128/256 compile this tier removes.
        totals = lloyd_accumulate(
            planes, cents, n_valid, k_active=k_act,
            weight_planes=weight_planes, interpret=interpret, metric=metric,
            emit_inertia=True, fast=fast and metric == "cie2000",
        )  # [k, 5]; column 4 = per-cluster squared-distance sums
        cents_runs.append(cents)
        iters_runs.append(iters)
        inertia_runs.append(jnp.sum(totals[:, 4]))

    best = jnp.argmin(jnp.stack(inertia_runs))
    return jnp.stack(cents_runs)[best], jnp.stack(iters_runs)[best]


# Row-chunk size for the memory-bounded XLA trainer: [CHUNK, K] f32
# intermediates stay <= 256 MB even at k = 256.
_CHUNK_PIXELS = 1 << 18


def _assign_chunked(pixels, centroids, valid, metric):
    """`assign_clusters` over row chunks via `lax.map` — no [N, K]
    intermediate ever exists (the same trick as `ops/quantize.py`'s
    `_meld_chunked`)."""
    n = pixels.shape[0]
    n_pad = (n + _CHUNK_PIXELS - 1) // _CHUNK_PIXELS * _CHUNK_PIXELS
    padded = jnp.pad(pixels, ((0, n_pad - n), (0, 0)))
    chunks = padded.reshape(-1, _CHUNK_PIXELS, 3)
    out = jax.lax.map(
        lambda px: assign_clusters(px, centroids, valid, metric), chunks
    )
    return out.reshape(-1)[:n]


def _update_chunked(pixels, assign, k, weight):
    """`_update_centroids` over row chunks: per-chunk one-hot matmuls with
    the partial (sums, counts) reduced across chunks."""
    n = pixels.shape[0]
    n_pad = (n + _CHUNK_PIXELS - 1) // _CHUNK_PIXELS * _CHUNK_PIXELS
    padded = jnp.pad(pixels, ((0, n_pad - n), (0, 0)))
    # pad assignments to k: an out-of-range one_hot row is all zeros, so
    # pad pixels contribute nothing even without a weight vector
    asg = jnp.pad(assign, (0, n_pad - n), constant_values=k)
    if weight is None:
        weight = jnp.ones(n, jnp.float32)
    wgt = jnp.pad(weight, (0, n_pad - n))
    sums, counts = jax.lax.map(
        lambda args: _update_centroids(args[0], args[1], k, args[2]),
        (
            padded.reshape(-1, _CHUNK_PIXELS, 3),
            asg.reshape(-1, _CHUNK_PIXELS),
            wgt.reshape(-1, _CHUNK_PIXELS),
        ),
    )
    return sums.sum(axis=0), counts.sum(axis=0)


@jax.named_scope("kmeans.lloyd_chunked")
def lloyd_chunked(
    pixels: jnp.ndarray,
    centroids: jnp.ndarray,
    convergence: float = LAB_CONVERGENCE,
    max_iterations: int = MAX_ITERATIONS,
    k_active: jnp.ndarray | int | None = None,
    weight: jnp.ndarray | None = None,
    metric: str = "cie94",
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """`lloyd` with every [N, K] intermediate row-chunked (`lax.map`):
    the memory-bounded XLA trainer for LARGE pixel counts where the
    Pallas accumulator cannot run (no TPU, unsupported metric, or
    k > ACCUM_MAX_K) — full-resolution training at k = 256 would
    otherwise materialize multi-GB one-hot/distance matrices. On TPU the
    accumulator covers k <= 512 and is 1.5-5.2x faster per iteration
    (tools/exp_accum2.py), so this is the fallback, not the default.
    Same termination protocol; results match `lloyd` up to f32
    partial-sum reordering."""
    k = centroids.shape[0]
    k_act = jnp.asarray(k if k_active is None else k_active, jnp.int32)
    valid = jnp.arange(k) < k_act
    dist, _ = metric_fns(metric)

    assign0 = _assign_chunked(pixels, centroids, valid, metric)

    def cond(carry):
        _, _, converged, i = carry
        last = i - 1
        checked = jnp.logical_and(last > 0, last % CONVERGENCE_CHECK_EVERY == 0)
        return jnp.logical_and(
            i < max_iterations,
            jnp.logical_not(jnp.logical_and(checked, converged)),
        )

    def body(carry):
        centroids, assign, _, i = carry
        sums, counts = _update_chunked(pixels, assign, k, weight)
        nonempty = counts > 0
        new_centroids = jnp.where(
            nonempty[:, None], sums / jnp.maximum(counts, 1.0)[:, None], centroids
        )
        moved = dist(new_centroids, centroids)
        votes = jnp.logical_and(nonempty, moved < convergence)
        converged = jnp.all(jnp.logical_or(votes, jnp.logical_not(valid)))
        assign = _assign_chunked(pixels, new_centroids, valid, metric)
        return new_centroids, assign, converged, i + 1

    centroids, _, _, iters = jax.lax.while_loop(
        cond, body, (centroids, assign0, jnp.asarray(False), jnp.int32(0))
    )
    return centroids, iters


@partial(
    jax.jit, static_argnames=("k", "max_iterations", "metric", "restarts")
)
def fit_chunked(
    pixels: jnp.ndarray,
    k: int,
    first_index,
    restarts: int = 1,
    convergence: float = LAB_CONVERGENCE,
    max_iterations: int = MAX_ITERATIONS,
    k_active: jnp.ndarray | int | None = None,
    weight: jnp.ndarray | None = None,
    metric: str = "cie94",
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Memory-bounded fit for large pixel counts at k > 64: farthest-point
    seeding (already O(N)-incremental, no big intermediates) + the
    row-chunked Lloyd above. Multi-restart runs sequentially with a
    chunked min-distance inertia — peak memory stays one [CHUNK, K]
    block regardless of N, K, or R."""
    seeds = (
        derive_restart_seeds(pixels.shape[0], first_index, restarts, weight)
        if restarts > 1
        else None
    )
    k_act = jnp.asarray(k if k_active is None else k_active, jnp.int32)
    valid = jnp.arange(k) < k_act

    def one(fi):
        cents = plusplus_init(
            pixels, k, fi, k_active=k_active, weight=weight, metric=metric
        )
        return lloyd_chunked(
            pixels, cents, convergence=convergence,
            max_iterations=max_iterations, k_active=k_active, weight=weight,
            metric=metric,
        )

    if restarts <= 1:
        return one(first_index)

    def inertia(cents):
        n = pixels.shape[0]
        n_pad = (n + _CHUNK_PIXELS - 1) // _CHUNK_PIXELS * _CHUNK_PIXELS
        padded = jnp.pad(pixels, ((0, n_pad - n), (0, 0)))
        w = jnp.ones(n, jnp.float32) if weight is None else weight
        wpad = jnp.pad(w, (0, n_pad - n))

        def chunk_sum(args):
            px, cw = args
            d2 = _masked_d2(px, cents, valid, metric)
            return jnp.sum(jnp.min(d2, axis=1) * cw)

        sums = jax.lax.map(
            chunk_sum,
            (padded.reshape(-1, _CHUNK_PIXELS, 3),
             wpad.reshape(-1, _CHUNK_PIXELS)),
        )
        return jnp.sum(sums)

    cents_runs, iters_runs, inert_runs = [], [], []
    for r in range(restarts):
        cents, iters = one(seeds[r])
        cents_runs.append(cents)
        iters_runs.append(iters)
        inert_runs.append(inertia(cents))
    best = jnp.argmin(jnp.stack(inert_runs))
    return jnp.stack(cents_runs)[best], jnp.stack(iters_runs)[best]


@partial(jax.jit, static_argnames=("k", "max_iterations", "metric"))
def fit(
    pixels: jnp.ndarray,
    k: int,
    first_index,
    convergence: float = LAB_CONVERGENCE,
    max_iterations: int = MAX_ITERATIONS,
    k_active: jnp.ndarray | int | None = None,
    weight: jnp.ndarray | None = None,
    metric: str = "cie94",
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Seed + Lloyd: the full `extract_palette_kmeans` compute
    (`core/src/operations.rs:15-88`) minus the resize/convert edges.

    `pixels[N,3]` Lab -> (`centroids[k,3]` Lab, iterations). `weight[N]`
    (optional) masks pad pixels out of seeding and updates (see
    `plusplus_init` / `lloyd`; `fit_large` supports the same via the
    kernel's weight plane).
    """
    centroids = plusplus_init(
        pixels, k, first_index, k_active=k_active, weight=weight, metric=metric
    )
    return lloyd(
        pixels,
        centroids,
        convergence=convergence,
        max_iterations=max_iterations,
        k_active=k_active,
        weight=weight,
        metric=metric,
    )
