"""Multi-device k-means: pixel-axis sharding with explicit collectives.

The reference has no multi-device story (`SURVEY.md` §2.3); this module is
the TPU-native extension that makes one image's pixel axis scale across
chips. Design (the standard JAX SPMD recipe):

- pixels `[N, 3]` are sharded over the mesh's `pixel` axis (`shard_map`);
- the k-means++ farthest-point pick becomes: local argmax ->
  `all_gather` of per-shard (value, global index) winners -> global
  lexicographic pick (identical tie-breaking to single-device `argmax`,
  i.e. smallest index among maxima);
- Lloyd's per-cluster (sum, count) accumulation becomes local one-hot
  partial sums + `psum` over the pixel axis — the collective rides ICI;
- convergence votes are computed redundantly on every shard from the
  psum'd centroids, so the `lax.while_loop` stays fully device-resident
  with no host synchronisation, exactly like the single-device path.

A leading batch axis (frames / k-values) shards over the mesh's `data`
axis with no collectives (pure DP); inside each data shard the pixel-axis
fit is vmapped over the local batch.

Padding: shard counts must divide N, so callers pad pixels and pass a
`weight` mask (1 = real pixel, 0 = padding). Padding never wins a seeding
argmax (its distance is forced to -1) and contributes nothing to sums.

Numerical note: distributed psum of per-shard partial sums adds f32
rounding differences vs the single-device reduction; palettes agree within
float tolerance, bit-exactness is not guaranteed (same caveat as any
reduction re-ordering).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from kmeans_tpu.models.kmeans import (
    CONVERGENCE_CHECK_EVERY,
    LAB_CONVERGENCE,
    MAX_ITERATIONS,
    derive_restart_seeds,
)
from kmeans_tpu.ops.delta_e import metric_fns
from kmeans_tpu.parallel.mesh import DATA_AXIS, PIXEL_AXIS

_BIG = 3.4e38  # larger than any CIE94^2; plain float so import stays device-free


def _global_argmax(value_local, axis_name):
    """(value, global flat index) of the global max of a sharded vector,
    with single-device tie-breaking (first max wins)."""
    n_local = value_local.shape[0]
    shard = jax.lax.axis_index(axis_name)
    local_idx = jnp.argmax(value_local)
    local_val = value_local[local_idx]
    global_idx = shard * n_local + local_idx

    vals = jax.lax.all_gather(local_val, axis_name)  # [D]
    idxs = jax.lax.all_gather(global_idx, axis_name)  # [D]
    best_val = jnp.max(vals)
    winner_idx = jnp.min(jnp.where(vals == best_val, idxs, jnp.int32(2**31 - 1)))
    return best_val, winner_idx


def _take_global(pixels_local, global_idx, axis_name):
    """Fetch pixel `global_idx` from whichever shard owns it (psum of a
    masked local gather)."""
    n_local = pixels_local.shape[0]
    shard = jax.lax.axis_index(axis_name)
    lo = shard * n_local
    owns = jnp.logical_and(global_idx >= lo, global_idx < lo + n_local)
    local = pixels_local[jnp.clip(global_idx - lo, 0, n_local - 1)]
    return jax.lax.psum(jnp.where(owns, local, 0.0), axis_name)


def _seed_local(
    pixels_local: jnp.ndarray,
    weight_local: jnp.ndarray,
    k: int,
    first_index,
    k_active,
    axis_name: str,
    metric: str = "cie94",
) -> jnp.ndarray:
    """Distributed farthest-point seeding (the shard_map body shared by
    every sharded trainer): local argmax -> all_gather of per-shard
    winners -> global pick with single-device tie-breaking, mirroring
    `models.kmeans.plusplus_init` (plus_plus_init.wgsl:70-187)."""
    _, dist_sq = metric_fns(metric)
    c0 = _take_global(pixels_local, jnp.asarray(first_index, jnp.int32), axis_name)
    dmap = dist_sq(pixels_local, c0[None, :])
    dmap = jnp.where(weight_local > 0, dmap, -1.0)

    centroids = jnp.zeros((k, 3), jnp.float32).at[0].set(c0)

    def seed_body(j, carry):
        centroids, dmap = carry
        _, idx = _global_argmax(dmap, axis_name)
        cand = _take_global(pixels_local, idx, axis_name)
        take = j < k_active
        new_c = jnp.where(take, cand, centroids[j])
        centroids = centroids.at[j].set(new_c)
        new_d = jnp.minimum(dmap, dist_sq(pixels_local, new_c[None, :]))
        new_d = jnp.where(weight_local > 0, new_d, -1.0)
        dmap = jnp.where(take, new_d, dmap)
        return centroids, dmap

    if k > 1:
        centroids, _ = jax.lax.fori_loop(1, k, seed_body, (centroids, dmap))
    return centroids


def _fit_local(
    pixels_local: jnp.ndarray,
    weight_local: jnp.ndarray,
    k: int,
    first_index,
    convergence: float,
    k_active,
    axis_name: str,
    metric: str = "cie94",
):
    """Per-shard body of the pixel-sharded fit (runs under shard_map)."""
    k_active = jnp.asarray(k if k_active is None else k_active, jnp.int32)
    valid = jnp.arange(k) < k_active
    dist, dist_sq = metric_fns(metric)

    centroids = _seed_local(
        pixels_local, weight_local, k, first_index, k_active, axis_name, metric
    )

    # --- Lloyd ---
    def assign(cents):
        d2 = dist_sq(pixels_local[:, None, :], cents[None, :, :])
        d2 = jnp.where(valid[None, :], d2, _BIG)
        return jnp.argmin(d2, axis=1).astype(jnp.int32)

    assign0 = assign(centroids)

    def cond(carry):
        _, _, converged, i = carry
        last = i - 1
        checked = jnp.logical_and(last > 0, last % CONVERGENCE_CHECK_EVERY == 0)
        return jnp.logical_and(
            i < MAX_ITERATIONS, jnp.logical_not(jnp.logical_and(checked, converged))
        )

    def body(carry):
        centroids, assignments, _, i = carry
        onehot = jax.nn.one_hot(assignments, k, dtype=jnp.float32)
        onehot = onehot * weight_local[:, None]
        local_sums = jax.lax.dot_general(
            onehot,
            pixels_local,
            dimension_numbers=(((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        local_counts = jnp.sum(onehot, axis=0)
        sums = jax.lax.psum(local_sums, axis_name)  # ICI collective
        counts = jax.lax.psum(local_counts, axis_name)
        nonempty = counts > 0
        new_centroids = jnp.where(
            nonempty[:, None], sums / jnp.maximum(counts, 1.0)[:, None], centroids
        )
        moved = dist(new_centroids, centroids)
        votes = jnp.logical_and(nonempty, moved < convergence)
        converged = jnp.all(jnp.logical_or(votes, jnp.logical_not(valid)))
        return new_centroids, assign(new_centroids), converged, i + 1

    centroids, _, _, iters = jax.lax.while_loop(
        cond, body, (centroids, assign0, jnp.asarray(False), jnp.int32(0))
    )
    return centroids, iters


def _fit_local_restarts(
    pixels_local: jnp.ndarray,
    weight_local: jnp.ndarray,
    seeds: jnp.ndarray,  # [R] replicated flat seed indices
    k: int,
    convergence: float,
    k_active,
    axis_name: str,
    metric: str = "cie94",
):
    """Multi-restart body: vmap `_fit_local` over the seed vector (the
    collectives batch over the restart axis, exactly like
    `fit_sharded_batch`'s per-frame vmap), then pick the lowest-weighted-
    inertia run with a psum'd distance sum — the distributed counterpart
    of `models/kmeans.py::fit_restarts`' winner selection."""
    k_act = jnp.asarray(k if k_active is None else k_active, jnp.int32)
    valid = jnp.arange(k) < k_act
    _, dist_sq = metric_fns(metric)

    def one(fi):
        return _fit_local(
            pixels_local, weight_local, k, fi, convergence, k_active,
            axis_name, metric,
        )

    cents_v, iters_v = jax.vmap(one)(seeds)  # [R, k, 3], [R]

    def inertia(cents):
        d2 = dist_sq(pixels_local[:, None, :], cents[None, :, :])
        d2 = jnp.where(valid[None, :], d2, _BIG)
        dmin = jnp.min(d2, axis=1) * weight_local
        return jax.lax.psum(jnp.sum(dmin), axis_name)

    best = jnp.argmin(jax.vmap(inertia)(cents_v))
    return cents_v[best], iters_v[best]


def _converged_vote(new_centroids, centroids, valid, counts, convergence, dist):
    """The reference's convergence protocol on psum'd (replicated) totals:
    empty clusters vote 0, inactive clusters always pass
    (choose_centroid.wgsl:185-197)."""
    nonempty = counts > 0
    updated = jnp.where(
        nonempty[:, None],
        new_centroids,
        centroids,
    )
    moved = dist(updated, centroids)
    votes = jnp.logical_and(nonempty, moved < convergence)
    return updated, jnp.all(jnp.logical_or(votes, jnp.logical_not(valid)))


def _fit_local_pallas(
    pixels_local: jnp.ndarray,
    weight_local: jnp.ndarray,
    k: int,
    first_index,
    convergence: float,
    k_active,
    axis_name: str,
    metric: str = "cie94",
    fast: bool = False,
    plane_dtype=None,
    interpret: bool = False,
):
    """Per-shard body of the Pallas-accumulator sharded fit: each shard
    runs `ops.kernels.lloyd_accumulate` on its LOCAL plane store and only
    the tiny `[KP, 4]` (sum, count) totals cross the ICI via `psum`
    (~KP x 16 bytes — negligible next to the per-shard kernel pass). The
    multi-chip twin of `models.kmeans.lloyd_pallas`: no `[N_local, K]`
    one-hot ever exists, so full-resolution sharded training keeps the
    single-chip accumulator's memory bound AND its measured 1.5-5.2x/iter
    kernel speed per chip (docs/perf.md) instead of the one-hot XLA
    protocol `_fit_local` runs. Seeding and the convergence vote reuse the
    distributed protocol (the vote is computed redundantly per shard from
    the psum'd totals, so the `while_loop` stays uniform across shards
    with zero host syncs). Replaces choose_centroid.wgsl:73-206's
    single-device pass, distributed.

    `fast` engages the factorized CIE94 distance — or, under CIEDE2000,
    the pruned two-pass tier — for k > 16 (same gate as `lloyd_pallas`);
    `plane_dtype="bfloat16"` stores half-width training planes (the
    `train_dtype` opt-in, threaded through the sharded path so multi-chip
    honors it like single-chip)."""
    from kmeans_tpu.ops.kernels import (
        lloyd_accumulate,
        pack_lab_planes,
        pack_plane,
    )

    k_act = jnp.asarray(k if k_active is None else k_active, jnp.int32)
    valid = jnp.arange(k) < k_act
    dist, _ = metric_fns(metric)
    fast = bool(fast) and k > 16 and metric in ("cie94", "cie2000")

    centroids0 = _seed_local(
        pixels_local, weight_local, k, first_index, k_act, axis_name, metric
    )
    planes, n_valid = pack_lab_planes(
        pixels_local,
        dtype=None if plane_dtype is None else jnp.dtype(plane_dtype),
    )
    weight_planes = pack_plane(weight_local)

    def cond(carry):
        _, converged, i = carry
        last = i - 1
        checked = jnp.logical_and(last > 0, last % CONVERGENCE_CHECK_EVERY == 0)
        return jnp.logical_and(
            i < MAX_ITERATIONS,
            jnp.logical_not(jnp.logical_and(checked, converged)),
        )

    def body(carry):
        centroids, _, i = carry
        totals = lloyd_accumulate(
            planes,
            centroids,
            n_valid,
            k_active=k_act,
            weight_planes=weight_planes,
            interpret=interpret,
            metric=metric,
            fast=fast,
        )  # [K, 4] per-shard partials
        totals = jax.lax.psum(totals, axis_name)  # ICI collective, ~K*16 B
        sums, counts = totals[:, :3], totals[:, 3]
        new_centroids = sums / jnp.maximum(counts, 1.0)[:, None]
        updated, converged = _converged_vote(
            new_centroids, centroids, valid, counts, convergence, dist
        )
        return updated, converged, i + 1

    centroids, _, iters = jax.lax.while_loop(
        cond, body, (centroids0, jnp.asarray(False), jnp.int32(0))
    )
    return centroids, iters


def _psum_inertia_pallas(
    pixels_local, weight_local, cents, k_act, axis_name, metric, interpret,
    fast=False,
):
    """Weighted within-cluster inertia of one run, via the accumulator's
    `emit_inertia` column psum'd over the pixel axis — the distributed
    counterpart of `fit_large_restarts`' winner-pick pass (always f32
    planes: run comparison must not inherit plane quantization). `fast`
    keeps the pruned tier for cie2000 (exact distances to the
    pruned-assigned centroids; the exact unrolled cie2000 kernel's
    130/351 s compile is what the tier removes) — cie94 always exact,
    like `fit_large_restarts`."""
    from kmeans_tpu.ops.kernels import (
        lloyd_accumulate,
        pack_lab_planes,
        pack_plane,
    )

    planes, n_valid = pack_lab_planes(pixels_local)
    totals = lloyd_accumulate(
        planes,
        cents,
        n_valid,
        k_active=k_act,
        weight_planes=pack_plane(weight_local),
        interpret=interpret,
        metric=metric,
        emit_inertia=True,
        fast=fast and metric == "cie2000",
    )  # [K, 5]
    return jax.lax.psum(jnp.sum(totals[:, 4]), axis_name)


def _fit_local_pallas_restarts(
    pixels_local: jnp.ndarray,
    weight_local: jnp.ndarray,
    seeds: jnp.ndarray,  # [R] replicated flat seed indices
    k: int,
    convergence: float,
    k_active,
    axis_name: str,
    metric: str = "cie94",
    fast: bool = False,
    plane_dtype=None,
    interpret: bool = False,
):
    """Multi-restart Pallas sharded fit: sequential per-shard restarts
    (vmap of pallas_call cannot lower on Mosaic, and sequential keeps HBM
    at one run's state — the same design as `fit_large_restarts`), winner
    by psum'd accumulator inertia."""
    k_act = jnp.asarray(k if k_active is None else k_active, jnp.int32)
    restarts = seeds.shape[0]

    cents_runs, iters_runs, inert_runs = [], [], []
    for r in range(restarts):
        cents, iters = _fit_local_pallas(
            pixels_local, weight_local, k, seeds[r], convergence, k_active,
            axis_name, metric, fast=fast, plane_dtype=plane_dtype,
            interpret=interpret,
        )
        cents_runs.append(cents)
        iters_runs.append(iters)
        inert_runs.append(
            _psum_inertia_pallas(
                pixels_local, weight_local, cents, k_act, axis_name, metric,
                interpret, fast=fast,
            )
        )
    best = jnp.argmin(jnp.stack(inert_runs))
    return jnp.stack(cents_runs)[best], jnp.stack(iters_runs)[best]


def _fit_local_chunked(
    pixels_local: jnp.ndarray,
    weight_local: jnp.ndarray,
    k: int,
    first_index,
    convergence: float,
    k_active,
    axis_name: str,
    metric: str = "cie94",
):
    """Per-shard body of the memory-bounded sharded fit: the row-chunked
    XLA trainer (`models.kmeans.lloyd_chunked`'s building blocks) on local
    pixels with the per-chunk (sum, count) partials psum'd over the pixel
    axis. Serves the trainings the Pallas accumulator cannot (CPU meshes,
    CIEDE2000 at k > 64, k > ACCUM_MAX_K) without `_fit_local`'s
    `[N_local, K]` one-hot — peak memory stays one [CHUNK, K] block per
    shard regardless of the full-resolution pixel count."""
    from kmeans_tpu.models.kmeans import _assign_chunked, _update_chunked

    k_act = jnp.asarray(k if k_active is None else k_active, jnp.int32)
    valid = jnp.arange(k) < k_act
    dist, _ = metric_fns(metric)

    centroids0 = _seed_local(
        pixels_local, weight_local, k, first_index, k_act, axis_name, metric
    )
    assign0 = _assign_chunked(pixels_local, centroids0, valid, metric)

    def cond(carry):
        _, _, converged, i = carry
        last = i - 1
        checked = jnp.logical_and(last > 0, last % CONVERGENCE_CHECK_EVERY == 0)
        return jnp.logical_and(
            i < MAX_ITERATIONS,
            jnp.logical_not(jnp.logical_and(checked, converged)),
        )

    def body(carry):
        centroids, assign, _, i = carry
        sums, counts = _update_chunked(pixels_local, assign, k, weight_local)
        sums = jax.lax.psum(sums, axis_name)
        counts = jax.lax.psum(counts, axis_name)
        new_centroids = sums / jnp.maximum(counts, 1.0)[:, None]
        updated, converged = _converged_vote(
            new_centroids, centroids, valid, counts, convergence, dist
        )
        assign = _assign_chunked(pixels_local, updated, valid, metric)
        return updated, assign, converged, i + 1

    centroids, _, _, iters = jax.lax.while_loop(
        cond, body, (centroids0, assign0, jnp.asarray(False), jnp.int32(0))
    )
    return centroids, iters


def _fit_local_chunked_restarts(
    pixels_local: jnp.ndarray,
    weight_local: jnp.ndarray,
    seeds: jnp.ndarray,
    k: int,
    convergence: float,
    k_active,
    axis_name: str,
    metric: str = "cie94",
):
    """Sequential multi-restart for the chunked sharded trainer (R x the
    one-hot memory would defeat the chunking); winner by a chunked
    min-distance inertia psum'd over the pixel axis — the distributed
    counterpart of `fit_chunked`'s restart loop."""
    from kmeans_tpu.models.kmeans import _CHUNK_PIXELS, _masked_d2

    k_act = jnp.asarray(k if k_active is None else k_active, jnp.int32)
    valid = jnp.arange(k) < k_act
    restarts = seeds.shape[0]

    def inertia(cents):
        n = pixels_local.shape[0]
        n_pad = (n + _CHUNK_PIXELS - 1) // _CHUNK_PIXELS * _CHUNK_PIXELS
        padded = jnp.pad(pixels_local, ((0, n_pad - n), (0, 0)))
        wpad = jnp.pad(weight_local, (0, n_pad - n))

        def chunk_sum(args):
            px, cw = args
            d2 = _masked_d2(px, cents, valid, metric)
            return jnp.sum(jnp.min(d2, axis=1) * cw)

        sums = jax.lax.map(
            chunk_sum,
            (padded.reshape(-1, _CHUNK_PIXELS, 3),
             wpad.reshape(-1, _CHUNK_PIXELS)),
        )
        return jax.lax.psum(jnp.sum(sums), axis_name)

    cents_runs, iters_runs, inert_runs = [], [], []
    for r in range(restarts):
        cents, iters = _fit_local_chunked(
            pixels_local, weight_local, k, seeds[r], convergence, k_active,
            axis_name, metric,
        )
        cents_runs.append(cents)
        iters_runs.append(iters)
        inert_runs.append(inertia(cents))
    best = jnp.argmin(jnp.stack(inert_runs))
    return jnp.stack(cents_runs)[best], jnp.stack(iters_runs)[best]


def fit_sharded(
    mesh,
    pixels: jnp.ndarray,
    weight: jnp.ndarray,
    k: int,
    first_index,
    convergence: float = LAB_CONVERGENCE,
    k_active=None,
    metric: str = "cie94",
    restarts: int = 1,
    trainer: str = "onehot",
    fast: bool = False,
    plane_dtype=None,
    interpret: bool = False,
):
    """Pixel-sharded fit of a single image: `pixels[N, 3]` sharded over the
    mesh's pixel axis (N must divide by the pixel-axis size; pad + weight).

    `trainer` selects the per-shard Lloyd protocol (the sharded mirrors of
    `api._fit_auto`'s routing — see `api.ImageProcessor`):

    - `"onehot"` (default): the one-hot MXU matmul — bit-compatible with
      the small-training single-chip protocol; `[N_local, K]` one-hot per
      iteration, so only for shrunk trainings.
    - `"pallas"`: per-shard `lloyd_accumulate` Pallas kernel + psum of the
      tiny `[K, 4]` totals — full-resolution sharded training at the
      single-chip kernel's speed and memory floor (TPU meshes;
      `interpret=True` for CPU-mesh tests). `fast` / `plane_dtype` thread
      the accumulator's opt-ins through.
    - `"chunked"`: row-chunked XLA update + psum — the memory-bounded
      fallback (CPU meshes, CIEDE2000 k > 64, k > ACCUM_MAX_K).

    With `restarts > 1`, R independent seedings (restart 0 = the caller's
    reference seed; `derive_restart_seeds`) train inside the shard_map and
    the lowest-inertia run wins — vmapped on the onehot trainer,
    SEQUENTIAL on pallas/chunked (vmap of pallas_call cannot lower on
    Mosaic, and R x the chunked state would defeat its memory bound),
    exactly like the single-chip `fit_restarts` vs
    `fit_large_restarts`/`fit_chunked` split.

    Returns replicated `(centroids[k, 3], iterations)`.
    """
    if trainer not in ("onehot", "pallas", "chunked"):
        raise ValueError(f"unknown trainer {trainer!r}")
    if restarts > 1:
        # Seed derivation runs outside the shard_map on the (tiny, shrunk)
        # training inputs; XLA gathers the sharded weight vector once.
        seeds = derive_restart_seeds(
            pixels.shape[0], first_index, restarts, weight
        )
        if trainer == "pallas":
            local = partial(
                _fit_local_pallas_restarts,
                k=k,
                convergence=convergence,
                k_active=k_active,
                axis_name=PIXEL_AXIS,
                metric=metric,
                fast=fast,
                plane_dtype=plane_dtype,
                interpret=interpret,
            )
        elif trainer == "chunked":
            local = partial(
                _fit_local_chunked_restarts,
                k=k,
                convergence=convergence,
                k_active=k_active,
                axis_name=PIXEL_AXIS,
                metric=metric,
            )
        else:
            local = partial(
                _fit_local_restarts,
                k=k,
                convergence=convergence,
                k_active=k_active,
                axis_name=PIXEL_AXIS,
                metric=metric,
            )
        fn = jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P(PIXEL_AXIS, None), P(PIXEL_AXIS), P()),
            out_specs=(P(), P()),
            check_vma=False,
        )
        return fn(pixels, weight, seeds)
    if trainer == "pallas":
        local = partial(
            _fit_local_pallas,
            k=k,
            first_index=first_index,
            convergence=convergence,
            k_active=k_active,
            axis_name=PIXEL_AXIS,
            metric=metric,
            fast=fast,
            plane_dtype=plane_dtype,
            interpret=interpret,
        )
    elif trainer == "chunked":
        local = partial(
            _fit_local_chunked,
            k=k,
            first_index=first_index,
            convergence=convergence,
            k_active=k_active,
            axis_name=PIXEL_AXIS,
            metric=metric,
        )
    else:
        local = partial(
            _fit_local,
            k=k,
            first_index=first_index,
            convergence=convergence,
            k_active=k_active,
            axis_name=PIXEL_AXIS,
            metric=metric,
        )
    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(PIXEL_AXIS, None), P(PIXEL_AXIS)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return fn(pixels, weight)


def fit_sharded_batch(
    mesh,
    pixels: jnp.ndarray,
    weight: jnp.ndarray,
    k: int,
    first_index,
    k_actives: jnp.ndarray,
    convergence: float = LAB_CONVERGENCE,
    metric: str = "cie94",
    restarts: int = 1,
    trainer: str = "onehot",
    fast: bool = False,
    plane_dtype=None,
    interpret: bool = False,
):
    """Batched fit: `pixels[B, N, 3]` with batch over the data axis (DP)
    and pixels over the pixel axis (SP; SURVEY §2.3's DP x SP row).
    `k_actives[B]` masks per-item k.

    `trainer`/`restarts`/`fast`/`plane_dtype` carry `fit_sharded`'s full
    trainer surface (round-4): `"onehot"` vmaps the bit-compatible MXU
    protocol over the local batch (shrunk trainings); `"pallas"` /
    `"chunked"` run SEQUENTIAL per-frame large-N trainings inside the
    shard_map — vmap of pallas_call cannot lower on Mosaic, and B x the
    chunked state would defeat its memory bound, so a batch of full-res
    frames keeps per-frame kernel memory behavior (the same design as
    `_fit_local_pallas_restarts` / the single-chip `lax.map` heavy
    buckets). With `restarts > 1`, each frame derives its own pad-aware
    seeds (`derive_restart_seeds` on its weight row) and its
    lowest-inertia run wins, exactly like `fit_sharded`. `first_index`
    may be a scalar or a `[B]` array (per-frame reference seeds — each
    frame of an image batch has its own `reference_seed_index`).

    Returns `centroids[B, k, 3]` (replicated over the pixel axis).
    """
    if trainer not in ("onehot", "pallas", "chunked"):
        raise ValueError(f"unknown trainer {trainer!r}")
    B = pixels.shape[0]
    firsts = jnp.broadcast_to(
        jnp.asarray(first_index, jnp.int32).reshape(-1), (B,)
    )
    need_seeds = restarts > 1
    if need_seeds:
        # Per-frame pad-aware seeds [B, R], derived OUTSIDE the shard_map
        # on the (tiny, shrunk) training inputs like `fit_sharded`.
        seeds = jax.vmap(
            lambda w, f: derive_restart_seeds(
                pixels.shape[1], f, restarts, w
            )
        )(weight, firsts)

    def local(px, wt, ka, fi, *maybe_seeds):
        # px: [B_local, N_local, 3].
        if trainer == "onehot":
            # vmap the pixel-sharded fit over the local batch; collectives
            # inside vmap broadcast over the batch.
            if need_seeds:
                (sd,) = maybe_seeds
                fitr = partial(
                    _fit_local_restarts,
                    k=k,
                    convergence=convergence,
                    axis_name=PIXEL_AXIS,
                    metric=metric,
                )
                cents, _ = jax.vmap(
                    lambda p, w, s, a: fitr(p, w, s, k_active=a)
                )(px, wt, sd, ka)
            else:
                fit1 = partial(
                    _fit_local,
                    k=k,
                    convergence=convergence,
                    axis_name=PIXEL_AXIS,
                    metric=metric,
                )
                cents, _ = jax.vmap(
                    lambda p, w, a, f: fit1(p, w, first_index=f, k_active=a)
                )(px, wt, ka, fi)
            return cents
        outs = []
        for b in range(px.shape[0]):  # sequential per-frame (see docstring)
            if trainer == "pallas":
                if need_seeds:
                    (sd,) = maybe_seeds
                    c, _ = _fit_local_pallas_restarts(
                        px[b], wt[b], sd[b], k=k, convergence=convergence,
                        k_active=ka[b], axis_name=PIXEL_AXIS, metric=metric,
                        fast=fast, plane_dtype=plane_dtype,
                        interpret=interpret,
                    )
                else:
                    c, _ = _fit_local_pallas(
                        px[b], wt[b], k=k, first_index=fi[b],
                        convergence=convergence, k_active=ka[b],
                        axis_name=PIXEL_AXIS, metric=metric, fast=fast,
                        plane_dtype=plane_dtype, interpret=interpret,
                    )
            else:
                if need_seeds:
                    (sd,) = maybe_seeds
                    c, _ = _fit_local_chunked_restarts(
                        px[b], wt[b], sd[b], k=k, convergence=convergence,
                        k_active=ka[b], axis_name=PIXEL_AXIS, metric=metric,
                    )
                else:
                    c, _ = _fit_local_chunked(
                        px[b], wt[b], k=k, first_index=fi[b],
                        convergence=convergence, k_active=ka[b],
                        axis_name=PIXEL_AXIS, metric=metric,
                    )
            outs.append(c)
        return jnp.stack(outs)

    in_specs = [
        P(DATA_AXIS, PIXEL_AXIS, None),
        P(DATA_AXIS, PIXEL_AXIS),
        P(DATA_AXIS),
        P(DATA_AXIS),
    ]
    operands = [pixels, weight, k_actives, firsts]
    if need_seeds:
        in_specs.append(P(DATA_AXIS, None))
        operands.append(seeds)
    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=P(DATA_AXIS, None, None),
        check_vma=False,
    )
    return fn(*operands)
