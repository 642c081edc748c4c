"""All-pairs DTW driver: pair-block scheduling over the device (SS3 row 6).

The reference iterates (i, j) pairs in a CPU hot loop; the TPU-native design
dispatches whole *pair blocks* per device call so per-pair Python overhead is
amortized away (SURVEY.md SS8 'the hard parts'):

* Upper-triangle pairs are bucketed by max(len_i, len_j) into a small set of
  padded lengths (multiples of `bucket_step`) — one XLA compilation per
  (bucket, batch) shape, reused across the whole run.
* Each block gathers its sequences *on device* from the resident feature
  tensor (no host round-trip per pair) and runs the batched wavefront DTW.
* Optional block persistence makes the run restartable at block granularity
  (SURVEY.md SS6.3-6.4): the all-pairs job is embarrassingly restartable.
* Multi-chip: blocks round-robin across a 1-D "pairs" mesh axis via explicit
  device placement of the index vectors (parallel/mesh.py); each chip owns a
  slice of pair space and results are gathered on host.
"""

from __future__ import annotations

import hashlib
import os
import queue
import threading
import time
from functools import partial
from pathlib import Path
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from audio_pattern_discovery_tpu import native
from audio_pattern_discovery_tpu.config import DTWConfig
from audio_pattern_discovery_tpu.ops.dtw import dtw_batch
from audio_pattern_discovery_tpu.ops.dtw_long import dtw_long_batch
from audio_pattern_discovery_tpu.ops.dtw_pallas import (
    MAX_KERNEL_SEQ_LEN,
    diag_class_bounds,
    dtw_batch_pallas,
    dtw_tile_lane_diag_pairs,
    dtw_tile_lane_full_pairs,
    dtw_tile_lane_pairs,
    dtw_tile_pairs,
    effective_lane_stack,
    dtw_tile_stripe_pairs,
    lane_full_geometry,
    lane_geometry,
    pallas_supported,
    scan_len_diff_classes,
    tile_geometry,
    tile_rep_lengths,
    tile_stripe_geometry,
)


# Direct (original-order) block scatter is used while D fits comfortably
# in host cache-friendly territory; above this the per-block random-row
# writes degrade superlinearly (measured: K=20k/1.6 GB fine and fully
# hidden under device wait, K=40k/6.7 GB spent 100-280 s scattering) and
# the contiguous-sorted + one-final-gather strategy wins.
_DIRECT_SCATTER_BYTES = 2 * 1024**3


def _long_block_shape(bucket: int, cap: int = 256) -> tuple[int, int]:
    """(block, padded_len) for the blocked long-sequence path: a healthy
    tile size with the bucket padded UP to a multiple of it (dtw_long needs
    S % block == 0; its +inf length masking makes the padding free), never
    a degenerate 1-element block from an odd bucket length."""
    blk = min(cap, 1 << max(bucket - 1, 1).bit_length())
    padded = -(-bucket // blk) * blk
    return int(blk), int(padded)


def _on_tpu() -> bool:
    return jax.devices()[0].platform not in ("cpu", "gpu")


def bucket_lengths(lengths: np.ndarray, step: int, max_len: int) -> np.ndarray:
    """Smallest multiple of `step` >= each length (capped at max_len)."""
    b = np.minimum(-(-lengths // step) * step, max_len)
    return np.maximum(b, step)


def enumerate_pair_blocks(
    lengths: np.ndarray,
    pair_batch: int,
    bucket_step: int,
    max_len: int,
    band: int | None = None,
    auto_widen: bool = True,
    new_from: int | None = None,
):
    """Yield (row_cap, bucket_len, max_len_diff, ii, jj) blocks covering the
    upper triangle.

    `new_from`: incremental-update filter — only pairs with at least one
    index >= new_from are emitted (pairs among indices < new_from are
    already known to the caller; SS6.4 incremental corpus growth).

    DTW is symmetric, so every pair is oriented shorter-first (ii = shorter
    sequence): the kernel's sequential row loop then runs only row_cap
    steps.  Pairs are bucketed by the longer side's padded length (the lane
    width) and sub-bucketed by the shorter side's, so blocks get tight
    static row capacities.  Within each shape, pairs are further grouped by
    their |len_i - len_j| routing class (ops.dtw_pallas.scan_len_diff_classes):
    the emitted `max_len_diff` is the class's canonical upper bound, so the
    stripe kernel's width applies per group with only a handful of distinct
    static values (compiles cost minutes on this backend).  Deterministic
    order: (column bucket, row bucket, class) ascending, pairs in the
    row-major order of each length-sorted group pair.
    """
    K = len(lengths)
    lengths = np.asarray(lengths)
    buckets = bucket_lengths(lengths, bucket_step, max_len)
    # This enumeration sits on the measured critical path of the all-pairs
    # job (a naive 50M-pair triu + full-array orientation/bucket masks cost
    # 12-35 s of single-core time on this host; scale_bench "enumerate").
    # Group-wise construction touches only K-sized arrays until the final
    # per-block index output: sequences are grouped by bucket with each
    # group length-sorted, so (a) a group-pair's pairs are a direct
    # repeat/tile cartesian (same-bucket: triangle in sorted positions), and
    # (b) the shorter-first orientation holds by construction — no per-pair
    # swap/masks.  Streaming per group-pair also means the first block
    # yields in milliseconds, overlapping the rest with device work.
    order = np.argsort(lengths, kind="stable").astype(np.int32)
    b_sorted = buckets[order]
    uniq = [int(b) for b in np.unique(buckets)]
    groups = {b: order[b_sorted == b] for b in uniq}

    for bb in uniq:
        gb = groups[bb]
        # At most TWO row capacities per column bucket (full and half):
        # every distinct (row, col) shape is a fresh XLA compile — minutes
        # on a remote backend — so finer row buckets cost more in compiles
        # than their extra row savings return.
        half = min(bb, max(bucket_step, -(-(bb // 2) // bucket_step) * bucket_step))
        classes = scan_len_diff_classes(bb, band, auto_widen)
        for ba in uniq:
            if ba > bb:
                break
            ga = groups[ba]
            rb = half if (ba <= half < bb) else bb
            if ba == bb:
                n = len(gb)
                if n < 2:
                    continue
                counts = np.arange(n - 1, 0, -1)
                iu = np.repeat(np.arange(n - 1, dtype=np.int32), counts)
                ju = np.concatenate(
                    [np.arange(i + 1, n, dtype=np.int32) for i in range(n - 1)]
                )
                ii, jj = gb[iu], gb[ju]
            else:
                if not (len(ga) and len(gb)):
                    continue
                ii = np.repeat(ga, len(gb))
                jj = np.tile(gb, len(ga))
            if new_from is not None:
                keep = (ii >= new_from) | (jj >= new_from)
                if not keep.any():
                    continue
                ii, jj = ii[keep], jj[keep]
            if len(classes) == 1:
                splits = [(int(classes[0]), ii, jj)]
            else:
                dd = lengths[jj] - lengths[ii]                 # >= 0
                cls = np.searchsorted(np.asarray(classes), dd)
                splits = []
                for c, bound in enumerate(classes):
                    m = cls == c
                    if m.any():
                        splits.append((int(bound), ii[m], jj[m]))
            for bound, ic, jc in splits:
                for s in range(0, len(ic), pair_batch):
                    yield (
                        rb,
                        bb,
                        bound,
                        ic[s : s + pair_batch],
                        jc[s : s + pair_batch],
                    )


@partial(
    jax.jit,
    static_argnames=(
        "row_cap",
        "bucket",
        "metric",
        "band",
        "auto_widen",
        "normalize",
        "matmul_dtype",
        "use_pallas",
        "max_len_diff",
        "band_mode",
    ),
)
def _dtw_block(
    features: jax.Array,      # [K, L, d] device-resident
    lengths: jax.Array,       # [K]
    ii: jax.Array,            # [B] (shorter sequence of each pair)
    jj: jax.Array,            # [B] (longer sequence)
    *,
    row_cap: int,
    bucket: int,
    metric: str,
    band: int | None,
    auto_widen: bool,
    normalize: str,
    matmul_dtype: str | None,
    use_pallas: bool,
    max_len_diff: int | None = None,
    band_mode: str = "widen",
) -> jax.Array:
    # Pairs arrive shorter-first; the kernel's sequential row loop runs only
    # row_cap (<= bucket) steps, the main latency saving of the orientation.
    a = features[ii, :row_cap]
    b = features[jj, :bucket]
    la = lengths[ii]
    lb = lengths[jj]
    if use_pallas:
        # The per-pair Mosaic kernels implement "widen" only; diag-banded
        # jobs ride the lane kernel through the tiled scheduler, and their
        # legacy fallback is the pure-JAX path (caller passes
        # use_pallas=False).
        assert band_mode == "widen", band_mode
        return dtw_batch_pallas(
            a,
            b,
            la,
            lb,
            metric=metric,
            band=band,
            auto_widen=auto_widen,
            normalize=normalize,
            max_len_diff=max_len_diff,
        )
    if bucket > MAX_KERNEL_SEQ_LEN:
        # Over-long bucket: the blocked wavefront keeps memory at boundary
        # vectors instead of the scan path's [B, S, S] HBM cost tensor.
        blk, padded = _long_block_shape(bucket)
        a = jnp.pad(a, ((0, 0), (0, padded - row_cap), (0, 0)))
        if padded > bucket:
            b = jnp.pad(b, ((0, 0), (0, padded - bucket), (0, 0)))
        return dtw_long_batch(
            a,
            b,
            la,
            lb,
            metric=metric,
            band=band,
            auto_widen=auto_widen,
            normalize=normalize,
            block=blk,
            matmul_dtype=matmul_dtype,
            band_mode=band_mode,
        )
    return dtw_batch(
        a,
        b,
        la,
        lb,
        metric=metric,
        band=band,
        auto_widen=auto_widen,
        normalize=normalize,
        matmul_dtype=matmul_dtype,
        band_mode=band_mode,
    )


def _with_retries(fn: Callable, max_retries: int, pending_exc: BaseException):
    """Re-run `fn` up to max_retries times after an initial failure.

    `pending_exc` is the exception that triggered the retry; it is raised
    directly when max_retries < 1 (no bare `raise`, so the helper works
    outside an `except` block) and chained from the final retry failure."""
    if max_retries < 1:
        raise pending_exc
    for attempt in range(max_retries):
        try:
            return fn()
        except Exception:
            if attempt == max_retries - 1:
                raise
    raise AssertionError("unreachable")


def _block_key(ii: np.ndarray, jj: np.ndarray, cfg_tag: bytes = b"") -> str:
    """Resume key: pair indices + the DTW config fingerprint, so blocks
    persisted under one metric/band/normalization are never reused after a
    config change (they would silently poison the distance matrix)."""
    h = hashlib.sha1(ii.tobytes() + b"|" + jj.tobytes() + b"|" + cfg_tag)
    return f"block_{ii[0]}_{jj[0]}_{len(ii)}_{h.hexdigest()[:16]}"


def _cfg_tag(cfg: DTWConfig, features: np.ndarray, lengths: np.ndarray) -> bytes:
    """DTW config + a feature fingerprint: resume blocks must also be
    invalidated when UPSTREAM config changes the features (different AE,
    bins, segmentation) — same indices, different sequences.  The
    fingerprint hashes shapes, lengths, and a 64-row stride of the feature
    tensor (any feature-affecting change perturbs essentially all values)."""
    h = hashlib.sha1(
        repr(
            (cfg.metric, cfg.band, cfg.auto_widen_band, cfg.normalize,
             cfg.dtype, cfg.band_mode)
        ).encode()
    )
    h.update(repr(features.shape).encode())
    h.update(np.ascontiguousarray(lengths).tobytes())
    step = max(1, features.shape[0] // 64)
    h.update(np.ascontiguousarray(features[::step]).tobytes())
    return h.hexdigest().encode()


def make_tile_pair_class_fn(
    lens_sorted: np.ndarray,   # [nT*ti] lengths in tile order (pad: 1)
    nT: int,
    ti: int,
    Lp: int,
    band: int | None,
    auto_widen: bool,
) -> Callable[[int, int], tuple[int, int]]:
    """(I, J) tile-pair -> (rows_cls, scan_cls) static-shape class.

    Per-tile length ranges give each tile-pair a DP row requirement (the
    A-tile's max length) and a banded scan-depth requirement, quantized to
    at most 2x2 classes so each class is one compiled program shape.  The
    bounds are correctness contracts of dtw_tile_pairs; bench.py uses this
    same function so the headline measures the production program shapes.

    The widening bound is taken over BOTH orientations
    (max(tmax[j]-tmin[i], tmax[i]-tmin[j])): under the all-pairs global
    length sort the second term is <= 0 for j > i, but the incremental
    update's grouped permutation (old tiles first, then new) is NOT
    globally monotone — a new tile of short sequences can pair as J with
    a longer old I, and a one-sided bound would under-provision the scan
    depth and silently truncate the banded min-plus propagation.
    """
    tmin = np.array([lens_sorted[t * ti : (t + 1) * ti].min() for t in range(nT)])
    tmax = np.array([lens_sorted[t * ti : (t + 1) * ti].max() for t in range(nT)])
    full_scan = max(1, (Lp - 1).bit_length())
    small_scan = min(6, full_scan)
    # rows quantized to 16-frame steps (sorted tiles make rows_req tight;
    # the DP loop is ~70% of the kernel, so finer steps shave real time —
    # each distinct value is one compiled shape, persistently cached)
    rq = max(16, Lp // 8)

    def pair_class(i: int, j: int) -> tuple[int, int]:
        rows_req = int(tmax[i])                      # A-tile = the shorter
        rows_cls = min(Lp, rq * -(-rows_req // rq))
        if band is None:
            scan_cls = full_scan
        else:
            wv_req = int(band)
            if auto_widen:
                wv_req = max(
                    wv_req,
                    int(tmax[j]) - int(tmin[i]),
                    int(tmax[i]) - int(tmin[j]),
                )
            need = max(1, (2 * min(wv_req, Lp) + 1 - 1).bit_length())
            scan_cls = small_scan if need <= small_scan else full_scan
        return rows_cls, scan_cls

    return pair_class


def _wv_width(wv: int) -> int:
    """Stripe width (128-multiple) covering band half-widths <= wv."""
    return 128 * -(-(2 * int(wv) + 2) // 128)


def _wv_level(wv_req: int) -> int:
    """Quantize a required half-width UP to its stripe-width class level
    (the largest wv the class's W covers: 63, 127, 191, ...) so the class
    key round-trips to one compiled stripe shape per width."""
    return 64 * (_wv_width(wv_req) // 128) - 1


def _ws_width(wv: int) -> int:
    """Lane-kernel stripe SUBLANE width (16-multiple) covering band
    half-widths <= wv.  16 instead of the native 8 granularity halves the
    class count (each class is its own compiled executable)."""
    return 16 * -(-(2 * int(wv) + 2) // 16)


def _ws_level(wv_req: int) -> int:
    """Quantize a required half-width UP to its lane-kernel class level
    (the largest wv the class's W_s covers: 7, 15, 23, ...)."""
    return (_ws_width(wv_req) - 2) // 2


def _ws_level_diag(wv_req: int) -> int:
    """Diag-route level: quantize UP on the kernel's NATIVE 8-sublane
    width grid (W = 8*ceil((2*wv+2)/8); levels 7, 11, 15, 19, 23, ...).
    The widen-route _ws_level uses 16-granularity to halve executable
    count, but at the diag bench mix the exact class needs wv=18 (W=40)
    and the 16-grid rounds it to wv=23 (W=48) — 1.2x computed elements on
    an element-bound kernel (BASELINE.md round-5 exact-width entry).  The
    finer grid's extra class-count risk is absorbed by
    _merge_thin_classes."""
    w = 8 * -(-(2 * int(wv_req) + 2) // 8)
    return (w - 2) // 2


def _lane_route(
    L: int, d: int, lengths: np.ndarray, cfg: DTWConfig,
) -> int | None:
    """Tile size for the LANE-PACKED kernel family if the whole job can
    ride it (S <= 4096, SMEM/VMEM in range), else None.  Gates on the
    corpus-global worst-class stripe width: widened half-width in "widen"
    mode, diag_class_bounds at the global length extremes in "diag" mode
    (every tile-pair's class is narrower; narrower always fits), and the
    FULL-WIDTH kernel's max-real-length stripe for unbanded jobs —
    band=None rides the exact full lane kernel (round 4) unless the
    square tile kernel covers the length (S <= 256, MXU Gram build;
    measured faster there, BASELINE.md round-4 unbanded table)."""
    if not len(lengths):
        return None
    Lp = 128 * -(-L // 128)
    if cfg.band is None:
        if tile_geometry(Lp, d) is not None:
            return None
        return lane_full_geometry(Lp, d, int(lengths.max()))
    if getattr(cfg, "band_mode", "widen") == "diag":
        lo, hi = int(lengths.min()), int(lengths.max())
        wv, _ = diag_class_bounds(int(cfg.band), lo, hi, lo, hi)
    else:
        wv = int(cfg.band)
        if cfg.auto_widen_band:
            wv = max(wv, int(lengths.max()) - int(lengths.min()))
    return lane_geometry(Lp, d, _ws_width(min(wv, Lp)))


def _stripe_route(
    L: int, d: int, lengths: np.ndarray, cfg: DTWConfig,
) -> tuple[int, int, int] | None:
    """Geometry of the WIDEST stripe class if the whole job can ride the
    tile-stripe kernel (banded long sequences, S > 256), else None.

    The gate uses the corpus-global widened half-width over REAL lengths:
    every tile-pair's class is narrower, and narrower W always fits at the
    same ti, so gating on the widest class guarantees per-class geometry.
    """
    if cfg.band is None or not len(lengths):
        return None
    Lp = 128 * -(-L // 128)
    wv = int(cfg.band)
    if cfg.auto_widen_band:
        wv = max(wv, int(lengths.max()) - int(lengths.min()))
    return tile_stripe_geometry(Lp, d, _wv_width(min(wv, Lp)))


def make_tile_stripe_class_fn(
    lens_sorted: np.ndarray,   # [nT*ti] lengths in tile order (pad: 1)
    nT: int,
    ti: int,
    Lp: int,
    band: int,
    auto_widen: bool,
    n_real: int,
    level_fn: Callable[[int], int] = _wv_level,
) -> Callable[[int, int], tuple[int, int]]:
    """(I, J) tile-pair -> (rows_cls, wv_cls) for the tile-stripe kernel
    (default `level_fn`) or the lane-packed kernel (`_ws_level`).

    Like make_tile_pair_class_fn, but the banded scan depth is implied by
    the class's static wv bound (dtw_tile_stripe_pairs derives W, off, and
    scan depth from wv_max), so the second key is the quantized stripe
    half-width.  Tile ranges are taken over REAL entries only (`n_real`):
    pad sequences (length 1, trailing positions) would inflate the last
    tile's spread to ~Lp and push its classes off the stripe entirely,
    yet pad pairs' outputs are never scattered — the +inf they produce
    out-of-frame is discarded with the rest of the pad rows/cols.
    """
    tmin = np.empty(nT, np.int64)
    tmax = np.empty(nT, np.int64)
    for t in range(nT):
        real = lens_sorted[t * ti : min((t + 1) * ti, n_real)]
        if len(real) == 0:              # all-pad tile (cannot happen: the
            real = lens_sorted[t * ti : (t + 1) * ti]   # pad count is < ti)
        tmin[t], tmax[t] = real.min(), real.max()
    rq = max(16, Lp // 8)

    def pair_class(i: int, j: int) -> tuple[int, int]:
        rows_cls = min(Lp, rq * -(-int(tmax[i]) // rq))
        wv_req = int(band)
        if auto_widen:
            wv_req = max(
                wv_req,
                int(tmax[j]) - int(tmin[i]),
                int(tmax[i]) - int(tmin[j]),
            )
        return rows_cls, level_fn(min(wv_req, Lp))

    return pair_class


def make_tile_lane_full_class_fn(
    lens_sorted: np.ndarray,   # [nT*ti] lengths in tile order (pad: 1)
    nT: int,
    ti: int,
    Lp: int,
    n_real: int,
) -> Callable[[int, int], tuple[int, int]]:
    """(I, J) tile-pair -> (rows_cls, width_cls) for the FULL-WIDTH lane
    kernel (band=None).

    rows covers the A tile's max REAL length (the scheduler's length sort
    makes A the shorter side), width the B tile's — each quantized UP on
    the same Lp//8 ladder so a job compiles a handful of executables.
    Both components are >=-monotone contracts of dtw_tile_lane_full_pairs
    (more rows / wider stripe always covers), so _merge_thin_classes'
    elementwise-max merging stays correct.  Pad entries (length 1) are
    excluded exactly as in make_tile_stripe_class_fn.
    """
    tmax = np.empty(nT, np.int64)
    for t in range(nT):
        real = lens_sorted[t * ti : min((t + 1) * ti, n_real)]
        if len(real) == 0:
            real = lens_sorted[t * ti : (t + 1) * ti]
        tmax[t] = real.max()
    rq = max(16, Lp // 8)

    def pair_class(i: int, j: int) -> tuple[int, int]:
        rows_cls = min(Lp, rq * -(-int(tmax[i]) // rq))
        width_cls = min(Lp, rq * -(-int(tmax[j]) // rq))
        return rows_cls, width_cls

    return pair_class


def make_tile_lane_diag_class_fn(
    lens_sorted: np.ndarray,   # [nT*ti] lengths in tile order (pad: 1)
    nT: int,
    ti: int,
    Lp: int,
    band: int,
    n_real: int,
) -> Callable[[int, int], tuple[int, int, int]]:
    """(I, J) tile-pair -> (rows_cls, wv_cls, kmax_cls) for the
    diag-corridor lane kernel (band_mode="diag").

    wv comes from diag_class_bounds over the tile-pair's REAL length
    ranges (pad entries excluded, as in make_tile_stripe_class_fn),
    quantized UP on the kernel's native 8-sublane ladder (_ws_level_diag;
    the exact bound makes W=40 reachable at band=16 mixes) so each
    distinct key is one compiled executable.  kmax returned to the key in
    round 5: the dyn_roll CARRY realignment needs no static step bound
    (round 4 dropped it on that basis), but the hoisted block-window
    build sizes its drift budget ww_ext from kmax — an understated kmax
    now poisons rows to +inf (loud) instead of realigning, so the
    scheduler must ship the true bound.  kmax > 1 arises only on
    diagonal/near-diagonal tile-pairs of wide-spread tiles (long-on-rows
    keeps off-diagonal slopes <= 1), and ww_ext quantizes it to 8-sublane
    buckets, so the executable-count cost is marginal.  All three
    components are >=-monotone contracts, so _merge_thin_classes'
    elementwise-max merging stays correct.
    """
    tmin = np.empty(nT, np.int64)
    tmax = np.empty(nT, np.int64)
    for t in range(nT):
        real = lens_sorted[t * ti : min((t + 1) * ti, n_real)]
        if len(real) == 0:
            real = lens_sorted[t * ti : (t + 1) * ti]
        tmin[t], tmax[t] = real.min(), real.max()
    rq = max(16, Lp // 8)

    def pair_class(i: int, j: int) -> tuple[int, int, int]:
        rows_cls = min(Lp, rq * -(-int(tmax[i]) // rq))
        wv_req, kmax = diag_class_bounds(
            band, int(tmin[i]), int(tmax[i]), int(tmin[j]), int(tmax[j])
        )
        return rows_cls, _ws_level_diag(min(wv_req, Lp)), kmax

    return pair_class


def _merge_thin_classes(
    by_class: dict[tuple[int, ...], list],
    min_programs: int = 16,
    max_merge_cost: int = 400_000,
) -> None:
    """Merge (rows, scan) classes with few programs into neighbors, in
    place.

    Each distinct class compiles its own tile-kernel executable, and a
    fresh process pays ~3 s activation per executable (cache load +
    program shipping, BASELINE.md round-3) — far more than the DP rows a
    thin class saves on its handful of programs, which also dispatch as
    tiny poorly-amortized chunks.  The contract-scale class map held
    singleton classes ((128, 7): 1 program at K=10k) before this pass.

    Merging is contract-monotone — the merged class takes the pairwise
    max of (rows, scan), and `dtw_tile_pairs`'s contracts only require
    rows/scan to be >= each pair's true bounds — so correctness is
    preserved by construction; the merge target minimizes a crude
    device-time model (DP cost ~ programs * rows * (3 + scan_steps)).

    `max_merge_cost` caps the model-units a single merge may add, so a
    thin class with only EXPENSIVE neighbors (length-skewed corpus: one
    long-sequence program next to a 10k-program short-sequence bulk
    class) keeps its own executable instead of upgrading the bulk.
    Calibration: one (128, 6) program = 128*(3+6) = 1152 units ~ 8 ms
    measured, so a unit ~ 7 us and 400k units ~ 2.8 s ~ one activation —
    merges are accepted only while they cost less than the activation
    they save.  (The model ignores pow2 chunk-tail padding shifts; those
    are bounded by one extra sub-2x tail chunk either way.)
    """

    def t(cls, n):
        # Crude device-time model: programs * rows * (3 + scan-ish key).
        # Extra key components (the diag classes' kmax) add linearly —
        # they cost one masked roll per DP row each.
        r, s = cls[0], cls[1]
        return n * r * (3 + s + sum(cls[2:]))

    while len(by_class) > 1:
        thin = [c for c in by_class if len(by_class[c]) < min_programs]
        if not thin:
            return
        best = None  # (cost, small, target)
        for small in thin:
            for other in by_class:
                if other == small:
                    continue
                m = tuple(map(max, small, other))
                cost = (
                    t(m, len(by_class[small]))
                    - t(small, len(by_class[small]))
                    + t(m, len(by_class[other]))
                    - t(other, len(by_class[other]))
                )
                if best is None or cost < best[0]:
                    best = (cost, small, other)
        if best[0] > max_merge_cost:
            return
        _, small, target = best
        m = tuple(map(max, small, target))
        merged = by_class.pop(small) + by_class.pop(target)
        by_class.setdefault(m, []).extend(merged)


def all_pairs_distances_tiled(
    features: np.ndarray,          # [K, L, d] padded segment features
    lengths: np.ndarray,           # [K] true frame counts
    cfg: DTWConfig,
    *,
    block_dir: str | Path | None = None,
    progress: Callable[[int, int], None] | None = None,
    devices: list | None = None,
    max_retries: int = 1,
    stats: dict | None = None,
    chunk_programs: int = 64,
    interpret: bool = False,
    geometry: tuple[int, int, int] | None = None,
    known: tuple[int, np.ndarray] | None = None,
    stripe: bool | None = None,
    lane: bool | None = None,
) -> np.ndarray:
    """Symmetric [K, K] DTW matrix via the all-pairs TILE kernel.

    The round-3 fast path: sequences upload once as a device-resident
    corpus; each (ti x ti) tile-pair program reuses its 2*ti sequences for
    ti*ti pairs, cutting HBM traffic ~115x vs per-pair gathers — which is
    the binding constraint on this device (BASELINE.md round-3 findings).
    Dispatches go in chunks of `chunk_programs` tile-pairs with the same
    pipelined in-flight window, chunk persistence, and retry contract as
    the per-pair scheduler.  No length bucketing: every pair pays L rows,
    but at ~140 B/pair of traffic the extra rows are far cheaper than the
    16 KB/pair the bucketed gather path ships.

    `known=(k_old, D_old)`: incremental update.  Distances among the first
    k_old sequences are taken from D_old; the sort permutation groups old
    sequences before new ones (each side length-sorted, so tiles stay
    length-coherent) and tile-pairs whose tiles are both pure-old are
    skipped entirely — the computed fraction scales with the new-pair
    share, not the full triangle.  The one boundary tile mixing old and
    new recomputes its old x old pairs; same features, same kernel, so
    the overwrite is a no-op numerically.

    `progress(done, total)` is invoked from the scheduler's scatter WORKER
    thread in the default async-assembly mode (main thread only under
    APD_SYNC_SCATTER=1) — callbacks must be thread-safe; calls are strictly
    sequential (one worker), never concurrent.
    """
    K, L, d = features.shape
    lengths = np.asarray(lengths, dtype=np.int32)
    if K < 2:
        return np.zeros((K, K), dtype=np.float32)
    # Mosaic requires lane-tile-friendly shapes: the kernel's dot/masks die
    # on e.g. L=96 ("unsupported shape cast").  Pad the time dim up to the
    # 128-multiple the geometry is built for — the per-pair length masks
    # make pad frames free, and DP rows stay bounded by true lengths.
    # (A test-provided geometry override keeps L as-is for interpret runs.)
    Lp = L if geometry is not None else 128 * -(-L // 128)
    if lane is None:
        # Auto-route priority: the LANE-PACKED kernel owns every banded
        # job it can take (fastest at ALL lengths, BASELINE.md round-3
        # lane table); the square tile kernel keeps unbanded S <= 256;
        # the tile-stripe kernel keeps banded jobs the lane kernel's
        # SMEM/VMEM gates exclude (e.g. very high-d features).
        lane = (
            stripe is not True
            and geometry is None
            and _lane_route(L, d, lengths, cfg) is not None
        )
    if lane:
        stripe = False
    elif stripe is None:
        stripe = (geometry or tile_geometry(Lp, d)) is None
    if geometry is not None:
        geom = geometry
    elif lane:
        geom = (_lane_route(L, d, lengths, cfg), 0, 0)
    elif stripe:
        geom = _stripe_route(L, d, lengths, cfg)
    else:
        geom = tile_geometry(Lp, d)
    assert geom is not None and geom[0] is not None, (
        f"tile kernels out of range for L={L}, d={d}, band={cfg.band}"
    )
    ti, su, sv = geom
    diag = cfg.band is not None and getattr(cfg, "band_mode", "widen") == "diag"
    full = lane and cfg.band is None
    if diag and not lane:
        # Only the lane kernel implements the diag corridor; the router
        # (all_pairs_distances) sends non-lane-eligible diag jobs to the
        # legacy pure-JAX path instead of here.
        raise ValueError(
            "band_mode='diag' requires the lane route in the tiled "
            f"scheduler (L={L}, d={d}, band={cfg.band})"
        )

    Kp = -(-K // ti) * ti
    # Sort sequences by length: tiles then hold near-constant lengths, so
    # each tile-pair gets a TIGHT static DP row count (the A-tile's max
    # length) and banded scan depth (from the tile-pair's length spread) —
    # the DP loop is ~70% of the kernel, and the average A-tile of an
    # upper-triangle pair is the shorter one.
    #
    # Two un-permutation strategies, chosen by matrix size (both measured,
    # BASELINE.md round 3): up to ~contract scale, blocks fancy-scatter
    # STRAIGHT into original-order D inside the collect loop — that work
    # hides under the device wait and kills the non-overlappable final
    # gather (~1.4 s at K=10k, 24.7 s job).  Past ~2 GB of matrix ANY
    # per-block write into D thrashes the host (measured at K=40k:
    # 100-280 s direct-scattered, 127 s + a 65-228 s final gather via a
    # sorted-space matrix), so large jobs assemble per ROW STRIP: blocks
    # land in a cache-sized [<=ti, K] buffer per sorted row-strip, and a
    # completed strip flushes once — one vectorized column un-permute +
    # ti contiguous row writes — touching D exactly once, sequentially.
    # Update jobs force direct scatter: skipped tile-pairs would leave row
    # strips permanently incomplete (strip_left counts all nT pieces), and
    # strips would also need their old-column region prefilled from D_old
    # per strip — a K_old x K_old fancy gather, the exact host tail the
    # strip design exists to kill.  Accepted tradeoff: a LARGE-fraction
    # update of a > 2 GB matrix re-enters the measured direct-scatter
    # regime (K=40k full job: direct 457-587 s vs strips 418-444 s, i.e.
    # direct costs ~10-30% more wall, partially hidden under device wait) —
    # bounded, not pathological, and updates that big are near full-recompute
    # cost anyway.  Generalizing strip accounting to per-strip piece counts
    # + D_old prefill is the upgrade path if large-fraction huge-K updates
    # become a real workload.
    direct = known is not None or K * K * 4 <= _DIRECT_SCATTER_BYTES
    D = np.zeros((K, K), dtype=np.float32)
    if known is not None:
        k_old, D_old = known
        D[:k_old, :k_old] = D_old
        # Group old before new (each side length-sorted): tiles then hold
        # only-old or only-new sequences (plus at most one boundary tile),
        # so pure-old tile-pairs can be skipped instead of scattering new
        # indices across every tile.
        perm = np.concatenate(
            [
                np.argsort(lengths[:k_old], kind="stable"),
                k_old + np.argsort(lengths[k_old:], kind="stable"),
            ]
        ).astype(np.int64)
    else:
        perm = np.argsort(lengths, kind="stable").astype(np.int64)
    lens_sorted = lengths[perm]
    lens_p = np.ones((Kp,), np.int32)
    lens_p[:K] = lens_sorted
    nT = Kp // ti

    if devices is None:
        devices = [jax.devices()[0]]
    t_up = time.perf_counter()
    if isinstance(features, jax.Array):
        # Already device-resident (the pipeline's AE features are): permute
        # and pad on device — no host round-trip of the [K, L, d] corpus.
        feats_p = jnp.pad(
            features.astype(jnp.float32)[jnp.asarray(perm)],
            ((0, Kp - K), (0, Lp - L), (0, 0)),
        )
    else:
        fp = np.zeros((Kp, Lp, d), np.float32)
        fp[:K, :L] = features[perm]
        feats_p = jnp.asarray(fp)
    feats_dev = [jax.device_put(feats_p, dv) for dv in devices]
    lens_dev = [jax.device_put(jnp.asarray(lens_p), dv) for dv in devices]
    # honest sync so upload_s reflects the actual transfer, not its launch
    for fd in feats_dev:
        np.asarray(fd[0, 0, 0])
    upload_s = time.perf_counter() - t_up

    rep_dev = None
    lane_stack = 1
    if lane and diag:
        # Chain interleaving (round 5): pack lane_stack consecutive sorted
        # A-rows per program as independent DP chains — fills the VPU
        # pipeline on the latency-bound narrow-corridor shape.  Clamped to
        # the SMEM A-block budget per shape; bitwise-stable in the knob
        # (tests/test_dtw_diag.py stack parity), so it never enters the
        # class map, block cache tag, or feature fingerprint.
        lane_stack = effective_lane_stack(
            getattr(cfg, "lane_stack", 1), Lp, d
        )
        while lane_stack > 1 and ti % lane_stack:
            lane_stack //= 2  # test geometries may use ti < 128
        pair_class = make_tile_lane_diag_class_fn(
            lens_p, nT, ti, Lp, int(cfg.band), K
        )
        tile_rep = tile_rep_lengths(lens_p, nT, ti, K)
        rep_dev = [jax.device_put(jnp.asarray(tile_rep), dv) for dv in devices]
    elif full:
        pair_class = make_tile_lane_full_class_fn(lens_p, nT, ti, Lp, K)
    elif lane:
        pair_class = make_tile_stripe_class_fn(
            lens_p, nT, ti, Lp, cfg.band, cfg.auto_widen_band, K,
            level_fn=_ws_level,
        )
    elif stripe:
        pair_class = make_tile_stripe_class_fn(
            lens_p, nT, ti, Lp, cfg.band, cfg.auto_widen_band, K
        )
    else:
        pair_class = make_tile_pair_class_fn(
            lens_p, nT, ti, Lp, cfg.band, cfg.auto_widen_band
        )

    pairs_list = [(i, j) for i in range(nT) for j in range(i, nT)]
    n_all_pairs = K * (K - 1) // 2
    if known is not None:
        # Skip tile-pairs with no new sequence on either side; their pairs
        # are all in D_old.  (Pad positions >= K are never "new".)
        pos_new = np.zeros(nT * ti, bool)
        pos_new[:K] = perm >= k_old
        tile_new = [bool(pos_new[t * ti : (t + 1) * ti].any()) for t in range(nT)]
        pairs_list = [
            (i, j) for (i, j) in pairs_list if tile_new[i] or tile_new[j]
        ]
        n_all_pairs -= k_old * (k_old - 1) // 2
    if lane and diag:
        # Orient the LONG side onto DP rows (tiles are length-sorted, so
        # J >= I is the longer tile): the scaled corridor's per-row
        # half-width is band * max(1, (lb-1)/(la-1)) — with la >= lb that
        # is exactly `band`, independent of the length ratio, while the
        # short-side orientation pays band * ratio.  Same cell count, but
        # the class stripe collapses from W_s ~ 2*band*ratio to the
        # equal-length W_s (48 at band=16), cutting modeled element volume
        # ~1.19x at the bench mix and merging the wide-wv classes away
        # (BASELINE.md round-4 orientation table).  Scatter handles (J, I)
        # blocks identically (both triangles written per block).
        pairs_list = [(j, i) for (i, j) in pairs_list]
    if stats is None:
        stats = {}
    stats.update(
        dispatch_s=0.0, collect_s=0.0, scatter_s=0.0, persist_s=0.0,
        enumerate_s=0.0, blocks=0, pad_pairs=0, pairs=n_all_pairs,
        tiled=True, stripe=bool(stripe), lane=bool(lane), full=bool(full),
        tile_programs=len(pairs_list), upload_s=upload_s,
        device_blocks=[0] * len(devices),
    )

    if block_dir is not None:
        block_dir = Path(block_dir)
        block_dir.mkdir(parents=True, exist_ok=True)
        cfg_tag = _cfg_tag(cfg, features, lengths) + (
            b"|tiledlanefull" if full
            else b"|tiledlane" if lane
            else (b"|tiledstripe" if stripe else b"|tiled")
        )

    # Group tile-pairs by (rows, scan) class, then pad each class's tail
    # chunk UP to the next power of two (not the full chunk size: a 6-pair
    # tail padded to 64 would run 58 redundant ~8 ms programs every job,
    # while pow2 keeps the padding under 2x and the compiled-U shapes to a
    # handful, cached persistently).  Pad entries repeat the last tile-pair;
    # duplicate scatters are idempotent.
    by_class: dict[tuple[int, ...], list[tuple[int, int]]] = {}
    for pij in pairs_list:
        by_class.setdefault(pair_class(*pij), []).append(pij)
    _merge_thin_classes(by_class)
    stats["tile_classes"] = len(by_class)
    # Chunk entries carry the full class key: (rows, scan) for the square
    # tile route, (rows, wv_level) for the stripe/lane/diag routes.
    chunks: list[tuple[np.ndarray, np.ndarray, tuple[int, ...]]] = []
    for cls, plist in sorted(by_class.items()):
        for s in range(0, len(plist), chunk_programs):
            part = plist[s : s + chunk_programs]
            u = 1 << max(0, (len(part) - 1).bit_length())
            while len(part) < min(u, chunk_programs):
                part = part + [part[-1]]
            ii = np.array([p[0] for p in part], np.int32)
            jj = np.array([p[1] for p in part], np.int32)
            chunks.append((ii, jj, cls))

    done_programs = 0
    total_programs = len(pairs_list)
    norm = cfg.normalize == "path_len"
    pending: list = []

    ls_f = lens_p.astype(np.float32)

    # strip-assembly state (large-K path; see strategy comment above)
    inv = None if direct else np.argsort(perm)
    strip_bufs: dict[int, np.ndarray] = {}
    strip_left: dict[int, int] = {}
    # Fused C++ scatter (native/apd_native.cc): one pass over each block
    # writes both mirrored destinations with normalization inlined, vs ~6
    # NumPy passes + temps — host scatter was ~1/3 of contract-scale wall
    # and THE K=40k bottleneck (BASELINE.md rounds 3-4).  NumPy twin kept
    # as fallback + A/B control (APD_NO_NATIVE_SCATTER=1; identity tested
    # in tests/test_native.py and tests/test_dtw_tile.py).
    use_native = (
        native.available()
        and os.environ.get("APD_NO_NATIVE_SCATTER", "") != "1"
    )

    def _strip_buf(I):
        buf = strip_bufs.get(I)
        if buf is None:
            buf = np.zeros((min(ti, K - I * ti), K), np.float32)
            strip_bufs[I] = buf
            # strip I receives one piece per tile: from pairs (I, J >= I)
            # directly and (J < I, I) mirrored — nT pieces total
            strip_left[I] = nT
        return buf

    def _strip_dec(I):
        strip_left[I] -= 1
        if strip_left[I] == 0:
            del strip_left[I]
            buf = strip_bufs.pop(I)
            rows = perm[I * ti : I * ti + buf.shape[0]]
            if use_native:
                native.strip_unpermute(buf, inv, rows, D)
            else:
                D[rows] = np.take(buf, inv, axis=1)

    def strip_add(I, c0, part):
        buf = _strip_buf(I)
        buf[:, c0 : c0 + part.shape[1]] = part
        _strip_dec(I)

    def scatter_chunk(ii, jj, blocks):
        # Each (I, J) appears once.  Both triangles are written per block
        # (mirroring the 64 KB block is ~0.1 ms; a final full-matrix
        # D += D.T measured 7.1 s at K=10k on the throttled host).
        # Diagonal tiles take their strict-upper part mirrored so D stays
        # exactly symmetric and the diagonal exactly zero regardless of
        # last-ulp differences between the kernel's (u,v) and (v,u) paths.
        seen = set()
        for u in range(len(ii)):
            I, J = int(ii[u]), int(jj[u])
            if (I, J) in seen:
                continue
            seen.add((I, J))
            blk = blocks[u]
            r0, c0 = I * ti, J * ti
            # pad sequences (sorted index >= K) exist only in the last tile
            nr, nc = min(ti, K - r0), min(ti, K - c0)
            if use_native and not direct:
                # Round 5: fused strip writes — ONE pass over the raw block
                # does normalize + strip-I rows + transposed strip-J rows,
                # in a ctypes call that RELEASES THE GIL for its whole
                # duration.  The raw write is ~0.88x NumPy (round-4 A/B),
                # but the NumPy chain (divide temp, triu, .T copy) holds
                # the GIL on the scatter worker and starves the main
                # thread's dispatch loop on the 1-core host — the K=40k
                # "other-host" tail (114.6 s, BASELINE.md round 4).
                bufI = _strip_buf(I)
                lr = ls_f[r0 : r0 + nr] if norm else None
                lc = ls_f[c0 : c0 + nc] if norm else None
                if I == J:
                    native.scatter_block_strip(
                        blk, nr, nc, lr, lc, bufI, c0, None, 0
                    )
                    _strip_dec(I)
                else:
                    bufJ = _strip_buf(J)
                    native.scatter_block_strip(
                        blk, nr, nc, lr, lc, bufI, c0, bufJ, r0
                    )
                    _strip_dec(I)
                    _strip_dec(J)
                continue
            if use_native and direct:
                # The native win here is the permuted scatter (1.9x) with
                # normalization inlined; strip completion rides
                # native.strip_unpermute in _strip_dec above (1.7x).
                native.scatter_block_direct(
                    blk, nr, nc,
                    ls_f[r0 : r0 + nr] if norm else None,
                    ls_f[c0 : c0 + nc] if norm else None,
                    perm[r0 : r0 + nr], perm[c0 : c0 + nc], D, I == J,
                )
                continue
            if norm:
                blk = blk[:nr, :nc] / (
                    ls_f[r0 : r0 + nr][:, None] + ls_f[c0 : c0 + nc][None, :]
                )
            else:
                blk = blk[:nr, :nc]
            if direct:
                r_orig = perm[r0 : r0 + nr]
                c_orig = perm[c0 : c0 + nc]
                if I == J:
                    sym = np.triu(blk, k=1)
                    D[np.ix_(r_orig, c_orig)] = sym + sym.T
                else:
                    D[np.ix_(r_orig, c_orig)] = blk
                    D[np.ix_(c_orig, r_orig)] = blk.T
            else:
                if I == J:
                    sym = np.triu(blk, k=1)
                    strip_add(I, c0, sym + sym.T)
                else:
                    strip_add(I, c0, blk)
                    strip_add(J, r0, np.ascontiguousarray(blk.T))
        return len(seen)

    # Matrix assembly rides ONE worker thread: `np.asarray(fut)` releases
    # the GIL while it blocks on the device, so scatter/persist overlap the
    # device wait instead of stalling the collect loop between dispatches —
    # once the lane kernel cut device time ~2.8x, host assembly was ~1/3 of
    # contract-scale wall (BASELINE.md round 3) and grows with K on the
    # strip path.  A single worker keeps D writes strictly sequential (no
    # locking, bitwise-identical result); its errors are parked and
    # re-raised on the main thread.  APD_SYNC_SCATTER=1 forces the inline
    # path (A/B measurement + the identity test in test_dtw_tile.py).
    sync_scatter = os.environ.get("APD_SYNC_SCATTER", "") == "1"
    scatter_q: queue.Queue = queue.Queue(maxsize=8)
    scatter_err: list[BaseException] = []

    def handle_block(ii, jj, vals, path):
        nonlocal done_programs
        t0 = time.perf_counter()
        done_programs += scatter_chunk(ii, jj, vals)
        stats["scatter_s"] += time.perf_counter() - t0
        if path is not None:
            t0 = time.perf_counter()
            np.savez(path, ii=ii, jj=jj, blocks=vals)
            stats["persist_s"] += time.perf_counter() - t0
        if progress:
            progress(done_programs, total_programs)

    def scatter_worker():
        while True:
            item = scatter_q.get()
            if item is None:
                return
            if scatter_err:
                continue  # drain so the producer can never block on put()
            try:
                handle_block(*item)
            except BaseException as exc:
                scatter_err.append(exc)

    worker = None
    if not sync_scatter:
        worker = threading.Thread(
            target=scatter_worker, name="apd-scatter", daemon=True
        )
        worker.start()

    def emit_block(ii, jj, vals, path):
        if worker is None:
            handle_block(ii, jj, vals, path)
            return
        if scatter_err:
            raise scatter_err[0]
        scatter_q.put((ii, jj, vals, path))

    def collect_one():
        ii, jj, dispatch, fut, path = pending.pop(0)
        t0 = time.perf_counter()
        try:
            vals = np.asarray(fut)
        except Exception as exc:
            vals = _with_retries(
                lambda: np.asarray(dispatch()), max_retries, exc
            )
        stats["collect_s"] += time.perf_counter() - t0
        emit_block(ii, jj, vals, path)

    # The try spans the WHOLE dispatch/collect region, not just the final
    # drain: any exception escaping the chunk loop (retry exhaustion, a
    # corrupt resume block's np.load, emit_block re-raising a parked
    # scatter error) must still put(None)/join() or it leaks one daemon
    # scatter thread per failed call, each pinning this closure's K x K D.
    try:
        for ci, (ii, jj, cls) in enumerate(chunks):
            rows_cls, scan_cls = cls[0], cls[1]
            stats["blocks"] += 1
            path = None
            if block_dir is not None:
                cls_tag = "|".join(str(c) for c in cls)
                path = block_dir / (
                    _block_key(ii, jj, cfg_tag + f"|{cls_tag}".encode())
                    + ".npz"
                )
                if path.exists():
                    saved = np.load(path)
                    emit_block(saved["ii"], saved["jj"], saved["blocks"], None)
                    continue
            di = ci % len(devices)
            stats["device_blocks"][di] += 1

            if lane and diag:
                def dispatch(di=di, ii=ii, jj=jj, rows_cls=rows_cls,
                             wv_cls=scan_cls,
                             km_cls=(cls[2] if len(cls) > 2 else 1)):
                    return dtw_tile_lane_diag_pairs(
                        feats_dev[di], lens_dev[di], rep_dev[di],
                        jnp.asarray(ii), jnp.asarray(jj),
                        ti=ti, band=cfg.band, wv_max=wv_cls,
                        kmax=km_cls, metric=cfg.metric, rows=rows_cls,
                        stack=lane_stack, interpret=interpret,
                    )
            elif full:
                def dispatch(di=di, ii=ii, jj=jj, rows_cls=rows_cls,
                             w_cls=scan_cls):
                    return dtw_tile_lane_full_pairs(
                        feats_dev[di], lens_dev[di],
                        jnp.asarray(ii), jnp.asarray(jj),
                        ti=ti, width=w_cls, metric=cfg.metric,
                        rows=rows_cls, interpret=interpret,
                    )
            elif lane:
                def dispatch(di=di, ii=ii, jj=jj, rows_cls=rows_cls,
                             wv_cls=scan_cls):
                    return dtw_tile_lane_pairs(
                        feats_dev[di], lens_dev[di],
                        jnp.asarray(ii), jnp.asarray(jj),
                        ti=ti, band=cfg.band, wv_max=wv_cls,
                        auto_widen=cfg.auto_widen_band, metric=cfg.metric,
                        rows=rows_cls, interpret=interpret,
                    )
            elif stripe:
                # Per-class geometry at the job's fixed ti: narrower classes
                # always fit where the widest (gating) class did, and a test
                # geometry override applies to every class.
                if geometry is not None:
                    su_c, sv_c = su, sv
                else:
                    g_c = tile_stripe_geometry(
                        Lp, d, _wv_width(scan_cls), ti=ti
                    )
                    assert g_c is not None, (Lp, d, scan_cls, ti)
                    su_c, sv_c = g_c[1], g_c[2]

                def dispatch(di=di, ii=ii, jj=jj, rows_cls=rows_cls,
                             wv_cls=scan_cls, su_c=su_c, sv_c=sv_c):
                    return dtw_tile_stripe_pairs(
                        feats_dev[di], lens_dev[di],
                        jnp.asarray(ii), jnp.asarray(jj),
                        ti=ti, su=su_c, sv=sv_c,
                        band=cfg.band, auto_widen=cfg.auto_widen_band,
                        metric=cfg.metric, rows=rows_cls, wv_max=wv_cls,
                        interpret=interpret,
                    )
            else:
                def dispatch(di=di, ii=ii, jj=jj, rows_cls=rows_cls,
                             scan_cls=scan_cls):
                    return dtw_tile_pairs(
                        feats_dev[di], lens_dev[di],
                        jnp.asarray(ii), jnp.asarray(jj),
                        ti=ti, su=su, sv=sv,
                        band=cfg.band, auto_widen=cfg.auto_widen_band,
                        metric=cfg.metric, rows=rows_cls, scan_steps=scan_cls,
                        interpret=interpret,
                    )

            t0 = time.perf_counter()
            try:
                fut = dispatch()
            except Exception as exc:
                fut = _with_retries(dispatch, max_retries, exc)
            stats["dispatch_s"] += time.perf_counter() - t0
            pending.append((ii, jj, dispatch, fut, path))
            if len(pending) >= 4 * len(devices):
                collect_one()
        while pending:
            collect_one()
    finally:
        if worker is not None:
            scatter_q.put(None)
            worker.join()
    if scatter_err:
        raise scatter_err[0]
    assert not strip_bufs, "incomplete row strips after all chunks"
    return D


def all_pairs_distances(
    features: np.ndarray,          # [K, L, d] padded segment features
    lengths: np.ndarray,           # [K] true frame counts
    cfg: DTWConfig,
    *,
    bucket_step: int = 32,
    block_dir: str | Path | None = None,
    progress: Callable[[int, int], None] | None = None,
    devices: list | None = None,
    matmul_dtype: str | None = None,
    max_retries: int = 1,
    stats: dict | None = None,
    tiled: bool | None = None,
    known: tuple[int, np.ndarray] | None = None,
) -> np.ndarray:
    """Symmetric [K, K] DTW distance matrix over all segment pairs.

    `devices`: optional explicit device list; pair blocks round-robin across
    them (single-host multi-chip DP over pair space).  Default: one device.
    `block_dir`: persist each block's distances for crash resume.
    `max_retries`: failure detection (SURVEY.md SS6.3) — a block whose
    dispatch or materialization raises is retried synchronously up to this
    many times before the error propagates; completed blocks are unaffected
    (and, with `block_dir`, already persisted).
    `stats`: optional dict filled with host-side timing breakdown
    (dispatch_s, collect_s, persist_s, blocks, pad_pairs) for perf triage.
    `known=(k_old, D_old)`: incremental corpus growth (SS6.4) — the first
    k_old sequences' pairwise distances are taken from D_old (a prior run
    over byte-identical features); only pairs touching a new sequence are
    computed, so update cost scales with the new-pair share of the
    triangle, not K^2.
    """
    K, L, _ = features.shape
    lengths = np.asarray(lengths, dtype=np.int32)
    if known is not None:
        k_old, D_old = known
        if not (0 <= k_old <= K and D_old.shape == (k_old, k_old)):
            raise ValueError(
                f"known: D_old shape {D_old.shape} != ({k_old}, {k_old}) "
                f"or k_old {k_old} out of range for K={K}"
            )

    # Round-3 fast path: the all-pairs TILE kernels whenever one applies —
    # the LANE-PACKED kernel for banded jobs up to S=4096 (fastest at
    # every length, BASELINE.md round-3 lane table), the square tile
    # kernel for unbanded S <= 256, the TILE-STRIPE kernel for banded
    # jobs the lane gates exclude (all three kill the per-pair gather
    # traffic that bounds this device).  `tiled` forces the choice either
    # way (tests exercise the tile paths in interpret mode on CPU).
    # bfloat16 matmul_dtype keeps the legacy path: the square/stripe tile
    # kernels are HIGHEST-only by design (the lane kernel's VPU build
    # needs no precision knob at all).
    diag = cfg.band is not None and getattr(cfg, "band_mode", "widen") == "diag"
    if tiled is None:
        tiled = bool(
            cfg.use_pallas
            and _on_tpu()
            and matmul_dtype is None
            and cfg.dtype != "bfloat16"
            and (
                _lane_route(L, features.shape[2], lengths, cfg) is not None
                or (
                    not diag
                    and (
                        tile_geometry(L, features.shape[2]) is not None
                        or _stripe_route(L, features.shape[2], lengths, cfg)
                        is not None
                    )
                )
            )
        )
    if tiled:
        return all_pairs_distances_tiled(
            features, lengths, cfg,
            block_dir=block_dir, progress=progress, devices=devices,
            max_retries=max_retries, stats=stats,
            interpret=not _on_tpu(),
            known=known,
        )

    if cfg.length_bucketing:
        step = min(bucket_step, L)
    else:
        step = L
    D = np.zeros((K, K), dtype=np.float32)
    if K < 2:
        return D

    if devices is None:
        devices = [jax.devices()[0]]
    feats_dev = [jax.device_put(jnp.asarray(features, jnp.float32), d) for d in devices]
    lens_dev = [jax.device_put(jnp.asarray(lengths), d) for d in devices]

    if block_dir is not None:
        block_dir = Path(block_dir)
        block_dir.mkdir(parents=True, exist_ok=True)
        cfg_tag = _cfg_tag(cfg, features, lengths)

    # Effective batch: don't pad a tiny workload up to the configured TPU
    # batch — round the corpus's own pair count to a lane-friendly multiple.
    # The non-Pallas scan path materializes [B, S, S] cost tensors, so cap
    # the batch off-TPU where the default was tuned for the VMEM kernel.
    n_all_pairs = K * (K - 1) // 2
    if known is not None:
        n_all_pairs -= k_old * (k_old - 1) // 2
    B = int(min(cfg.pair_batch, max(8, -(-n_all_pairs // 8) * 8)))
    if not _on_tpu():
        B = min(B, 1024)

    if stats is None:
        stats = {}
    stats.update(
        dispatch_s=0.0, collect_s=0.0, scatter_s=0.0, persist_s=0.0,
        enumerate_s=0.0, blocks=0, pad_pairs=0, pairs=n_all_pairs,
    )

    # Blocks STREAM from the enumerator instead of materializing a list:
    # at 10k sequences the enumeration is tens of seconds of single-core
    # numpy (worse under the shared host's CPU throttling), and streaming
    # overlaps all of it with device work — the in-flight window keeps the
    # chip busy while the host prepares the next groups.
    # Per-block device-gather budget: each dispatch gathers [B, bucket, d]
    # a/b operands, so long buckets must take proportionally smaller blocks
    # (a 128k-pair block at bucket=1024 would gather 17 GiB).
    gather_budget = 2 << 30
    d_feat = features.shape[2]

    def blocks_iter():
        t0 = time.perf_counter()
        for row_cap, bucket, mld, ii, jj in enumerate_pair_blocks(
            lengths, B, step, L, band=cfg.band, auto_widen=cfg.auto_widen_band,
            new_from=None if known is None else k_old,
        ):
            cap = max(512, gather_budget // (bucket * d_feat * 8))
            # Mirror the dispatch-time routing predicate exactly: the stripe
            # kernel only takes this bucket when use_pallas AND on-TPU AND
            # pallas_supported all hold.  Anything else past the kernel
            # ceiling lands on dtw_long_batch, whose [B, nB, blk, blk] cost
            # tiles blow up with gather-budget-sized batches — keep those
            # blocks small.
            stripe_ok = bool(
                cfg.use_pallas
                and _on_tpu()
                and not diag
                and pallas_supported(bucket, cfg.band, cfg.auto_widen_band, mld)
            )
            if bucket > MAX_KERNEL_SEQ_LEN and not stripe_ok:
                cap = min(cap, 512)
            for s in range(0, len(ii), cap):
                stats["enumerate_s"] += time.perf_counter() - t0
                yield row_cap, bucket, mld, ii[s : s + cap], jj[s : s + cap]
                t0 = time.perf_counter()

    total_pairs = n_all_pairs
    done_pairs = 0

    # In-flight results for pipelining: keep a sliding window of dispatched
    # blocks and sync only the oldest when the window is full, so the device
    # queue never empties between host-side collections.
    pending: list[tuple[np.ndarray, np.ndarray, Callable, jax.Array, Path | None]] = []

    def collect_one():
        nonlocal done_pairs
        ii, jj, dispatch, fut, path = pending.pop(0)
        t0 = time.perf_counter()
        try:
            vals = np.asarray(fut)[: len(ii)]
        except Exception as exc:
            vals = _with_retries(
                lambda: np.asarray(dispatch())[: len(ii)], max_retries, exc
            )
        stats["collect_s"] += time.perf_counter() - t0
        t0 = time.perf_counter()
        # Upper-triangle scatter only; one vectorized D + D.T symmetrization
        # at the end replaces the second 50M-element random scatter.
        D[ii, jj] = vals
        stats["scatter_s"] += time.perf_counter() - t0
        if path is not None:
            t0 = time.perf_counter()
            np.savez(path, ii=ii, jj=jj, d=vals)
            stats["persist_s"] += time.perf_counter() - t0
        done_pairs += len(ii)
        if progress:
            progress(done_pairs, total_pairs)

    def drain():
        while pending:
            collect_one()

    for bi, (row_cap, bucket, mld, ii, jj) in enumerate(blocks_iter()):
        stats["blocks"] += 1
        path = None
        if block_dir is not None:
            path = block_dir / (_block_key(ii, jj, cfg_tag) + ".npz")
            if path.exists():
                saved = np.load(path)
                D[saved["ii"], saved["jj"]] = saved["d"]
                done_pairs += len(ii)
                if progress:
                    progress(done_pairs, total_pairs)
                continue

        # Pad partial blocks to the next power of two (not the full batch:
        # length-diverse corpora produce many (bucket, row) combos whose
        # tails would otherwise each dispatch pair_batch of mostly-padding
        # work).  Pad entries are self-pairs of index 0; discarded on
        # collection.
        B_blk = min(B, max(8, 1 << (len(ii) - 1).bit_length()))
        ii_pad = np.zeros(B_blk, dtype=np.int32)
        jj_pad = np.zeros(B_blk, dtype=np.int32)
        ii_pad[: len(ii)] = ii
        jj_pad[: len(jj)] = jj

        # The Mosaic kernel is the fast path on real TPU hardware; the
        # lax.scan wavefront covers CPU test meshes and shapes the kernels
        # can't take (banded blocks past MAX_KERNEL_SEQ_LEN ride the
        # band-limited stripe kernel up to MAX_STRIPE_SEQ_LEN).
        use_pallas = bool(
            cfg.use_pallas
            and _on_tpu()
            and not diag
            and pallas_supported(bucket, cfg.band, cfg.auto_widen_band, mld)
        )
        di = bi % len(devices)

        def dispatch(di=di, ii_pad=ii_pad, jj_pad=jj_pad, row_cap=row_cap,
                     bucket=bucket, mld=mld, use_pallas=use_pallas):
            # Index vectors ride along with the jitted call (one transfer
            # fused into the dispatch — no separate eager device_puts).
            return _dtw_block(
                feats_dev[di],
                lens_dev[di],
                ii_pad,
                jj_pad,
                row_cap=row_cap,
                bucket=bucket,
                metric=cfg.metric,
                band=cfg.band,
                auto_widen=cfg.auto_widen_band,
                normalize=cfg.normalize,
                matmul_dtype=matmul_dtype
                or (cfg.dtype if cfg.dtype == "bfloat16" else None),
                use_pallas=use_pallas,
                max_len_diff=mld,
                band_mode=getattr(cfg, "band_mode", "widen") if diag else "widen",
            )

        stats["pad_pairs"] += B_blk - len(ii)
        t0 = time.perf_counter()
        try:
            fut = dispatch()
        except Exception as exc:
            fut = _with_retries(dispatch, max_retries, exc)
        stats["dispatch_s"] += time.perf_counter() - t0
        pending.append((ii, jj, dispatch, fut, path))
        # 10-deep per device: deep enough that host-side collection (scatter
        # + persist) and the tunnel's dispatch latency never drain the
        # device queue.  In-flight entries hold only the tiny output futures
        # (the gathers live inside each compiled program), so depth costs
        # almost nothing.
        if len(pending) >= 10 * len(devices):
            collect_one()
    drain()
    # Pairs scatter into one triangle each (orientation varies per block);
    # the matrix is their disjoint union, so D + D.T symmetrizes exactly.
    D += D.T
    if known is not None:
        # The old x old block was never enumerated; its distances come from
        # the prior run (after symmetrization, so nothing doubles).
        D[:k_old, :k_old] = D_old
    return D
