"""Automated performance-regression gates (SURVEY.md SS5.2 last bullet).

Run on real hardware with the TPU suite:
    APD_TPU_TESTS=1 python -m pytest tests/test_perf_gate.py -q

Floors sized to the WORST healthy best-of-3 pipelined windows actually
recorded (round 3 re-measured this under live bad weather): across one
day the square kernel's best window spanned 357k-1.06M pairs/s and the
streaming spectrogram 8.6k-74k frames/s — the shared tunnel's weather
moves even pipelined windows ~3-8x, not the ~2x round-2 assumed.  The
tile kernel's gate is the robust one (each dispatch carries 64 tile-pair
programs = seconds of device work, amortizing RPC turbulence; observed
1.49-2.0M).  Floors: pairs 250k, frames 6k, tile 700k — they catch real
multi-x regressions while riding out recorded weather.  Override with
APD_PERF_FLOOR_PAIRS / APD_PERF_FLOOR_FRAMES / APD_PERF_FLOOR_TILE for
stricter CI on a dedicated link.
"""

import os
import time

import numpy as np
import pytest


@pytest.fixture(autouse=True)
def _no_debug_nans():
    """conftest enables jax_debug_nans suite-wide (the SS6.2 sanitizer) —
    but it forces a device->host materialization of EVERY jitted output to
    scan for NaNs, which for these gates times a download the production
    pipeline never performs and serializes the pipelined dispatch windows
    (measured: the spectrogram gate read 1.7-4.5k frames/s under the
    sanitizer vs 50k for the identical path in bench.py, which runs
    outside pytest).  Perf gates measure throughput, not numerics; the
    parity tests keep the sanitizer."""
    import jax

    jax.config.update("jax_debug_nans", False)
    yield
    jax.config.update("jax_debug_nans", True)


@pytest.mark.tpu
def test_dtw_kernel_throughput_floor(rng):
    import jax.numpy as jnp

    from audio_pattern_discovery_tpu.ops.dtw_pallas import dtw_batch_pallas

    floor = float(os.environ.get("APD_PERF_FLOOR_PAIRS", 250_000))
    B, S, d = 32_768, 128, 16
    lengths = rng.integers(S // 2, S + 1, B).astype(np.int32)
    a = jnp.asarray(rng.normal(0, 1, (B, S, d)).astype(np.float32))
    b = jnp.asarray(rng.normal(0, 1, (B, S, d)).astype(np.float32))
    la = jnp.asarray(lengths)
    lb = jnp.asarray(np.roll(lengths, 1))

    def run():
        return dtw_batch_pallas(a, b, la, lb, band=16, normalize="path_len")

    np.asarray(run())  # compile + warm
    for o in [run() for _ in range(3)]:
        np.asarray(o)
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [run() for _ in range(4)]
        for o in outs:
            np.asarray(o)
        best = max(best, 4 * B / (time.perf_counter() - t0))
    assert best >= floor, f"DTW kernel {best:,.0f} pairs/s < floor {floor:,.0f}"


@pytest.mark.tpu
def test_spectrogram_throughput_floor(rng):
    from audio_pattern_discovery_tpu.config import SpectrogramConfig
    from audio_pattern_discovery_tpu.ops.spectrogram import spectrogram_corpus

    floor = float(os.environ.get("APD_PERF_FLOOR_FRAMES", 6_000))
    cfg = SpectrogramConfig()
    sigs = [
        (rng.normal(0, 0.1, 15 * 44_100) * 3276.8).clip(-32768, 32767).astype(np.int16)
        for _ in range(8)
    ]
    scales = np.ones(len(sigs), np.float32)

    def run():
        # return_device=True is the production path (pipeline.py consumes
        # spectrograms on-device; there is no [B, F, bins] download) and
        # what bench.py measures.  Without it this gate times a ~21 MB
        # host download per call that no real run performs — measured
        # 4.5k frames/s in a session where the production path did 50k.
        specs_dev, fc, _ = spectrogram_corpus(
            sigs, cfg, scales=scales, return_device=True
        )
        np.asarray(specs_dev[:, -1, 0])  # honest sync barrier
        return fc

    run()  # compile + warm
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        fc = run()
        best = max(best, int(fc.sum()) / (time.perf_counter() - t0))
    assert best >= floor, f"spectrogram {best:,.0f} frames/s < floor {floor:,.0f}"


@pytest.mark.tpu
def test_tile_kernel_throughput_floor(rng):
    """Round-3 all-pairs tile kernel: healthy ~1.5M pairs/s at S=128
    (su=8, sv=64 plateau); floor 700k rides out tunnel weather while
    catching a 2x regression."""
    import jax.numpy as jnp

    from audio_pattern_discovery_tpu.ops.dtw_pallas import (
        dtw_tile_pairs,
        tile_geometry,
    )

    floor = float(os.environ.get("APD_PERF_FLOOR_TILE", 700_000))
    S, d = 128, 16
    ti, su, sv = tile_geometry(S)
    K = 9 * ti
    feats = jnp.asarray(rng.normal(0, 1, (K, S, d)).astype(np.float32))
    lens = jnp.asarray(rng.integers(S // 2, S + 1, K).astype(np.int32))
    pairs = [(i, j) for i in range(9) for j in range(i + 1, 9)]
    ii = jnp.asarray(np.array([p[0] for p in pairs[:32]], np.int32))
    jj = jnp.asarray(np.array([p[1] for p in pairs[:32]], np.int32))
    n = 32 * ti * ti

    def run():
        return dtw_tile_pairs(feats, lens, ii, jj, ti=ti, su=su, sv=sv,
                              band=16)

    np.asarray(run())  # compile + warm
    for o in [run() for _ in range(2)]:
        np.asarray(o)
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [run() for _ in range(3)]
        for o in outs:
            np.asarray(o)
        best = max(best, 3 * n / (time.perf_counter() - t0))
    assert best >= floor, f"tile kernel {best:,.0f} pairs/s < floor {floor:,.0f}"


@pytest.mark.tpu
def test_lane_kernel_throughput_floor(rng):
    """Round-3 LANE-PACKED kernel (the banded production path): healthy
    ~6M pairs/s at uniform wv, ~4.3-4.5M under the bench's realistic
    class mix; floor 1.5M rides out the recorded ~3x weather while
    catching a 3x regression (BASELINE.md round-3 lane table)."""
    import jax.numpy as jnp

    from audio_pattern_discovery_tpu.ops.dtw_pallas import dtw_tile_lane_pairs

    floor = float(os.environ.get("APD_PERF_FLOOR_LANE", 1_500_000))
    S, d, ti = 128, 16, 128
    K = 9 * ti
    feats = jnp.asarray(rng.normal(0, 1, (K, S, d)).astype(np.float32))
    lens = jnp.asarray(rng.integers(S - 16, S + 1, K).astype(np.int32))
    pairs = [(i, j) for i in range(9) for j in range(i + 1, 9)]
    ii = jnp.asarray(np.array([p[0] for p in pairs[:32]], np.int32))
    jj = jnp.asarray(np.array([p[1] for p in pairs[:32]], np.int32))
    n = 32 * ti * ti

    def run():
        return dtw_tile_lane_pairs(
            feats, lens, ii, jj, ti=ti, band=16, wv_max=16
        )

    np.asarray(run())  # compile + warm
    for o in [run() for _ in range(2)]:
        np.asarray(o)
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [run() for _ in range(3)]
        for o in outs:
            np.asarray(o)
        best = max(best, 3 * n / (time.perf_counter() - t0))
    assert best >= floor, f"lane kernel {best:,.0f} pairs/s < floor {floor:,.0f}"


def _diag_fixture(rng, K, S, ti, d):
    """Length-varied sorted corpus + long-on-rows pair orientation + merged
    class bounds — the production diag-lane configuration (round 4's
    headline path; the scheduler does exactly this)."""
    import jax.numpy as jnp

    from audio_pattern_discovery_tpu.ops.dtw_pallas import (
        diag_class_bounds,
        tile_rep_lengths,
    )

    lens_np = np.sort(rng.integers(S // 2, S + 1, K)).astype(np.int32)
    nT = K // ti
    rep = jnp.asarray(tile_rep_lengths(lens_np, nT, ti, K))
    tmin = [int(lens_np[t * ti:(t + 1) * ti].min()) for t in range(nT)]
    tmax = [int(lens_np[t * ti:(t + 1) * ti].max()) for t in range(nT)]
    pairs = [(j, i) for i in range(nT) for j in range(i + 1, nT)][:32]
    wv_d, kmax_d = 16, 1
    for a, b in pairs:
        wv, km = diag_class_bounds(16, tmin[a], tmax[a], tmin[b], tmax[b])
        wv_d, kmax_d = max(wv_d, wv), max(kmax_d, km)
    rows_d = max(tmax[a] for a, _ in pairs)
    ii = jnp.asarray(np.array([p[0] for p in pairs], np.int32))
    jj = jnp.asarray(np.array([p[1] for p in pairs], np.int32))
    return lens_np, rep, ii, jj, wv_d, kmax_d, rows_d, len(pairs)


@pytest.mark.tpu
def test_diag_lane_kernel_throughput_floor(rng):
    """Round-4/5 HEADLINE kernel (diag corridor, long-on-rows): healthy
    ~4.5-5.1M pairs/s at the bench's length mix, worst recorded weather
    window 2.25M (BASELINE.md round-4 orientation entry); floor 1.2M rides
    the recorded spread while catching a ~2x kernel regression.  VERDICT r4
    item 2: gate the PRODUCTION kernel, not its predecessors."""
    import jax.numpy as jnp

    from audio_pattern_discovery_tpu.ops.dtw_pallas import (
        dtw_tile_lane_diag_pairs,
    )

    floor = float(os.environ.get("APD_PERF_FLOOR_DIAG", 1_200_000))
    S, d, ti = 128, 16, 128
    K = 9 * ti
    lens_np, rep, ii, jj, wv_d, kmax_d, rows_d, npr = _diag_fixture(
        rng, K, S, ti, d
    )
    feats = jnp.asarray(rng.normal(0, 1, (K, S, d)).astype(np.float32))
    lens = jnp.asarray(lens_np)
    n = npr * ti * ti

    def run():
        return dtw_tile_lane_diag_pairs(
            feats, lens, rep, ii, jj, ti=ti, band=16,
            wv_max=wv_d, kmax=kmax_d, rows=rows_d,
        )

    np.asarray(run())  # compile + warm
    for o in [run() for _ in range(2)]:
        np.asarray(o)
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [run() for _ in range(3)]
        for o in outs:
            np.asarray(o)
        best = max(best, 3 * n / (time.perf_counter() - t0))
    assert best >= floor, (
        f"diag lane kernel {best:,.0f} pairs/s < floor {floor:,.0f}"
    )


@pytest.mark.tpu
def test_kernel_ratio_gates(rng):
    """Weather-immune regression gates (VERDICT r3 item 6): the lane and
    square-tile ALL-PAIRS kernels are timed back-to-back against the legacy
    per-pair square kernel IN ONE PROCESS, so tunnel weather multiplies
    both sides and cancels in the ratio.  Healthy ratios on the v5e:
    lane/legacy ~6-8x, tile/legacy ~2.5-3x (BASELINE.md rounds 3-4); the
    3x / 1.5x floors catch a 2x kernel regression in ANY weather window
    where the absolute floors would still pass.

    Proof-of-catch: APD_PERF_INJECT_SLOWDOWN=2 dispatches the all-pairs
    kernels that many extra times per timed window (a synthetic N-x
    slowdown); the gate must then FAIL (exercised by
    test_ratio_gate_catches_injected_slowdown below, which expects the
    failure without burning a second process).
    """
    import jax.numpy as jnp

    from audio_pattern_discovery_tpu.ops.dtw_pallas import (
        dtw_batch_pallas,
        dtw_tile_lane_diag_pairs,
        dtw_tile_lane_pairs,
        dtw_tile_pairs,
        tile_geometry,
    )

    lane_floor = float(os.environ.get("APD_PERF_RATIO_LANE", 3.0))
    diag_floor = float(os.environ.get("APD_PERF_RATIO_DIAG", 3.0))
    tile_floor = float(os.environ.get("APD_PERF_RATIO_TILE", 1.5))
    inject = int(os.environ.get("APD_PERF_INJECT_SLOWDOWN", 1))

    S, d, ti = 128, 16, 128
    K = 9 * ti
    feats = jnp.asarray(rng.normal(0, 1, (K, S, d)).astype(np.float32))
    lens_np = rng.integers(S - 16, S + 1, K).astype(np.int32)
    lens = jnp.asarray(lens_np)
    pairs = [(i, j) for i in range(9) for j in range(i + 1, 9)]
    ii = jnp.asarray(np.array([p[0] for p in pairs[:32]], np.int32))
    jj = jnp.asarray(np.array([p[1] for p in pairs[:32]], np.int32))
    n_tile = 32 * ti * ti

    # Per-pair batch: gathered index pairs over the SAME corpus (K < B, so
    # plain slicing would under/overflow — this is the production gather
    # pattern the legacy kernel pays for anyway).
    B = 4_096
    gi = jnp.asarray(rng.integers(0, K, B, dtype=np.int32))
    gj = jnp.asarray(rng.integers(0, K, B, dtype=np.int32))
    pa, pb, pla, plb = feats[gi], feats[gj], lens[gi], lens[gj]
    n_pp = B

    ti_g, su, sv = tile_geometry(S)
    assert ti_g == ti

    def run_legacy():
        return [dtw_batch_pallas(pa, pb, pla, plb, band=16,
                                 normalize="path_len", max_len_diff=16)]

    def run_lane():
        return [
            dtw_tile_lane_pairs(feats, lens, ii, jj, ti=ti, band=16,
                                wv_max=16)
            for _ in range(inject)
        ]

    # Diag (headline) kernel over the SAME corpus: class bounds from the
    # real helper so the gate exercises the production configuration.
    from audio_pattern_discovery_tpu.ops.dtw_pallas import (
        diag_class_bounds,
        tile_rep_lengths,
    )

    rep = jnp.asarray(tile_rep_lengths(lens_np, 9, ti, K))
    tmin = [int(lens_np[t * ti:(t + 1) * ti].min()) for t in range(9)]
    tmax = [int(lens_np[t * ti:(t + 1) * ti].max()) for t in range(9)]
    wv_d, kmax_d = 16, 1
    for a, b in pairs[:32]:
        wv, km = diag_class_bounds(16, tmin[a], tmax[a], tmin[b], tmax[b])
        wv_d, kmax_d = max(wv_d, wv), max(kmax_d, km)
    rows_d = int(lens_np.max())

    def run_diag():
        return [
            dtw_tile_lane_diag_pairs(
                feats, lens, rep, ii, jj, ti=ti, band=16,
                wv_max=wv_d, kmax=kmax_d, rows=rows_d,
            )
            for _ in range(inject)
        ]

    def run_tile():
        return [
            dtw_tile_pairs(feats, lens, ii, jj, ti=ti, su=su, sv=sv, band=16)
            for _ in range(inject)
        ]

    def rate(run, n):
        for o in run():          # compile + warm
            np.asarray(o)
        for _ in range(2):
            for o in run():
                np.asarray(o)
        best = 0.0
        for _ in range(3):
            t0 = time.perf_counter()
            outs = [run() for _ in range(3)]
            for og in outs:
                for o in og:
                    np.asarray(o)
            best = max(best, 3 * n / (time.perf_counter() - t0))
        return best

    # Interleave: legacy measured in the SAME windows bracketing the
    # all-pairs kernels, so a mid-test weather shift cannot fake a ratio.
    legacy1 = rate(run_legacy, n_pp)
    diag = rate(run_diag, n_tile)
    lane = rate(run_lane, n_tile)
    tile = rate(run_tile, n_tile)
    legacy2 = rate(run_legacy, n_pp)
    legacy = max(legacy1, legacy2)

    assert diag >= diag_floor * legacy, (
        f"diag/legacy ratio {diag / legacy:.2f} < {diag_floor} "
        f"(diag {diag:,.0f}, legacy {legacy:,.0f} pairs/s)"
    )
    assert lane >= lane_floor * legacy, (
        f"lane/legacy ratio {lane / legacy:.2f} < {lane_floor} "
        f"(lane {lane:,.0f}, legacy {legacy:,.0f} pairs/s)"
    )
    assert tile >= tile_floor * legacy, (
        f"tile/legacy ratio {tile / legacy:.2f} < {tile_floor} "
        f"(tile {tile:,.0f}, legacy {legacy:,.0f} pairs/s)"
    )
    if os.environ.get("APD_PERF_RETURN_RATIOS") == "1":
        # consumed by test_ratio_gate_catches_injected_slowdown only; a
        # plain pytest run never sees a non-None test return.
        return diag / legacy, lane / legacy, tile / legacy


@pytest.mark.tpu
def test_full_kernel_ratio_gate(rng):
    """Round-4 unbanded fast path: the FULL-WIDTH lane kernel vs the
    per-pair square kernel it supersedes (band=None, S=512), back-to-back
    in one process so weather cancels.  Healthy ratio ~3.9x (BASELINE.md
    round-4 unbanded table); the 2x floor catches a ~2x kernel regression
    in any window."""
    import jax.numpy as jnp

    from audio_pattern_discovery_tpu.ops.dtw_pallas import (
        dtw_batch_pallas,
        dtw_tile_lane_full_pairs,
    )

    floor = float(os.environ.get("APD_PERF_RATIO_FULL", 2.0))
    S, d, ti = 512, 16, 128
    K = 4 * ti
    feats = jnp.asarray(rng.normal(0, 1, (K, S, d)).astype(np.float32))
    lens_np = rng.integers(S - 16, S + 1, K).astype(np.int32)
    lens = jnp.asarray(lens_np)
    lmax = int(lens_np.max())
    w_full = 8 * -(-lmax // 8)
    pairs = [(i, j) for i in range(4) for j in range(i + 1, 4)]
    ii = jnp.asarray(np.array([p[0] for p in pairs], np.int32))
    jj = jnp.asarray(np.array([p[1] for p in pairs], np.int32))
    n_full = len(pairs) * ti * ti

    bi = np.repeat(np.arange(ti), ti)
    bj = np.tile(np.arange(ti, 2 * ti), ti)
    n_pp = len(bi)

    def run_full():
        return [dtw_tile_lane_full_pairs(
            feats, lens, ii, jj, ti=ti, width=w_full, rows=lmax)]

    def run_pp():
        return [dtw_batch_pallas(
            feats[bi], feats[bj], lens[bi], lens[bj], band=None)]

    def rate(run, n, iters=3):
        for o in run():
            np.asarray(o)
        best = 0.0
        for _ in range(3):
            t0 = time.perf_counter()
            outs = [run() for _ in range(iters)]
            for og in outs:
                for o in og:
                    np.asarray(o)
            best = max(best, iters * n / (time.perf_counter() - t0))
        return best

    pp1 = rate(run_pp, n_pp)
    full = rate(run_full, n_full)
    pp2 = rate(run_pp, n_pp)
    pp = max(pp1, pp2)
    assert full >= floor * pp, (
        f"full/per-pair ratio {full / pp:.2f} < {floor} "
        f"(full {full:,.0f}, per-pair {pp:,.0f} pairs/s)"
    )


@pytest.mark.tpu
def test_ratio_gate_catches_injected_slowdown(rng, monkeypatch):
    """Prove the ratio gate trips on a synthetic 4x all-pairs slowdown
    (VERDICT r3 item 6's done bar).  The slowed pass's floor is set
    ADAPTIVELY to half the same-process healthy ratio: in dispatch-bound
    weather the healthy ratio itself inflates (per-pair dispatches suffer
    far more than 64-program chunks — measured 20x on 2026-08-19), so no
    static floor can both hold in good weather and trip here in bad."""
    monkeypatch.setenv("APD_PERF_RETURN_RATIOS", "1")
    diag_r, lane_r, _ = test_kernel_ratio_gates(rng)
    monkeypatch.setenv("APD_PERF_INJECT_SLOWDOWN", "4")
    # VERDICT r4 item 2's done bar: the injected slowdown of the DIAG
    # (headline) kernel must trip ITS gate.  Lane/tile floors are zeroed so
    # the failure is attributable to the diag assertion alone.
    monkeypatch.setenv("APD_PERF_RATIO_DIAG", str(diag_r * 0.5))
    monkeypatch.setenv("APD_PERF_RATIO_LANE", "0")
    monkeypatch.setenv("APD_PERF_RATIO_TILE", "0")
    with pytest.raises(AssertionError, match="diag/legacy ratio"):
        test_kernel_ratio_gates(rng)
    # And independently for the straight lane kernel (round-4 proof kept).
    monkeypatch.setenv("APD_PERF_RATIO_DIAG", "0")
    monkeypatch.setenv("APD_PERF_RATIO_LANE", str(lane_r * 0.5))
    with pytest.raises(AssertionError, match="lane/legacy ratio"):
        test_kernel_ratio_gates(rng)
