"""All-pairs LANE-PACKED tile kernel (round 3): pairs on lanes, stripe on
sublanes — parity with the oracle-verified scan path, the stripe-frame
contracts, geometry gates, and scheduler routing.

The kernel exists because the tile-stripe kernel is fully compute-bound
with ~4x lane waste (33 live of 128 lanes at band=16; BASELINE.md round-3
repeat-slope probes): flipping pairs onto lanes advances 128 pairs per
vector row op and measured 6.0M pairs/s at S=128 / 2.9M at S=512 on the
v5e — 2.9x/9.3x the square-tile/tile-stripe kernels it supersedes on
banded jobs.  Runs in interpret mode on the CPU suite; on-hardware
measurement lives in tools/kernel_tile_diag.py --lane.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from audio_pattern_discovery_tpu.ops.dtw import dtw_batch
from audio_pattern_discovery_tpu.ops.dtw_pallas import (
    dtw_tile_lane_pairs,
    lane_geometry,
)

TI = 8
# S=128 keeps interpret-mode cost tractable (~20 s XLA:CPU compile +
# ~2 s execution PER distinct static-arg combination; S=512 graphs took
# minutes each).  The frame algebra has no S-dependent branches and
# S=512..4096 are hardware-verified in tools/kernel_tile_diag.py --lane
# (BASELINE.md round-3 lane table).
S, D = 128, 5


def _mk(K, seed=0, spread=30):
    rng = np.random.default_rng(seed)
    feats = rng.normal(0, 1, (K, S, D)).astype(np.float32)
    lengths = rng.integers(S - spread, S + 1, K).astype(np.int32)
    return jnp.asarray(feats), jnp.asarray(lengths)


def _ref_block(feats, lengths, rows, cols, **kw):
    ii = np.repeat(rows, len(cols))
    jj = np.tile(cols, len(rows))
    d = dtw_batch(
        feats[ii], feats[jj], lengths[ii], lengths[jj], normalize="none", **kw
    )
    return np.asarray(d).reshape(len(rows), len(cols)).copy()


@pytest.mark.parametrize(
    "kw",
    [
        dict(band=16, auto_widen=True, metric="euclidean"),
        # sqeuclidean is euclidean minus the sqrt — cosine covers the
        # other cost formula; each param is a ~25 s interpret compile
        dict(band=16, auto_widen=True, metric="cosine"),
    ],
)
@pytest.mark.full
def test_lane_matches_scan_path(kw):
    feats, lengths = _mk(2 * TI, seed=1)
    blocks = np.asarray(
        dtw_tile_lane_pairs(
            feats, lengths,
            jnp.asarray([0, 0, 1], jnp.int32),
            jnp.asarray([0, 1, 1], jnp.int32),
            ti=TI, wv_max=40, interpret=True, **kw,
        )
    ).copy()
    r0 = np.arange(TI)
    r1 = np.arange(TI, 2 * TI)
    for u, (rows, cols) in enumerate([(r0, r0), (r0, r1), (r1, r1)]):
        ref = _ref_block(np.asarray(feats), np.asarray(lengths), rows, cols,
                         **kw)
        got = blocks[u]
        if rows[0] == cols[0]:
            # Self-pairs: the build is f32 but still uses the channel
            # trick (sqa + sqb - 2ab), so |a-a|^2 carries an O(1e-5)/cell
            # cancellation residue that sqrt amplifies near zero and the
            # path accumulates; the scheduler forces the diagonal to 0,
            # so only bound it here (same contract as the other tile
            # kernels).
            assert np.all(np.abs(np.diag(got)) <= 1e-1)
            np.fill_diagonal(got, 0.0)
            np.fill_diagonal(ref, 0.0)
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-3)


@pytest.mark.full
def test_lane_hard_band_inf_agreement():
    feats, lengths = _mk(2 * TI, seed=1)
    got = np.asarray(
        dtw_tile_lane_pairs(
            feats, lengths,
            jnp.asarray([0], jnp.int32), jnp.asarray([1], jnp.int32),
            ti=TI, band=16, auto_widen=False, wv_max=40, interpret=True,
        )
    )[0]
    ref = _ref_block(
        np.asarray(feats), np.asarray(lengths),
        np.arange(TI), np.arange(TI, 2 * TI),
        band=16, auto_widen=False,
    )
    assert np.array_equal(np.isinf(got), np.isinf(ref))
    m = np.isfinite(ref)
    assert m.sum() > 0
    np.testing.assert_allclose(got[m], ref[m], rtol=1e-4, atol=1e-3)


@pytest.mark.full
def test_lane_out_of_frame_pair_is_inf_not_wrong():
    """A pair whose widened band exceeds wv_max must come back +inf, never
    a silently-truncated distance (the tile-stripe kernel's contract)."""
    feats, lengths = _mk(2 * TI, seed=2)
    l3 = np.asarray(lengths).copy()
    l3[0] = 20                        # |20 - ~128| = ~108 >> wv_max=40
    got = np.asarray(
        dtw_tile_lane_pairs(
            feats, jnp.asarray(l3),
            jnp.asarray([0], jnp.int32), jnp.asarray([1], jnp.int32),
            ti=TI, band=16, wv_max=40, interpret=True,
        )
    )[0]
    assert np.all(np.isinf(got[0]))
    assert np.all(np.isfinite(got[1:]))


@pytest.mark.full
def test_lane_block_transpose_symmetry():
    feats, lengths = _mk(2 * TI, seed=5)
    blocks = np.asarray(
        dtw_tile_lane_pairs(
            feats, lengths,
            jnp.asarray([0, 1], jnp.int32), jnp.asarray([1, 0], jnp.int32),
            ti=TI, band=16, wv_max=40, interpret=True,
        )
    )
    np.testing.assert_allclose(blocks[0], blocks[1].T, rtol=1e-5, atol=1e-3)


@pytest.mark.full
def test_lane_rows_bound_and_unroll_identical():
    """A tight static `rows` and a degraded unroll factor must be
    value-identical to the full, unroll-1 row loop.  Lengths are clamped
    to S-4 so the tight rows class still covers every A length (the
    kernel's rows contract); rows=S-4 also forces UR to degrade 8 -> 4
    (124 % 8 != 0).  UR=32 is hardware-verified instead (BASELINE.md lane
    table) — its interpret-mode XLA:CPU compile alone took ~19 min."""
    feats, lengths = _mk(TI, seed=6)
    lengths = jnp.minimum(lengths, S - 4)
    ii = jnp.asarray([0], jnp.int32)
    kw = dict(ti=TI, band=16, wv_max=40, interpret=True)
    full = np.asarray(
        dtw_tile_lane_pairs(feats, lengths, ii, ii, unroll_rows=1, **kw)
    )
    got = np.asarray(
        dtw_tile_lane_pairs(
            feats, lengths, ii, ii, rows=S - 4, unroll_rows=8, **kw
        )
    )
    np.testing.assert_array_equal(full, got)


@pytest.mark.full
def test_lane_wider_stripe_class():
    feats, _ = _mk(2 * TI, seed=3)
    rng = np.random.default_rng(4)
    lengths = rng.integers(S - 100, S + 1, 2 * TI).astype(np.int32)
    got = np.asarray(
        dtw_tile_lane_pairs(
            feats, jnp.asarray(lengths),
            jnp.asarray([0], jnp.int32), jnp.asarray([1], jnp.int32),
            ti=TI, band=16, wv_max=100, interpret=True,
        )
    )[0]
    ref = _ref_block(
        np.asarray(feats), lengths, np.arange(TI), np.arange(TI, 2 * TI),
        band=16,
    )
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-3)


def test_lane_geometry_gates():
    # banded jobs up to S=4096 ride the lane kernel at any stripe width
    for seq, wide in ((128, 48), (512, 48), (512, 256), (4096, 48)):
        assert lane_geometry(seq, 16, wide) == 128, (seq, wide)
    # beyond the stripe ceiling
    assert lane_geometry(8192, 16, 48) is None
    # SMEM gate: the per-row A block (d+1)*S*4 must stay under the
    # hardware-verified budget (S=4096 x d=16 = 279 KB measured working)
    assert lane_geometry(4096, 16, 48) == 128
    assert lane_geometry(4096, 64, 48) is None
    # VMEM gate: huge-d B tiles are excluded
    assert lane_geometry(512, 513, 48) is None


# ------------------------------------------------------------- scheduler


@pytest.mark.full
def test_lane_scheduler_matches_legacy():
    from audio_pattern_discovery_tpu.config import DTWConfig
    from audio_pattern_discovery_tpu.parallel.pair_scheduler import (
        all_pairs_distances,
        all_pairs_distances_tiled,
    )

    feats, lengths = _mk(20, seed=7)
    feats_np, lengths_np = np.asarray(feats), np.asarray(lengths)
    cfg = DTWConfig(band=16, normalize="path_len", band_mode="widen")
    D_legacy = all_pairs_distances(feats_np, lengths_np, cfg, tiled=False)
    stats: dict = {}
    D_tiled = all_pairs_distances_tiled(
        feats_np, lengths_np, cfg, interpret=True, geometry=(TI, 0, 0),
        lane=True, stats=stats,
    )
    assert stats["lane"] is True
    np.testing.assert_allclose(D_tiled, D_legacy, rtol=1e-4, atol=1e-4)
    assert np.allclose(D_tiled, D_tiled.T)
    np.testing.assert_allclose(np.diag(D_tiled), 0.0, atol=1e-6)


def test_lane_route_gating():
    """_lane_route: fires exactly for banded jobs inside the SMEM/VMEM
    gates, and outranks both other kernels in the auto-router."""
    from audio_pattern_discovery_tpu.config import DTWConfig
    from audio_pattern_discovery_tpu.parallel.pair_scheduler import (
        _lane_route,
        _ws_level,
        _ws_width,
    )

    lens = np.array([480, 500, 512], np.int32)
    assert _lane_route(512, 8, lens, DTWConfig(band=16)) == 128
    # short sequences are in range too (supersedes the square kernel)
    assert _lane_route(128, 8, lens, DTWConfig(band=16)) == 128
    # band=None rides the FULL-WIDTH lane kernel since round 4 (S > 256;
    # routing details in tests/test_dtw_lane_full.py::test_lane_route_unbanded)
    assert _lane_route(512, 8, lens, DTWConfig(band=None)) == 128
    # class quantization round-trips: width covers its level exactly
    for wv in (1, 7, 8, 16, 23, 100):
        lvl = _ws_level(wv)
        assert lvl >= wv
        assert _ws_width(lvl) == _ws_width(wv)


@pytest.mark.full
def test_lane_scheduler_resume(tmp_path):
    from audio_pattern_discovery_tpu.config import DTWConfig
    from audio_pattern_discovery_tpu.parallel.pair_scheduler import (
        all_pairs_distances_tiled,
    )

    feats, lengths = _mk(20, seed=8)
    cfg = DTWConfig(band=16, band_mode="widen")
    stats1: dict = {}
    D1 = all_pairs_distances_tiled(
        np.asarray(feats), np.asarray(lengths), cfg, interpret=True,
        geometry=(TI, 0, 0), lane=True, block_dir=tmp_path,
        stats=stats1, chunk_programs=2,
    )
    stats2: dict = {}
    D2 = all_pairs_distances_tiled(
        np.asarray(feats), np.asarray(lengths), cfg, interpret=True,
        geometry=(TI, 0, 0), lane=True, block_dir=tmp_path,
        stats=stats2, chunk_programs=2,
    )
    np.testing.assert_array_equal(D1, D2)
    assert stats2["dispatch_s"] == 0.0
