"""All-pairs TILE-STRIPE kernel (round 3, long sequences): parity with the
oracle-verified scan path, the stripe-frame contracts, and geometry routing.

The kernel exists because banded pairs past the square tile kernel's range
(S > 256) ride per-pair kernels whose wall is ~80% gathered-input DMA on
this device (~40 KB/pair at S=512; BASELINE.md round-3 findings) — tiles
reuse each sequence across ti*ti pairs, leaving only the stripe DP + panel
skew.  Runs in interpret mode on the CPU suite; on-hardware measurement
lives in tools/kernel_tile_diag.py --stripe.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from audio_pattern_discovery_tpu.ops.dtw import dtw_batch
from audio_pattern_discovery_tpu.ops.dtw_pallas import (
    dtw_tile_stripe_pairs,
    tile_stripe_geometry,
)

TI, SU, SV = 8, 4, 8
S, D = 512, 5


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
        dict(band=16, auto_widen=True, metric="sqeuclidean"),
        dict(band=16, auto_widen=True, metric="cosine"),
    ],
)
@pytest.mark.full
def test_tile_stripe_matches_scan_path(kw):
    feats, lengths = _mk(2 * TI, seed=1)
    blocks = np.asarray(
        dtw_tile_stripe_pairs(
            feats, lengths,
            jnp.asarray([0, 0, 1], jnp.int32),
            jnp.asarray([0, 1, 1], jnp.int32),
            ti=TI, su=SU, sv=SV, wv_max=40, interpret=True, **kw,
        )
    )
    r0 = np.arange(TI)
    r1 = np.arange(TI, 2 * TI)
    for u, (rows, cols) in enumerate([(r0, r0), (r0, r1), (r1, r1)]):
        ref = _ref_block(np.asarray(feats), np.asarray(lengths), rows, cols,
                         **kw)
        got = blocks[u].copy()
        if rows[0] == cols[0]:
            # Self-pairs: the fused sqb-2ab dot leaves an O(1e-5)/cell
            # cancellation residue that sqrt amplifies near zero and a
            # ~500-cell path accumulates; the scheduler forces the diagonal
            # to 0, so only bound it here.
            assert np.all(np.abs(np.diag(got)) <= 1e-1)
            np.fill_diagonal(got, 0.0)
            np.fill_diagonal(ref, 0.0)
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-3)


@pytest.mark.full
def test_tile_stripe_hard_band_inf_agreement():
    """auto_widen=False: pairs with |la-lb| > band have NO in-band path —
    both the scan path and the stripe must return +inf for exactly the
    same pairs, and agree tightly on the reachable ones."""
    feats, lengths = _mk(2 * TI, seed=1)
    got = np.asarray(
        dtw_tile_stripe_pairs(
            feats, lengths,
            jnp.asarray([0], jnp.int32), jnp.asarray([1], jnp.int32),
            ti=TI, su=SU, sv=SV, band=16, auto_widen=False, wv_max=40,
            interpret=True,
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
def test_tile_stripe_out_of_frame_pair_is_inf_not_wrong():
    """A pair whose widened band exceeds wv_max must come back +inf (its
    extraction slot lies outside the stripe), never a silently-truncated
    distance — the documented contract violation signature."""
    feats, lengths = _mk(2 * TI, seed=2)
    l3 = np.asarray(lengths).copy()
    l3[0] = 100                       # |100 - ~500| >> wv_max
    got = np.asarray(
        dtw_tile_stripe_pairs(
            feats, jnp.asarray(l3),
            jnp.asarray([0], jnp.int32), jnp.asarray([1], jnp.int32),
            ti=TI, su=SU, sv=SV, band=16, wv_max=40, interpret=True,
        )
    )[0]
    assert np.all(np.isinf(got[0]))
    assert np.all(np.isfinite(got[1:]))


@pytest.mark.full
def test_tile_stripe_block_transpose_symmetry():
    feats, lengths = _mk(2 * TI, seed=5)
    blocks = np.asarray(
        dtw_tile_stripe_pairs(
            feats, lengths,
            jnp.asarray([0, 1], jnp.int32), jnp.asarray([1, 0], jnp.int32),
            ti=TI, su=SU, sv=SV, band=16, wv_max=40, interpret=True,
        )
    )
    np.testing.assert_allclose(blocks[0], blocks[1].T, rtol=1e-5, atol=1e-3)


@pytest.mark.full
def test_tile_stripe_rows_bound_identical():
    """A tight static `rows` covering every A-tile length must be
    value-identical to the full row loop."""
    feats, lengths = _mk(TI, seed=6)
    ii = jnp.asarray([0], jnp.int32)
    kw = dict(ti=TI, su=SU, sv=SV, band=16, wv_max=40, interpret=True)
    full = np.asarray(dtw_tile_stripe_pairs(feats, lengths, ii, ii, **kw))
    tight = np.asarray(
        dtw_tile_stripe_pairs(feats, lengths, ii, ii, rows=S, **kw)
    )
    np.testing.assert_array_equal(full, tight)


@pytest.mark.full
def test_tile_stripe_wider_stripe_class():
    """wv_max=100 -> W=256: the second stripe-width class must stay exact
    (panel windows, extraction slots, and scan depth all shift with W)."""
    feats, _ = _mk(2 * TI, seed=3)
    rng = np.random.default_rng(4)
    lengths = rng.integers(S - 100, S + 1, 2 * TI).astype(np.int32)
    got = np.asarray(
        dtw_tile_stripe_pairs(
            feats, jnp.asarray(lengths),
            jnp.asarray([0], jnp.int32), jnp.asarray([1], jnp.int32),
            ti=TI, su=SU, sv=SV, band=16, wv_max=100, interpret=True,
        )
    )[0]
    ref = _ref_block(
        np.asarray(feats), lengths, np.arange(TI), np.arange(TI, 2 * TI),
        band=16,
    )
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-3)


def test_tile_stripe_geometry_ranges():
    # square tile kernel owns S <= 256; stripe must be narrower than the row
    assert tile_stripe_geometry(256, 8, 128) is None
    assert tile_stripe_geometry(512, 8, 512) is None
    assert tile_stripe_geometry(8192, 8, 128) is None
    for seq, wide in ((384, 128), (512, 128), (512, 256), (1024, 128),
                      (2048, 128), (4096, 128)):
        geom = tile_stripe_geometry(seq, 8, wide)
        assert geom is not None, (seq, wide)
        ti, su, sv = geom
        assert ti in (32, 64, 128) and su * sv >= 4
        # sanity: the scratch the geometry promises actually fits
        Sp = 128 * -(-seq // 128)
        assert Sp * su * sv * wide * 4 <= 96 * 1024 * 1024
    # raw high-d features blow the input window budget at long S
    assert tile_stripe_geometry(4096, 513, 128) is None


# ------------------------------------------------------------- scheduler


@pytest.mark.full
def test_tile_stripe_scheduler_matches_legacy():
    """all_pairs_distances_tiled in stripe mode == the per-pair scheduler's
    D at a long-sequence shape (S=512, banded)."""
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
        feats_np, lengths_np, cfg, interpret=True, geometry=(TI, SU, SV),
        stripe=True, stats=stats,
    )
    assert stats["stripe"] is True
    np.testing.assert_allclose(D_tiled, D_legacy, rtol=1e-4, atol=1e-4)
    assert np.allclose(D_tiled, D_tiled.T)
    np.testing.assert_allclose(np.diag(D_tiled), 0.0, atol=1e-6)


def test_tile_stripe_class_fn_contracts():
    """make_tile_stripe_class_fn: rows covers every real A-tile length and
    the wv class covers every REAL pair's widened half-width; pads (length
    1, trailing) must not inflate the classes."""
    from audio_pattern_discovery_tpu.parallel.pair_scheduler import (
        _wv_width,
        make_tile_stripe_class_fn,
    )

    rng = np.random.default_rng(11)
    ti_, nT, Lp, band = 16, 4, 512, 16
    K = nT * ti_ - 5                     # 5 trailing pads
    lens = np.ones(nT * ti_, np.int32)
    lens[:K] = np.sort(rng.integers(Lp - 60, Lp + 1, K)).astype(np.int32)
    fn = make_tile_stripe_class_fn(lens, nT, ti_, Lp, band, True, K)
    for i in range(nT):
        for j in range(i, nT):
            rows_cls, wv_cls = fn(i, j)
            la = lens[i * ti_ : min((i + 1) * ti_, K)]
            lb = lens[j * ti_ : min((j + 1) * ti_, K)]
            assert rows_cls >= la.max()
            wv_req = np.maximum(
                band, np.abs(la[:, None] - lb[None, :])
            ).max()
            assert wv_cls >= wv_req
            # pads never widen a class beyond the real spread + band
            assert _wv_width(wv_cls) <= _wv_width(
                max(band, int(lens[:K].max() - lens[:K].min()))
            )


def test_stripe_route_gating():
    """_stripe_route: fires only for banded long sequences whose global
    widened band fits a stripe at the padded length."""
    from audio_pattern_discovery_tpu.config import DTWConfig
    from audio_pattern_discovery_tpu.parallel.pair_scheduler import (
        _stripe_route,
    )

    lens = np.array([480, 500, 512], np.int32)
    assert _stripe_route(512, 8, lens, DTWConfig(band=16, band_mode="widen")) is not None
    # no band -> no stripe
    assert _stripe_route(512, 8, lens, DTWConfig(band=None)) is None
    # square-tile territory
    assert _stripe_route(256, 8, lens, DTWConfig(band=16, band_mode="widen")) is None
    # a corpus-wide spread ~S blows the stripe past the row width
    wide = np.array([10, 500], np.int32)
    assert _stripe_route(512, 8, wide, DTWConfig(band=16, band_mode="widen")) is None


@pytest.mark.full
def test_tile_stripe_scheduler_resume(tmp_path):
    """Chunk persistence in stripe mode: a second run reuses saved blocks
    bit-for-bit and dispatches nothing."""
    from audio_pattern_discovery_tpu.config import DTWConfig
    from audio_pattern_discovery_tpu.parallel.pair_scheduler import (
        all_pairs_distances_tiled,
    )

    feats, lengths = _mk(20, seed=8)
    cfg = DTWConfig(band=16, band_mode="widen")
    stats1: dict = {}
    D1 = all_pairs_distances_tiled(
        np.asarray(feats), np.asarray(lengths), cfg, interpret=True,
        geometry=(TI, SU, SV), stripe=True, block_dir=tmp_path,
        stats=stats1, chunk_programs=2,
    )
    stats2: dict = {}
    D2 = all_pairs_distances_tiled(
        np.asarray(feats), np.asarray(lengths), cfg, interpret=True,
        geometry=(TI, SU, SV), stripe=True, block_dir=tmp_path,
        stats=stats2, chunk_programs=2,
    )
    np.testing.assert_array_equal(D1, D2)
    assert stats2["dispatch_s"] == 0.0
