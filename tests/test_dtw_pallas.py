"""Pallas row-scan DTW kernel vs the lax.scan wavefront and NumPy oracle
(SURVEY.md SS5.2 'kernel tests').  Runs in interpreter mode on the CPU mesh;
`tpu`-marked cases compile the real Mosaic kernel on hardware."""

import numpy as np
import pytest

from audio_pattern_discovery_tpu.io.corpus import pad_and_stack
from audio_pattern_discovery_tpu.ops.dtw import dtw_batch
from audio_pattern_discovery_tpu.ops.dtw_pallas import dtw_batch_pallas
from audio_pattern_discovery_tpu.oracle.dtw import dtw_oracle


def _pairs(rng, n, len_range=(5, 60), d=8, pad_to=64):
    sa = [rng.normal(0, 1, (rng.integers(*len_range), d)).astype(np.float32) for _ in range(n)]
    sb = [rng.normal(0, 1, (rng.integers(*len_range), d)).astype(np.float32) for _ in range(n)]
    a, la = pad_and_stack(sa, pad_to=pad_to)
    b, lb = pad_and_stack(sb, pad_to=pad_to)
    return sa, sb, a, b, la, lb


@pytest.mark.parametrize("metric", ["euclidean", "sqeuclidean", "cosine"])
def test_interpret_matches_oracle(rng, metric):
    sa, sb, a, b, la, lb = _pairs(rng, 6)
    got = np.asarray(
        dtw_batch_pallas(a, b, la, lb, metric=metric, interpret=True)
    )
    for p in range(6):
        want = dtw_oracle(sa[p], sb[p], metric=metric)
        np.testing.assert_allclose(got[p], want, rtol=1e-3, atol=1e-3)


def test_interpret_banded(rng):
    sa, sb, a, b, la, lb = _pairs(rng, 5, len_range=(10, 60))
    got = np.asarray(dtw_batch_pallas(a, b, la, lb, band=7, interpret=True))
    for p in range(5):
        want = dtw_oracle(sa[p], sb[p], band=7)
        np.testing.assert_allclose(got[p], want, rtol=1e-3, atol=1e-3)


def test_interpret_matches_scan_version(rng):
    _, _, a, b, la, lb = _pairs(rng, 12, len_range=(3, 64), pad_to=64)
    scan = np.asarray(dtw_batch(a, b, la, lb))
    pallas = np.asarray(dtw_batch_pallas(a, b, la, lb, interpret=True))
    np.testing.assert_allclose(pallas, scan, rtol=1e-3, atol=1e-3)


def test_non_multiple_pair_block(rng):
    """B not divisible by the pair block: padding pairs must be discarded."""
    _, _, a, b, la, lb = _pairs(rng, 3)
    got = np.asarray(dtw_batch_pallas(a, b, la, lb, interpret=True))
    assert got.shape == (3,)
    want = np.asarray(dtw_batch(a, b, la, lb))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_normalization(rng):
    _, _, a, b, la, lb = _pairs(rng, 4)
    raw = np.asarray(dtw_batch_pallas(a, b, la, lb, interpret=True))
    norm = np.asarray(
        dtw_batch_pallas(a, b, la, lb, normalize="path_len", interpret=True)
    )
    np.testing.assert_allclose(norm, raw / (la + lb), rtol=1e-5)


def test_non_power_of_two_seq_len(rng):
    _, _, a, b, la, lb = _pairs(rng, 4, len_range=(5, 48), pad_to=48)
    got = np.asarray(dtw_batch_pallas(a, b, la, lb, interpret=True))
    want = np.asarray(dtw_batch(a, b, la, lb))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


@pytest.mark.tpu
def test_tpu_compiled_matches_scan(rng):
    _, _, a, b, la, lb = _pairs(rng, 64, len_range=(20, 128), pad_to=128)
    scan = np.asarray(dtw_batch(a, b, la, lb))
    pallas = np.asarray(dtw_batch_pallas(a, b, la, lb))
    np.testing.assert_allclose(pallas, scan, rtol=1e-3, atol=1e-3)


@pytest.mark.tpu
def test_tpu_compiled_banded(rng):
    _, _, a, b, la, lb = _pairs(rng, 32, len_range=(20, 128), pad_to=128)
    scan = np.asarray(dtw_batch(a, b, la, lb, band=16))
    pallas = np.asarray(dtw_batch_pallas(a, b, la, lb, band=16))
    np.testing.assert_allclose(pallas, scan, rtol=1e-3, atol=1e-3)


@pytest.mark.tpu
def test_self_distance_precision_on_hardware(rng):
    """Gram matmul must run multi-pass f32 on the MXU: with the default
    single bf16 pass, self sq-distances come out ~0.2 per cell and identical
    motifs look dissimilar (review finding, fixed with precision=HIGHEST)."""
    import jax.numpy as jnp

    a = rng.normal(0, 1, (32, 128, 16)).astype(np.float32)
    la = jnp.asarray(np.full(32, 128, np.int32))
    aj = jnp.asarray(a)
    d_self = np.asarray(dtw_batch_pallas(aj, aj, la, la, band=16))
    b = jnp.asarray(rng.normal(0, 1, a.shape).astype(np.float32))
    d_dist = np.asarray(dtw_batch_pallas(aj, b, la, la, band=16))
    assert np.abs(d_self).max() < 1e-3 * d_dist.mean()
