"""Temporal-context stacking: spectrogram SLICES as embedder inputs.

The capability spec's north star describes "the autoencoder that embeds
spectrogram slices" (BASELINE.json; SURVEY.md §1.1) — a slice being a short
multi-frame window of the spectrogram, not necessarily a single frame.
`autoencoder.context_frames = k` feeds the embedder (AE or PCA) the
(2k+1)-frame window centered on each frame, concatenated along the feature
axis, so the latent captures local temporal structure (onsets, sweeps)
instead of a bag-of-frames.  The DTW contract is unchanged: one latent per
frame, segment lengths untouched.

Boundary rule: offsets are clamped INTO the segment (`clip(t+o, 0, len-1)`),
never across segment or clip boundaries — a segment's embedding depends only
on its own frames, which is what keeps incremental update/query reuse sound
(the frozen embedding of an old segment cannot change when new clips arrive).

Both implementations below produce identical values (tested); the device
version is a handful of `take_along_axis` gathers on the resident segment
tensor — no host round-trip of the (2k+1)× inflated tensor.
"""

from __future__ import annotations

import numpy as np


def stack_context_frames(frames: np.ndarray, k: int) -> np.ndarray:
    """[n, d] -> [n, (2k+1)*d] windows with edge clamping (one segment)."""
    if k <= 0:
        return frames
    n = frames.shape[0]
    t = np.arange(n)
    cols = [frames[np.clip(t + o, 0, n - 1)] for o in range(-k, k + 1)]
    return np.concatenate(cols, axis=1)


def stack_context_host(
    seg_frames: np.ndarray,     # [K, L, d] padded segment frames
    seg_lengths: np.ndarray,    # [K]
    k: int,
) -> np.ndarray:
    """Padded-batch host stacking; pad frames (t >= len) are zeroed."""
    if k <= 0:
        return seg_frames
    K, L, d = seg_frames.shape
    t = np.arange(L, dtype=np.int64)[None, :]                       # [1, L]
    hi = np.maximum(seg_lengths.astype(np.int64), 1)[:, None] - 1   # [K, 1]
    cols = []
    for o in range(-k, k + 1):
        idx = np.clip(t + o, 0, hi)                                 # [K, L]
        cols.append(np.take_along_axis(seg_frames, idx[:, :, None], axis=1))
    out = np.concatenate(cols, axis=2)
    mask = t < seg_lengths[:, None]
    return np.where(mask[:, :, None], out, 0.0).astype(seg_frames.dtype)


def stack_context_device(seg_dev, seg_lengths: np.ndarray, k: int):
    """Device twin of stack_context_host on the resident [K, L, d] tensor.

    Eager jnp gathers (like extract_segment_features_device): a few
    dispatches per corpus, trivially amortized.  HBM note: the result is
    (2k+1)× the segment tensor — callers enable context only with an
    embedder that reduces back to latent_dim.
    """
    import jax.numpy as jnp

    if k <= 0:
        return seg_dev
    K, L, d = seg_dev.shape
    t = np.arange(L, dtype=np.int32)[None, :]
    hi = np.maximum(seg_lengths.astype(np.int32), 1)[:, None] - 1
    cols = []
    for o in range(-k, k + 1):
        idx = jnp.asarray(np.clip(t + o, 0, hi))                    # [K, L]
        cols.append(jnp.take_along_axis(seg_dev, idx[:, :, None], axis=1))
    out = jnp.concatenate(cols, axis=2)
    mask = jnp.asarray(t < seg_lengths[:, None])
    return jnp.where(mask[:, :, None], out, jnp.zeros((), seg_dev.dtype))


def flat_context(
    seg_frames: np.ndarray,     # [K, L, d]
    seg_lengths: np.ndarray,    # [K]
    k: int,
) -> np.ndarray:
    """Unpadded training pool: every real frame's (2k+1)-frame slice,
    concatenated across segments in segment order — the context analogue of
    the pipeline's `_flat()` (pipeline.py)."""
    parts = [
        stack_context_frames(seg_frames[s, : int(seg_lengths[s])], k)
        for s in range(seg_frames.shape[0])
    ]
    return np.concatenate(parts, axis=0)
