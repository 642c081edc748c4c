"""Corpus loading + padded batching of ragged clips (SURVEY.md SS3 row 1).

The host reads a directory of WAVs, optionally via the native C++ demuxer,
and packs them into a padded [n_clips, max_len] float32 array with a length
vector — the shape contract the jitted spectrogram op expects (static
shapes; masking handles raggedness, SURVEY.md SS8 P1).
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path

import numpy as np

from audio_pattern_discovery_tpu.io.wavio import read_wav


@dataclass
class Clip:
    path: str
    samples: np.ndarray  # float32 [n]
    sample_rate: int

    def __len__(self) -> int:
        return len(self.samples)


def load_corpus(
    wav_dir: str | Path,
    pattern: str = "*.wav",
    expected_rate: int | None = None,
    use_native: bool = True,
) -> list[Clip]:
    """Read every WAV under `wav_dir` (sorted for determinism).

    Fast path: the native C++ parallel demuxer (native.load_wavs_batch,
    OpenMP thread pool) ingests plain-PCM16 corpora in bulk; anything it
    can't parse falls back to the per-file Python reader, which handles
    8/24/32-bit and IEEE-float WAVs and is the correctness oracle
    (tested equal in tests/test_native.py).
    """
    paths = sorted(Path(wav_dir).glob(pattern))
    if not paths:
        raise FileNotFoundError(f"no {pattern} files under {wav_dir}")

    clips: list[Clip] | None = None
    if use_native:
        from audio_pattern_discovery_tpu import native

        res = native.load_wavs_batch(paths)
        if res is not None:
            padded, lengths, rates = res
            clips = [
                Clip(
                    path=str(p),
                    # Copy out of the padded batch: a view would pin the
                    # whole [n_clips, max_len] allocation (mostly padding
                    # for ragged corpora) for the lifetime of the clips.
                    samples=padded[i, : lengths[i]].copy(),
                    sample_rate=int(rates[i]),
                )
                for i, p in enumerate(paths)
            ]
    if clips is None:
        clips = []
        for p in paths:
            samples, rate = read_wav(p)
            clips.append(Clip(path=str(p), samples=samples, sample_rate=rate))
    if expected_rate is not None:
        for c in clips:
            if c.sample_rate != expected_rate:
                raise ValueError(
                    f"{c.path}: sample rate {c.sample_rate} != expected {expected_rate}"
                )
    return clips


def pad_and_stack(
    arrays: list[np.ndarray],
    pad_to: int | None = None,
    multiple_of: int = 1,
    pad_value: float = 0.0,
) -> tuple[np.ndarray, np.ndarray]:
    """Ragged list of [n_i, ...] arrays -> ([B, N, ...] padded, [B] lengths).

    N = max length, rounded up to `multiple_of` (TPU lane alignment).
    """
    lengths = np.array([len(a) for a in arrays], dtype=np.int32)
    n = pad_to if pad_to is not None else int(lengths.max())
    n = -(-n // multiple_of) * multiple_of
    trailing = arrays[0].shape[1:]
    out = np.full((len(arrays), n, *trailing), pad_value, dtype=np.float32)
    for i, a in enumerate(arrays):
        if len(a) > n:
            raise ValueError(f"clip {i} length {len(a)} exceeds pad_to {n}")
        out[i, : len(a)] = a
    return out, lengths
