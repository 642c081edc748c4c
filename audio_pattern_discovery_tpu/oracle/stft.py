"""NumPy oracle for the windowed-FFT spectrogram (SURVEY.md SS3 row 2).

Frame -> window -> rFFT -> |.|^power -> optional log10.  Frames are cut
without centering/padding (reference-style streaming frames: frame t covers
samples [t*hop, t*hop + win)).
"""

from __future__ import annotations

import numpy as np


def window_fn(name: str, win_length: int) -> np.ndarray:
    n = np.arange(win_length, dtype=np.float64)
    if name == "hann":
        return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)).astype(np.float64)
    if name == "hamming":
        return (0.54 - 0.46 * np.cos(2.0 * np.pi * n / win_length)).astype(np.float64)
    if name == "rect":
        return np.ones(win_length, dtype=np.float64)
    raise ValueError(f"unknown window {name!r}")


def num_frames(n_samples: int, win_length: int, hop_length: int) -> int:
    if n_samples < win_length:
        return 0
    return 1 + (n_samples - win_length) // hop_length


def stft_oracle(
    signal: np.ndarray,
    win_length: int = 1024,
    hop_length: int = 256,
    window: str = "hann",
    n_fft: int | None = None,
    power: float = 2.0,
    log_scale: bool = True,
    log_floor: float = 1e-10,
) -> np.ndarray:
    """Returns [n_frames, n_fft//2+1] float64 spectrogram."""
    signal = np.asarray(signal, dtype=np.float64)
    n_fft = n_fft or win_length
    w = window_fn(window, win_length)
    nf = num_frames(len(signal), win_length, hop_length)
    out = np.zeros((nf, n_fft // 2 + 1), dtype=np.float64)
    for t in range(nf):
        frame = signal[t * hop_length : t * hop_length + win_length] * w
        spec = np.fft.rfft(frame, n=n_fft)
        mag = np.abs(spec)
        out[t] = mag if power == 1.0 else mag**power
    if log_scale:
        out = np.log10(np.maximum(out, log_floor))
    return out
