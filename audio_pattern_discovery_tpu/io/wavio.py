"""WAV (RIFF/WAVE) ingest and snippet writing (SURVEY.md SS3 row 1).

Host-side reader: parses RIFF chunks directly with NumPy (no librosa /
soundfile in the environment), normalizes PCM to float32 in [-1, 1], and
downmixes multichannel to mono.  Supports PCM 8/16/24/32-bit and IEEE
float32/64.  The native C++ demuxer (native/apd_native.cc: apd_wav_load_batch,
OpenMP-parallel) accelerates bulk PCM16 ingest via io/corpus.load_corpus;
this module is the portable fallback and the correctness oracle for it.
"""

from __future__ import annotations

import struct
from pathlib import Path

import numpy as np

_WAVE_FORMAT_PCM = 0x0001
_WAVE_FORMAT_IEEE_FLOAT = 0x0003
_WAVE_FORMAT_EXTENSIBLE = 0xFFFE


def read_wav(path: str | Path, mono: bool = True) -> tuple[np.ndarray, int]:
    """Read a WAV file -> (float32 samples in [-1, 1], sample_rate).

    Multichannel audio is averaged to mono when `mono=True`, otherwise
    returned as [n_samples, n_channels].
    """
    raw = Path(path).read_bytes()
    if len(raw) < 12 or raw[0:4] != b"RIFF" or raw[8:12] != b"WAVE":
        raise ValueError(f"{path}: not a RIFF/WAVE file")

    fmt = None
    fmt_body = b""
    data = None
    pos = 12
    while pos + 8 <= len(raw):
        chunk_id = raw[pos : pos + 4]
        (chunk_size,) = struct.unpack_from("<I", raw, pos + 4)
        body = raw[pos + 8 : pos + 8 + chunk_size]
        if chunk_id == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
            fmt_body = body
        elif chunk_id == b"data":
            data = body
        pos += 8 + chunk_size + (chunk_size & 1)  # chunks are word-aligned

    if fmt is None or data is None:
        raise ValueError(f"{path}: missing fmt/data chunk")
    audio_format, n_channels, sample_rate, _, block_align, bits = fmt
    if audio_format == _WAVE_FORMAT_EXTENSIBLE:
        # The true format tag is the first two bytes of the extension's
        # SubFormat GUID (fmt body offset 24); guessing from the bit depth
        # would misread 32-bit int PCM as float.
        if len(fmt_body) >= 26:
            (audio_format,) = struct.unpack_from("<H", fmt_body, 24)
        else:
            raise ValueError(f"{path}: truncated WAVE_FORMAT_EXTENSIBLE fmt chunk")

    if audio_format == _WAVE_FORMAT_PCM:
        if bits == 8:
            x = (np.frombuffer(data, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
        elif bits == 16:
            x = np.frombuffer(data, dtype="<i2").astype(np.float32) / 32768.0
        elif bits == 24:
            b = np.frombuffer(data, dtype=np.uint8)
            b = b[: (len(b) // 3) * 3].reshape(-1, 3)
            vals = (
                b[:, 0].astype(np.int32)
                | (b[:, 1].astype(np.int32) << 8)
                | (b[:, 2].astype(np.int32) << 16)
            )
            vals = np.where(vals >= 1 << 23, vals - (1 << 24), vals)
            x = vals.astype(np.float32) / float(1 << 23)
        elif bits == 32:
            x = np.frombuffer(data, dtype="<i4").astype(np.float32) / 2147483648.0
        else:
            raise ValueError(f"{path}: unsupported PCM bit depth {bits}")
    elif audio_format == _WAVE_FORMAT_IEEE_FLOAT:
        dtype = "<f4" if bits == 32 else "<f8"
        x = np.frombuffer(data, dtype=dtype).astype(np.float32)
    else:
        raise ValueError(f"{path}: unsupported WAVE format 0x{audio_format:04x}")

    if n_channels > 1:
        x = x[: (len(x) // n_channels) * n_channels].reshape(-1, n_channels)
        if mono:
            x = x.mean(axis=1)
    return np.ascontiguousarray(x, dtype=np.float32), sample_rate


def read_wav_info(path: str | Path) -> tuple[int, int, int, int, int]:
    """Header-only probe -> (n_samples_mono, sample_rate, format_tag, bits,
    n_channels).

    Reads chunk headers and seeks past bodies, so probing an hours-long
    corpus costs milliseconds.  This is what lets the pipeline's streaming
    ingest know every clip's frame count (and whether the whole corpus can
    ride the int16 device-upload path) BEFORE any sample data is read
    (SURVEY.md SS4.1 boundary note; VERDICT r2 missing #3).  The declared
    data size is clamped to the bytes actually present, matching read_wav
    on truncated/streaming-written files.
    """
    p = Path(path)
    file_size = p.stat().st_size
    with open(p, "rb") as f:
        head = f.read(12)
        if len(head) < 12 or head[0:4] != b"RIFF" or head[8:12] != b"WAVE":
            raise ValueError(f"{path}: not a RIFF/WAVE file")
        fmt = None
        audio_format = n_channels = sample_rate = bits = 0
        data_bytes = None
        pos = 12
        while pos + 8 <= file_size:
            f.seek(pos)
            hdr = f.read(8)
            if len(hdr) < 8:
                break
            chunk_id = hdr[0:4]
            (chunk_size,) = struct.unpack_from("<I", hdr, 4)
            avail = max(0, file_size - (pos + 8))
            body_size = min(chunk_size, avail)
            if chunk_id == b"fmt ":
                body = f.read(min(body_size, 64))
                fmt = struct.unpack_from("<HHIIHH", body, 0)
                audio_format, n_channels, sample_rate, _, _, bits = fmt
                if audio_format == _WAVE_FORMAT_EXTENSIBLE:
                    if len(body) >= 26:
                        (audio_format,) = struct.unpack_from("<H", body, 24)
                    else:
                        raise ValueError(
                            f"{path}: truncated WAVE_FORMAT_EXTENSIBLE fmt chunk"
                        )
            elif chunk_id == b"data":
                data_bytes = body_size
            pos += 8 + chunk_size + (chunk_size & 1)
    if fmt is None or data_bytes is None:
        raise ValueError(f"{path}: missing fmt/data chunk")
    if audio_format == _WAVE_FORMAT_PCM:
        bytes_per = {8: 1, 16: 2, 24: 3, 32: 4}.get(bits)
        if bytes_per is None:
            raise ValueError(f"{path}: unsupported PCM bit depth {bits}")
    elif audio_format == _WAVE_FORMAT_IEEE_FLOAT:
        bytes_per = 4 if bits == 32 else 8
    else:
        raise ValueError(f"{path}: unsupported WAVE format 0x{audio_format:04x}")
    n_ch = max(1, n_channels)
    # Match read_wav exactly: full (all-channel) samples first, then whole
    # frames only.
    n_total = data_bytes // bytes_per
    n_samples = n_total // n_ch if n_ch > 1 else n_total
    return (int(n_samples), int(sample_rate), int(audio_format), int(bits),
            int(n_ch))


def write_wav(path: str | Path, samples: np.ndarray, sample_rate: int) -> None:
    """Write mono float samples in [-1, 1] as 16-bit PCM WAV."""
    x = np.asarray(samples, dtype=np.float64)
    pcm = np.clip(np.round(x * 32768.0), -32768, 32767).astype("<i2").tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
    hdr += b"fmt " + struct.pack(
        "<IHHIIHH", 16, _WAVE_FORMAT_PCM, 1, sample_rate, sample_rate * 2, 2, 16
    )
    hdr += b"data" + struct.pack("<I", len(pcm))
    Path(path).write_bytes(hdr + pcm)
