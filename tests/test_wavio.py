import numpy as np
import pytest

from audio_pattern_discovery_tpu.io.wavio import read_wav, write_wav


def test_write_read_roundtrip(tmp_path, rng):
    x = rng.uniform(-0.9, 0.9, 16_000).astype(np.float32)
    path = tmp_path / "a.wav"
    write_wav(path, x, 16_000)
    y, sr = read_wav(path)
    assert sr == 16_000
    assert y.shape == x.shape
    assert y.dtype == np.float32
    np.testing.assert_allclose(y, x, atol=0.51 / 32768)


def test_read_stdlib_written_stereo(tmp_path, rng):
    # Cross-check against the stdlib `wave` writer, stereo 16-bit.
    import wave

    left = (rng.uniform(-0.5, 0.5, 1000) * 32767).astype("<i2")
    right = (rng.uniform(-0.5, 0.5, 1000) * 32767).astype("<i2")
    inter = np.empty(2000, dtype="<i2")
    inter[0::2], inter[1::2] = left, right
    path = tmp_path / "st.wav"
    with wave.open(str(path), "wb") as f:
        f.setnchannels(2)
        f.setsampwidth(2)
        f.setframerate(8000)
        f.writeframes(inter.tobytes())
    y, sr = read_wav(path)
    assert sr == 8000
    expected = (left.astype(np.float32) + right.astype(np.float32)) / 2.0 / 32768.0
    np.testing.assert_allclose(y, expected, atol=1e-6)


@pytest.mark.parametrize("bits", [8, 24, 32])
def test_read_other_depths(tmp_path, rng, bits):
    import struct

    n = 500
    x = rng.uniform(-0.8, 0.8, n)
    if bits == 8:
        data = (np.clip(x, -1, 1) * 127 + 128).astype(np.uint8).tobytes()
        expected = (np.frombuffer(data, np.uint8).astype(np.float32) - 128) / 128
    elif bits == 24:
        vals = (np.clip(x, -1, 1) * (1 << 23 - 1)).astype(np.int32)
        b = np.zeros((n, 3), dtype=np.uint8)
        b[:, 0] = vals & 0xFF
        b[:, 1] = (vals >> 8) & 0xFF
        b[:, 2] = (vals >> 16) & 0xFF
        data = b.tobytes()
        expected = vals.astype(np.float32) / (1 << 23)
    else:
        vals = (np.clip(x, -1, 1) * 2147483647).astype("<i4")
        data = vals.tobytes()
        expected = vals.astype(np.float32) / 2147483648.0
    hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
    hdr += b"fmt " + struct.pack(
        "<IHHIIHH", 16, 1, 1, 8000, 8000 * bits // 8, bits // 8, bits
    )
    hdr += b"data" + struct.pack("<I", len(data))
    path = tmp_path / f"{bits}.wav"
    path.write_bytes(hdr + data)
    y, sr = read_wav(path)
    np.testing.assert_allclose(y, expected, atol=1e-6)
