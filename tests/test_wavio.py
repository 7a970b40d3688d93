import numpy as np
import pytest

from turkish_asr_tpu.audio.wavio import read_wav, write_wav, resample, load_audio


def _sine(sr, seconds, freq=440.0):
    t = np.arange(int(sr * seconds)) / sr
    return (0.5 * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def test_wav_roundtrip(tmp_path):
    sr = 16000
    x = _sine(sr, 0.5)
    p = tmp_path / "a.wav"
    write_wav(p, x, sr)
    y, sr2 = read_wav(p)
    assert sr2 == sr
    assert y.shape == (1, len(x))
    assert np.max(np.abs(y[0] - x)) < 1e-3  # 16-bit quantization


def test_stereo_mono_mix(tmp_path):
    sr = 16000
    x = np.stack([_sine(sr, 0.2), -_sine(sr, 0.2)])
    p = tmp_path / "st.wav"
    write_wav(p, x, sr)
    mono, _ = load_audio(p, sr)
    assert np.max(np.abs(mono)) < 1e-3  # channels cancel


def test_resample_preserves_tone():
    sr = 8000
    x = _sine(sr, 1.0, freq=400.0)
    y = resample(x, sr, 16000)
    assert abs(len(y) - 16000) <= 1
    # Dominant frequency should remain ~400 Hz.
    spec = np.abs(np.fft.rfft(y))
    peak = np.argmax(spec) * 16000 / len(y)
    assert abs(peak - 400.0) < 5.0


def test_resample_identity():
    x = _sine(16000, 0.1)
    y = resample(x, 16000, 16000)
    np.testing.assert_array_equal(x, y)


def test_resample_length_contract():
    # torchaudio contract: out_len = ceil(new * len / orig)
    # (the coprime 16000->17777 ratio runs a 17777-phase filterbank —
    # keep its input short; the length contract is input-size-agnostic)
    for orig, new, n in [(48000, 16000, 48001), (22050, 16000, 10000), (16000, 17777, 603)]:
        x = np.zeros(n, dtype=np.float32)
        y = resample(x, orig, new)
        import math
        g = math.gcd(orig, new)
        assert len(y) == math.ceil((new // g) * n / (orig // g))


def test_read_24bit(tmp_path):
    import struct
    sr = 16000
    vals = np.array([0, 1 << 22, -(1 << 22), (1 << 23) - 1], dtype=np.int64)
    raw = b"".join(struct.pack("<i", int(v))[:3] for v in vals)
    hdr = b"RIFF" + struct.pack("<I", 36 + len(raw)) + b"WAVE"
    hdr += b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, sr, sr * 3, 3, 24)
    hdr += b"data" + struct.pack("<I", len(raw))
    p = tmp_path / "b24.wav"
    p.write_bytes(hdr + raw)
    y, _ = read_wav(p)
    np.testing.assert_allclose(y[0], vals / (1 << 23), atol=1e-6)


def test_bad_file_raises(tmp_path):
    p = tmp_path / "bad.wav"
    p.write_bytes(b"not a wav file at all")
    with pytest.raises(ValueError):
        read_wav(p)
