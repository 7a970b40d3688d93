"""FLAC decode: pure-Python decoder (audio/flacio.py), native C++ decoder
(asr_native.cpp flac_decode), the load_audio format dispatcher, and the
serve-layer 400-vs-500 contract for compressed formats.

Test files are synthesized by tests/flac_util.encode_flac (the image ships
no flac/ffmpeg tooling) covering every subframe type, Rice partitions with
escapes, wasted bits, stereo decorrelation modes and several bit depths.

Reference parity: /root/reference/data/preprocessing.py:66-79 decodes flac
via torchaudio/ffmpeg; /root/reference/serve/api.py:117-124 whitelists it.
"""

import numpy as np
import pytest

from flac_util import encode_flac
from turkish_asr_tpu.audio.flacio import read_flac_bytes
from turkish_asr_tpu.audio.wavio import (
    load_audio, sniff_format, supported_formats, ffmpeg_available,
    UnsupportedFormatError)

SR = 16000
rng = np.random.default_rng(7)
T = np.arange(20000) / SR
MONO = (np.sin(2 * np.pi * 440 * T) * 12000
        + rng.normal(0, 300, T.size)).astype(np.int64)
STEREO = np.stack([
    MONO[:8192],
    (np.cos(2 * np.pi * 300 * T[:8192]) * 9000).astype(np.int64)])


def _pcm16(dec):
    return np.round(dec * 32768.0).astype(np.int64)


@pytest.mark.parametrize("kinds", [
    ["verbatim"], ["fixed2"], ["lpc1"], ["fixed2", "verbatim", "lpc1"]])
def test_python_decoder_subframe_types(kinds):
    data = encode_flac(MONO, SR, subframe_kinds=kinds)
    dec, rate = read_flac_bytes(data)
    assert rate == SR
    np.testing.assert_array_equal(_pcm16(dec[0]), MONO)


def test_python_decoder_constant():
    x = np.full(4096, 123, dtype=np.int64)
    dec, _ = read_flac_bytes(encode_flac(x, SR, subframe_kinds=["constant"]))
    np.testing.assert_array_equal(_pcm16(dec[0]), x)


@pytest.mark.parametrize("part_order", [0, 2, 4])
def test_rice_partitions(part_order):
    x = MONO[:8192]
    dec, _ = read_flac_bytes(
        encode_flac(x, SR, subframe_kinds=["fixed2"], part_order=part_order))
    np.testing.assert_array_equal(_pcm16(dec[0]), x)


def test_rice_escape_partitions():
    x = MONO[:4096]
    dec, _ = read_flac_bytes(
        encode_flac(x, SR, subframe_kinds=["fixed2"], force_escape=True))
    np.testing.assert_array_equal(_pcm16(dec[0]), x)


def test_wasted_bits():
    x = MONO[:4096] & ~3
    dec, _ = read_flac_bytes(
        encode_flac(x, SR, subframe_kinds=["verbatim"], wasted=2))
    np.testing.assert_array_equal(_pcm16(dec[0]), x)


@pytest.mark.parametrize("modes", [
    ["independent"], ["ls"], ["rs"], ["ms"],
    ["ls", "rs", "ms", "independent"]])
def test_stereo_decorrelation(modes):
    data = encode_flac(STEREO, SR, subframe_kinds=["verbatim"],
                       stereo_modes=modes)
    dec, _ = read_flac_bytes(data)
    np.testing.assert_array_equal(_pcm16(dec), STEREO)


@pytest.mark.parametrize("bps", [8, 24])
def test_bit_depths(bps):
    scale = 1 << (bps - 1)
    x = (np.sin(2 * np.pi * 220 * T) * scale * 0.7).astype(np.int64)
    dec, _ = read_flac_bytes(encode_flac(x, SR, bps=bps,
                                         subframe_kinds=["fixed2"]))
    np.testing.assert_array_equal(
        np.round(dec[0] * scale).astype(np.int64), x)


def test_native_matches_python_oracle():
    from turkish_asr_tpu.native.loader import flac_decode_native
    cases = [
        encode_flac(MONO, 22050, subframe_kinds=["fixed2", "verbatim",
                                                 "lpc1"]),
        encode_flac(MONO, SR, subframe_kinds=["fixed2"], part_order=4),
        encode_flac(MONO[:4096], SR, subframe_kinds=["fixed2"],
                    force_escape=True),
        encode_flac(MONO[:4096] & ~1, SR, subframe_kinds=["verbatim"],
                    wasted=1),
        encode_flac(STEREO, SR, subframe_kinds=["verbatim"],
                    stereo_modes=["ls", "rs", "ms", "independent"]),
        encode_flac((MONO * 128).clip(-(1 << 23), (1 << 23) - 1), SR,
                    bps=24, subframe_kinds=["lpc1"]),
    ]
    for i, data in enumerate(cases):
        nat = flac_decode_native(data)
        if nat is None:
            pytest.skip("native lib unavailable (no compiler)")
        py, rate_py = read_flac_bytes(data)
        assert nat[1] == rate_py
        np.testing.assert_array_equal(nat[0], py, err_msg=f"case {i}")


def test_truncated_stream_raises():
    data = encode_flac(MONO[:4096], SR)
    with pytest.raises(ValueError):
        read_flac_bytes(data[: len(data) // 2])
    with pytest.raises(ValueError):
        read_flac_bytes(b"fLaC\x00\x00\x01")


def test_sniff_format():
    assert sniff_format(encode_flac(MONO[:256], SR)[:16]) == "flac"
    assert sniff_format(b"RIFF\x00\x00\x00\x00WAVEfmt ") == "wav"
    assert sniff_format(b"ID3\x04" + b"\x00" * 12) == "mp3"
    assert sniff_format(b"\xff\xfb\x90\x00" + b"\x00" * 12) == "mp3"
    assert sniff_format(b"OggS" + b"\x00" * 12) == "ogg"
    assert sniff_format(b"\x00\x00\x00 ftypM4A " + b"\x00" * 4) == "m4a"
    assert sniff_format(b"garbage!" + b"\x00" * 8) is None


def test_load_audio_flac_resamples(tmp_path):
    """load_audio decodes FLAC at a foreign rate, mono-mixes, resamples to
    16 kHz — the same contract as the wav path."""
    sr_in = 22050
    t = np.arange(sr_in) / sr_in
    x = (np.sin(2 * np.pi * 440 * t) * 12000).astype(np.int64)
    st = np.stack([x, x])  # stereo -> mono-mix is identity here
    p = tmp_path / "a.flac"
    p.write_bytes(encode_flac(st, sr_in, subframe_kinds=["fixed2"]))
    wav, sr = load_audio(str(p))
    assert sr == 16000
    assert abs(wav.shape[0] - 16000) <= 2
    # windowed-sinc resample of a pure tone stays a pure tone at 440 Hz
    spec = np.abs(np.fft.rfft(wav * np.hanning(wav.shape[0])))
    assert abs(np.argmax(spec) * sr / wav.shape[0] - 440.0) < 5.0


def test_supported_formats_contract():
    fmts = supported_formats()
    assert ".wav" in fmts and ".flac" in fmts
    if not ffmpeg_available():
        assert ".mp3" not in fmts


@pytest.mark.skipif(ffmpeg_available(), reason="ffmpeg present")
def test_mp3_without_ffmpeg_raises_unsupported(tmp_path):
    p = tmp_path / "x.mp3"
    p.write_bytes(b"\xff\xfb\x90\x00" + bytes(2000))
    with pytest.raises(UnsupportedFormatError):
        load_audio(str(p))


@pytest.mark.skipif(not ffmpeg_available(), reason="needs ffmpeg")
def test_mp3_decode_via_ffmpeg(tmp_path):
    """When ffmpeg is on PATH (the Docker image), mp3 round-trips."""
    import subprocess
    from turkish_asr_tpu.audio.wavio import write_wav
    t = np.arange(SR) / SR
    x = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    wav_p, mp3_p = tmp_path / "a.wav", tmp_path / "a.mp3"
    write_wav(str(wav_p), x, SR)
    subprocess.run(["ffmpeg", "-v", "error", "-i", str(wav_p), str(mp3_p)],
                   check=True)
    wav, sr = load_audio(str(mp3_p))
    assert sr == 16000 and wav.shape[0] > SR // 2
    spec = np.abs(np.fft.rfft(wav * np.hanning(wav.shape[0])))
    assert abs(np.argmax(spec) * sr / wav.shape[0] - 440.0) < 5.0
