import numpy as np
import jax.numpy as jnp

from turkish_asr_tpu.audio.features import (
    mel_filterbank,
    log_mel_spectrogram,
    AudioPreprocessor,
    _windowed_dft_matrix,
)


def _rand_wave(n, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(n) * 0.1).astype(np.float32)


def _oracle_log_mel(x, n_fft=400, hop=160, win=400, n_mels=80, sr=16000,
                    f_min=0.0, f_max=8000.0, top_db=80.0, normalize=True):
    """Numpy oracle following torchaudio MelSpectrogram semantics:
    center=True reflect pad, periodic Hann, power=2, HTK mel (norm=None),
    AmplitudeToDB(power, top_db), CMVN with unbiased std."""
    pad = n_fft // 2
    xp = np.pad(x.astype(np.float64), pad, mode="reflect")
    n_frames = 1 + len(x) // hop
    window = 0.5 * (1 - np.cos(2 * np.pi * np.arange(win) / win))
    frames = np.stack([xp[t * hop:t * hop + n_fft] for t in range(n_frames)])
    spec = np.fft.rfft(frames * window, n=n_fft)
    power = np.abs(spec) ** 2
    fb = mel_filterbank(n_fft // 2 + 1, n_mels, sr, f_min, f_max).astype(np.float64)
    mel = power @ fb
    log_mel = 10.0 * np.log10(np.maximum(mel, 1e-10))
    log_mel = np.maximum(log_mel, log_mel.max() - top_db)
    if normalize:
        mean = log_mel.mean(axis=0, keepdims=True)
        std = log_mel.std(axis=0, ddof=1, keepdims=True)
        log_mel = (log_mel - mean) / (std + 1e-8)
    return log_mel


def test_mel_filterbank_shape_and_partition():
    fb = mel_filterbank(201, 80, 16000, 0.0, 8000.0)
    assert fb.shape == (201, 80)
    assert np.all(fb >= 0)
    # Each filter is a triangle with a single peak.
    assert np.all(fb.max(axis=0) > 0)
    # Interior frequency bins are covered by at least one filter.
    coverage = fb[5:195].sum(axis=1)
    assert np.all(coverage > 0)


def test_dft_matrix_matches_rfft():
    n_fft = 400
    M = _windowed_dft_matrix(n_fft, n_fft)
    x = _rand_wave(n_fft).astype(np.float64)
    window = 0.5 * (1 - np.cos(2 * np.pi * np.arange(n_fft) / n_fft))
    ref = np.fft.rfft(x * window)
    out = x @ M.astype(np.float64)
    n_bins = n_fft // 2 + 1
    np.testing.assert_allclose(out[:n_bins], ref.real, atol=1e-3)
    np.testing.assert_allclose(out[n_bins:], ref.imag, atol=1e-3)


def test_log_mel_matches_numpy_oracle():
    x = _rand_wave(16000)
    got = np.asarray(log_mel_spectrogram(jnp.asarray(x)))
    want = _oracle_log_mel(x)
    assert got.shape == want.shape == (1 + 16000 // 160, 80)
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_batched_matches_single():
    """A right-padded batch element must produce the same features as the
    single-utterance path (virtual reflect padding against true length)."""
    x1 = _rand_wave(12345, seed=1)
    x2 = _rand_wave(8000, seed=2)
    S = 16000
    batch = np.zeros((2, S), dtype=np.float32)
    batch[0, :len(x1)] = x1
    batch[1, :len(x2)] = x2
    lengths = jnp.asarray([len(x1), len(x2)], dtype=jnp.int32)
    feats, frame_lengths = log_mel_spectrogram(jnp.asarray(batch), lengths)
    f1 = np.asarray(log_mel_spectrogram(jnp.asarray(x1)))
    f2 = np.asarray(log_mel_spectrogram(jnp.asarray(x2)))
    n1, n2 = int(frame_lengths[0]), int(frame_lengths[1])
    assert n1 == 1 + len(x1) // 160 and n2 == 1 + len(x2) // 160
    np.testing.assert_allclose(np.asarray(feats)[0, :n1], f1, atol=1e-4)
    np.testing.assert_allclose(np.asarray(feats)[1, :n2], f2, atol=1e-4)
    # Padding frames are zeroed.
    assert np.all(np.asarray(feats)[1, n2:] == 0)


def test_preprocessor_end_to_end(tmp_path):
    from turkish_asr_tpu.audio.wavio import write_wav
    sr = 16000
    t = np.arange(sr) / sr
    x = (0.3 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    p = tmp_path / "tone.wav"
    write_wav(p, x, sr)
    pre = AudioPreprocessor()
    feats = pre(str(p))
    assert feats.shape == (1 + sr // 160, 80)
    # CMVN: near-zero mean, ~unit std per mel bin.
    assert np.abs(feats.mean(axis=0)).max() < 1e-3
