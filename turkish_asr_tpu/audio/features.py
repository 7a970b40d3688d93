"""Log-mel front-end, TPU-first.

Reference behavior being matched (/root/reference/data/preprocessing.py:52-116):
torchaudio ``MelSpectrogram(n_fft=400, win_length=400, hop_length=160,
f_min=0, f_max=8000, n_mels=80, mel_scale="htk")`` (power=2, center=True,
reflect pad, periodic Hann, filterbank norm=None) -> ``AmplitudeToDB(
stype="power", top_db=80)`` -> per-utterance CMVN ``(x - mean)/(std + 1e-8)``
with torch's unbiased (n-1) std.

TPU-first design: instead of an FFT op, the STFT is expressed as framing
(one gather) followed by a single fused matmul with a windowed-DFT matrix
``(n_fft, 2*n_bins)`` — the whole front-end then is two MXU matmuls
(DFT, mel filterbank) plus elementwise work that XLA fuses. This keeps the
hot path on the systolic array with static shapes; ``jnp.fft.rfft`` is used
only as a test oracle.

Batched processing pads waveforms to a static bucket length and masks:
reflect padding is emulated per-utterance via index arithmetic against the
true length, so a padded batch element produces bit-identical features to
the single-utterance path (tested in tests/test_features.py).
"""

import math
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from turkish_asr_tpu.audio.wavio import load_audio

# MXU precision of the two front-end matmuls (DFT, mel filterbank) — see
# the note at their use site. 'highest' is the parity-tested default.
_STFT_PRECISION = "highest"

TARGET_SAMPLE_RATE = 16000


# ---------------------------------------------------------------------------
# Host-side constants
# ---------------------------------------------------------------------------

def _hz_to_mel_htk(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)


def _mel_to_hz_htk(m):
    return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64) / 2595.0) - 1.0)


@lru_cache(maxsize=8)
def _mel_filterbank_cached(n_freqs, n_mels, sample_rate, f_min, f_max):
    all_freqs = np.linspace(0.0, sample_rate / 2.0, n_freqs)
    m_min = _hz_to_mel_htk(f_min)
    m_max = _hz_to_mel_htk(f_max)
    m_pts = np.linspace(m_min, m_max, n_mels + 2)
    f_pts = _mel_to_hz_htk(m_pts)

    # Triangular filters: rising and falling slopes between adjacent points.
    f_diff = f_pts[1:] - f_pts[:-1]                       # (n_mels + 1,)
    slopes = f_pts[None, :] - all_freqs[:, None]          # (n_freqs, n_mels + 2)
    down = -slopes[:, :-2] / f_diff[None, :-1]
    up = slopes[:, 2:] / f_diff[None, 1:]
    fb = np.maximum(0.0, np.minimum(down, up))            # (n_freqs, n_mels)
    return fb.astype(np.float32)


def mel_filterbank(n_freqs, n_mels=80, sample_rate=16000, f_min=0.0, f_max=8000.0):
    """HTK-scale triangular mel filterbank, no normalization.

    Shape (n_freqs, n_mels); matches torchaudio.functional.melscale_fbanks
    with mel_scale="htk", norm=None (the reference's configuration).
    """
    return _mel_filterbank_cached(int(n_freqs), int(n_mels), int(sample_rate),
                                  float(f_min), float(f_max))


@lru_cache(maxsize=8)
def _windowed_dft_matrix(n_fft, win_length):
    """(n_fft, 2*n_bins) matrix computing [Re | -Im] of the windowed rFFT.

    frames @ M gives re and im parts of rfft(frames * window) concatenated,
    so |STFT|^2 = re^2 + im^2 as one matmul + square-sum.
    """
    n_bins = n_fft // 2 + 1
    # Periodic Hann (torch.hann_window default periodic=True)
    window = 0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(win_length) / win_length))
    if win_length < n_fft:  # torchaudio centers the window in the FFT frame
        pad = (n_fft - win_length) // 2
        w = np.zeros(n_fft)
        w[pad:pad + win_length] = window
    else:
        w = window
    j = np.arange(n_fft)[:, None]
    k = np.arange(n_bins)[None, :]
    ang = 2.0 * np.pi * j * k / n_fft
    cos_m = np.cos(ang) * w[:, None]
    sin_m = -np.sin(ang) * w[:, None]
    return np.concatenate([cos_m, sin_m], axis=1).astype(np.float32)


# ---------------------------------------------------------------------------
# Device-side front-end
# ---------------------------------------------------------------------------

def _frame_indices_reflect(n_frames, n_samples, lengths, n_fft, hop_length):
    """Per-frame sample indices with per-utterance reflect padding.

    Emulates center=True reflect padding against the *true* length of each
    (possibly right-padded) utterance: global sample position
    p = t*hop + j - n_fft//2 maps to |p| on the left edge and to
    2*(L-1) - p past the right edge. (Gather fallback path — see
    ``_frames_via_reshape`` for the fast path.)
    """
    t = jnp.arange(n_frames)[:, None]
    j = jnp.arange(n_fft)[None, :]
    p = t * hop_length + j - n_fft // 2          # (T, n_fft), may be <0 or >=L
    if lengths is None:
        L = n_samples
        p = jnp.abs(p)
        p = jnp.where(p >= L, 2 * (L - 1) - p, p)
        return jnp.clip(p, 0, n_samples - 1)
    L = lengths[:, None, None]                   # (B, 1, 1)
    p = jnp.abs(p)[None]                         # (1, T, n_fft) -> broadcast
    p = jnp.where(p >= L, 2 * (L - 1) - p, p)
    return jnp.clip(p, 0, n_samples - 1)


def _reflect_padded(x, lengths, n_frames, n_fft, hop_length, min_len=0):
    """Reflect-padded buffer: n_fft//2 reflected samples written explicitly
    on each side against per-utterance true lengths; tail zero-padded to at
    least ``min_len`` samples."""
    B, S = x.shape
    half = n_fft // 2
    n_chunks = -(-n_fft // hop_length)  # ceil
    pad_to = max(hop_length * (n_frames + n_chunks), min_len)
    buf = jnp.pad(x, ((0, 0), (half, pad_to - S - half)))
    # Left reflect (static): buf[:, :half] = x[:, half:0:-1]
    buf = buf.at[:, :half].set(x[:, 1:half + 1][:, ::-1])

    # Right reflect per utterance: buf[half + L + j] = x[L - 2 - j].
    if lengths is None:
        lengths = jnp.full((B,), S, dtype=jnp.int32)

    def fix(row_x, row_buf, L):
        src = jax.lax.dynamic_slice(
            row_x, (jnp.maximum(L - 1 - half, 0),), (half,))
        return jax.lax.dynamic_update_slice(row_buf, src[::-1], (half + L,))

    return jax.vmap(fix)(x, buf, lengths)


def _frames_via_reshape(x, lengths, n_frames, n_fft, hop_length):
    """Zero-gather framing with per-utterance reflect padding.

    TPU-first: a giant gather fused into the DFT matmul destroys MXU
    throughput (measured 108 ms -> 3 ms for B=32 x 8 s on v5e by switching
    to this). Instead: write the reflected edge samples (n_fft//2 each
    side) explicitly into a padded buffer, then build overlapping frames
    from ceil(n_fft/hop) *strided slices* of the hop-reshaped signal —
    pure slicing/concat, bit-exact vs the gather path.
    """
    B, S = x.shape
    n_chunks = -(-n_fft // hop_length)
    buf = _reflect_padded(x, lengths, n_frames, n_fft, hop_length)
    n_hops = buf.shape[1] // hop_length
    wh = buf[:, :n_hops * hop_length].reshape(B, n_hops, hop_length)
    pieces = [wh[:, c:n_frames + c] for c in range(n_chunks - 1)]
    rem = n_fft - (n_chunks - 1) * hop_length
    pieces.append(wh[:, n_chunks - 1:n_frames + n_chunks - 1, :rem])
    return jnp.concatenate(pieces, axis=-1)  # (B, n_frames, n_fft)


@partial(jax.jit, static_argnames=("n_fft", "hop_length", "win_length", "n_mels",
                                   "sample_rate", "f_min", "f_max", "top_db",
                                   "normalize"))
def log_mel_spectrogram(
    waveform,
    lengths=None,
    *,
    n_fft=400,
    hop_length=160,
    win_length=400,
    n_mels=80,
    sample_rate=16000,
    f_min=0.0,
    f_max=8000.0,
    top_db=80.0,
    normalize=True,
):
    """Compute log-mel features (optionally CMVN-normalized).

    Args:
        waveform: (S,) or (B, S) float32.
        lengths: optional (B,) true sample counts for padded batches.

    Returns:
        Single input: (T, n_mels) features.
        Batched input: ((B, T, n_mels) features, (B,) valid frame counts).
        T = 1 + S // hop_length; frames beyond a sequence's valid count are
        zeroed.
    """
    single = waveform.ndim == 1
    x = waveform[None, :] if single else waveform
    B, S = x.shape
    n_frames = 1 + S // hop_length

    dft = jnp.asarray(_windowed_dft_matrix(n_fft, win_length))
    fb = jnp.asarray(mel_filterbank(n_fft // 2 + 1, n_mels, sample_rate, f_min, f_max))
    n_bins = n_fft // 2 + 1

    # Note: a fused Pallas mel kernel (framing + DFT + power + mel + log in
    # one VMEM pass) was built and measured on real TPU, and XLA's fused
    # jnp path beat it (5.8 ms vs 9.0 ms at B=128x8s — the kernel paid a
    # 1.9x zero-pad FLOPs tax for Mosaic's 128-lane DMA alignment). The
    # kernel and its selector knob were removed rather than shipped as
    # known-slower dead code; see AGENTS.md "Pallas findings".
    if S > n_fft:
        frames = _frames_via_reshape(x, lengths, n_frames, n_fft,
                                     hop_length)
    else:
        # Degenerate tiny inputs (< n_fft samples): gather fallback.
        # Applies ONE reflection fold each side then clamps to the
        # edge — inputs shorter than n_fft//2 would need multiple
        # folds (torchaudio refuses such inputs outright; we return
        # edge-clamped frames instead of raising).
        idx = _frame_indices_reflect(n_frames, S, lengths, n_fft,
                                     hop_length)
        if idx.ndim == 2:
            frames = x[:, idx]                          # (B, T, n_fft)
        else:
            flat = idx.reshape(B, -1)
            frames = jnp.take_along_axis(x, flat, axis=1).reshape(
                B, n_frames, n_fft)

    # _STFT_PRECISION='highest': on TPU the default f32 matmul uses bf16
    # MXU passes; log10 amplifies relative error on low-energy bins, so
    # the (tiny) front-end matmuls run at full fp32 MXU precision. A
    # module-level knob so perf ablations (scripts/ab_mel_precision.py)
    # can measure the cheaper passes without forking the function.
    spec = jnp.dot(frames, dft, precision=_STFT_PRECISION,
                   preferred_element_type=jnp.float32)
    power = spec[..., :n_bins] ** 2 + spec[..., n_bins:] ** 2
    mel = jnp.dot(power, fb, precision=_STFT_PRECISION,
                  preferred_element_type=jnp.float32)  # (B, T, n_mels)

    # AmplitudeToDB(stype="power", top_db): 10*log10(clamp(x, 1e-10)),
    # clamped from below at per-utterance max - top_db.
    log_mel = 10.0 * jnp.log10(jnp.maximum(mel, 1e-10))

    if lengths is not None:
        frame_lengths = 1 + lengths // hop_length
        valid = (jnp.arange(n_frames)[None, :] < frame_lengths[:, None])[..., None]
    else:
        frame_lengths = jnp.full((B,), n_frames, dtype=jnp.int32)
        valid = jnp.ones((B, n_frames, 1), dtype=bool)

    neg_inf = jnp.asarray(-jnp.inf, log_mel.dtype)
    max_db = jnp.max(jnp.where(valid, log_mel, neg_inf), axis=(1, 2), keepdims=True)
    log_mel = jnp.maximum(log_mel, max_db - top_db)

    if normalize:
        # Per-utterance CMVN over valid frames; torch std is unbiased (n-1).
        n_valid = frame_lengths.astype(jnp.float32)[:, None, None]
        masked = jnp.where(valid, log_mel, 0.0)
        mean = jnp.sum(masked, axis=1, keepdims=True) / n_valid
        sq = jnp.sum(jnp.where(valid, (log_mel - mean) ** 2, 0.0), axis=1, keepdims=True)
        std = jnp.sqrt(sq / jnp.maximum(n_valid - 1.0, 1.0))
        log_mel = (log_mel - mean) / (std + 1e-8)

    log_mel = jnp.where(valid, log_mel, 0.0)

    if single:
        return log_mel[0]
    return log_mel, frame_lengths.astype(jnp.int32)


class AudioPreprocessor:
    """Load-and-featurize pipeline mirroring the reference AudioPreprocessor
    (/root/reference/data/preprocessing.py:16-129).

    ``__call__(path)`` -> (T, n_mels) numpy features.
    """

    def __init__(
        self,
        sample_rate=TARGET_SAMPLE_RATE,
        n_mels=80,
        n_fft=400,
        hop_length=160,
        win_length=400,
        f_min=0.0,
        f_max=8000.0,
        normalize=True,
    ):
        self.sample_rate = sample_rate
        self.n_mels = n_mels
        self.n_fft = n_fft
        self.hop_length = hop_length
        self.win_length = win_length
        self.f_min = f_min
        self.f_max = f_max
        self.normalize = normalize

    def load_audio(self, path):
        return load_audio(path, self.sample_rate)

    def extract_features(self, waveform):
        x = jnp.asarray(np.asarray(waveform, dtype=np.float32).reshape(-1))
        feats = log_mel_spectrogram(
            x,
            n_fft=self.n_fft,
            hop_length=self.hop_length,
            win_length=self.win_length,
            n_mels=self.n_mels,
            sample_rate=self.sample_rate,
            f_min=self.f_min,
            f_max=self.f_max,
            normalize=self.normalize,
        )
        return np.asarray(feats)

    def __call__(self, path):
        waveform, _ = self.load_audio(path)
        return self.extract_features(waveform)
