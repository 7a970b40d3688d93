"""Data augmentation: SpecAugment, speed perturbation, noise injection.

Reference semantics (/root/reference/data/preprocessing.py:132-283):
- SpecAugment: 2 frequency masks (param 27) + 2 time masks (param 100),
  torchaudio-style sampling — mask width = int(U(0,1)*param), start =
  int(U(0,1)*(len-width)), fill 0.0.
- SpeedPerturbation: speed drawn from {0.9, 1.0, 1.1}; implemented by
  resampling to int(sr/speed) (changes pitch too, like the reference).
- NoisePerturbation: random noise file, tiled/cropped, mixed at
  U(5,20) dB SNR by power scaling.

TPU-first: SpecAugment also ships as a jittable batched function
(``spec_augment_batch``) applied inside the training step with
``jax.random`` — augmentation runs on-device after the padded batch is
transferred, instead of per-utterance on host workers.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from turkish_asr_tpu.audio.wavio import load_audio, resample


# ---------------------------------------------------------------------------
# SpecAugment
# ---------------------------------------------------------------------------

def _mask_axis(x, rng, mask_param, axis, axis_len, valid_len=None):
    """One torchaudio-style mask on `axis`: width=int(u1*param),
    start=int(u2*(len-width)). When valid_len is given, the start range is
    bounded by the utterance's true length so padding doesn't absorb masks."""
    k1, k2 = jax.random.split(rng)
    value = jax.random.uniform(k1) * mask_param
    if valid_len is not None:
        # A mask wider than the utterance would start at 0 and bleed into
        # padding; cap it at the valid length (torchaudio never masks more
        # than the tensor it sees).
        value = jnp.minimum(value, valid_len)
    span = (valid_len if valid_len is not None else axis_len) - value
    min_value = jax.random.uniform(k2) * jnp.maximum(span, 0.0)
    start = min_value.astype(jnp.int32)
    end = start + value.astype(jnp.int32)
    pos = jnp.arange(axis_len)
    mask = (pos >= start) & (pos < end)
    shape = [1] * x.ndim
    shape[axis] = axis_len
    return jnp.where(mask.reshape(shape), 0.0, x)


@partial(jax.jit, static_argnames=("freq_mask_param", "time_mask_param",
                                   "n_freq_masks", "n_time_masks"))
def spec_augment_batch(
    features,
    rng,
    lengths=None,
    *,
    freq_mask_param=27,
    time_mask_param=100,
    n_freq_masks=2,
    n_time_masks=2,
):
    """Apply SpecAugment to a (B, T, F) batch with independent masks per item.

    Args:
        features: (B, T, F) float features.
        rng: jax PRNG key.
        lengths: optional (B,) valid frame counts (bounds time-mask starts).
    """
    B, T, F = features.shape

    def one(x, key, valid_t):
        keys = jax.random.split(key, n_freq_masks + n_time_masks)
        for i in range(n_freq_masks):
            x = _mask_axis(x, keys[i], freq_mask_param, axis=1, axis_len=F)
        for i in range(n_time_masks):
            x = _mask_axis(x, keys[n_freq_masks + i], time_mask_param,
                           axis=0, axis_len=T, valid_len=valid_t)
        return x

    keys = jax.random.split(rng, B)
    if lengths is None:
        lengths = jnp.full((B,), T, dtype=jnp.int32)
    return jax.vmap(one)(features, keys, lengths.astype(jnp.float32))


class SpecAugment:
    """Host-side per-utterance SpecAugment on (T, F) numpy features."""

    def __init__(self, freq_mask_param=27, time_mask_param=100,
                 n_freq_masks=2, n_time_masks=2, rng=None):
        self.freq_mask_param = freq_mask_param
        self.time_mask_param = time_mask_param
        self.n_freq_masks = n_freq_masks
        self.n_time_masks = n_time_masks
        self.rng = rng or np.random.default_rng()

    def __call__(self, features):
        x = np.array(features, dtype=np.float32, copy=True)
        T, F = x.shape
        for _ in range(self.n_freq_masks):
            width = int(self.rng.uniform() * self.freq_mask_param)
            start = int(self.rng.uniform() * (F - width))
            x[:, start:start + width] = 0.0
        for _ in range(self.n_time_masks):
            width = int(self.rng.uniform() * self.time_mask_param)
            start = int(self.rng.uniform() * (T - width))
            x[start:start + width, :] = 0.0
        return x


# ---------------------------------------------------------------------------
# Waveform-level augmentations (host-side, per-sample)
# ---------------------------------------------------------------------------

class SpeedPerturbation:
    """Random 3-way speed perturbation via resampling (pitch shifts too)."""

    def __init__(self, speeds=(0.9, 1.0, 1.1), rng=None):
        self.speeds = speeds
        self.rng = rng or np.random.default_rng()

    def __call__(self, waveform, sample_rate):
        speed = self.speeds[int(self.rng.integers(len(self.speeds)))]
        if speed == 1.0:
            return waveform
        # output_len = input_len * new/orig; want input_len/speed => new = orig/speed
        new_freq = int(sample_rate / speed)
        return resample(waveform, sample_rate, new_freq)


class NoisePerturbation:
    """SNR-controlled additive noise from a directory of wav files."""

    def __init__(self, noise_dir=None, snr_range=(5.0, 20.0), rng=None):
        self.noise_dir = noise_dir
        self.snr_range = snr_range
        self.rng = rng or np.random.default_rng()
        self.noise_files = []
        if noise_dir:
            import glob
            self.noise_files = glob.glob(f"{noise_dir}/**/*.wav", recursive=True)

    def __call__(self, waveform, sample_rate):
        if not self.noise_files:
            return waveform
        x = np.asarray(waveform, dtype=np.float32).reshape(-1)
        idx = int(self.rng.integers(len(self.noise_files)))
        noise, _ = load_audio(self.noise_files[idx], sample_rate)
        if noise.shape[0] < x.shape[0]:
            repeats = x.shape[0] // noise.shape[0] + 1
            noise = np.tile(noise, repeats)
        noise = noise[: x.shape[0]]
        snr = float(self.rng.uniform(*self.snr_range))
        signal_power = np.mean(x ** 2)
        noise_power = np.mean(noise ** 2) + 1e-12
        scale = np.sqrt(signal_power / (noise_power * (10 ** (snr / 10))))
        return x + scale.astype(np.float32) * noise
