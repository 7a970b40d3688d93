"""SpecAugment semantics: reference sampling + padding containment.

Reference: /root/reference/data/preprocessing.py:132-188 (2 freq masks
param 27, 2 time masks param 100, torchaudio-style width/start sampling).
Our batched on-device variant additionally bounds masks by each item's
valid length so padding never absorbs (or receives) a mask.
"""

import jax
import jax.numpy as jnp
import numpy as np

from turkish_asr_tpu.audio.augment import spec_augment_batch, SpecAugment


def test_masks_zero_something():
    x = jnp.ones((2, 120, 80))
    out = spec_augment_batch(x, jax.random.PRNGKey(0))
    out = np.asarray(out)
    assert out.shape == (2, 120, 80)
    assert (out == 0.0).sum() > 0
    assert (out == 1.0).sum() > 0


def test_time_mask_never_touches_padding():
    """Even when the sampled width exceeds the utterance's valid length,
    the mask must stay inside [0, valid_len) — ADVICE r1 item 4."""
    B, T, F = 4, 200, 8
    valid = np.array([5, 9, 3, 7], dtype=np.int32)
    x = jnp.ones((B, T, F))
    for seed in range(40):
        out = np.asarray(spec_augment_batch(
            x, jax.random.PRNGKey(seed), lengths=jnp.asarray(valid),
            freq_mask_param=0, time_mask_param=100))
        for b in range(B):
            pad = out[b, valid[b]:, :]
            assert (pad == 1.0).all(), (
                f"seed {seed} item {b}: time mask bled into padding")


def test_freq_mask_is_full_time_stripe():
    x = jnp.ones((1, 50, 80))
    out = np.asarray(spec_augment_batch(
        x, jax.random.PRNGKey(3), time_mask_param=0))
    # a frequency mask zeroes whole columns across all frames
    col_zero = (out[0] == 0.0).all(axis=0)
    col_one = (out[0] == 1.0).all(axis=0)
    assert (col_zero | col_one).all()


def test_host_specaugment_matches_reference_shape_contract():
    rng = np.random.default_rng(0)
    aug = SpecAugment(rng=np.random.default_rng(1))
    x = rng.standard_normal((130, 80)).astype(np.float32)
    y = aug(x)
    assert y.shape == x.shape
    assert (y == 0.0).sum() >= 0  # masks may be width 0; no crash is the bar
