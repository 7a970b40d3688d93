"""Fused Pallas mel kernel vs the jnp front-end (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from turkish_asr_tpu.audio.features import log_mel_spectrogram


def _run(w, l, use_kernel):
    if jax.default_backend() == "tpu" or not use_kernel:
        return log_mel_spectrogram(w, l, use_kernel=use_kernel)
    from jax.experimental.pallas import tpu as pltpu
    with pltpu.force_tpu_interpret_mode():
        return log_mel_spectrogram(w, l, use_kernel=True)


def test_kernel_matches_jnp_path():
    B, S = 2, 48000
    rng = np.random.default_rng(0)
    w = jnp.asarray((rng.standard_normal((B, S)) * 0.1).astype(np.float32))
    l = jnp.asarray([S, 30000], dtype=jnp.int32)
    a, fla = _run(w, l, use_kernel=True)
    b, flb = _run(w, l, use_kernel=False)
    np.testing.assert_array_equal(np.asarray(fla), np.asarray(flb))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3)


def test_kernel_non_tile_multiple_frames():
    # n_frames not a multiple of block_t exercises the padded last tile
    B, S = 1, 100 * 160  # 101 frames < block_t
    rng = np.random.default_rng(1)
    w = jnp.asarray((rng.standard_normal((B, S)) * 0.1).astype(np.float32))
    l = jnp.asarray([S], dtype=jnp.int32)
    a, _ = _run(w, l, use_kernel=True)
    b, _ = _run(w, l, use_kernel=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3)
