"""masked_norm mode: valid outputs must be independent of padded length."""

import numpy as np
import jax
import jax.numpy as jnp

from turkish_asr_tpu.models.conformer import ModelConfig, init_model, apply_model


def _cfg(masked):
    return ModelConfig(n_mels=80, d_model=64, n_heads=4, n_blocks=2,
                       n_classes=40, dropout=0.0, masked_norm=masked)


def test_masked_norm_padding_invariance():
    cfg = _cfg(True)
    params, state = init_model(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    L = 64  # multiple of 4 avoids //4 edge effects at the boundary
    x_short = rng.standard_normal((1, L, 80)).astype(np.float32)

    # unpadded run at exact length
    want, _ = apply_model(params, state, jnp.asarray(x_short),
                          jnp.asarray([L], dtype=jnp.int32), cfg=cfg)

    # same utterance inside a longer zero-padded buffer
    T_pad = 128
    x_pad = np.zeros((1, T_pad, 80), dtype=np.float32)
    x_pad[0, :L] = x_short[0]
    got, _ = apply_model(params, state, jnp.asarray(x_pad),
                         jnp.asarray([L], dtype=jnp.int32), cfg=cfg)

    Lq = L // 4
    np.testing.assert_allclose(np.asarray(got)[0, :Lq],
                               np.asarray(want)[0, :Lq], atol=1e-4)


def test_reference_mode_is_padding_dependent():
    """Sanity: without masked_norm the reference quirk persists (outputs
    depend on padded length) — proves the flag actually changes behavior."""
    cfg = _cfg(False)
    params, state = init_model(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    L = 64
    x_short = rng.standard_normal((1, L, 80)).astype(np.float32)
    want, _ = apply_model(params, state, jnp.asarray(x_short),
                          jnp.asarray([L], dtype=jnp.int32), cfg=cfg)
    x_pad = np.zeros((1, 128, 80), dtype=np.float32)
    x_pad[0, :L] = x_short[0]
    got, _ = apply_model(params, state, jnp.asarray(x_pad),
                         jnp.asarray([L], dtype=jnp.int32), cfg=cfg)
    diff = np.abs(np.asarray(got)[0, :L // 4] - np.asarray(want)[0, :L // 4]).max()
    assert diff > 1e-3  # padding leaks in reference mode


def test_masked_norm_trains():
    cfg = _cfg(True)
    params, state = init_model(jax.random.PRNGKey(1), cfg)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 64, 80))
    lengths = jnp.asarray([64, 40], dtype=jnp.int32)

    def loss(p):
        logits, _ = apply_model(p, state, x, lengths, cfg=cfg, train=True,
                                rng=jax.random.PRNGKey(3))
        return jnp.mean(logits.astype(jnp.float32) ** 2)

    g = jax.grad(loss)(params)
    gnorm = float(jnp.sqrt(sum(jnp.sum(v ** 2) for v in jax.tree.leaves(g))))
    assert np.isfinite(gnorm) and gnorm > 0
