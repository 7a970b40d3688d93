"""Pallas flash-attention kernel vs einsum oracle (interpret mode on CPU)."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest


def _ref_attention(q, k, v, mask):
    D = q.shape[-1]
    if k.shape[1] != q.shape[1]:  # broadcast shared KV head
        k = jnp.broadcast_to(k, q.shape[:2] + k.shape[2:])
        v = jnp.broadcast_to(v, q.shape[:2] + v.shape[2:])
    scores = jnp.einsum("bhtd,bhsd->bhts", q, k) / math.sqrt(D)
    if mask is not None:
        scores = jnp.where(mask[:, None, None, :], scores, -1e9)
    return jnp.einsum("bhts,bhsd->bhtd", jax.nn.softmax(scores, -1), v)


def _run_kernel(q, k, v, mask, **kw):
    from jax.experimental.pallas import tpu as pltpu
    from turkish_asr_tpu.ops._flash_attention_impl import flash_attention
    if jax.default_backend() == "tpu":
        return flash_attention(q, k, v, mask, **kw)
    with pltpu.force_tpu_interpret_mode():
        return flash_attention(q, k, v, mask, **kw)


@pytest.mark.parametrize("Kh", [1, 4])
def test_kernel_matches_einsum(Kh):
    B, H, T, D = 2, 4, 96, 32
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, H, T, D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, Kh, T, D)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, Kh, T, D)).astype(np.float32))
    lens = np.array([96, 40])
    mask = jnp.asarray(np.arange(T)[None, :] < lens[:, None])

    got = np.asarray(_run_kernel(q, k, v, mask, block_q=64))
    want = np.asarray(_ref_attention(q, k, v, mask))
    for b in range(B):
        np.testing.assert_allclose(got[b, :, :lens[b]], want[b, :, :lens[b]],
                                   atol=2e-3)


def test_kernel_no_mask():
    B, H, T, D = 1, 2, 64, 32
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((B, H, T, D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, 1, T, D)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, 1, T, D)).astype(np.float32))
    got = np.asarray(_run_kernel(q, k, v, None, block_q=64))
    want = np.asarray(_ref_attention(q, k, v, None))
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_dispatcher_declines_short_sequences():
    from turkish_asr_tpu.ops.flash_attention import make_flash_attention
    kern = make_flash_attention()
    if jax.default_backend() != "tpu":
        assert kern is None
    else:
        q = jnp.zeros((1, 4, 100, 64))
        k = v = jnp.zeros((1, 1, 100, 64))
        assert kern(q, k, v, None) is None
