"""Custom-VJP gradients of the flash kernel vs einsum autodiff."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest


def _ref_attention(q, k, v, mask):
    D = q.shape[-1]
    if k.shape[1] != q.shape[1]:
        k = jnp.broadcast_to(k, q.shape[:2] + k.shape[2:])
        v = jnp.broadcast_to(v, q.shape[:2] + v.shape[2:])
    scores = jnp.einsum("bhtd,bhsd->bhts", q, k) / math.sqrt(D)
    if mask is not None:
        scores = jnp.where(mask[:, None, None, :], scores, -1e9)
    return jnp.einsum("bhts,bhsd->bhtd", jax.nn.softmax(scores, -1), v)


@pytest.mark.parametrize("Kh", [1, 4])
@pytest.mark.parametrize("T", [64, 40])  # 40: partial q tiles at block 64
def test_flash_grads_match_einsum(Kh, T):
    from jax.experimental.pallas import tpu as pltpu
    from turkish_asr_tpu.ops._flash_attention_impl import flash_attention

    B, H, D = 2, 4, 32
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, H, T, D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, Kh, T, D)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, Kh, T, D)).astype(np.float32))
    mask = jnp.asarray(np.arange(T)[None, :] < np.array([T, 33])[:, None])
    w = jnp.asarray(rng.standard_normal((D,)).astype(np.float32))

    def loss_kernel(q, k, v):
        out = flash_attention(q, k, v, mask, block_q=64)
        # weight valid rows only (invalid q rows see garbage logits)
        valid = mask[:, None, :, None]
        return jnp.sum(jnp.where(valid, out, 0.0) * w)

    def loss_ref(q, k, v):
        out = _ref_attention(q, k, v, mask)
        valid = mask[:, None, :, None]
        return jnp.sum(jnp.where(valid, out, 0.0) * w)

    if jax.default_backend() == "tpu":
        g_k = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    else:
        # the backward pass also runs Pallas kernels now, so the whole
        # grad computation needs interpret mode on CPU
        with pltpu.force_tpu_interpret_mode():
            g_k = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_k, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-3)
