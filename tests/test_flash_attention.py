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


def test_dropout_rate_zero_is_identity_program():
    """dropout_rate=0.0 must produce exactly the no-dropout result (the
    seed input and bits draw are compiled out — same program)."""
    B, H, T, D = 2, 4, 96, 32
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.standard_normal((B, H, T, D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, 1, T, D)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, 1, T, D)).astype(np.float32))
    a = np.asarray(_run_kernel(q, k, v, None, block_q=64))
    b = np.asarray(_run_kernel(q, k, v, None, block_q=64, dropout_rate=0.0))
    np.testing.assert_array_equal(a, b)


def test_dropout_requires_seed_and_valid_rate():
    from turkish_asr_tpu.ops._flash_attention_impl import flash_attention
    q = jnp.zeros((1, 2, 64, 32))
    k = v = jnp.zeros((1, 1, 64, 32))
    with pytest.raises(ValueError, match="seed"):
        flash_attention(q, k, v, None, block_q=64, dropout_rate=0.1)
    with pytest.raises(ValueError, match="dropout_rate"):
        flash_attention(q, k, v, None, block_q=64, dropout_rate=1.5,
                        seed=jnp.zeros((1,), jnp.int32))


def test_dropout_plumbing_compiles_in_interpret_mode():
    """The rate>0 program (SMEM seed input + in-kernel PRNG) must trace
    and execute. NOTE: interpret mode's pltpu.prng_random_bits returns
    all zeros (checked 2026-08-18) — every weight is dropped, so the
    output is exactly zero here; the REAL randomness/mean/gradient
    validation runs on hardware (scripts/check_attn_dropout_tpu.py,
    record in AGENTS.md)."""
    B, H, T, D = 1, 2, 64, 32
    rng = np.random.default_rng(4)
    q = jnp.asarray(rng.standard_normal((B, H, T, D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, 1, T, D)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, 1, T, D)).astype(np.float32))
    seed = jnp.asarray([7], jnp.int32)
    out = np.asarray(_run_kernel(q, k, v, None, block_q=64,
                                 dropout_rate=0.25, seed=seed))
    assert out.shape == (B, H, T, D)
    assert np.isfinite(out).all()
    if jax.default_backend() == "tpu":
        assert not np.allclose(out, 0.0)


def test_dropout_grad_plumbing_interpret_mode():
    """Backward with rate>0 traces and runs (mask regenerated in-kernel;
    all-zero bits in interpret mode -> zero grads, finite everywhere)."""
    from jax.experimental.pallas import tpu as pltpu
    from turkish_asr_tpu.ops._flash_attention_impl import flash_attention
    B, H, T, D = 1, 2, 64, 32
    rng = np.random.default_rng(5)
    q = jnp.asarray(rng.standard_normal((B, H, T, D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, 1, T, D)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, 1, T, D)).astype(np.float32))
    seed = jnp.asarray([7], jnp.int32)

    def loss(a, b, c):
        return jnp.sum(flash_attention(a, b, c, None, block_q=64,
                                       dropout_rate=0.25, seed=seed))

    if jax.default_backend() == "tpu":
        g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    else:
        with pltpu.force_tpu_interpret_mode():
            g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    for arr in g:
        assert np.isfinite(np.asarray(arr)).all()


def test_mqa_attention_falls_back_on_kernel_without_dropout_support():
    """Custom kernels without the dropout kwargs (tests, older callables)
    must not break training: mqa_attention catches TypeError and runs the
    einsum path."""
    from turkish_asr_tpu.models.attention import init_attention, mqa_attention
    key = jax.random.PRNGKey(0)
    params = init_attention(key, 32, 2)
    x = jnp.asarray(np.random.default_rng(6).standard_normal(
        (2, 16, 32)).astype(np.float32))

    calls = []

    def legacy_kernel(q, k, v, mask):  # no dropout kwargs
        calls.append(1)
        return None

    out = mqa_attention(params, x, n_heads=2, dropout=0.1, train=True,
                        rng=jax.random.PRNGKey(1), kernel=legacy_kernel)
    assert out.shape == (2, 16, 32)
    assert np.isfinite(np.asarray(out)).all()
