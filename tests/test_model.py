import numpy as np
import jax
import jax.numpy as jnp
import pytest

from turkish_asr_tpu.models.conformer import (
    ModelConfig, init_model, apply_model, count_params, groupnorm_groups,
    group_norm, batch_norm, _init_groupnorm,
)
from turkish_asr_tpu.models.attention import (
    rope_cos_sin, rotate_half, apply_rope, init_attention, mqa_attention,
)


CFG = ModelConfig(n_mels=80, d_model=64, n_heads=4, n_blocks=2, n_classes=33,
                  dropout=0.1)


def test_groupnorm_divisor_fallback():
    assert groupnorm_groups(256) == 32
    assert groupnorm_groups(80) == 16
    assert groupnorm_groups(100) == 4
    assert groupnorm_groups(7) == 1


def test_groupnorm_matches_torch():
    torch = pytest.importorskip("torch")
    x = np.random.default_rng(0).standard_normal((2, 10, 64)).astype(np.float32)
    g = groupnorm_groups(64)
    p = _init_groupnorm(64)
    got = np.asarray(group_norm(p, jnp.asarray(x), g))
    m = torch.nn.GroupNorm(g, 64)
    want = m(torch.tensor(x).transpose(1, 2)).transpose(1, 2).detach().numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_batchnorm_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(1)
    x = rng.standard_normal((4, 12, 16)).astype(np.float32)
    p = {"scale": jnp.ones((16,)), "bias": jnp.zeros((16,))}
    s = {"mean": jnp.zeros((16,)), "var": jnp.ones((16,))}
    got, new_s = batch_norm(p, s, jnp.asarray(x), train=True)
    m = torch.nn.BatchNorm1d(16)
    want = m(torch.tensor(x).transpose(1, 2)).transpose(1, 2).detach().numpy()
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)
    np.testing.assert_allclose(np.asarray(new_s["mean"]),
                               m.running_mean.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_s["var"]),
                               m.running_var.numpy(), atol=1e-4)


def test_rope_matches_reference_math():
    """RoPE must equal the reference's cos/sin-cache construction
    (/root/reference/model/attention.py:40-49,62-70)."""
    T, d = 16, 8
    cos, sin = rope_cos_sin(T, d)
    inv_freq = 1.0 / (10000.0 ** (np.arange(0, d, 2) / d))
    t = np.arange(T)
    freqs = np.outer(t, inv_freq)
    emb = np.concatenate([freqs, freqs], axis=-1)
    np.testing.assert_allclose(np.asarray(cos), np.cos(emb), atol=1e-6)
    np.testing.assert_allclose(np.asarray(sin), np.sin(emb), atol=1e-6)

    x = np.random.default_rng(2).standard_normal((T, d)).astype(np.float32)
    got = np.asarray(apply_rope(jnp.asarray(x), cos, sin))
    x1, x2 = x[:, :d // 2], x[:, d // 2:]
    rot = np.concatenate([-x2, x1], axis=-1)
    want = x * np.cos(emb) + rot * np.sin(emb)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_attention_mask_blocks_padding():
    key = jax.random.PRNGKey(0)
    p = init_attention(key, 64, 4, use_mqa=True)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 10, 64))
    mask = jnp.asarray([[True] * 10, [True] * 5 + [False] * 5])
    out1 = mqa_attention(p, x, mask, n_heads=4)
    # Perturbing masked positions must not change valid outputs of sample 1.
    x2 = x.at[1, 7].set(99.0)
    out2 = mqa_attention(p, x2, mask, n_heads=4)
    np.testing.assert_allclose(np.asarray(out1[1, :5]), np.asarray(out2[1, :5]),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(out1[0]), np.asarray(out2[0]), atol=1e-5)


def test_mqa_equals_expanded_kv():
    """Broadcasting the shared KV head must equal explicit expansion."""
    key = jax.random.PRNGKey(3)
    p = init_attention(key, 64, 4, use_mqa=True)
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 9, 64))
    out = mqa_attention(p, x, None, n_heads=4, use_mqa=True)

    import math
    from turkish_asr_tpu.models.attention import _dense
    B, T, D = x.shape
    dh = D // 4
    q = _dense(p["q"], x, jnp.float32).reshape(B, T, 4, dh)
    k = _dense(p["k"], x, jnp.float32).reshape(B, T, 1, dh)
    v = _dense(p["v"], x, jnp.float32).reshape(B, T, 1, dh)
    cos, sin = rope_cos_sin(T, dh)
    q = apply_rope(q, cos[None, :, None, :], sin[None, :, None, :]).transpose(0, 2, 1, 3)
    k = apply_rope(k, cos[None, :, None, :], sin[None, :, None, :]).transpose(0, 2, 1, 3)
    v = v.transpose(0, 2, 1, 3)
    k = jnp.broadcast_to(k, (B, 4, T, dh))
    v = jnp.broadcast_to(v, (B, 4, T, dh))
    scores = q @ k.transpose(0, 1, 3, 2) / math.sqrt(dh)
    ctx = jax.nn.softmax(scores, axis=-1) @ v
    want = _dense(p["out"], ctx.transpose(0, 2, 1, 3).reshape(B, T, D), jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=1e-4)


def test_model_shapes_and_length_rule():
    params, state = init_model(jax.random.PRNGKey(0), CFG)
    B, T = 2, 101
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, CFG.n_mels))
    lengths = jnp.asarray([101, 60], dtype=jnp.int32)
    logits, new_state = apply_model(params, state, x, lengths, cfg=CFG)
    # Two stride-2 convs with p=1,k=3: T' = floor((T-1)/2)+1 applied twice.
    t1 = (T - 1) // 2 + 1
    t2 = (t1 - 1) // 2 + 1
    assert logits.shape == (B, t2, CFG.n_classes)
    assert jax.tree.structure(new_state) == jax.tree.structure(state)


def test_model_train_updates_bn_state():
    params, state = init_model(jax.random.PRNGKey(0), CFG)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, CFG.n_mels))
    _, new_state = apply_model(params, state, x, cfg=CFG, train=True,
                               rng=jax.random.PRNGKey(2))
    before = np.asarray(state["blocks"]["bn"]["mean"])
    after = np.asarray(new_state["blocks"]["bn"]["mean"])
    assert not np.allclose(before, after)
    # Eval must not touch state.
    _, eval_state = apply_model(params, state, x, cfg=CFG, train=False)
    np.testing.assert_array_equal(np.asarray(eval_state["blocks"]["bn"]["mean"]),
                                  before)


def test_model_jit_and_grad():
    params, state = init_model(jax.random.PRNGKey(0), CFG)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, CFG.n_mels))

    @jax.jit
    def loss_fn(p):
        logits, _ = apply_model(p, state, x, cfg=CFG)
        return jnp.mean(logits ** 2)

    g = jax.grad(loss_fn)(params)
    gnorm = float(jnp.sqrt(sum(jnp.sum(v ** 2) for v in jax.tree.leaves(g))))
    assert np.isfinite(gnorm) and gnorm > 0


def test_param_count_default_config():
    cfg = ModelConfig(n_mels=80, d_model=256, n_heads=4, n_blocks=8,
                      n_classes=33)
    params, _ = init_model(jax.random.PRNGKey(0), cfg)
    n = count_params(params)
    # Conformer-S-ish: ~19M params at d=256/8 blocks with 4x SwiGLU FFNs.
    assert 10_000_000 < n < 40_000_000


def test_remat_grads_match_no_remat():
    """Per-block remat (jax.checkpoint on the scan body) is a pure
    scheduling change: with identical inputs and RNG keys the recomputed
    forward computes the same math, so loss and gradients must match the
    non-remat step to float tolerance (train mode, dropout active).
    Tolerances are tight-but-not-exact: XLA fuses/reassociates the remat
    program differently, which perturbs the last ulps."""
    params, state = init_model(jax.random.PRNGKey(0), CFG)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, CFG.n_mels))
    lengths = jnp.array([64, 40])
    rng = jax.random.PRNGKey(7)

    def loss_fn(p, remat):
        logits, _ = apply_model(p, state, x, lengths, cfg=CFG, train=True,
                                rng=rng, remat=remat)
        return jnp.mean(logits.astype(jnp.float32) ** 2)

    l0, g0 = jax.value_and_grad(lambda p: loss_fn(p, False))(params)
    l1, g1 = jax.value_and_grad(lambda p: loss_fn(p, True))(params)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
