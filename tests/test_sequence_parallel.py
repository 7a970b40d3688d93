"""Sequence/context parallelism: time-sharded activations must match
unsharded numerics (virtual 8-device CPU mesh)."""

import numpy as np
import jax
import jax.numpy as jnp

from turkish_asr_tpu.models.conformer import ModelConfig, init_model, apply_model
from turkish_asr_tpu.parallel.mesh import (
    make_mesh, replicated_sharding, shard_batch, activation_constraint)

CFG = ModelConfig(n_mels=80, d_model=64, n_heads=4, n_blocks=2, n_classes=40,
                  dropout=0.0)


def _inputs(B=2, T=256, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((B, T, CFG.n_mels)).astype(np.float32)
    lengths = np.array([T, T // 2], dtype=np.int32)
    return x, lengths


def test_seq_sharded_forward_matches():
    params, state = init_model(jax.random.PRNGKey(0), CFG)
    x, lengths = _inputs()

    want, _ = jax.jit(lambda p, s, x, l: apply_model(p, s, x, l, cfg=CFG))(
        params, state, jnp.asarray(x), jnp.asarray(lengths))

    mesh = make_mesh("data=2,seq=4")
    constrain = activation_constraint(mesh)
    assert constrain is not None
    sp = jax.device_put(params, replicated_sharding(mesh))
    ss = jax.device_put(state, replicated_sharding(mesh))

    @jax.jit
    def fwd(p, s, x, l):
        return apply_model(p, s, x, l, cfg=CFG, act_constraint=constrain)

    got, _ = fwd(sp, ss, jnp.asarray(x), jnp.asarray(lengths))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_seq_sharded_grads_match():
    params, state = init_model(jax.random.PRNGKey(1), CFG)
    x, lengths = _inputs(seed=3)

    def loss(p, s, x, l, constrain=None):
        logits, _ = apply_model(p, s, x, l, cfg=CFG, act_constraint=constrain)
        return jnp.mean(logits.astype(jnp.float32) ** 2)

    g_want = jax.jit(jax.grad(loss))(params, state, jnp.asarray(x),
                                     jnp.asarray(lengths))

    mesh = make_mesh("data=2,seq=4")
    constrain = activation_constraint(mesh)
    sp = jax.device_put(params, replicated_sharding(mesh))
    ss = jax.device_put(state, replicated_sharding(mesh))
    g_got = jax.jit(jax.grad(
        lambda p, s, x, l: loss(p, s, x, l, constrain)))(
        sp, ss, jnp.asarray(x), jnp.asarray(lengths))

    for a, b in zip(jax.tree.leaves(g_want), jax.tree.leaves(g_got)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)
