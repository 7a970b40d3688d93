"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from turkish_asr_tpu.models.conformer import ModelConfig, init_model, apply_model
from turkish_asr_tpu.ops.ctc import ctc_loss
from turkish_asr_tpu.audio.features import log_mel_spectrogram
from turkish_asr_tpu.parallel.mesh import (
    make_mesh, shard_batch, batch_sharding, replicated_sharding,
    param_shardings)

CFG = ModelConfig(n_mels=80, d_model=64, n_heads=4, n_blocks=2, n_classes=40,
                  dropout=0.0)


def _batch(B=8, S=8000, L=8, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "waveforms": (rng.standard_normal((B, S)) * 0.1).astype(np.float32),
        "wav_lengths": np.full((B,), S, dtype=np.int32),
        "targets": rng.integers(1, CFG.n_classes, (B, L)).astype(np.int32),
        "target_lengths": np.full((B,), L, dtype=np.int32),
        "sample_mask": np.ones((B,), dtype=np.float32),
    }


def _loss_fn(params, state, batch):
    feats, frame_lengths = log_mel_spectrogram(
        batch["waveforms"], batch["wav_lengths"], n_mels=CFG.n_mels)
    logits, _ = apply_model(params, state, feats, frame_lengths, cfg=CFG)
    lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    per = ctc_loss(lp, batch["targets"], frame_lengths // 4,
                   batch["target_lengths"], reduction="none")
    per = per / jnp.maximum(batch["target_lengths"], 1)
    return jnp.sum(per * batch["sample_mask"]) / jnp.sum(batch["sample_mask"])


def test_requires_8_devices():
    assert len(jax.devices()) == 8, "conftest must provide 8 CPU devices"


def test_data_parallel_loss_matches_single_device():
    params, state = init_model(jax.random.PRNGKey(0), CFG)
    batch = _batch()

    single = float(jax.jit(_loss_fn)(params, state, batch))

    mesh = make_mesh("data=8")
    sp = jax.device_put(params, replicated_sharding(mesh))
    ss = jax.device_put(state, replicated_sharding(mesh))
    sb = shard_batch(mesh, batch)
    sharded = float(jax.jit(_loss_fn)(sp, ss, sb))
    assert abs(single - sharded) < 1e-4


def test_data_parallel_grads_match():
    params, state = init_model(jax.random.PRNGKey(1), CFG)
    batch = _batch(seed=3)

    g_single = jax.jit(jax.grad(_loss_fn))(params, state, batch)

    mesh = make_mesh("data=8")
    sp = jax.device_put(params, replicated_sharding(mesh))
    ss = jax.device_put(state, replicated_sharding(mesh))
    sb = shard_batch(mesh, batch)
    g_shard = jax.jit(jax.grad(_loss_fn))(sp, ss, sb)

    for a, b in zip(jax.tree.leaves(g_single), jax.tree.leaves(g_shard)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_tensor_parallel_forward_matches():
    params, state = init_model(jax.random.PRNGKey(2), CFG)
    batch = _batch(seed=5)

    single = float(jax.jit(_loss_fn)(params, state, batch))

    mesh = make_mesh("data=4,model=2")
    sp = jax.device_put(params, param_shardings(params, mesh))
    ss = jax.device_put(state, replicated_sharding(mesh))
    sb = shard_batch(mesh, batch)
    sharded = float(jax.jit(_loss_fn)(sp, ss, sb))
    assert abs(single - sharded) < 1e-4


def test_mesh_spec_parsing():
    m = make_mesh("data=2,model=4")
    assert m.axis_names == ("data", "model")
    assert m.devices.shape == (2, 4)
    m2 = make_mesh("data=-1,model=2")
    assert m2.devices.shape == (4, 2)
    with pytest.raises(ValueError):
        make_mesh("data=3,model=5")
