"""Gradient accumulation semantics: MultiSteps + epoch-end flush must match
the reference's scaled-loss accumulation math."""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from turkish_asr_tpu.train.optim import make_optimizer


def _make_trainer(accum, tmp_path):
    from turkish_asr_tpu.models.conformer import ModelConfig, init_model
    from turkish_asr_tpu.train.trainer import Trainer
    from turkish_asr_tpu.utils.config import get_config
    from turkish_asr_tpu.utils.logger import get_logger
    from turkish_asr_tpu.data.tokenizer import TurkishTokenizer
    from turkish_asr_tpu.parallel.mesh import make_mesh

    tok = TurkishTokenizer()
    cfg = ModelConfig(n_mels=80, d_model=32, n_heads=2, n_blocks=1,
                      n_classes=tok.vocab_size, dropout=0.0)
    params, state = init_model(jax.random.PRNGKey(0), cfg)
    tx, sched = make_optimizer(1e-3, 1e-6, total_steps=100,
                               accumulation_steps=accum)
    config = get_config(["--accumulation_steps", str(accum)])
    logger = get_logger("test_accum", log_file=str(tmp_path / "t.log"))
    return Trainer(model_cfg=cfg, params=params, model_state=state,
                   optimizer=tx, schedule=sched, config=config,
                   logger=logger, tokenizer=tok,
                   mesh=make_mesh(None, devices=jax.devices()[:1]),
                   accumulation_steps=accum, compute_dtype=jnp.float32)


def _batch(B=2, S=8000, bad=False):
    rng = np.random.default_rng(0)
    w = (rng.standard_normal((B, S)) * 0.1).astype(np.float32)
    if bad:
        w[0, 0] = np.inf  # drives the loss non-finite -> on-device skip
    return {
        "waveforms": w,
        "wav_lengths": np.full((B,), S, dtype=np.int32),
        "targets": rng.integers(2, 30, (B, 8)).astype(np.int32),
        "target_lengths": np.full((B,), 8, dtype=np.int32),
        "sample_mask": np.ones((B,), dtype=np.float32),
    }


def test_flush_uses_device_mini_step_after_nan_skip(tmp_path):
    """A NaN-skipped batch must not desync the epoch-end flush: leftover
    comes from opt_state.mini_step, not the host counter."""
    from turkish_asr_tpu.parallel.mesh import shard_batch
    tr = _make_trainer(accum=4, tmp_path=tmp_path)
    key = jax.random.PRNGKey(0)
    # 5 batches, one bad: device collects 4 good micro-grads -> exactly one
    # full window emitted, mini_step back to 0.
    for i, bad in enumerate([False, False, True, False, False]):
        db = shard_batch(tr.mesh, _batch(bad=bad))
        tr.params, tr.model_state, tr.opt_state, loss = tr._train_step(
            tr.params, tr.model_state, tr.opt_state, db,
            jax.random.fold_in(key, i))
        tr._micro_step += 1
    assert int(jax.device_get(tr.opt_state.mini_step)) == 0
    before = jax.device_get(tr.params["fc"]["w"])
    tr.flush_accumulation()  # leftover==0 on device: must be a no-op
    assert int(jax.device_get(tr.opt_state.mini_step)) == 0
    np.testing.assert_array_equal(before, jax.device_get(tr.params["fc"]["w"]))


def test_flush_applies_partial_window_via_trainer(tmp_path):
    from turkish_asr_tpu.parallel.mesh import shard_batch
    tr = _make_trainer(accum=4, tmp_path=tmp_path)
    key = jax.random.PRNGKey(0)
    for i in range(3):  # partial window: 3 of 4
        db = shard_batch(tr.mesh, _batch())
        tr.params, tr.model_state, tr.opt_state, loss = tr._train_step(
            tr.params, tr.model_state, tr.opt_state, db,
            jax.random.fold_in(key, i))
        tr._micro_step += 1
    assert int(jax.device_get(tr.opt_state.mini_step)) == 3
    before = np.asarray(jax.device_get(tr.params["fc"]["w"]))
    tr.flush_accumulation()
    assert int(jax.device_get(tr.opt_state.mini_step)) == 0
    after = np.asarray(jax.device_get(tr.params["fc"]["w"]))
    assert not np.array_equal(before, after)  # flush emitted an update


def test_multisteps_mean_matches_scaled_sum():
    """k micro-grads through MultiSteps(accum=k) must apply the same update
    as one step on the mean gradient (= reference's sum of loss/k grads)."""
    accum = 4
    tx_acc, _ = make_optimizer(1e-2, 0.0, total_steps=100,
                               accumulation_steps=accum)
    tx_ref, _ = make_optimizer(1e-2, 0.0, total_steps=100,
                               accumulation_steps=1)
    params = {"w": jnp.ones((3,))}
    grads = [{"w": jnp.asarray([float(i + 1), 0.0, -1.0])} for i in range(accum)]

    # accumulated path
    s = tx_acc.init(params)
    p = params
    for g in grads:
        u, s = tx_acc.update(g, s, p)
        p = optax.apply_updates(p, u)
    # reference path: one step on the mean grad
    mean_grad = jax.tree.map(lambda *xs: sum(xs) / accum, *grads)
    s2 = tx_ref.init(params)
    u2, _ = tx_ref.update(mean_grad, s2, params)
    p2 = optax.apply_updates(params, u2)
    np.testing.assert_allclose(np.asarray(p["w"]), np.asarray(p2["w"]),
                               rtol=1e-6)


def test_epoch_end_flush_applies_partial_window():
    """Feeding zero grads to the window boundary must emit the diluted
    partial mean (reference trainer.py:214-219 semantics)."""
    accum = 4
    k = 3  # leftover micro-steps
    tx_acc, _ = make_optimizer(1e-2, 0.0, total_steps=100,
                               accumulation_steps=accum)
    tx_ref, _ = make_optimizer(1e-2, 0.0, total_steps=100,
                               accumulation_steps=1)
    params = {"w": jnp.ones((3,))}
    grads = [{"w": jnp.asarray([1.0, 2.0, 3.0])} for _ in range(k)]

    s = tx_acc.init(params)
    p = params
    for g in grads:
        u, s = tx_acc.update(g, s, p)
        p = optax.apply_updates(p, u)
    # params unchanged before the flush
    np.testing.assert_array_equal(np.asarray(p["w"]), np.asarray(params["w"]))
    zeros = jax.tree.map(jnp.zeros_like, params)
    for _ in range(accum - k):
        u, s = tx_acc.update(zeros, s, p)
        p = optax.apply_updates(p, u)

    diluted = jax.tree.map(lambda *xs: sum(xs) / accum, *grads)
    s2 = tx_ref.init(params)
    u2, _ = tx_ref.update(diluted, s2, params)
    p2 = optax.apply_updates(params, u2)
    np.testing.assert_allclose(np.asarray(p["w"]), np.asarray(p2["w"]),
                               rtol=1e-6)
