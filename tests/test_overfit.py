"""Overfit test (SURVEY.md §4): a tiny synthetic corpus must be memorized —
loss driven to near zero and training transcripts recovered exactly."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from turkish_asr_tpu.audio.features import log_mel_spectrogram
from turkish_asr_tpu.data.tokenizer import TurkishTokenizer
from turkish_asr_tpu.models.conformer import ModelConfig, init_model, apply_model
from turkish_asr_tpu.ops.ctc import ctc_loss
from turkish_asr_tpu.decode.greedy import GreedyDecoder
import optax


@pytest.mark.slow
def test_overfit_five_utterances():
    tok = TurkishTokenizer()
    words = ["bir", "iki", "üç", "dört", "beş"]
    sr = 16000
    rng = np.random.default_rng(0)
    B = len(words)
    S = sr // 2
    waveforms = np.zeros((B, S), dtype=np.float32)
    for i in range(B):
        t = np.arange(S) / sr
        waveforms[i] = 0.3 * np.sin(2 * np.pi * (200 + 150 * i) * t) \
            + 0.01 * rng.standard_normal(S)
    targets_list = [tok.encode(w) for w in words]
    L = max(len(t) for t in targets_list)
    targets = np.zeros((B, L), dtype=np.int32)
    target_lengths = np.zeros((B,), dtype=np.int32)
    for i, t in enumerate(targets_list):
        targets[i, :len(t)] = t
        target_lengths[i] = len(t)

    cfg = ModelConfig(n_mels=80, d_model=64, n_heads=2, n_blocks=2,
                      n_classes=tok.vocab_size, dropout=0.0)
    params, state = init_model(jax.random.PRNGKey(0), cfg)
    tx = optax.adamw(3e-3, weight_decay=1e-6)
    opt = tx.init(params)

    w = jnp.asarray(waveforms)
    wl = jnp.full((B,), S, dtype=jnp.int32)
    feats, fl = log_mel_spectrogram(w, wl)
    tg = jnp.asarray(targets)
    tl = jnp.asarray(target_lengths)

    @jax.jit
    def step(params, state, opt):
        def loss_fn(p):
            logits, new_state = apply_model(p, state, feats, fl, cfg=cfg,
                                            train=True,
                                            rng=jax.random.PRNGKey(0))
            lp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
            return ctc_loss(lp, tg, fl // 4, tl), new_state
        (loss, new_state), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, updates), new_state, new_opt, loss

    first = None
    for i in range(300):
        params, state, opt, loss = step(params, state, opt)
        if first is None:
            first = float(loss)
    final = float(loss)
    assert final < 0.1, f"loss did not converge: {first} -> {final}"

    logits, _ = apply_model(params, state, feats, fl, cfg=cfg, train=False)
    dec = GreedyDecoder(tok)
    preds = dec.decode_batch(np.asarray(logits), np.asarray(fl // 4))
    assert preds == words
