"""Prototype for the held-out WER parity harness (VERDICT r3 ask #1).

Builds a compositional tone-word corpus: W distinct tone 'words', training
sentences are ordered word pairs, a held-out set of UNSEEN pairs recombines
seen words. Trains OUR stack only and reports held-out greedy WER over
epochs + wall time — used to size the slow test before wiring the
reference side. Run on CPU (the test environment):

    JAX_PLATFORM_NAME=cpu python scripts/proto_heldout.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")

import numpy as np


WORDS = ["bir", "iki", "üç", "dört", "beş", "altı"]
SR = 16000
WORD_SEC = float(__import__('os').environ.get('WORD_SEC', 0.3))
GAP_SEC = float(__import__('os').environ.get('GAP_SEC', 0.08))
LR = 3e-3
WD = 1e-6
EPOCHS = int(__import__('os').environ.get('EPOCHS', 300))
EDGE_SEC = float(__import__('os').environ.get('EDGE_SEC', 0.08))


def tone_for_word(i, n_samples, rng):
    """Distinct, speech-scale signature per word: base tone + harmonic with
    a word-specific AM envelope. Deterministic except tiny dither."""
    t = np.arange(n_samples) / SR
    f0 = 160 + 70 * i
    am = 0.5 * (1 + np.sin(2 * np.pi * (3 + i) * t))
    x = 0.3 * np.sin(2 * np.pi * f0 * t) * am
    x += 0.1 * np.sin(2 * np.pi * 2 * f0 * t)
    x += 0.005 * rng.standard_normal(n_samples)
    return x.astype(np.float32)


def make_corpus(rng):
    """All ordered pairs (i != j) -> 30 sentences; hold out 8 pairs chosen
    so every word still appears in BOTH positions in training."""
    pairs = [(i, j) for i in range(len(WORDS)) for j in range(len(WORDS))
             if i != j]
    held = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (5, 0), (0, 3), (2, 5)]
    train = [p for p in pairs if p not in held]
    wn = int(WORD_SEC * SR)
    gn = int(GAP_SEC * SR)
    en = int(EDGE_SEC * SR)  # leading/trailing silence: the //4 length
    # rule truncates up to 3 tail frames, which was dropping final chars
    S = 2 * wn + gn + 2 * en

    def render(pair):
        x = np.zeros((S,), dtype=np.float32)
        x[en:en + wn] = tone_for_word(pair[0], wn, rng)
        x[en + wn + gn:en + 2 * wn + gn] = tone_for_word(pair[1], wn, rng)
        return x, f"{WORDS[pair[0]]} {WORDS[pair[1]]}"

    return train, held, render, S


def batch_of(pairs, render, tok, S):
    B = len(pairs)
    wav = np.zeros((B, S), dtype=np.float32)
    texts = []
    for k, p in enumerate(pairs):
        x, txt = render(p)
        wav[k] = x
        texts.append(txt)
    enc = [tok.encode(t) for t in texts]
    L = max(len(e) for e in enc)
    tgt = np.zeros((B, L), dtype=np.int32)
    tl = np.zeros((B,), dtype=np.int32)
    for k, e in enumerate(enc):
        tgt[k, :len(e)] = e
        tl[k] = len(e)
    return wav, texts, tgt, tl


def main():
    import jax
    import jax.numpy as jnp
    from turkish_asr_tpu.data.tokenizer import TurkishTokenizer
    from turkish_asr_tpu.models.conformer import ModelConfig, init_model, apply_model
    from turkish_asr_tpu.audio.features import log_mel_spectrogram
    from turkish_asr_tpu.train.optim import make_optimizer
    from turkish_asr_tpu.train.trainer import Trainer
    from turkish_asr_tpu.parallel.mesh import make_mesh
    from turkish_asr_tpu.utils.config import get_config
    from turkish_asr_tpu.utils.logger import get_logger
    from turkish_asr_tpu.utils.metrics import wer
    from turkish_asr_tpu.decode.greedy import GreedyDecoder

    rng = np.random.default_rng(0)
    tok = TurkishTokenizer()
    train_pairs, held_pairs, render, S = make_corpus(rng)
    wav, texts, tgt, tl = batch_of(train_pairs, render, tok, S)
    hwav, htexts, _, _ = batch_of(held_pairs, render, tok, S)
    B = wav.shape[0]
    print(f"train={B} held={len(held_pairs)} S={S}")

    cfg = ModelConfig(n_mels=80, d_model=64, n_heads=2, n_blocks=2,
                      n_classes=tok.vocab_size, dropout=0.0)
    params, state = init_model(jax.random.PRNGKey(0), cfg)
    tx, sched = make_optimizer(LR, WD, total_steps=EPOCHS,
                               accumulation_steps=1)
    batch = {"waveforms": wav,
             "wav_lengths": np.full((B,), S, dtype=np.int32),
             "targets": tgt, "target_lengths": tl,
             "sample_mask": np.ones((B,), dtype=np.float32)}
    tr = Trainer(model_cfg=cfg, params=params, model_state=state,
                 optimizer=tx, schedule=sched,
                 config=get_config(["--checkpoint_dir", "/tmp/proto_h",
                                    "--epochs", str(EPOCHS),
                                    "--log_interval", "1000000"]),
                 logger=get_logger("proto", log_file="/tmp/proto_h.log"),
                 tokenizer=tok, train_loader=[batch],
                 mesh=make_mesh(None, devices=jax.devices()[:1]),
                 gradient_clip=1.0, accumulation_steps=1,
                 compute_dtype=jnp.float32, augment=False)

    hb = len(held_pairs)
    hfeats, hfl = log_mel_spectrogram(
        jnp.asarray(hwav), jnp.full((hb,), S, dtype=jnp.int32))
    dec = GreedyDecoder(tok)

    t0 = time.time()
    for epoch in range(1, EPOCHS + 1):
        loss = float(tr.train_epoch(epoch))
        if epoch % 25 == 0 or epoch == EPOCHS:
            logits, _ = apply_model(tr.params, tr.model_state, hfeats, hfl,
                                    cfg=cfg, train=False)
            preds = dec.decode_batch(np.asarray(logits), np.asarray(hfl) // 4)
            w = wer(htexts, preds)
            print(f"ep {epoch:4d} loss {loss:7.4f} heldout WER {w:.3f} "
                  f"({time.time() - t0:6.1f}s) preds[:3]={preds[:3]}")
            if w == 0.0 and loss < 0.2:
                print(f"CONVERGED at epoch {epoch}, {time.time() - t0:.1f}s")
                break


if __name__ == "__main__":
    main()
