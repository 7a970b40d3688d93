"""Parameterized held-out WER-parity harness vs the LIVE reference stack.

Shared by tests/test_heldout_wer_parity.py (one canonical draw in the
slow lane) and scripts/sweep_wer_parity.py (the statistical sweep:
multiple init seeds, a harder corpus — more words / 3-word sentences —
and the BPE tokenizer path; VERDICT r4 ask #2).

The design is the round-4 harness verbatim, with the knobs lifted out:
a compositional tone-word corpus (every 'word' a distinct tone
signature; sentences are ordered word tuples) split so the held-out
sentences recombine words seen in training — generalization, not
memorization. Both stacks train from IDENTICAL imported weights on
identical features: the actual reference Trainer/model imported from
/root/reference vs our Trainer, then held-out greedy WER and
beam-16 + word-ARPA-fused WER are compared.

Match: /root/reference/trainer/trainer.py:147-225 (training),
/root/reference/utils/decoding.py:172-307 (host beam + LM fusion).
"""

import os
import sys
from types import SimpleNamespace

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from ref_stack import (import_reference, import_reference_beam,  # noqa: E402
                       duck_kenlm)

LR = 3e-3
WD = 1e-6
# 12 distinct Turkish words; the base config uses the first 8 (the exact
# round-4 corpus), the harder variant all 12.
WORDS12 = ["bir", "iki", "üç", "dört", "beş", "altı", "yedi", "sekiz",
           "dokuz", "on", "yüz", "bin"]
SR = 16000
WORD_SEC, GAP_SEC, EDGE_SEC = 0.4, 0.12, 0.08


def _tone(i, n, rng):
    t = np.arange(n) / SR
    f0 = 140.0 * (1.28 ** i)   # geometric spacing keeps words separable
    # (i=11 -> 2.1 kHz fundamental, 4.3 kHz harmonic: inside the 8 kHz
    # mel band with no aliasing)
    am = 0.5 * (1 + np.sin(2 * np.pi * (2.0 + 1.7 * i) * t))
    x = 0.3 * np.sin(2 * np.pi * f0 * t) * am
    x += 0.1 * np.sin(2 * np.pi * 2 * f0 * t)
    x += 0.005 * rng.standard_normal(n)
    r = int(0.02 * SR)   # 20 ms ramps sharpen word boundaries
    env = np.ones(n)
    env[:r] = np.linspace(0, 1, r)
    env[-r:] = np.linspace(1, 0, r)
    return (x * env).astype(np.float32)


def make_corpus(n_words=8, sent_len=2):
    """(words, train_tuples, held_tuples, batch_of, S).

    sent_len=2: all ordered pairs (i != j); hold out (i, i+1) and
    (i, i+3) mod W — every word keeps both positions in training.
    sent_len=3: arithmetic-progression triples (i, i+k, i+2k) mod W for
    every stride k with distinct members; hold out strides {1, 3} — the
    held-out triples recombine words (and even bigrams) never seen
    together in training order.
    """
    words = WORDS12[:n_words]
    W = len(words)
    if sent_len == 2:
        tuples = [(i, j) for i in range(W) for j in range(W) if i != j]
        held = [(i, (i + 1) % W) for i in range(W)] \
            + [(i, (i + 3) % W) for i in range(W)]
    elif sent_len == 3:
        strides = [k for k in range(1, W)
                   if len({0, k % W, (2 * k) % W}) == 3]
        tuples = [tuple((i + m * k) % W for m in range(3))
                  for k in strides for i in range(W)]
        held = [tuple((i + m * k) % W for m in range(3))
                for k in (1, 3) for i in range(W)]
        assert all(t in tuples for t in held)
    else:
        raise ValueError(sent_len)
    train = [p for p in tuples if p not in held]
    rng = np.random.default_rng(0)  # corpus audio is FIXED across seeds:
    # the sweep varies model init, so deltas attribute to initialization
    wn, gn, en = int(WORD_SEC * SR), int(GAP_SEC * SR), int(EDGE_SEC * SR)
    S = sent_len * wn + (sent_len - 1) * gn + 2 * en

    def render(tup):
        x = np.zeros((S,), dtype=np.float32)
        for m, wi in enumerate(tup):
            a = en + m * (wn + gn)
            x[a:a + wn] = _tone(wi, wn, rng)
        return x, " ".join(words[wi] for wi in tup)

    def batch(ps, tok):
        B = len(ps)
        wav = np.zeros((B, S), dtype=np.float32)
        texts = []
        for k, p in enumerate(ps):
            wav[k], txt = render(p)
            texts.append(txt)
        enc = [tok.encode(t) for t in texts]
        L = max(len(e) for e in enc)
        tgt = np.zeros((B, L), dtype=np.int32)
        tl = np.zeros((B,), dtype=np.int32)
        for k, e in enumerate(enc):
            tgt[k, :len(e)] = e
            tl[k] = len(e)
        return wav, texts, tgt, tl

    return words, train, held, batch, S


def write_word_arpa(path, words, train_tuples):
    """N-gram word ARPA (bigram) from the TRAINING sentences — the LM a
    user would build with lmplz over the training transcripts."""
    from collections import Counter
    uni = Counter()
    bi = Counter()
    for tup in train_tuples:
        ws = [words[i] for i in tup]
        for w in ws:
            uni[w] += 1
        for a, b in zip(["<s>"] + ws, ws + ["</s>"]):
            bi[(a, b)] += 1
    n_uni = sum(uni.values())
    with open(path, "w", encoding="utf-8") as f:
        f.write("\\data\\\n")
        f.write(f"ngram 1={len(uni) + 3}\nngram 2={len(bi)}\n\n\\1-grams:\n")
        f.write("-2.0\t<unk>\t-0.3\n-1.0\t<s>\t-0.3\n-1.2\t</s>\n")
        for w, c in sorted(uni.items()):
            f.write(f"{np.log10(c / n_uni):.4f}\t{w}\t-0.3\n")
        f.write("\n\\2-grams:\n")
        for (a, b), c in sorted(bi.items()):
            f.write(f"{np.log10(c / max(uni.get(a, c), c)):.4f}\t{a} {b}\n")
        f.write("\n\\end\\\n")


def run_heldout_parity(tmp_dir, seed=0, n_words=8, sent_len=2,
                       epochs=150, tokenizer=None, lm_fusion=True):
    """Train both stacks from identical seed-``seed`` torch init; return
    a dict of held-out metrics (greedy + fused WERs and deltas)."""
    import torch
    import jax
    import jax.numpy as jnp
    from turkish_asr_tpu.audio.features import log_mel_spectrogram
    from turkish_asr_tpu.data.tokenizer import TurkishTokenizer
    from turkish_asr_tpu.models.conformer import ModelConfig, apply_model
    from turkish_asr_tpu.utils.torch_import import import_torch_state_dict
    from turkish_asr_tpu.utils.config import get_config
    from turkish_asr_tpu.utils.logger import get_logger
    from turkish_asr_tpu.utils.metrics import wer
    from turkish_asr_tpu.train.optim import make_optimizer
    from turkish_asr_tpu.train.trainer import Trainer
    from turkish_asr_tpu.parallel.mesh import make_mesh
    from turkish_asr_tpu.decode.greedy import GreedyDecoder
    from turkish_asr_tpu.decode.factory import DeviceBeamDecoder
    from turkish_asr_tpu.decode.lm import build_trie_fusion_tables

    os.makedirs(tmp_dir, exist_ok=True)
    RefTrainer, TurkishASRModel = import_reference()
    tok = tokenizer if tokenizer is not None else TurkishTokenizer()
    words, train_tuples, held_tuples, batch_of, S = make_corpus(
        n_words, sent_len)
    wav, texts, tgt, tl = batch_of(train_tuples, tok)
    hwav, htexts, _, _ = batch_of(held_tuples, tok)
    B = wav.shape[0]
    n_mels, d, heads, blocks = 80, 64, 2, 2

    feats, fl = log_mel_spectrogram(
        jnp.asarray(wav), jnp.full((B,), S, dtype=jnp.int32), n_mels=n_mels)
    feats, fl = np.asarray(feats), np.asarray(fl)

    # --- reference stack: REAL model + REAL trainer, CPU ------------------
    torch.manual_seed(seed)
    ref_model = TurkishASRModel(n_mel_channels=n_mels, d_model=d,
                                n_heads=heads, n_blocks=blocks,
                                n_classes=tok.vocab_size, dropout=0.0)
    ref_opt = torch.optim.AdamW(ref_model.parameters(), lr=LR,
                                weight_decay=WD)
    ref_sched = torch.optim.lr_scheduler.OneCycleLR(
        ref_opt, max_lr=LR, total_steps=epochs, pct_start=0.1,
        anneal_strategy="cos")
    loader = [(torch.tensor(feats), torch.tensor(tgt.astype(np.int64)),
               torch.tensor(fl.astype(np.int64)),
               torch.tensor(tl.astype(np.int64)))]
    ref_cfg = SimpleNamespace(checkpoint_dir=os.path.join(tmp_dir, "ref"),
                              epochs=epochs, log_interval=10 ** 6,
                              resume=False, save_interval=10 ** 9,
                              output_model_path="final.pt")
    logger = get_logger("heldout", log_file=os.path.join(tmp_dir, "h.log"))
    ref_tr = RefTrainer(ref_model, loader, ref_opt, ref_sched,
                        torch.device("cpu"), ref_cfg, logger,
                        valid_loader=None, tokenizer=None,
                        gradient_clip=1.0, accumulation_steps=1)

    # --- our stack: identical imported weights ----------------------------
    params, state = import_torch_state_dict(ref_model.state_dict(), blocks)
    cfg = ModelConfig(n_mels=n_mels, d_model=d, n_heads=heads,
                      n_blocks=blocks, n_classes=tok.vocab_size, dropout=0.0)
    tx, sched = make_optimizer(LR, WD, total_steps=epochs,
                               accumulation_steps=1)
    batch = {"waveforms": wav,
             "wav_lengths": np.full((B,), S, dtype=np.int32),
             "targets": tgt, "target_lengths": tl,
             "sample_mask": np.ones((B,), dtype=np.float32)}
    our_tr = Trainer(model_cfg=cfg, params=params, model_state=state,
                     optimizer=tx, schedule=sched,
                     config=get_config(["--checkpoint_dir",
                                        os.path.join(tmp_dir, "ours"),
                                        "--epochs", str(epochs),
                                        "--log_interval", "1000000"]),
                     logger=logger, tokenizer=tok, train_loader=[batch],
                     mesh=make_mesh(None, devices=jax.devices()[:1]),
                     gradient_clip=1.0, accumulation_steps=1,
                     compute_dtype=jnp.float32, augment=False)

    for epoch in range(1, epochs + 1):
        ref_tr.train_epoch(epoch)
        our_tr.train_epoch(epoch)

    # --- held-out greedy decode -------------------------------------------
    hb = len(held_tuples)
    hfeats, hfl = log_mel_spectrogram(
        jnp.asarray(hwav), jnp.full((hb,), S, dtype=jnp.int32),
        n_mels=n_mels)
    hfeats_np, hfl_np = np.asarray(hfeats), np.asarray(hfl)

    ref_model.eval()
    with torch.no_grad():
        ref_logits = ref_model(torch.tensor(hfeats_np),
                               input_lengths=torch.tensor(
                                   hfl_np.astype(np.int64))).numpy()
    out_lens = hfl_np // 4
    ref_greedy = [tok.ctc_decode(np.argmax(ref_logits[i, :out_lens[i]],
                                           axis=-1).tolist())
                  for i in range(hb)]

    our_logits, _ = apply_model(our_tr.params, our_tr.model_state,
                                hfeats, hfl, cfg=cfg, train=False)
    our_logits = np.asarray(our_logits)
    dec = GreedyDecoder(tok)
    our_greedy = dec.decode_batch(our_logits, out_lens)

    out = {
        "seed": seed, "n_words": n_words, "sent_len": sent_len,
        "tokenizer": getattr(tok, "backend", type(tok).__name__),
        "wer_ref": wer(htexts, ref_greedy),
        "wer_our": wer(htexts, our_greedy),
        "ref_greedy": ref_greedy, "our_greedy": our_greedy,
        "htexts": htexts,
    }
    out["delta_greedy"] = abs(out["wer_ref"] - out["wer_our"])

    if lm_fusion:
        # --- beam-16 + word-ARPA fusion on both stacks --------------------
        arpa = os.path.join(tmp_dir, "pairs.arpa")
        write_word_arpa(arpa, words, train_tuples)

        RefBeam, RefKenLM = import_reference_beam()
        ref_dec = RefBeam(tok, beam_width=16, lm=duck_kenlm(RefKenLM, arpa),
                          lm_weight=0.3, word_bonus=0.5, blank_id=0)
        ref_fused = [ref_dec.decode(
            torch.tensor(ref_logits[i, :out_lens[i]])) for i in range(hb)]

        trie = build_trie_fusion_tables(arpa, tok, tok.vocab_size)
        if trie is None:
            out["fusion"] = None  # tokenizer not triable (e.g. some BPEs)
            return out
        our_dec = DeviceBeamDecoder(tok, beam_width=16, lm_trie=trie,
                                    lm_weight=0.3, word_bonus=0.5)
        our_fused = our_dec.decode_batch(our_logits, out_lens)
        out.update({
            "fusion": True,
            "wer_ref_fused": wer(htexts, ref_fused),
            "wer_our_fused": wer(htexts, our_fused),
            "ref_fused": ref_fused, "our_fused": our_fused,
        })
        out["delta_fused"] = abs(out["wer_ref_fused"] - out["wer_our_fused"])
        out["delta_effect"] = abs(
            (out["wer_ref_fused"] - out["wer_ref"])
            - (out["wer_our_fused"] - out["wer_our"]))
    return out
