"""Attribute the hash-fusion (production-scale ARPA) beam cost.

bench_beam_arpa_100k measured 101.9 RTFx vs 16.5k for the dense trie at
config-4 shapes — 160x. Is it the table SIZE (random-gather probes into
10.6M slots) or the hash-mode STRUCTURE (windowed contexts, the m-order
probe recursion)? Variants:

  small   hash fusion on the 400-word config-4 ARPA (same table as the
          trie bench compiles densely) — structure at small size
  100k    the production table
  100k-ns 100k with _hash_lm_scores stubbed to zeros — advance + merge
          only (no score probes)
  100k-na 100k with the trie-front advance stubbed — score probes only

Timing per AGENTS.md: chained scan iterations, fetch-sync, tables as jit
args (HTTP 413).
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from bench import (_flagship, _synthetic_word_arpa, _waves, BATCH, SECONDS,
                   _chained_timer)
from turkish_asr_tpu.audio.features import log_mel_spectrogram
from turkish_asr_tpu.data.tokenizer import TurkishTokenizer
from turkish_asr_tpu.decode.lm import (ArpaLanguageModel,
                                       build_hash_fusion_tables)
from turkish_asr_tpu.models.conformer import apply_model
from turkish_asr_tpu.ops.beam_search import ctc_beam_search
from turkish_asr_tpu.ops import beam_search as bs
from turkish_asr_tpu.ops.flash_attention import make_flash_attention


def build(arpa_path, n_classes):
    tok = TurkishTokenizer()
    model = ArpaLanguageModel(arpa_path)
    # the beam sees cfg.n_classes logits — tables must match THAT width
    ht = build_hash_fusion_tables(model, tok, n_classes)
    arr = {k: jnp.asarray(ht[k]) for k in
           ("keys", "vals", "pnext", "wq", "tok_kind", "qwid",
            "start_ctx", "unk_prob", "uniq_q", "qcol")}
    return arr, ht


def run(cfg, params, state, arr, label):
    attn_kernel = make_flash_attention()

    def pipeline(pstate, waveforms, wav_lengths):
        p, s, tables = pstate
        feats, frame_lengths = log_mel_spectrogram(
            waveforms, wav_lengths, n_mels=cfg.n_mels)
        logits, _ = apply_model(p, s, feats, frame_lengths, cfg=cfg,
                                train=False, compute_dtype=jnp.bfloat16,
                                attn_kernel=attn_kernel)
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        return ctc_beam_search(lp, frame_lengths // 4, beam_width=16,
                               blank_id=0,
                               max_prefix_len=min(lp.shape[1], 512),
                               lm_hash=tables)

    w, n = _waves(BATCH, SECONDS)
    sec = _chained_timer(pipeline, (params, state, arr), w, n, 4)
    rtfx = BATCH * SECONDS / sec
    print(f"{label:10s} {sec * 1e3:8.1f} ms/iter  {rtfx:10.1f} RTFx",
          flush=True)
    return rtfx


def main():
    cfg, params, state = _flagship()

    small_arpa = "/tmp/bench_words.arpa"
    _synthetic_word_arpa(small_arpa)
    arr_s, _ = build(small_arpa, cfg.n_classes)

    big_arpa = "/tmp/bench_100k.arpa"
    import os
    if not os.path.exists(big_arpa):
        _synthetic_word_arpa(big_arpa, n_words=100_000, seed=7,
                             ngram_counts={2: 500_000, 3: 300_000,
                                           4: 150_000})
    t0 = time.perf_counter()
    arr_b, _ = build(big_arpa, cfg.n_classes)
    print(f"100k build {time.perf_counter() - t0:.1f} s", flush=True)

    run(cfg, params, state, arr_s, "small")
    run(cfg, params, state, arr_b, "100k")

    # ctc_beam_search is @jax.jit — same shapes+statics would replay the
    # compiled executable and silently ignore the monkeypatch.
    orig_scores = bs._hash_lm_scores
    try:
        jax.clear_caches()
        bs._hash_lm_scores = lambda ht, ctx, wids: jnp.zeros(
            (ctx.shape[0], wids.shape[0]), jnp.float32)
        run(cfg, params, state, arr_b, "100k-ns")
    finally:
        bs._hash_lm_scores = orig_scores

    orig_pair = bs._cell_lookup_pair_dual
    try:
        jax.clear_caches()
        bs._cell_lookup_pair_dual = lambda t2, r, c, n_cols: (
            jnp.zeros(r.shape, jnp.float32), jnp.zeros(r.shape, jnp.float32))
        run(cfg, params, state, arr_b, "100k-na")
    finally:
        bs._cell_lookup_pair_dual = orig_pair
        jax.clear_caches()


if __name__ == "__main__":
    main()
