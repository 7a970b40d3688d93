"""Beam-width scaling of the device CTC beam (config-4 shapes).

BASELINE config 4 fixes beam_width=16, but production ASR decoders often
run wider beams (pyctcdecode defaults to 100). The device beam's per-step
cost has an O(W^3) term — the stay-vs-extend merge match is a
(W, W*K) = (W, 2W^2) equality matrix — so this sweep measures where that
asymptotic actually bites at config-4 shapes (bench BATCH x 8 s, char
tokenizer) for both fusion paths:

  trie   word-ARPA trie fusion (the ~400-word config-4 table)
  hash   100k-word cuckoo-hash fusion (the production-scale table)

Timing per AGENTS.md: chained scan iterations, fetch-sync, tables as jit
args (HTTP 413).
"""

import os
import sys
import time

import jax.numpy as jnp

sys.path.insert(0, ".")

from bench import (_flagship, _make_pipeline, _synthetic_word_arpa, _waves,
                   BATCH, SECONDS, _chained_timer)
from scripts.ab_hash_fusion import build as build_hash
from turkish_asr_tpu.data.tokenizer import TurkishTokenizer
from turkish_asr_tpu.decode.lm import (ArpaLanguageModel,
                                       build_trie_fusion_tables)
from turkish_asr_tpu.ops.flash_attention import make_flash_attention


def run(cfg, params, state, tables_kw, beam_width, label):
    pipeline = _make_pipeline(cfg, make_flash_attention(), decode="beam",
                              beam_width=beam_width, **tables_kw)
    w, n = _waves(BATCH, SECONDS)
    sec = _chained_timer(pipeline, (params, state), w, n, 4)
    rtfx = BATCH * SECONDS / sec
    print(f"{label:6s} W={beam_width:3d} {sec * 1e3:8.1f} ms/iter "
          f"{rtfx:10.1f} RTFx", flush=True)
    return rtfx


def main():
    tok = TurkishTokenizer()
    cfg, params, state = _flagship()

    small_arpa = "/tmp/bench_words.arpa"
    _synthetic_word_arpa(small_arpa)
    trie = build_trie_fusion_tables(ArpaLanguageModel(small_arpa), tok,
                                    cfg.n_classes)
    trie_arr = {k: (jnp.asarray(v) if hasattr(v, "shape") else v)
                for k, v in trie.items()}

    big_arpa = "/tmp/bench_100k.arpa"
    if not os.path.exists(big_arpa):
        _synthetic_word_arpa(big_arpa, n_words=100_000, seed=7,
                             ngram_counts={2: 500_000, 3: 300_000,
                                           4: 150_000})
    t0 = time.perf_counter()
    hash_arr, _ = build_hash(big_arpa, cfg.n_classes)
    print(f"100k build {time.perf_counter() - t0:.1f} s", flush=True)

    for width in (8, 16, 32, 64):
        run(cfg, params, state, {"lm_trie": trie_arr}, width, "trie")
    for width in (8, 16, 32, 64):
        run(cfg, params, state, {"lm_hash": hash_arr}, width, "hash")


if __name__ == "__main__":
    main()
