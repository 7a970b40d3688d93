"""A/B: trie-fusion LM lookups as one-hot matmul sandwiches vs targeted
2D gathers (config-4 path).

The trie tables are (S, Wa) with S = Wa ~ 2400: the one-hot row lookup
reads the whole 5.7M-entry table per beam set per scan step, but only a
(W, K) = (16, 32) cell block is needed. _CELL_GATHER_MIN_ELEMS picks the
strategy; this script measures the full config-4 pipeline both ways.

Usage: python scripts/ab_trie_lookup.py
"""

import sys

import numpy as np

sys.path.insert(0, ".")

import bench
from turkish_asr_tpu.ops import beam_search as bs


def run(threshold):
    import jax.numpy as jnp
    from turkish_asr_tpu.ops.flash_attention import make_flash_attention
    from turkish_asr_tpu.data.tokenizer import TurkishTokenizer
    from turkish_asr_tpu.decode.lm import (ArpaLanguageModel,
                                           build_trie_fusion_tables)

    bs._CELL_GATHER_MIN_ELEMS = threshold
    tokenizer = TurkishTokenizer()
    cfg, params, state = bench._flagship()
    w, n = bench._waves(bench.BATCH, bench.SECONDS)
    word_arpa = "/tmp/bench_words.arpa"
    bench._synthetic_word_arpa(word_arpa)
    trie = build_trie_fusion_tables(ArpaLanguageModel(word_arpa),
                                    tokenizer, cfg.n_classes)
    trie_dev = {k: (jnp.asarray(v) if hasattr(v, "shape") else v)
                for k, v in trie.items()}
    pipeline = bench._make_pipeline(cfg, make_flash_attention(),
                                    decode="beam", lm_trie=trie_dev,
                                    beam_width=16)
    sec = bench._chained_timer(pipeline, (params, state), w, n, 6)
    rtfx = bench.BATCH * bench.SECONDS / sec

    # decode agreement check between strategies
    ids, counts = map(np.asarray, pipeline((params, state), w, n))
    return rtfx, ids, counts


def main():
    r_gather, ids_g, counts_g = run(1 << 20)   # big tables -> gather
    r_onehot, ids_o, counts_o = run(1 << 62)   # force one-hot everywhere
    assert np.array_equal(counts_g, counts_o)
    assert np.array_equal(ids_g, ids_o), "strategies decoded differently!"
    print(f"trie config-4 RTFx: one-hot {r_onehot:8.1f}   "
          f"gather {r_gather:8.1f}   ({r_gather / r_onehot:.2f}x)")


if __name__ == "__main__":
    main()
