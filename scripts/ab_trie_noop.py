"""Ablate the trie-fusion per-step work to locate the config-4 gap
(trie 8.9k vs word-table 14.8k RTFx — which per-step ops cost 46 ms?).

Variants:
  full   — shipped trie fusion
  nolm   — cell lookups stubbed to zeros (keeps the where-chains, state
           carries, kind/qwid vocab lookups)
  word   — word-granular state tables (the 14.8k configuration)
  nofuse — plain beam, no LM at all

Timing only; decodes differ across variants by design.
"""

import sys

import numpy as np

sys.path.insert(0, ".")

import bench
from turkish_asr_tpu.ops import beam_search as bs


def time_pipeline(lm_tables=None, lm_trie=None):
    import jax.numpy as jnp
    from turkish_asr_tpu.ops.flash_attention import make_flash_attention

    cfg, params, state = bench._flagship()
    w, n = bench._waves(bench.BATCH, bench.SECONDS)
    pipeline = bench._make_pipeline(cfg, make_flash_attention(),
                                    decode="beam", lm_tables=lm_tables,
                                    lm_trie=lm_trie, beam_width=16)
    sec = bench._chained_timer(pipeline, (params, state), w, n, 6)
    return bench.BATCH * bench.SECONDS / sec


def main():
    import jax.numpy as jnp
    from turkish_asr_tpu.data.tokenizer import TurkishTokenizer
    from turkish_asr_tpu.decode.lm import (ArpaLanguageModel,
                                           build_arpa_fusion_tables,
                                           build_trie_fusion_tables)

    tokenizer = TurkishTokenizer()
    cfg, _, _ = bench._flagship()
    bench._synthetic_word_arpa("/tmp/bench_words.arpa")
    trie = build_trie_fusion_tables(
        ArpaLanguageModel("/tmp/bench_words.arpa"), tokenizer, cfg.n_classes)
    trie_dev = {k: (jnp.asarray(v) if hasattr(v, "shape") else v)
                for k, v in trie.items()}
    bench._synthetic_arpa(tokenizer, "/tmp/bench_lm.arpa")
    tables = build_arpa_fusion_tables(
        ArpaLanguageModel("/tmp/bench_lm.arpa"), tokenizer, cfg.n_classes)
    tables = (jnp.asarray(tables[0]), jnp.asarray(tables[1]), tables[2])

    r_full = time_pipeline(lm_trie=trie_dev)
    print(f"trie full        : {r_full:8.1f} RTFx", flush=True)

    saved_o, saved_p = bs._cell_lookup_outer, bs._cell_lookup_pair
    try:
        bs._cell_lookup_outer = lambda t, r, c: jnp.zeros(
            (r.shape[0], c.shape[0]), jnp.float32)
        bs._cell_lookup_pair = lambda t, r, c: jnp.zeros(
            (r.shape[0],), jnp.float32)
        r_nolm = time_pipeline(lm_trie=trie_dev)
    finally:
        bs._cell_lookup_outer, bs._cell_lookup_pair = saved_o, saved_p
    print(f"trie noop lookups: {r_nolm:8.1f} RTFx", flush=True)

    r_word = time_pipeline(lm_tables=tables)
    print(f"word tables      : {r_word:8.1f} RTFx", flush=True)

    r_plain = time_pipeline()
    print(f"no LM            : {r_plain:8.1f} RTFx", flush=True)


def extra_probe():
    """noop2: ALSO stub _vec_lookup — isolates the where/state structure
    from every lookup op in the trie branch."""
    import jax.numpy as jnp
    from turkish_asr_tpu.data.tokenizer import TurkishTokenizer
    from turkish_asr_tpu.decode.lm import (ArpaLanguageModel,
                                           build_trie_fusion_tables)

    tokenizer = TurkishTokenizer()
    cfg, _, _ = bench._flagship()
    bench._synthetic_word_arpa("/tmp/bench_words.arpa")
    trie = build_trie_fusion_tables(
        ArpaLanguageModel("/tmp/bench_words.arpa"), tokenizer, cfg.n_classes)
    trie_dev = {k: (jnp.asarray(v) if hasattr(v, "shape") else v)
                for k, v in trie.items()}
    saved = (bs._cell_lookup_outer, bs._cell_lookup_pair, bs._vec_lookup)
    try:
        bs._cell_lookup_outer = lambda t, r, c: jnp.zeros(
            (r.shape[0], c.shape[0]), jnp.float32)
        bs._cell_lookup_pair = lambda t, r, c: jnp.zeros(
            (r.shape[0],), jnp.float32)
        bs._vec_lookup = lambda v, i: jnp.zeros(i.shape, jnp.float32)
        r = time_pipeline(lm_trie=trie_dev)
    finally:
        bs._cell_lookup_outer, bs._cell_lookup_pair, bs._vec_lookup = saved
    print(f"trie noop2 (no lookups at all): {r:8.1f} RTFx", flush=True)


def probe3():
    """noop3: _vec_lookup -> data-dependent cheap op (no table, no
    constant folding): isolates the one-hot lookup cost from the
    downstream where/state structure it feeds."""
    import jax.numpy as jnp
    from turkish_asr_tpu.data.tokenizer import TurkishTokenizer
    from turkish_asr_tpu.decode.lm import (ArpaLanguageModel,
                                           build_trie_fusion_tables)

    tokenizer = TurkishTokenizer()
    cfg, _, _ = bench._flagship()
    bench._synthetic_word_arpa("/tmp/bench_words.arpa")
    trie = build_trie_fusion_tables(
        ArpaLanguageModel("/tmp/bench_words.arpa"), tokenizer, cfg.n_classes)
    trie_dev = {k: (jnp.asarray(v) if hasattr(v, "shape") else v)
                for k, v in trie.items()}
    saved = bs._vec_lookup
    try:
        bs._vec_lookup = lambda v, i: (i & 3).astype(jnp.float32)
        r = time_pipeline(lm_trie=trie_dev)
    finally:
        bs._vec_lookup = saved
    print(f"trie noop3 (vec lookups -> i&3): {r:8.1f} RTFx", flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "noop2":
        extra_probe()
    elif len(sys.argv) > 1 and sys.argv[1] == "noop3":
        probe3()
    else:
        main()
