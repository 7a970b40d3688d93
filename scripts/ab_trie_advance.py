"""A/B the fused trie advance (round 4) on the config-4 workload.

Times ONLY the trie-fusion beam pipeline (B=128 x 8 s, beam 16, word ARPA
+ char tokenizer) — the word-table and host-beam arms of bench config 4
are unchanged by the advance restructure and cost minutes to re-run.

Round-3 shipped number: 10,849 RTFx (BENCH_r03). Word-table ceiling:
15,228 RTFx. VERDICT r3 #6 target: >= 13k or a measured dead-end note.
"""
import sys

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402

import bench  # noqa: E402
from turkish_asr_tpu.data.tokenizer import TurkishTokenizer  # noqa: E402
from turkish_asr_tpu.decode.lm import (  # noqa: E402
    ArpaLanguageModel, build_trie_fusion_tables)
from turkish_asr_tpu.ops.flash_attention import make_flash_attention  # noqa: E402
from turkish_asr_tpu.utils.runtime import enable_compilation_cache  # noqa: E402


def main():
    import jax.numpy as jnp

    enable_compilation_cache()
    tokenizer = TurkishTokenizer()
    cfg, params, state = bench._flagship()
    w, n = bench._waves(bench.BATCH, bench.SECONDS)

    word_arpa = "/tmp/bench_words.arpa"
    bench._synthetic_word_arpa(word_arpa)
    word_model = ArpaLanguageModel(word_arpa)
    trie = build_trie_fusion_tables(word_model, tokenizer, cfg.n_classes)
    trie_dev = {k: (jnp.asarray(v) if hasattr(v, "shape") else v)
                for k, v in trie.items()}
    pipeline = bench._make_pipeline(cfg, make_flash_attention(),
                                    decode="beam", lm_trie=trie_dev,
                                    beam_width=16)
    sec = bench._chained_timer(pipeline, (params, state), w, n, 6)
    rtfx = bench.BATCH * bench.SECONDS / sec
    print(f"trie-fusion beam16 RTFx: {rtfx:.0f}  (r3 baseline 10849, "
          f"word-table ceiling 15228)")


if __name__ == "__main__":
    main()
