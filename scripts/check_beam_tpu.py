"""TPU exactness check for the one-hot selection merge (round 4).

The beam search now fetches merge winners, parent state, and backtrace
links via precision='highest' one-hot matmuls (exact selection on MXU)
instead of dynamic gathers, with hash moduli < 2^24 so hashes survive
f32. CPU tests can't exercise the MXU decomposition — this script runs
the device beam ON THE TPU against the host-oracle beam decoder:
greedy-hard random logits, plain beam + trie-fused beam, and asserts
identical transcripts.
"""
import sys

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402


def main():
    import jax

    assert jax.devices()[0].platform != "cpu", "run on the TPU"

    import bench
    from turkish_asr_tpu.data.tokenizer import TurkishTokenizer
    from turkish_asr_tpu.decode.beam import CTCBeamDecoder
    from turkish_asr_tpu.decode.factory import DeviceBeamDecoder
    from turkish_asr_tpu.decode.lm import (
        ArpaLanguageModel, build_trie_fusion_tables)

    tok = TurkishTokenizer()
    V = tok.vocab_size
    rng = np.random.default_rng(0)
    B, T = 8, 120
    # Peaky logits (like trained-model outputs) so beams separate cleanly.
    logits = rng.normal(size=(B, T, V)).astype(np.float32) * 3.0

    bench._synthetic_word_arpa("/tmp/bench_words.arpa")
    lm = ArpaLanguageModel("/tmp/bench_words.arpa")
    trie = build_trie_fusion_tables(lm, tok, V)

    host_plain = CTCBeamDecoder(tok, beam_width=8)
    host_lm = CTCBeamDecoder(tok, beam_width=8, lm=lm, lm_weight=0.3)
    dev_plain = DeviceBeamDecoder(tok, beam_width=8)
    dev_lm = DeviceBeamDecoder(tok, beam_width=8, lm_trie=trie,
                               lm_weight=0.3)

    mism = 0
    for name, host, dev in [("plain", host_plain, dev_plain),
                            ("trie", host_lm, dev_lm)]:
        got = dev.decode_batch(logits)
        want = [host.decode(logits[i]) for i in range(B)]
        for i, (g, w) in enumerate(zip(got, want)):
            ok = g == w
            mism += not ok
            if not ok:
                print(f"{name}[{i}] MISMATCH: device={g!r} host={w!r}")
        print(f"{name}: {sum(g == w for g, w in zip(got, want))}/{B} match")
    if mism:
        sys.exit(1)
    print("TPU one-hot selection merge: exact vs host oracle")


if __name__ == "__main__":
    main()
