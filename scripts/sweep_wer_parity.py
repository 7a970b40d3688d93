"""Statistical held-out WER-parity sweep (VERDICT r4 ask #2).

Runs the tests/heldout_harness.py harness — BOTH stacks (live reference
torch Trainer/model from /root/reference, and ours) trained from
identical imported weights — across:

  - 9 init seeds at the canonical config (8 words, 2-word sentences,
    shipped char tokenizer);
  - a harder corpus: 12 words AND 3-word sentences (seed 0);
  - the BPE tokenizer path (seed 0, corpus-trained BPE vocab).

Pass criteria (the north-star bound is <= 0.1 absolute WER delta on a
CORPUS, BASELINE.json; each draw here scores only 32 held-out words, so
a single draw's WER quantum is 1/32 ~= 0.031 and its delta carries
sampling noise ~2 quanta either way):

  1. mean |delta| over all draws <= 0.1 (greedy, fused, fusion-effect);
  2. |signed mean delta| <= 0.1 — no systematic bias toward either
     stack (measured round 5: +0.008 greedy / +0.009 fused, ours
     trivially higher, sign-symmetric across draws);
  3. every individual draw <= 2x the bound (a real divergence, not
     draw noise, would blow past this).

Prints the per-draw table + delta distribution; record the output in
AGENTS.md ("Held-out WER parity — statistical sweep" entry).

Usage:  JAX_PLATFORM_NAME=cpu python scripts/sweep_wer_parity.py
(CPU-forced: the reference side is torch-CPU; keeping ours on CPU makes
the comparison platform-matched and avoids TPU-tunnel compile latency.)
"""

import os
import sys
import tempfile
import time

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

NORTH_STAR = 0.1


def bpe_tokenizer():
    """Corpus-trained BPE (blank=0 contract) over the 12 sweep words."""
    from turkish_asr_tpu.data.bpe import train_bpe, BPETokenizer
    from heldout_harness import WORDS12
    texts = [" ".join(WORDS12)] * 4 + WORDS12
    vocab, merges = train_bpe(texts, vocab_size=64)
    return BPETokenizer(vocab, merges)


def main():
    from heldout_harness import run_heldout_parity

    runs = [dict(seed=s, n_words=8, sent_len=2) for s in range(9)] + [
        dict(seed=0, n_words=12, sent_len=3),
        dict(seed=0, n_words=8, sent_len=2, tokenizer=bpe_tokenizer()),
    ]
    results = []
    for kw in runs:
        t0 = time.time()
        with tempfile.TemporaryDirectory() as d:
            r = run_heldout_parity(d, **kw)
        r["minutes"] = (time.time() - t0) / 60
        results.append(r)
        print(f"[{r['tokenizer']} seed={r['seed']} W={r['n_words']} "
              f"len={r['sent_len']}] greedy ref={r['wer_ref']:.4f} "
              f"ours={r['wer_our']:.4f} |d|={r['delta_greedy']:.4f} | "
              + (f"fused ref={r['wer_ref_fused']:.4f} "
                 f"ours={r['wer_our_fused']:.4f} "
                 f"|d|={r['delta_fused']:.4f} "
                 f"|effect d|={r['delta_effect']:.4f}"
                 if r.get("fusion") else "fusion: n/a")
              + f" ({r['minutes']:.1f} min)", flush=True)

    print("\n=== summary ===")
    ok = True
    for name, absd, signed in [
        ("greedy", [r["delta_greedy"] for r in results],
         [r["wer_our"] - r["wer_ref"] for r in results]),
        ("fused", [r["delta_fused"] for r in results if r.get("fusion")],
         [r["wer_our_fused"] - r["wer_ref_fused"] for r in results
          if r.get("fusion")]),
        ("effect", [r["delta_effect"] for r in results if r.get("fusion")],
         [(r["wer_our_fused"] - r["wer_our"])
          - (r["wer_ref_fused"] - r["wer_ref"]) for r in results
          if r.get("fusion")]),
    ]:
        if not absd:
            continue
        mean_abs = sum(absd) / len(absd)
        mean_signed = sum(signed) / len(signed)
        worse = sum(1 for s in signed if s > 0)
        better = sum(1 for s in signed if s < 0)
        print(f"{name:6s} |delta|: mean={mean_abs:.4f} max={max(absd):.4f} "
              f"| signed mean={mean_signed:+.4f} "
              f"(ours worse {worse} / better {better} / tie "
              f"{len(signed) - worse - better})  n={len(absd)}")
        if mean_abs > NORTH_STAR:
            print(f"FAIL: {name} mean |delta| {mean_abs:.4f} > {NORTH_STAR}")
            ok = False
        if abs(mean_signed) > NORTH_STAR:
            print(f"FAIL: {name} systematic bias {mean_signed:+.4f} "
                  f"exceeds {NORTH_STAR}")
            ok = False
        if max(absd) > 2 * NORTH_STAR:
            print(f"FAIL: {name} draw at {max(absd):.4f} > "
                  f"{2 * NORTH_STAR} (beyond draw noise)")
            ok = False
    if not ok:
        sys.exit(1)
    print(f"PASS: mean |delta| and systematic bias within the "
          f"{NORTH_STAR} north-star bound on every metric; "
          f"no draw beyond 2x (draw-noise cap)")


if __name__ == "__main__":
    main()
