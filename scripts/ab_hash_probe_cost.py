"""HISTORICAL RECORD — measured against the PRE-CUCKOO depth-8 linear
probe; its findings motivated the shipped two-choice cuckoo table. Do
not re-run for fresh numbers: the shipped _hash_probe now ignores
probe_depth (always gathers exactly 2 rows), so the "base" and "depth2"
arms compile the identical program, and "nogather" reconstructs the old
linear-probe slot math that no longer matches the cuckoo layout. The
numbers below stand as the evidence for "the gather is linear in
fetched rows" (AGENTS.md).

Split the hash-fusion score-probe cost: slab GATHER vs hash MATH.

ab_hash_fusion attributed ~418 of 474 ms/iter (100k ARPA, config-4
shapes) to _hash_lm_scores. This separates its parts by monkeypatching
_hash_probe variants (jax.clear_caches between runs — ctc_beam_search is
@jax.jit and would replay the old executable otherwise):

  base     shipped probe (D=8 linear probe, one (…,D,4) slab gather)
  nogather rows synthesized from idx arithmetic (VPU ops, no HBM gather)
           -> remaining time = rolling-hash math + selects + the rest
  depth2   slab gather with only 2 probe rows (timing-only: scores are
           wrong when an entry sits deeper, shapes/flow unchanged)
           -> is cost linear in probe rows? (cuckoo would make D=2 exact)
  small-ix same gather volume but idx clamped into the first 2^16 slots
           (timing-only) -> does TABLE footprint matter, or row count?

Timing per AGENTS.md: chained scan iterations, fetch-sync, tables as jit
args (HTTP 413).
"""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from scripts.ab_hash_fusion import build, run
from bench import _flagship, _synthetic_word_arpa
from turkish_asr_tpu.ops import beam_search as bs


def main():
    cfg, params, state = _flagship()

    big_arpa = "/tmp/bench_100k.arpa"
    if not os.path.exists(big_arpa):
        _synthetic_word_arpa(big_arpa, n_words=100_000, seed=7,
                             ngram_counts={2: 500_000, 3: 300_000,
                                           4: 150_000})
    t0 = time.perf_counter()
    arr, ht = build(big_arpa, cfg.n_classes)
    print(f"100k build {time.perf_counter() - t0:.1f} s  "
          f"table_size={ht['table_size']} "
          f"K2={int(ht['uniq_q'].shape[0])}", flush=True)

    run(cfg, params, state, arr, "base")

    orig = bs._hash_probe

    # The historical linear probe's depth (the shipped cuckoo probe
    # always gathers exactly 2 rows and carries no depth knob).
    DEPTH = 8

    def probe_nogather(ht_, h1, h2):
        hp1 = bs._hash_params()[0]
        mixed = h1.astype(jnp.uint32) * jnp.uint32(hp1)
        base = (mixed % jnp.uint32(ht_["slab"].shape[0])).astype(jnp.int32)
        idx = base[..., None] + jnp.arange(DEPTH)
        # synthesize (…, D, 4) rows from idx — same downstream math, no HBM
        rows = (idx[..., None] * jnp.array([3, 5, 7, 11], jnp.int32)
                + jnp.int32(1)) ^ h2[..., None, None]
        hit = (rows[..., 0] == h1[..., None]) & (rows[..., 1] == h2[..., None])
        hitf = hit.astype(jnp.float32)
        found = jnp.any(hit, axis=-1)
        pv = jax.lax.bitcast_convert_type(rows[..., 2], jnp.float32)
        bv = jax.lax.bitcast_convert_type(rows[..., 3], jnp.float32)
        return (found, jnp.sum(pv * hitf, axis=-1),
                jnp.sum(bv * hitf, axis=-1))

    def make_probe_depth(d):
        def probe(ht_, h1, h2):
            # Historically truncated the linear-probe chain to d rows;
            # the shipped cuckoo probe IS 2 rows, so this arm now equals
            # "base" (kept for the record).
            return orig(ht_, h1, h2)
        return probe

    def probe_smallix(ht_, h1, h2):
        hp1 = bs._hash_params()[0]
        mixed = h1.astype(jnp.uint32) * jnp.uint32(hp1)
        base = (mixed % jnp.uint32(65536)).astype(jnp.int32)
        idx = base[..., None] + jnp.arange(DEPTH)
        rows = ht_["slab"][idx]
        hit = (rows[..., 0] == h1[..., None]) & (rows[..., 1] == h2[..., None])
        hitf = hit.astype(jnp.float32)
        found = jnp.any(hit, axis=-1)
        pv = jax.lax.bitcast_convert_type(rows[..., 2], jnp.float32)
        bv = jax.lax.bitcast_convert_type(rows[..., 3], jnp.float32)
        return (found, jnp.sum(pv * hitf, axis=-1),
                jnp.sum(bv * hitf, axis=-1))

    for label, fn in [("nogather", probe_nogather),
                      ("depth2", make_probe_depth(2)),
                      ("small-ix", probe_smallix)]:
        try:
            jax.clear_caches()
            bs._hash_probe = fn
            run(cfg, params, state, arr, label)
        finally:
            bs._hash_probe = orig
    jax.clear_caches()


if __name__ == "__main__":
    main()
