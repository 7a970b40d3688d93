"""Config-3 train MFU levers (VERDICT r3 #2: 0.29 -> target 0.35).

ab_remat.py established the micro-step is HBM-residual-bound (full block
remat beat every save-more policy), so the untested levers are SCHEDULE
ones: unrolling the scan-over-blocks lets XLA fuse across block
boundaries (block i's final GroupNorm with block i+1's ff1 GroupNorm)
and overlap the per-block param loads; remat x unroll interactions come
along for free. Replicates the exact config-3 micro-step (mel +
SpecAugment + bf16 + rbg keys + Pallas CTC + grads forced).

Usage: python scripts/ab_mfu_levers.py [B]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from turkish_asr_tpu.audio.features import log_mel_spectrogram
from turkish_asr_tpu.audio.augment import spec_augment_batch
from turkish_asr_tpu.models.conformer import init_model, apply_model
from turkish_asr_tpu.ops.ctc import ctc_loss
from __graft_entry__ import _flagship_cfg

SR = 16000
SECONDS = 8.0


def step_time(cfg, B, *, remat, unroll, n=10):
    rng = np.random.default_rng(0)
    S = int(SECONDS * SR)
    w = jnp.asarray((rng.standard_normal((B, S)) * 0.1).astype(np.float32))
    wl = jnp.full((B,), S, dtype=jnp.int32)
    tg = jnp.asarray(rng.integers(2, cfg.n_classes, (B, 64)).astype(np.int32))
    tl = jnp.full((B,), 64, dtype=jnp.int32)
    params, mstate = init_model(jax.random.PRNGKey(0), cfg)
    key = jax.random.key(0, impl="rbg")

    @jax.jit
    def train_step(p, ms, w, wl, key):
        feats, fl = log_mel_spectrogram(w, wl, n_mels=cfg.n_mels)
        key, akey, dkey = jax.random.split(key, 3)
        feats = spec_augment_batch(feats, akey, fl)

        def loss_fn(pp):
            logits, new_ms = apply_model(
                pp, ms, feats, fl, cfg=cfg, train=True, rng=dkey,
                compute_dtype=jnp.bfloat16, remat=remat,
                scan_unroll=unroll)
            lp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
            per = ctc_loss(lp, tg, fl // 4, tl, reduction="none")
            return jnp.mean(per / jnp.maximum(tl, 1)), new_ms

        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(p)
        gn = sum(jnp.sum(jnp.square(g.astype(jnp.float32)))
                 for g in jax.tree.leaves(grads))
        return loss + gn * 1e-30

    def call():
        return train_step(params, mstate, w, wl, key)

    for _ in range(3):
        float(call())
    start = time.perf_counter()
    for _ in range(n):
        out = call()
    float(out)
    return (time.perf_counter() - start) / n * 1e3


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    cfg = _flagship_cfg()
    for remat in (True, False):
        for unroll in (1, 2, 4, 8):
            ms = step_time(cfg, B, remat=remat, unroll=unroll)
            print(f"B={B} remat={int(remat)} unroll={unroll}: "
                  f"{ms:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
