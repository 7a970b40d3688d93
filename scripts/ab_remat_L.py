"""Attribute Conformer-L training MFU (VERDICT r4 ask #4).

BENCH_r04: d=512/T'=1600 training MFU 0.2553 while inference at the same
shape measures 0.486 (53%) — proportionally worse than d=256 (83%).
Suspects, each measured here on the real chip at the bench config
(d=512, H=8, 16 blocks, B=4, 64 s audio, kernel ON where stated):

  A. remat-policy x kernel interaction: FULL remat re-runs the flash
     kernel's forward inside the backward (the kernel already recomputes
     its probs tile-by-tile in its own backward — remat pays the fwd a
     second time). Variants: full remat / 'dots' policy
     (dots_with_no_batch_dims_saveable) / no remat. With the kernel on,
     no-remat's residuals are O(T) per block (the (B,H,T',T') probs
     tensor never exists), so no-remat is no longer memory-absurd.
  B. CTC share at S=129/T'=1600: same step with the CTC loss replaced by
     a logits-sum (grads still forced) — the delta is CTC fwd+bwd.
  C. kernel-off context at the winning remat setting.

Usage: python scripts/ab_remat_L.py   (real TPU; ~10 min of compiles)
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
from turkish_asr_tpu.ops.flash_attention import make_flash_attention
from __graft_entry__ import _flagship_cfg

SR = 16000
SECONDS = 64.0
B = 4
L = 64


def timeit(fn, n=6):
    loss = fn()
    float(loss)
    for _ in range(2):
        loss = fn()
    float(loss)
    start = time.perf_counter()
    for _ in range(n):
        loss = fn()
    float(loss)
    return (time.perf_counter() - start) / n * 1e3


def main():
    cfg = _flagship_cfg(d_model=512, n_heads=8, n_blocks=16)
    params, mstate = init_model(jax.random.PRNGKey(0), cfg)

    S = int(SECONDS * SR)
    rng = np.random.default_rng(0)
    w = jnp.asarray((rng.standard_normal((B, S)) * 0.1).astype(np.float32))
    wl = jnp.full((B,), S, dtype=jnp.int32)
    tg = jnp.asarray(rng.integers(2, cfg.n_classes, (B, L)).astype(np.int32))
    tl = jnp.full((B,), L, dtype=jnp.int32)
    key = jax.random.key(0, impl="rbg")

    def make_step(remat, policy=None, kernel=True, use_ctc=True):
        attn = make_flash_attention() if kernel else None

        def step(p, ms, w, wl, key):
            feats, fl = log_mel_spectrogram(w, wl, n_mels=cfg.n_mels)
            key, akey, dkey = jax.random.split(key, 3)
            feats = spec_augment_batch(feats, akey, fl)

            def loss_fn(pp):
                logits, new_ms = apply_model(
                    pp, ms, feats, fl, cfg=cfg, train=True, rng=dkey,
                    compute_dtype=jnp.bfloat16, attn_kernel=attn,
                    remat=remat, remat_policy=policy)
                lp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
                if use_ctc:
                    per = ctc_loss(lp, tg, fl // 4, tl, reduction="none")
                    return jnp.mean(per / jnp.maximum(tl, 1)), new_ms
                return jnp.sum(lp) * 1e-6, new_ms

            (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(p)
            gn = sum(jnp.sum(jnp.square(g.astype(jnp.float32)))
                     for g in jax.tree.leaves(grads))
            return loss + gn * 1e-30  # force the backward into the program

        return jax.jit(step)

    dots = jax.checkpoint_policies.dots_with_no_batch_dims_saveable
    variants = [
        ("remat=full kernel=on (shipped)", dict(remat=True)),
        ("remat=dots kernel=on", dict(remat=True, policy=dots)),
        ("remat=off  kernel=on", dict(remat=False)),
        ("remat=full kernel=on NO-CTC", dict(remat=True, use_ctc=False)),
        ("remat=off  kernel=on NO-CTC",
         dict(remat=False, use_ctc=False)),
        ("remat=full kernel=off", dict(remat=True, kernel=False)),
    ]
    from bench import model_forward_flops, _peak_flops
    peak, _ = _peak_flops()
    flops = 3 * model_forward_flops(cfg, SECONDS) * B
    for name, kw in variants:
        step = make_step(**kw)
        try:
            ms = timeit(lambda: step(params, mstate, w, wl, key))
        except Exception as e:  # noqa: BLE001 — e.g. OOM on no-remat
            print(f"{name:36s}  FAILED: {type(e).__name__}: {e}")
            continue
        mfu = flops / (ms / 1e3) / peak if peak else float("nan")
        print(f"{name:36s}  {ms:8.1f} ms/step   mfu={mfu:.4f}", flush=True)


if __name__ == "__main__":
    main()
