"""A/B: block rematerialization (jax.checkpoint on the scan body) in the
training step.

Hypothesis: the fwd+bwd runs ~14% MFU — bandwidth-bound on saved residuals
(dominant: the (B, H, T', T') attention probs per block). Remat saves only
block inputs and recomputes the forward during the backward; the extra MXU
FLOPs should be cheaper than the residual HBM traffic.

Variants: none | full block remat | dots_saveable policy.

Usage: python scripts/ab_remat.py [batch_size]
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


def timeit(fn, n=10):
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
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    cfg = _flagship_cfg()
    params, mstate = init_model(jax.random.PRNGKey(0), cfg)

    S = int(SECONDS * SR)
    rng = np.random.default_rng(0)
    w = jnp.asarray((rng.standard_normal((B, S)) * 0.1).astype(np.float32))
    wl = jnp.full((B,), S, dtype=jnp.int32)
    tg = jnp.asarray(rng.integers(2, cfg.n_classes, (B, 64)).astype(np.int32))
    tl = jnp.full((B,), 64, dtype=jnp.int32)
    key = jax.random.key(0, impl="rbg")

    def make_step(remat, policy=None):
        def step(p, ms, w, wl, key):
            feats, fl = log_mel_spectrogram(w, wl, n_mels=cfg.n_mels)
            key, akey, dkey = jax.random.split(key, 3)
            feats = spec_augment_batch(feats, akey, fl)

            def loss_fn(pp):
                logits, new_ms = apply_model(
                    pp, ms, feats, fl, cfg=cfg, train=True, rng=dkey,
                    compute_dtype=jnp.bfloat16, remat=remat,
                    remat_policy=policy)
                lp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
                per = ctc_loss(lp, tg, fl // 4, tl, reduction="none")
                return jnp.mean(per / jnp.maximum(tl, 1)), new_ms

            (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(p)
            gn = sum(jnp.sum(jnp.square(g.astype(jnp.float32)))
                     for g in jax.tree.leaves(grads))
            return loss + gn * 1e-30

        return jax.jit(step)

    variants = [
        ("no remat", False, None),
        ("block remat", True, None),
        ("remat dots_save", True,
         jax.checkpoint_policies.dots_with_no_batch_dims_saveable),
        ("remat anything", True, jax.checkpoint_policies.everything_saveable),
    ]
    if len(sys.argv) > 2:  # optional variant filter (substring)
        variants = [v for v in variants if sys.argv[2] in v[0]]
    for name, remat, policy in variants:
        fn = make_step(remat, policy)
        ms = timeit(lambda: fn(params, mstate, w, wl, key))
        print(f"{name:16s} B={B}  fwd+bwd+ctc+aug: {ms:7.2f} ms")


if __name__ == "__main__":
    main()
