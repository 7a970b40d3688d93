"""A/B the layout-preserving GroupNorm vs the old reshape-based one on the
full fwd+bwd+CTC+aug train micro-step (B=32). Also times eval forward.

Usage: python scripts/ab_groupnorm.py [batch_size]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from turkish_asr_tpu.audio.features import log_mel_spectrogram
from turkish_asr_tpu.audio.augment import spec_augment_batch
from turkish_asr_tpu.models import conformer
from turkish_asr_tpu.models.conformer import init_model, apply_model
from turkish_asr_tpu.ops.ctc import ctc_loss
from __graft_entry__ import _flagship_cfg


def group_norm_reshape(p, x, num_groups, eps=1e-5, mask=None):
    """Round-2 implementation: stats via (B, T, G, C/G) reshape."""
    B, T, C = x.shape
    g = num_groups
    xg = x.astype(jnp.float32).reshape(B, T, g, C // g)
    if mask is None:
        mean = jnp.mean(xg, axis=(1, 3), keepdims=True)
        var = jnp.mean((xg - mean) ** 2, axis=(1, 3), keepdims=True)
    else:
        m = mask.astype(jnp.float32)[:, :, None, None]
        denom = jnp.maximum(jnp.sum(m, axis=1, keepdims=True) * (C // g), 1.0)
        mean = jnp.sum(xg * m, axis=(1, 3), keepdims=True) / denom
        var = jnp.sum(jnp.where(m > 0, (xg - mean) ** 2, 0.0),
                      axis=(1, 3), keepdims=True) / denom
    xn = ((xg - mean) * jax.lax.rsqrt(var + eps)).reshape(B, T, C)
    return (xn * p["scale"] + p["bias"]).astype(x.dtype)


def timeit(fn, n=10):
    for _ in range(3):
        float(fn())
    start = time.perf_counter()
    for _ in range(n):
        out = fn()
    float(out)
    return (time.perf_counter() - start) / n * 1e3


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    cfg = _flagship_cfg()
    rng = np.random.default_rng(0)
    S = int(8.0 * 16000)
    w = jnp.asarray((rng.standard_normal((B, S)) * 0.1).astype(np.float32))
    wl = jnp.full((B,), S, dtype=jnp.int32)
    tg = jnp.asarray(rng.integers(2, cfg.n_classes, (B, 64)).astype(np.int32))
    tl = jnp.full((B,), 64, dtype=jnp.int32)
    params, mstate = init_model(jax.random.PRNGKey(0), cfg)
    key = jax.random.key(0, impl="rbg")

    def make_train_step():
        def step(p, ms, w, wl, key):
            feats, fl = log_mel_spectrogram(w, wl, n_mels=cfg.n_mels)
            key, akey, dkey = jax.random.split(key, 3)
            feats = spec_augment_batch(feats, akey, fl)

            def loss_fn(pp):
                logits, new_ms = apply_model(pp, ms, feats, fl, cfg=cfg,
                                             train=True, rng=dkey,
                                             compute_dtype=jnp.bfloat16)
                lp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
                per = ctc_loss(lp, tg, fl // 4, tl, reduction="none")
                return jnp.mean(per / jnp.maximum(tl, 1)), new_ms

            (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(p)
            gn = sum(jnp.sum(jnp.square(g.astype(jnp.float32)))
                     for g in jax.tree.leaves(grads))
            return loss + gn * 1e-30
        return jax.jit(step)

    def make_eval_fwd():
        def step(p, ms, w, wl):
            feats, fl = log_mel_spectrogram(w, wl, n_mels=cfg.n_mels)
            logits, _ = apply_model(p, ms, feats, fl, cfg=cfg, train=False,
                                    compute_dtype=jnp.bfloat16)
            return jnp.sum(logits.astype(jnp.float32))
        return jax.jit(step)

    new_gn = conformer.group_norm
    for name, gn in (("old reshape GN", group_norm_reshape),
                     ("new lane-major GN", new_gn)):
        conformer.group_norm = gn
        try:
            train_step, eval_fwd = make_train_step(), make_eval_fwd()
            t_train = timeit(lambda: train_step(params, mstate, w, wl, key))
            t_eval = timeit(lambda: eval_fwd(params, mstate, w, wl), n=20)
        finally:
            conformer.group_norm = new_gn
        print(f"{name:20s} train {t_train:7.2f} ms   eval fwd {t_eval:6.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
