"""A/B BatchNorm formulations on the full fwd+bwd+CTC+aug step (B=32).

batch_norm is a conformer module global referenced by conv_module, so
variants patch in-process (one process, fresh jit per variant — the
only timing comparison that is trustworthy over the tunnel).

Variants:
  two-pass   — shipped: mean, then (x-mean)^2 (centered, fp32)
  one-pass   — E[x^2]-E[x]^2 moments (single sweep over the activation)
  no-running — diagnostic only: skip the running-stat update (bounds its
               share; NOT shippable — eval needs running stats)
  frozen     — diagnostic: use running stats even in train (bounds the
               whole batch-stat machinery incl. its backward)

Usage: python scripts/ab_batchnorm.py [batch_size]
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


def bn_one_pass(p, state, x, train, momentum=0.1, eps=1e-5, mask=None):
    xf = x.astype(jnp.float32)
    if train:
        n = x.shape[0] * x.shape[1]
        mean = jnp.mean(xf, axis=(0, 1))
        msq = jnp.mean(xf * xf, axis=(0, 1))
        var = jnp.maximum(msq - mean * mean, 0.0)
        unbiased = var * (n / max(n - 1, 1))
        new_state = {
            "mean": (1 - momentum) * state["mean"] + momentum * mean,
            "var": (1 - momentum) * state["var"] + momentum * unbiased,
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    xn = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (xn * p["scale"] + p["bias"]).astype(x.dtype), new_state


def bn_no_running(p, state, x, train, momentum=0.1, eps=1e-5, mask=None):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(0, 1))
    var = jnp.mean((xf - mean) ** 2, axis=(0, 1))
    xn = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (xn * p["scale"] + p["bias"]).astype(x.dtype), state


def bn_frozen(p, state, x, train, momentum=0.1, eps=1e-5, mask=None):
    xf = x.astype(jnp.float32)
    xn = (xf - state["mean"]) * jax.lax.rsqrt(state["var"] + eps)
    return (xn * p["scale"] + p["bias"]).astype(x.dtype), state


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

    def make_step():
        @jax.jit
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
        return step

    shipped = conformer.batch_norm
    for name, bn in (("two-pass (shipped)", shipped),
                     ("one-pass moments", bn_one_pass),
                     ("no-running (diag)", bn_no_running),
                     ("frozen stats (diag)", bn_frozen)):
        conformer.batch_norm = bn
        try:
            step = make_step()
            t = timeit(lambda: step(params, mstate, w, wl, key))
        finally:
            conformer.batch_norm = shipped
        print(f"{name:22s} train {t:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
