"""Time the current tree's full fwd+bwd+CTC+aug train micro-step (B=32)
and the eval forward. One line of output; run interleaved with a code
variant (e.g. via git stash) for cross-process A/Bs.

Usage: python scripts/time_train_step.py [batch_size] [label]
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
    label = sys.argv[2] if len(sys.argv) > 2 else ""
    cfg = _flagship_cfg()
    rng = np.random.default_rng(0)
    S = int(8.0 * 16000)
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

    @jax.jit
    def eval_fwd(p, ms, w, wl):
        feats, fl = log_mel_spectrogram(w, wl, n_mels=cfg.n_mels)
        logits, _ = apply_model(p, ms, feats, fl, cfg=cfg, train=False,
                                compute_dtype=jnp.bfloat16)
        return jnp.sum(logits.astype(jnp.float32))

    t_train = timeit(lambda: train_step(params, mstate, w, wl, key))
    t_eval = timeit(lambda: eval_fwd(params, mstate, w, wl), n=20)
    print(f"{label:24s} train {t_train:7.2f} ms   eval fwd {t_eval:6.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
