"""Attribute the config-3 training micro-step (B=32, aug, accum=4) cost.

jax.profiler traces hang over the axon tunnel (verify skill), so this
ablates the jitted step instead: each variant is timed with the eager
pipelined-dispatch pattern from bench.py (sync once via a scalar fetch).

Usage: python scripts/profile_train_step.py [batch_size]
"""

import sys
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from turkish_asr_tpu.audio.features import log_mel_spectrogram
from turkish_asr_tpu.audio.augment import spec_augment_batch
from turkish_asr_tpu.models.conformer import init_model, apply_model
from turkish_asr_tpu.ops.ctc import ctc_loss
from turkish_asr_tpu.train.optim import make_optimizer
from __graft_entry__ import _flagship_cfg

SR = 16000
SECONDS = 8.0


def timeit(fn, args, n=10):
    out = fn(*args)
    loss = out[-1] if isinstance(out, tuple) else out
    float(loss if loss.ndim == 0 else loss.sum())
    for _ in range(2):
        out = fn(*args)
    loss = out[-1] if isinstance(out, tuple) else out
    float(loss if loss.ndim == 0 else loss.sum())
    start = time.perf_counter()
    o = args
    for _ in range(n):
        out = fn(*args)
    loss = out[-1] if isinstance(out, tuple) else out
    float(loss if loss.ndim == 0 else loss.sum())
    return (time.perf_counter() - start) / n * 1e3


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    cfg = _flagship_cfg()
    params, mstate = init_model(jax.random.PRNGKey(0), cfg)
    tx, _ = make_optimizer(5e-4, 1e-6, total_steps=1000,
                           accumulation_steps=4)
    opt = tx.init(params)
    tx1, _ = make_optimizer(5e-4, 1e-6, total_steps=1000,
                            accumulation_steps=1)
    opt1 = tx1.init(params)

    S = int(SECONDS * SR)
    rng = np.random.default_rng(0)
    w = jnp.asarray((rng.standard_normal((B, S)) * 0.1).astype(np.float32))
    wl = jnp.full((B,), S, dtype=jnp.int32)
    tg = jnp.asarray(rng.integers(2, cfg.n_classes, (B, 64)).astype(np.int32))
    tl = jnp.full((B,), 64, dtype=jnp.int32)
    key = jax.random.PRNGKey(0)

    def fwd_loss(p, ms, feats, fl, *, use_ctc, train, drop_rng):
        logits, new_ms = apply_model(p, ms, feats, fl, cfg=cfg, train=train,
                                     rng=drop_rng,
                                     compute_dtype=jnp.bfloat16)
        if use_ctc:
            lp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
            per = ctc_loss(lp, tg, fl // 4, tl, reduction="none")
            return jnp.mean(per / jnp.maximum(tl, 1)), new_ms
        return jnp.mean(logits.astype(jnp.float32) ** 2), new_ms

    def make_step(*, aug, use_ctc, grad, update, tx_u=None):
        def step(p, ms, o, w, wl, key):
            feats, fl = log_mel_spectrogram(w, wl, n_mels=cfg.n_mels)
            key, akey, dkey = jax.random.split(key, 3)
            if aug:
                feats = spec_augment_batch(feats, akey, fl)
            if not grad:
                loss, _ = fwd_loss(p, ms, feats, fl, use_ctc=use_ctc,
                                   train=False, drop_rng=None)
                return loss
            (loss, new_ms), grads = jax.value_and_grad(
                lambda pp: fwd_loss(pp, ms, feats, fl, use_ctc=use_ctc,
                                    train=True, drop_rng=dkey),
                has_aux=True)(p)
            if not update:
                # Force the backward pass into the program: without a data
                # dependency on grads XLA dead-code-eliminates the entire
                # backward (measured: "fwd+bwd" == fwd-only time), which
                # misattributes the bwd cost to whatever variant uses the
                # grads (round-3 false lead: "optimizer adds 33ms").
                gn = sum(jnp.sum(jnp.square(g.astype(jnp.float32)))
                         for g in jax.tree.leaves(grads))
                return loss + gn * 1e-30
            if update:
                gn = sum(jnp.sum(jnp.square(g.astype(jnp.float32)))
                         for g in jax.tree.leaves(grads))
                bad = ~jnp.isfinite(loss) | ~jnp.isfinite(gn)
                def skip(_):
                    return p, o
                def apply(_):
                    u, no = tx_u.update(grads, o, p)
                    return jax.tree.map(lambda a, b: a + b, p, u), no
                np_, no_ = jax.lax.cond(bad, skip, apply, None)
                return np_, no_, loss
            return loss

        return jax.jit(step)

    # mel front-end alone
    mel = jax.jit(lambda w, wl: log_mel_spectrogram(w, wl,
                                                    n_mels=cfg.n_mels)[0])
    t_mel = timeit(lambda *a: mel(w, wl), (), n=20)
    aug_fn = jax.jit(lambda w, wl, key: spec_augment_batch(
        log_mel_spectrogram(w, wl, n_mels=cfg.n_mels)[0], key,
        log_mel_spectrogram(w, wl, n_mels=cfg.n_mels)[1]))
    t_melaug = timeit(lambda *a: aug_fn(w, wl, key), (), n=20)

    variants = [
        ("fwd only (no ctc, eval)", make_step(aug=False, use_ctc=False,
                                              grad=False, update=False)),
        ("fwd+ctc (eval)", make_step(aug=False, use_ctc=True, grad=False,
                                     update=False)),
        ("fwd+bwd no ctc", make_step(aug=False, use_ctc=False, grad=True,
                                     update=False)),
        ("fwd+bwd+ctc", make_step(aug=False, use_ctc=True, grad=True,
                                  update=False)),
        ("fwd+bwd+ctc+aug", make_step(aug=True, use_ctc=True, grad=True,
                                      update=False)),
        ("full step (accum=4)", make_step(aug=True, use_ctc=True, grad=True,
                                          update=True, tx_u=tx)),
        ("full step (accum=1)", make_step(aug=True, use_ctc=True, grad=True,
                                          update=True, tx_u=tx1)),
    ]

    print(f"B={B}  mel={t_mel:.2f}ms  mel+specaug={t_melaug:.2f}ms")
    for name, fn in variants:
        if "full" in name:
            o_used = opt if "accum=4" in name else opt1
            ms = timeit(lambda: fn(params, mstate, o_used, w, wl, key), ())
        else:
            ms = timeit(lambda: fn(params, mstate, None, w, wl, key), ())
        print(f"{name:26s} {ms:7.2f} ms")


if __name__ == "__main__":
    main()
