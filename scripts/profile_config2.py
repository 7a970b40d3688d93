"""Config-2 small-batch (B=8) cost anatomy (VERDICT r3 #5).

BENCH_r03: config 2 runs 8.15 ms/step at B=8 (1.02 ms/sample) vs
0.64 ms/sample at B=32 — per-sample cost +60% at the small batch. Which
parts are FIXED (batch-independent) vs linear? Measured parts, each as a
chained-scan jit at B in {8, 32}:

  mel        waveform -> log-mel front-end only
  fwd        mel + model forward (inference mode)
  fwdbwd     mel + forward + backward (grads forced, no CTC)
  ctc        mel + forward + Pallas-CTC loss + backward
  step       the full optax train step (bench config-2 equivalent)

The CTC kernel's time loop is SEQUENTIAL in T' (AGENTS: flat in t_chunk,
VPU-bound per step) — its cost should be near-flat in B, i.e. ~4x the
per-sample share at B=8. The optimizer update is batch-independent by
construction. Timing per AGENTS.md: iterations chained inside one jitted
scan with forced data deps, one fetch sync.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
import optax

sys.path.insert(0, ".")

from turkish_asr_tpu.audio.features import log_mel_spectrogram
from turkish_asr_tpu.models.conformer import init_model, apply_model
from turkish_asr_tpu.ops.ctc import ctc_loss
from __graft_entry__ import _flagship_cfg

SR = 16000
SECONDS = 8.0
ITERS = 30


def timed(fn, *args, n=ITERS):
    """One jitted scan chaining n data-dependent iterations; fetch-sync."""
    @jax.jit
    def run(*a):
        def body(carry, _):
            out = fn(carry, *a[1:])
            return out, ()
        final, _ = jax.lax.scan(body, a[0], None, length=n)
        return jax.tree.leaves(final)[0]

    out = run(*args)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]  # warm + sync
    t0 = time.perf_counter()
    out = run(*args)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    return (time.perf_counter() - t0) / n * 1e3


def anatomy(B):
    cfg = _flagship_cfg()
    rng = np.random.default_rng(0)
    S = int(SECONDS * SR)
    w = jnp.asarray((rng.standard_normal((B, S)) * 0.1).astype(np.float32))
    wl = jnp.full((B,), S, dtype=jnp.int32)
    tg = jnp.asarray(rng.integers(2, cfg.n_classes, (B, 64)).astype(np.int32))
    tl = jnp.full((B,), 64, dtype=jnp.int32)
    params, mstate = init_model(jax.random.PRNGKey(0), cfg)
    opt = optax.adamw(1e-4)
    ost = opt.init(params)

    # Each part takes a perturbation carry so the scan can't dedupe.
    def mel(c, w, wl):
        feats, fl = log_mel_spectrogram(w + c * 1e-30, wl, n_mels=cfg.n_mels)
        return jnp.sum(feats)

    def fwd(c, w, wl):
        feats, fl = log_mel_spectrogram(w + c * 1e-30, wl, n_mels=cfg.n_mels)
        logits, _ = apply_model(params, mstate, feats, fl, cfg=cfg,
                                train=False, compute_dtype=jnp.bfloat16)
        return jnp.sum(logits.astype(jnp.float32))

    def grads_of(c, w, wl, with_ctc):
        feats, fl = log_mel_spectrogram(w + c * 1e-30, wl, n_mels=cfg.n_mels)

        def loss_fn(pp):
            logits, new_ms = apply_model(pp, mstate, feats, fl, cfg=cfg,
                                         train=True,
                                         rng=jax.random.PRNGKey(0),
                                         compute_dtype=jnp.bfloat16)
            lf = logits.astype(jnp.float32)
            if with_ctc:
                lp = jax.nn.log_softmax(lf, -1)
                per = ctc_loss(lp, tg, fl // 4, tl, reduction="none")
                return jnp.mean(per / jnp.maximum(tl, 1))
            return jnp.mean(lf * lf)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        gn = sum(jnp.sum(jnp.square(g.astype(jnp.float32)))
                 for g in jax.tree.leaves(grads))
        return loss + gn * 1e-30

    def fwdbwd(c, w, wl):
        return grads_of(c, w, wl, with_ctc=False)

    def ctc_part(c, w, wl):
        return grads_of(c, w, wl, with_ctc=True)

    ms = {}
    ms["mel"] = timed(mel, jnp.float32(0), w, wl)
    ms["fwd"] = timed(fwd, jnp.float32(0), w, wl)
    ms["fwdbwd"] = timed(fwdbwd, jnp.float32(0), w, wl)
    ms["ctc"] = timed(ctc_part, jnp.float32(0), w, wl)

    # Full step: params/opt thread through the scan carry (donation-free
    # but chained — update cost rides the carry).
    def step(carry, w, wl):
        p, o = carry
        feats, fl = log_mel_spectrogram(w, wl, n_mels=cfg.n_mels)

        def loss_fn(pp):
            logits, _ = apply_model(pp, mstate, feats, fl, cfg=cfg,
                                    train=True, rng=jax.random.PRNGKey(0),
                                    compute_dtype=jnp.bfloat16)
            lp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
            per = ctc_loss(lp, tg, fl // 4, tl, reduction="none")
            return jnp.mean(per / jnp.maximum(tl, 1))

        grads = jax.grad(loss_fn)(p)
        upd, o2 = opt.update(grads, o, p)
        return (optax.apply_updates(p, upd), o2)

    ms["step"] = timed(step, (params, ost), w, wl)
    return ms


def main():
    for B in (8, 32):
        ms = anatomy(B)
        parts = " ".join(f"{k}={v:6.2f}" for k, v in ms.items())
        print(f"B={B:3d}: {parts}  (ms)", flush=True)
        print(f"B={B:3d}: mel={ms['mel']:.2f} model_fb="
              f"{ms['fwdbwd'] - ms['mel']:.2f} "
              f"ctc={ms['ctc'] - ms['fwdbwd']:.2f} "
              f"update={ms['step'] - ms['ctc']:.2f} "
              f"per_sample={ms['step'] / B:.3f}", flush=True)


if __name__ == "__main__":
    main()
