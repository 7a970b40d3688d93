"""A/B the Pallas flash-attention kernel in TRAINING (fwd+bwd, dropout
in-kernel) vs the einsum path, across model size x sequence length.

Round-3 verdict weak #2: training never used the kernel (dropout gate +
T'>=512 threshold) and the (B,H,T',T') einsum probs dominate long-form
training HBM. With in-kernel dropout the gate is gone; this measures
where the kernel actually wins for fwd+bwd so MIN_KERNEL_SEQ_LEN can be
set separately for training if warranted.

Replicates the trainer's real step: mel front-end + SpecAugment + bf16 +
per-block remat + rbg dropout keys + Pallas CTC (auto) + grads forced
into the program. Timing per AGENTS.md: chained iterations inside one
process, sync by fetching.
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


def timeit(fn, n=10):
    for _ in range(3):
        float(fn())
    start = time.perf_counter()
    for _ in range(n):
        out = fn()
    float(out)
    return (time.perf_counter() - start) / n * 1e3


def step_time(cfg, B, seconds, attn_kernel, n=10):
    rng = np.random.default_rng(0)
    S = int(seconds * 16000)
    w = jnp.asarray((rng.standard_normal((B, S)) * 0.1).astype(np.float32))
    wl = jnp.full((B,), S, dtype=jnp.int32)
    L = max(16, int(seconds * 8))
    tg = jnp.asarray(rng.integers(2, cfg.n_classes, (B, L)).astype(np.int32))
    tl = jnp.full((B,), L, dtype=jnp.int32)
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
                compute_dtype=jnp.bfloat16, attn_kernel=attn_kernel,
                remat=True)
            lp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
            per = ctc_loss(lp, tg, fl // 4, tl, reduction="none")
            return jnp.mean(per / jnp.maximum(tl, 1)), new_ms

        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(p)
        gn = sum(jnp.sum(jnp.square(g.astype(jnp.float32)))
                 for g in jax.tree.leaves(grads))
        return loss + gn * 1e-30

    return timeit(lambda: train_step(params, mstate, w, wl, key), n=n)


CASES = [
    # (label, d, h, blocks, B, seconds)  T' = seconds*100/4
    ("flagship-8s-T200", 256, 4, 8, 32, 8.0),
    ("flagship-16s-T400", 256, 4, 8, 16, 16.0),
    ("flagship-24s-T600", 256, 4, 8, 8, 24.0),
    ("conformerL-16s-T400", 512, 8, 16, 8, 16.0),
    ("conformerL-64s-T1600", 512, 8, 16, 4, 64.0),
]


def main():
    only = sys.argv[1] if len(sys.argv) > 1 else None
    for label, d, h, blk, B, sec in CASES:
        if only and only not in label:
            continue
        cfg = _flagship_cfg(d_model=d, n_heads=h, n_blocks=blk)
        t_off = step_time(cfg, B, sec, None)
        # force-engage the kernel regardless of T'
        t_on = step_time(cfg, B, sec, make_flash_attention(min_seq_len=64))
        print(f"{label:22s} B={B:3d} einsum {t_off:8.2f} ms  "
              f"kernel {t_on:8.2f} ms  speedup {t_off / t_on:5.2f}x",
              flush=True)


if __name__ == "__main__":
    main()
