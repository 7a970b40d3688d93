"""Attribute the config-3 train micro-step cost to Conformer submodules.

Method: monkeypatch a submodule (swiglu_ffn / mqa_attention / conv_module /
group_norm / batch_norm) to an output-of-zeros (or identity) stand-in and
re-jit the full fwd+bwd+CTC step. Zero outputs make the submodule's params
unused, so XLA dead-code-eliminates its forward AND backward — the delta
vs baseline is that submodule's true in-context cost (fusion-aware, unlike
standalone timings; see AGENTS.md "GroupNorm one-pass").

The grad-norm term keeps the surviving backward alive (AGENTS.md: XLA
DCEs an unused backward pass entirely).

Usage: python scripts/profile_block_parts.py [batch_size]
"""

import dataclasses
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from turkish_asr_tpu.audio.features import log_mel_spectrogram
from turkish_asr_tpu.audio.augment import spec_augment_batch
from turkish_asr_tpu.models import conformer
from turkish_asr_tpu.models import attention as attention_mod
from turkish_asr_tpu.models.conformer import init_model, apply_model
from turkish_asr_tpu.ops.ctc import ctc_loss
from __graft_entry__ import _flagship_cfg

SR = 16000
SECONDS = 8.0


def timeit(fn, n=10):
    for _ in range(3):
        float(fn())  # compile + 2 warm (fetch = the only reliable sync)
    start = time.perf_counter()
    for _ in range(n):
        out = fn()
    float(out)
    return (time.perf_counter() - start) / n * 1e3


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    base_cfg = _flagship_cfg()

    rng = np.random.default_rng(0)
    S = int(SECONDS * SR)
    w = jnp.asarray((rng.standard_normal((B, S)) * 0.1).astype(np.float32))
    wl = jnp.full((B,), S, dtype=jnp.int32)
    tg = jnp.asarray(rng.integers(2, base_cfg.n_classes, (B, 64)).astype(np.int32))
    tl = jnp.full((B,), 64, dtype=jnp.int32)

    def make_step(cfg):
        def step(p, ms, w, wl, key):
            feats, fl = log_mel_spectrogram(w, wl, n_mels=cfg.n_mels)
            key, akey, dkey = jax.random.split(key, 3)
            feats = spec_augment_batch(feats, akey, fl)

            def loss_fn(pp):
                logits, new_ms = apply_model(pp, ms, feats, fl, cfg=cfg,
                                             train=True, rng=dkey,
                                             compute_dtype=jnp.bfloat16,
                                             remat=True)
                lp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
                per = ctc_loss(lp, tg, fl // 4, tl, reduction="none")
                return jnp.mean(per / jnp.maximum(tl, 1)), new_ms

            (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(p)
            gn = sum(jnp.sum(jnp.square(g.astype(jnp.float32)))
                     for g in jax.tree.leaves(grads))
            return loss + gn * 1e-30
        return jax.jit(step)

    def zeros_ffn(p, x, **kw):
        return jnp.zeros_like(x)

    def zeros_attn(p, x, mask, **kw):
        return jnp.zeros_like(x)

    def zeros_conv(p, state, x, **kw):
        return jnp.zeros_like(x), state

    def id_gn(p, x, num_groups, eps=1e-5, mask=None):
        return x

    def id_bn(p, state, x, train, momentum=0.1, eps=1e-5, mask=None):
        return x, state

    variants = [
        ("baseline (rbg, drop=0.1)", {}, {}),
        ("threefry key", {}, {"impl": "threefry2x32"}),
        ("dropout=0", {}, {"cfg": dataclasses.replace(base_cfg, dropout=0.0)}),
        ("no FFN (both macaron)", {"swiglu_ffn": zeros_ffn}, {}),
        ("no attention", {"mqa_attention": zeros_attn}, {}),
        ("no conv module", {"conv_module": zeros_conv}, {}),
        ("identity GroupNorm", {"group_norm": id_gn}, {}),
        ("identity BatchNorm", {"batch_norm": id_bn}, {}),
        ("n_blocks=0 (frontend+head)", {},
         {"cfg": dataclasses.replace(base_cfg, n_blocks=1), "nb0": True}),
    ]

    results = {}
    for name, patches, opts in variants:
        cfg = opts.get("cfg", base_cfg)
        key = jax.random.key(0, impl=opts.get("impl", "rbg"))
        params, mstate = init_model(jax.random.PRNGKey(0), cfg)
        if opts.get("nb0"):
            # one block whose submodules are all zeroed = empty stack
            patches = {"swiglu_ffn": zeros_ffn, "mqa_attention": zeros_attn,
                       "conv_module": zeros_conv, "group_norm": id_gn}
        saved = {k: getattr(conformer, k) for k in patches}
        try:
            for k, v in patches.items():
                setattr(conformer, k, v)
            step = make_step(cfg)
            ms = timeit(lambda: step(params, mstate, w, wl, key))
        finally:
            for k, v in saved.items():
                setattr(conformer, k, v)
        results[name] = ms
        base = results.get("baseline (rbg, drop=0.1)")
        delta = f"  (delta {base - ms:+6.2f})" if base and name != "baseline (rbg, drop=0.1)" else ""
        print(f"{name:28s} {ms:7.2f} ms{delta}", flush=True)


if __name__ == "__main__":
    main()
