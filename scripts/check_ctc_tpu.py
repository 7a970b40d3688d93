"""Compiled-kernel CTC parity sweep on the real TPU.

The CPU tests exercise the kernel in interpreter mode; this asserts the
COMPILED Mosaic kernel matches the lax.scan path (loss and grads) across
the shape envelope the framework ships: batch sizes down to sublane
padding, time buckets up to long-form, target buckets that push S past
multiple 128-lane groups, ragged lengths, repeated labels.

Usage: python scripts/check_ctc_tpu.py
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from turkish_asr_tpu.ops.ctc import ctc_loss

CASES = [
    # (B, T, V, L)  — T is post-subsample frames, L the target bucket
    (8, 200, 55, 64),     # config-2 shape
    (32, 200, 55, 64),    # config-3 shape
    (4, 100, 31, 16),     # small
    (16, 800, 55, 128),   # 32 s bucket, S=257 -> two lane groups
    (2, 1600, 55, 200),   # long-form, S=401 -> Sp=512
    (8, 37, 7, 9),        # tiny/ragged
    (64, 400, 55, 150),   # big B x Sp — exercises the VMEM chunk budget
]


def main():
    assert jax.default_backend() == "tpu", "run on the TPU"
    worst = 0.0
    for B, T, V, L in CASES:
        rng = np.random.default_rng(B * 1000 + T)
        logits = jnp.asarray(
            rng.standard_normal((B, T, V)).astype(np.float32))
        lp = jax.nn.log_softmax(logits, -1)
        tg = jnp.asarray(rng.integers(1, V, (B, L)).astype(np.int32))
        il = jnp.asarray(rng.integers(max(T // 2, 2 * L + 2), T + 1,
                                      (B,)).astype(np.int32))
        tl = jnp.asarray(rng.integers(0, L + 1, (B,)).astype(np.int32))

        out = {}
        for impl in ("scan", "pallas"):
            def mean_loss(x, impl=impl):
                per = ctc_loss(x, tg, il, tl, reduction="none", impl=impl)
                return jnp.mean(per / jnp.maximum(tl, 1))

            loss, grad = jax.jit(jax.value_and_grad(mean_loss))(lp)
            out[impl] = (np.asarray(loss), np.asarray(grad))

        dl = abs(float(out["scan"][0] - out["pallas"][0]))
        rel = dl / max(abs(float(out["scan"][0])), 1e-9)
        gd = np.max(np.abs(out["scan"][1] - out["pallas"][1]))
        gscale = np.max(np.abs(out["scan"][1])) + 1e-12
        print(f"B={B:3d} T={T:5d} V={V:3d} L={L:3d}: "
              f"loss rel-delta {rel:.2e}  grad max-abs-delta {gd:.2e} "
              f"(grad scale {gscale:.2e})")
        assert rel < 1e-5, (B, T, V, L, rel)
        assert gd < 1e-4 * max(1.0, gscale), (B, T, V, L, gd)
        worst = max(worst, rel)
    print(f"OK — all {len(CASES)} shapes match (worst loss rel {worst:.2e})")


if __name__ == "__main__":
    main()
