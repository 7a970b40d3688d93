"""A/B: Pallas CTC kernel vs lax.scan implementation on the real chip.

Times forward-only and fwd+bwd (with forced grad data dependency) at the
flagship training shape (B=32, T'=200, S=129, V=55) plus the full train
micro-step through ctc_loss(impl=...).

Usage: python scripts/ab_ctc_pallas.py [B] [T_frames] [V]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from turkish_asr_tpu.ops.ctc import ctc_loss


def timeit(fn, n=20):
    float(fn())
    for _ in range(3):
        out = fn()
    float(out)
    start = time.perf_counter()
    for _ in range(n):
        out = fn()
    float(out)
    return (time.perf_counter() - start) / n * 1e3


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    V = int(sys.argv[3]) if len(sys.argv) > 3 else 55
    L = 64
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.standard_normal((B, T, V)).astype(np.float32))
    lp = jax.nn.log_softmax(logits, -1)
    tg = jnp.asarray(rng.integers(1, V, (B, L)).astype(np.int32))
    il = jnp.full((B,), T, dtype=jnp.int32)
    tl = jnp.full((B,), L, dtype=jnp.int32)

    for impl in ("scan", "pallas"):
        fwd = jax.jit(lambda x: ctc_loss(x, tg, il, tl, impl=impl))

        def loss_fn(x):
            return ctc_loss(x, tg, il, tl, impl=impl)

        @jax.jit
        def fwdbwd(x):
            l, g = jax.value_and_grad(loss_fn)(x)
            return l + jnp.sum(jnp.square(g)) * 1e-30

        t_f = timeit(lambda: fwd(lp))
        t_fb = timeit(lambda: fwdbwd(lp))
        print(f"{impl:7s} B={B} T={T} V={V}: fwd {t_f:6.2f} ms   "
              f"fwd+bwd {t_fb:6.2f} ms")


if __name__ == "__main__":
    main()
