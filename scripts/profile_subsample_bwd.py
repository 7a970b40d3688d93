"""Forward vs fwd+bwd cost of the conv subsample front-end at train shape
(B=32, T=800 mel frames, 80 mels) — is the stride-2 conv backward the
hidden cost in the 25 ms frontend+head+CTC ablation bucket?

Usage: python scripts/profile_subsample_bwd.py [batch_size]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from turkish_asr_tpu.models import conformer as cm
from __graft_entry__ import _flagship_cfg


def timeit(fn, n=20):
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
    x = jnp.asarray(rng.standard_normal((B, 800, cfg.n_mels, 1)).astype(np.float32))
    k = jax.random.PRNGKey(0)
    p = {
        "sub1": cm._conv2d_init(jax.random.fold_in(k, 0), 3, 1, cfg.d_model),
        "sub2": cm._conv2d_init(jax.random.fold_in(k, 1), 3, cfg.d_model, cfg.d_model),
        "proj": cm._linear_init(jax.random.fold_in(k, 2),
                                cfg.d_model * (cfg.n_mels // 4), cfg.d_model),
    }

    def sub1(p, x):
        return jax.nn.silu(cm._conv2d(p["sub1"], x, stride=2, padding=1,
                                      compute_dtype=jnp.bfloat16))

    def full(p, x):
        h = sub1(p, x)
        h = jax.nn.silu(cm._conv2d(p["sub2"], h, stride=2, padding=1,
                                   compute_dtype=jnp.bfloat16))
        Bh, Th, Fh, Ch = h.shape
        h = h.transpose(0, 1, 3, 2).reshape(Bh, Th, Ch * Fh)
        return cm._dense(p["proj"], h, jnp.bfloat16)

    def run(name, fn):
        fwd = jax.jit(lambda p, x: jnp.sum(fn(p, x).astype(jnp.float32)))

        def loss(p, x):
            return jnp.sum(fn(p, x).astype(jnp.float32) ** 2)

        def fb(p, x):
            l, g = jax.value_and_grad(loss)(p, x)
            gn = sum(jnp.sum(jnp.square(v.astype(jnp.float32)))
                     for v in jax.tree.leaves(g))
            return l + gn * 1e-30
        fbj = jax.jit(fb)
        t_f = timeit(lambda: fwd(p, x))
        t_fb = timeit(lambda: fbj(p, x))
        print(f"{name:18s} fwd {t_f:6.2f} ms   fwd+bwd {t_fb:6.2f} ms  "
              f"(bwd ~{t_fb - t_f:5.2f})", flush=True)

    run("sub1 only", sub1)
    run("sub1+sub2+proj", full)


if __name__ == "__main__":
    main()
