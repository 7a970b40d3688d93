"""A/B: fused SwiGLU FFN Pallas kernel vs XLA's matmul chain (forward).

The block-parts profile charges the FFNs 7.2 ms of the 20 ms micro-step.
The XLA chain materializes the (M, 2F) hidden between the two matmuls;
a fused kernel keeps it in VMEM. Standalone numbers OVERSTATE the XLA
side's true in-context cost (XLA fuses FFN edges with neighbors —
AGENTS.md GroupNorm lesson), so the kernel must win by a wide margin here
before an in-context attempt is justified.

Usage: python scripts/ab_swiglu.py [M] [C] [F]
"""

import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")


def timeit_chained(fn, x, args, n=50):
    """n carry-dependent iterations inside ONE jit, scalar fetch at the
    end — the only reliable timing over the tunnel (AGENTS.md)."""
    @jax.jit
    def run(x):
        def body(c, _):
            return fn(c, *args), None
        y, _ = jax.lax.scan(body, x, None, length=n)
        return jnp.sum(y.astype(jnp.float32))

    float(run(x))
    for _ in range(2):
        out = run(x)
    float(out)
    start = time.perf_counter()
    out = run(x)
    float(out)
    return (time.perf_counter() - start) / n * 1e3


def swiglu_xla(x, w1, b1, w2, b2):
    h = jnp.dot(x, w1, preferred_element_type=jnp.float32) + b1
    h = h.astype(jnp.bfloat16)
    f = h.shape[-1] // 2
    g = jax.nn.silu(h[..., :f].astype(jnp.float32)).astype(jnp.bfloat16) \
        * h[..., f:]
    y = jnp.dot(g, w2, preferred_element_type=jnp.float32) + b2
    return y.astype(jnp.bfloat16)


def _kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, y_ref):
    h = jnp.dot(x_ref[:], w1_ref[:],
                preferred_element_type=jnp.float32) + b1_ref[:]
    f = h.shape[-1] // 2
    h1, h2 = h[:, :f], h[:, f:]
    g = (h1 * jax.nn.sigmoid(h1) * h2).astype(jnp.bfloat16)
    y_ref[:] = (jnp.dot(g, w2_ref[:],
                        preferred_element_type=jnp.float32)
                + b2_ref[:]).astype(jnp.bfloat16)


def swiglu_pallas(x, w1, b1, w2, b2, tm=512):
    M, C = x.shape
    H2 = w1.shape[1]
    grid = (M // tm,)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, H2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H2 // 2, C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, C), jnp.bfloat16),
    )(x, w1, b1, w2, b2)


def main():
    M = int(sys.argv[1]) if len(sys.argv) > 1 else 6400
    C = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    F = int(sys.argv[3]) if len(sys.argv) > 3 else 1024
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((M, C)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    w1 = jnp.asarray((rng.standard_normal((C, 2 * F)) * 0.05
                      ).astype(np.float32)).astype(jnp.bfloat16)
    b1 = jnp.zeros((1, 2 * F), jnp.float32)
    w2 = jnp.asarray((rng.standard_normal((F, C)) * 0.05
                      ).astype(np.float32)).astype(jnp.bfloat16)
    b2 = jnp.zeros((1, C), jnp.float32)

    args = (w1, b1, w2, b2)
    f_x = jax.jit(swiglu_xla)
    y0 = f_x(x, *args)
    for tm in (256, 512, 1600):
        if M % tm:
            continue
        f_p = functools.partial(swiglu_pallas, tm=tm)
        y1 = jax.jit(f_p)(x, *args)
        err = float(jnp.max(jnp.abs(y0.astype(jnp.float32)
                                    - y1.astype(jnp.float32))))
        t = timeit_chained(f_p, x, args)
        print(f"pallas tm={tm:5d}: {t:6.3f} ms  (max err {err:.2e})")
    t0 = timeit_chained(swiglu_xla, x, args)
    print(f"xla chain       : {t0:6.3f} ms   M={M} C={C} F={F}")


if __name__ == "__main__":
    main()
