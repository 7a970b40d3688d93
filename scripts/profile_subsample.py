"""Decompose forward time: subsample convs vs block stack, and compare
conv1 implementations (direct C_in=1 conv vs im2col patch matmul).

Run on the real TPU chip. Methodology per AGENTS.md: warm compile first,
force a host sync via float() per iteration batch, median of repeats.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from turkish_asr_tpu.models.conformer import (
    ModelConfig, init_model, apply_model, _conv2d, _dense)
from turkish_asr_tpu.utils.runtime import enable_compilation_cache


INNER = 30  # iterations chained inside one jit to amortize tunnel latency


def timeit(fn, *args, repeats=5):
    """Median per-iteration ms. The remote-TPU tunnel costs ~30 ms per host
    sync, so each timed call runs INNER chained iterations of ``fn`` inside a
    single jit (carry-dependent so XLA can't dedupe) and divides by INNER.
    """
    @jax.jit
    def looped(*a):
        def body(i, acc):
            out = fn(*a[:-1], a[-1] + acc * 0)
            out = out[0] if isinstance(out, tuple) else out
            return acc + jnp.sum(out.astype(jnp.float32)) * 1e-9
        return jax.lax.fori_loop(0, INNER, body, jnp.float32(0))

    s = float(looped(*args))  # compile + warm
    best = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        s = float(looped(*args))
        best.append(time.perf_counter() - t0)
    return float(np.median(best)) * 1e3 / INNER, s


def main():
    enable_compilation_cache()
    cfg = ModelConfig(n_mels=80, d_model=256, n_heads=4, n_blocks=8,
                      n_classes=55, dropout=0.0)
    params, state = init_model(jax.random.PRNGKey(0), cfg)
    B, T = 128, 800  # 8 s of audio at 100 fps
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, T, cfg.n_mels)).astype(np.float32))
    lengths = jnp.full((B,), T, dtype=jnp.int32)
    dt = jnp.bfloat16

    @jax.jit
    def full(params, state, x):
        logits, _ = apply_model(params, state, x, lengths, cfg=cfg,
                                train=False, compute_dtype=dt)
        return logits

    @jax.jit
    def conv1_direct(params, x):
        h = x[..., None]
        return jax.nn.silu(_conv2d(params["sub1"], h, stride=2, padding=1,
                                   compute_dtype=dt))

    @jax.jit
    def conv1_im2col(params, x):
        # pad (T, F) by 1, take 9 strided slices, stack on a new last axis,
        # single (B*T'*F', 9) x (9, C) matmul
        B_, T_, F_ = x.shape
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1))).astype(dt)
        To, Fo = T_ // 2, F_ // 2
        cols = []
        for dt_ in range(3):
            for df in range(3):
                cols.append(jax.lax.slice(
                    xp, (0, dt_, df), (B_, dt_ + 2 * To, df + 2 * Fo),
                    (1, 2, 2)))
        patches = jnp.stack(cols, axis=-1)  # (B, To, Fo, 9)
        w = params["sub1"]["w"].reshape(9, -1).astype(dt)  # (9, C)
        y = jnp.dot(patches, w, preferred_element_type=jnp.float32)
        y = (y + params["sub1"]["b"]).astype(dt)
        return jax.nn.silu(y)

    @jax.jit
    def conv2_direct(params, h):
        return jax.nn.silu(_conv2d(params["sub2"], h, stride=2, padding=1,
                                   compute_dtype=dt))

    @jax.jit
    def subsample_all(params, x):
        h = x[..., None]
        h = jax.nn.silu(_conv2d(params["sub1"], h, stride=2, padding=1,
                                compute_dtype=dt))
        h = jax.nn.silu(_conv2d(params["sub2"], h, stride=2, padding=1,
                                compute_dtype=dt))
        Bh, Th, Fh, Ch = h.shape
        h = h.transpose(0, 1, 3, 2).reshape(Bh, Th, Ch * Fh)
        return _dense(params["input_proj"], h, dt)

    t_full, _ = timeit(full, params, state, x)
    t_c1, s1 = timeit(conv1_direct, params, x)
    t_c1b, s2 = timeit(conv1_im2col, params, x)
    h1 = conv1_direct(params, x)
    t_c2, _ = timeit(conv2_direct, params, h1)
    t_sub, _ = timeit(subsample_all, params, x)

    # numerics check
    a = np.asarray(conv1_direct(params, x), dtype=np.float32)
    b = np.asarray(conv1_im2col(params, x), dtype=np.float32)
    err = np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-9)

    print(f"full forward      : {t_full:8.3f} ms")
    print(f"conv1 direct      : {t_c1:8.3f} ms")
    print(f"conv1 im2col      : {t_c1b:8.3f} ms   rel_err={err:.2e}")
    print(f"conv2 direct      : {t_c2:8.3f} ms")
    print(f"subsample total   : {t_sub:8.3f} ms  ({100*t_sub/t_full:.1f}% of fwd)")


if __name__ == "__main__":
    main()
