"""Isolate where the Pallas CTC forward time goes: XLA prep (gather /
transpose) vs the pallas_call itself, and how cost scales with the time
chunk / grid shape.

Usage: python scripts/probe_ctc_kernel.py
"""

import sys
import time
import functools

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from turkish_asr_tpu.ops import _ctc_pallas_impl as impl


def timeit(fn, n=20):
    out = fn()
    np.asarray(out)
    for _ in range(3):
        out = fn()
    np.asarray(out)
    start = time.perf_counter()
    for _ in range(n):
        out = fn()
    np.asarray(out)
    return (time.perf_counter() - start) / n * 1e3


def main():
    B, T, V, L = 32, 200, 55, 64
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.standard_normal((B, T, V)).astype(np.float32))
    lp = jax.nn.log_softmax(logits, -1)
    tg = jnp.asarray(rng.integers(1, V, (B, L)).astype(np.int32))
    il = jnp.full((B,), T, dtype=jnp.int32)
    tl = jnp.full((B,), L, dtype=jnp.int32)

    @jax.jit
    def prep_only(lp):
        ext_p, skip, emit_tbs, alpha0, ilc, Sp = impl._prep(lp, tg, il, tl, 0)
        return emit_tbs.sum() + alpha0.sum()

    print(f"prep only (gather+transpose): {timeit(lambda: prep_only(lp)):6.2f} ms")

    ext_p, skip, emit_tbs, alpha0, ilc, Sp = jax.jit(
        functools.partial(impl._prep, blank_id=0))(lp, tg, il, tl)
    emit_tbs = jax.block_until_ready(emit_tbs)

    for tc in (8, 16, 32, 64, 200):
        Tpad = ((T + tc - 1) // tc) * tc
        emit_p = jnp.pad(emit_tbs, ((0, Tpad - T), (0, 0), (0, 0)))

        @jax.jit
        def run(emit_p=emit_p, tc=tc):
            a = impl._run_forward(emit_p, alpha0, skip, ilc,
                                  t_chunk=tc, interpret=False)
            return a[-1].sum()

        print(f"pallas fwd kernel only, Tc={tc:4d}: {timeit(run):6.2f} ms")


if __name__ == "__main__":
    main()
