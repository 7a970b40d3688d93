"""Fused MQA flash attention (Pallas TPU kernel) — public wiring.

Replaces the reference's dependency on PyTorch SDPA CUDA flash kernels
(/root/reference/model/attention.py:103-115). See _flash_attention_impl.py
for the kernel itself.

``make_flash_attention()`` returns a callable with the attention-kernel
contract used by models/attention.py:
    kernel(q (B,H,T,D), k (B,Kh,T,D), v (B,Kh,T,D), mask (B,T) bool|None)
        -> context (B,H,T,D)
or None when Pallas is unavailable on the current backend.

Dispatch: measured on TPU v5e at constant total query rows (B*T = 25.6k,
MQA H=4 D=64): einsum/kernel time ratio 0.83 at T=256, 1.05 at T=512,
1.42 at T=1024, 1.64 at T=2048 — the kernel wins from T ~ 512 post-
subsample frames (~20 s of audio) upward, so the shipped 24 s / 32 s
buckets and all long-form paths engage it; shorter utterances keep XLA's
einsum fusion, which is already optimal there. The callable auto-selects
per (static) sequence length — T is a trace-time constant, so the
dispatch is free at runtime. End-to-end artifact: bench.py config 5
(Conformer-L, B=16 x 64 s) runs 1.23x faster kernel-on than kernel-off.
"""

import jax
import jax.numpy as jnp

MIN_KERNEL_SEQ_LEN = 512


def make_flash_attention(block_q=None, min_seq_len=MIN_KERNEL_SEQ_LEN):
    """Build the length-dispatching Pallas attention callable, or None.

    block_q=None picks the tile size per (static) T: 512 rows while the
    fp32 score tile (block_q x T) stays within ~8 MB of VMEM (measured
    ~3% faster than 256 at T=1600), stepping down for very long
    sequences so the tile plus resident K/V never spills. With dropout
    active the uint32 keep-mask tile doubles the per-row budget, so the
    tile shrinks accordingly.

    The callable accepts optional ``dropout``/``rng`` kwargs (training):
    attention-weight dropout runs INSIDE the kernel via the TPU hardware
    PRNG, with the mask regenerated (not stored) in the backward — the
    capability the reference gets from SDPA's fused dropout
    (/root/reference/model/attention.py:238-241, training-only flash).
    """
    if jax.default_backend() != "tpu":
        return None
    try:
        from turkish_asr_tpu.ops._flash_attention_impl import flash_attention
    except ImportError:
        return None

    def kernel(q, k, v, mask, dropout=0.0, rng=None):
        T = q.shape[2]
        if T < min_seq_len:
            return None  # caller falls back to the einsum path
        rate = float(dropout)
        if rate > 0.0 and rng is None:
            return None  # dropout without a key: let the einsum path run
        bq = block_q
        if bq is None:
            bytes_per_row = 4 * T * (2 if rate > 0.0 else 1)
            budget = 8 * 1024 * 1024 // bytes_per_row  # score(+mask) rows
            bq = min(512, (budget // 64) * 64)
            if bq < 64:
                # T so long that even a 64-row tile blows the budget
                # (T > 32k frames ~ 21 min of audio in one window):
                # decline rather than spill VMEM; einsum path handles it.
                return None
        seed = None
        if rate > 0.0:
            seed = jax.lax.bitcast_convert_type(
                jax.random.bits(rng, (1,), jnp.uint32), jnp.int32)
        return flash_attention(q, k, v, mask, block_q=bq,
                               dropout_rate=rate, seed=seed)

    # Capability flag read by models/attention.py: kernels WITHOUT it
    # (legacy/test callables with a (q, k, v, mask)-only signature) are
    # never offered dropout. Feature detection by attribute, not by
    # catching TypeError — tracing errors inside the kernel also raise
    # TypeError and must propagate, not silently divert to einsum.
    kernel.supports_dropout = True
    return kernel
