"""Fused MQA flash attention (Pallas TPU kernel).

Replaces the reference's dependency on PyTorch SDPA CUDA flash kernels
(/root/reference/model/attention.py:103-115). The kernel streams the single
shared KV head through VMEM while computing all query heads against it —
the MQA structure means K/V are loaded once per query tile regardless of
head count (the reference materializes an expanded copy instead).

``make_flash_attention()`` returns a callable with the attention-kernel
contract used by models/attention.py:
    kernel(q (B,H,T,D), k (B,Kh,T,D), v (B,Kh,T,D), mask (B,T) bool|None)
        -> context (B,H,T,D)
or None when Pallas is unavailable on the current backend (the einsum path
is then used — correctness never depends on the kernel).
"""

import jax


def make_flash_attention(block_q=128, block_k=128):
    """Build the Pallas flash-attention callable, or None off-TPU."""
    try:
        import jax.numpy as jnp  # noqa: F401
        from turkish_asr_tpu.ops._flash_attention_impl import flash_attention
    except ImportError:
        return None
    if jax.default_backend() not in ("tpu",):
        return None

    def kernel(q, k, v, mask):
        return flash_attention(q, k, v, mask, block_q=block_q, block_k=block_k)

    return kernel
