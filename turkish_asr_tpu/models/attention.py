"""Attention: RoPE + Multi-Query attention for the Conformer encoder.

Capability parity with /root/reference/model/attention.py:
- RotaryEmbedding (:21-59): GPT-NeoX-style cos/sin over the full head dim
  (freqs duplicated, rotate_half on concatenated halves), base 10000.
- RelativeMultiHeadAttention (:147-251): full d_model query projection,
  MQA K/V projected to a single head (:180-184), RoPE on Q and K (:227-230),
  scaled dot-product attention with additive masking, output projection.

TPU-first differences from the reference:
- pure functions over a param pytree; no module state. cos/sin are computed
  inline for the static sequence length under jit (no growable cache needed).
- the single MQA KV head is *broadcast* into the attention contraction via
  einsum instead of materializing an expanded (B, H, T, D) copy
  (reference expands, :233-235) — saves HBM bandwidth.
- a Pallas fused flash-attention kernel (ops/flash_attention.py) is used on
  TPU when enabled; this einsum path is the always-available fallback and
  oracle.
"""

import math
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=16)
def _rope_tables_np(seq_len, dim, base):
    inv_freq = 1.0 / (base ** (np.arange(0, dim, 2, dtype=np.float64) / dim))
    t = np.arange(seq_len, dtype=np.float64)
    freqs = np.outer(t, inv_freq)                 # (T, dim/2)
    emb = np.concatenate([freqs, freqs], axis=-1)  # (T, dim)
    return np.cos(emb).astype(np.float32), np.sin(emb).astype(np.float32)


def rope_cos_sin(seq_len, dim, base=10000.0, dtype=jnp.float32):
    """Rotary cos/sin tables of shape (seq_len, dim).

    Concrete lengths use a host-precomputed fp64 table; symbolic lengths
    (jax.export shape polymorphism) fall back to tracing the same math.
    """
    try:
        t_static = int(seq_len)
    except Exception:  # symbolic dimension under export
        inv_freq = 1.0 / (base ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim))
        t = jnp.arange(seq_len, dtype=jnp.float32)
        freqs = t[:, None] * inv_freq[None, :]
        emb = jnp.concatenate([freqs, freqs], axis=-1)
        return jnp.cos(emb).astype(dtype), jnp.sin(emb).astype(dtype)
    cos, sin = _rope_tables_np(t_static, int(dim), float(base))
    return jnp.asarray(cos, dtype), jnp.asarray(sin, dtype)


def rotate_half(x):
    """(-x2, x1) for x split into halves along the last dim."""
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope(x, cos, sin):
    """Apply rotary embedding; cos/sin broadcast over leading dims."""
    return x * cos + rotate_half(x) * sin


def _uniform(key, shape, bound, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def _linear_init(key, d_in, d_out):
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(d_in)
    return {"w": _uniform(kw, (d_in, d_out), bound), "b": _uniform(kb, (d_out,), bound)}


def init_attention(key, d_model, n_heads, use_mqa=True):
    """Initialize MQA/MHA projection params (PyTorch-style uniform init)."""
    d_head = d_model // n_heads
    kv_dim = d_head if use_mqa else d_model
    kq, kk, kv, ko = jax.random.split(key, 4)
    return {
        "q": _linear_init(kq, d_model, d_model),
        "k": _linear_init(kk, d_model, kv_dim),
        "v": _linear_init(kv, d_model, kv_dim),
        "out": _linear_init(ko, d_model, d_model),
    }


def _dense(p, x, compute_dtype):
    # fp32 accumulation on the MXU, activations carried in compute_dtype
    out = jnp.dot(x.astype(compute_dtype), p["w"].astype(compute_dtype),
                  preferred_element_type=jnp.float32) + p["b"]
    return out.astype(compute_dtype)


def mqa_attention(
    params,
    x,
    mask=None,
    *,
    n_heads,
    use_mqa=True,
    dropout=0.0,
    train=False,
    rng=None,
    compute_dtype=jnp.float32,
    kernel=None,
):
    """Self-attention with RoPE and (optionally) a shared KV head.

    Args:
        params: dict from init_attention.
        x: (B, T, D) input (already normalized by the caller).
        mask: optional (B, T) bool validity mask (True = keep).
        kernel: optional callable (q, k, v, mask) -> context implementing a
            fused attention (Pallas); q (B,H,T,Dh), k/v (B,Kh,T,Dh).

    Returns:
        (B, T, D) attention output.
    """
    B, T, D = x.shape
    d_head = D // n_heads

    q = _dense(params["q"], x, compute_dtype).reshape(B, T, n_heads, d_head)
    kv_heads = 1 if use_mqa else n_heads
    k = _dense(params["k"], x, compute_dtype).reshape(B, T, kv_heads, d_head)
    v = _dense(params["v"], x, compute_dtype).reshape(B, T, kv_heads, d_head)

    # Tables in the activation dtype (reference casts its cache to x.dtype,
    # attention.py:57-58); f32 tables would silently upcast q/k and double
    # HBM traffic on the einsum path under the bf16 policy.
    cos, sin = rope_cos_sin(T, d_head, dtype=q.dtype)
    q = apply_rope(q, cos[None, :, None, :], sin[None, :, None, :])
    k = apply_rope(k, cos[None, :, None, :], sin[None, :, None, :])

    q = q.transpose(0, 2, 1, 3)  # (B, H, T, Dh)
    k = k.transpose(0, 2, 1, 3)  # (B, Kh, T, Dh)
    v = v.transpose(0, 2, 1, 3)

    context = None
    # A kernel may decline (return None) for shapes where the fallback is
    # faster — e.g. short sequences vs the Pallas flash kernel.
    if kernel is not None:
        if not train or dropout <= 0.0:
            context = kernel(q.astype(compute_dtype),
                             k.astype(compute_dtype),
                             v.astype(compute_dtype), mask)
        elif rng is not None and getattr(kernel, "supports_dropout", False):
            # Training with attention-weight dropout: the Pallas kernel
            # generates the keep mask in-kernel from the TPU PRNG
            # (regenerated, never stored — see ops/_flash_attention_impl).
            # Statistically equivalent to the einsum path's bernoulli
            # mask, different realization. Capability is declared by the
            # `supports_dropout` attribute (make_flash_attention sets it);
            # kernels without it — tests pass plain (q, k, v, mask)
            # callables — take the einsum path. Attribute detection, not
            # try/except TypeError: tracing errors inside a kernel also
            # raise TypeError and must propagate, not silently divert
            # every training step to einsum.
            context = kernel(q.astype(compute_dtype),
                             k.astype(compute_dtype),
                             v.astype(compute_dtype), mask,
                             dropout=dropout, rng=rng)
    if context is None:
        scale = 1.0 / math.sqrt(d_head)
        # Broadcast the shared KV head instead of expanding it.
        if use_mqa and n_heads > 1:
            scores = jnp.einsum("bhtd,bksd->bhts", q, k,
                                preferred_element_type=jnp.float32) * scale
        else:
            scores = jnp.einsum("bhtd,bhsd->bhts", q, k,
                                preferred_element_type=jnp.float32) * scale
        if mask is not None:
            scores = jnp.where(mask[:, None, None, :], scores, -1e9)
        attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
        # Cast to the activation dtype BEFORE dropout: the mask apply (and
        # its saved residual / backward) then move (B, H, T, T) at bf16
        # instead of fp32. Softmax math itself stays fp32 (torch-AMP
        # autocast parity).
        attn = attn.astype(compute_dtype)
        if train and dropout > 0.0 and rng is not None:
            keep = jax.random.bernoulli(rng, 1.0 - dropout, attn.shape)
            attn = jnp.where(keep, attn * (1.0 / (1.0 - dropout)), 0.0)
        if use_mqa and n_heads > 1:
            context = jnp.einsum("bhts,bksd->bhtd", attn, v.astype(compute_dtype),
                                 preferred_element_type=jnp.float32)
        else:
            context = jnp.einsum("bhts,bhsd->bhtd", attn, v.astype(compute_dtype),
                                 preferred_element_type=jnp.float32)

    context = context.transpose(0, 2, 1, 3).reshape(B, T, D)
    return _dense(params["out"], context, compute_dtype)
