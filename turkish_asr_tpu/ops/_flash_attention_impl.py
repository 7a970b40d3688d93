"""Pallas TPU fused attention kernel (MQA-aware).

Replaces the reference's SDPA CUDA flash-attention dependency
(/root/reference/model/attention.py:103-115) with a TPU kernel:

- grid (B, q_blocks): each program computes one q tile against the full
  K/V of its batch element. ASR sequence lengths (post-subsample
  T <= ~8k frames) keep one sequence's K/V in VMEM, so no streaming inner
  loop is needed — one MXU matmul for scores, masked softmax on the VPU,
  one MXU matmul for the context.
- MQA: query heads are folded into the q-tile row axis, so the single
  shared KV head is loaded once per tile and serves every head — no
  H-way expanded KV copy (the reference expands, :233-235).
- padding mask (B, T) enters as float {0,1}; masked scores get -1e9 like
  the reference's dense path (:133).

Used on the inference path; training uses the einsum path (autodiff).
"""

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# custom VJP: Pallas forward + recomputed-einsum backward, so the kernel is
# usable under jax.grad (training). The backward matches autodiff of the
# reference softmax-attention math exactly; forward speed is where the
# kernel pays off (long-form sequences).


def _attend(q, k, v, maskf, scale, out_dtype):
    scores = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale                                        # (block_q, T)
    scores = scores + (maskf - 1.0) * 1e9            # maskf: (1, T)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    s = jnp.sum(e, axis=-1, keepdims=True)
    p = (e / s).astype(v.dtype)
    return jax.lax.dot_general(
        p, v, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k"))
def flash_attention(q, k, v, mask=None, *, block_q=256, block_k=None):
    """Fused attention (differentiable — custom VJP).

    Args:
        q: (B, H, T, D)
        k, v: (B, Kh, T, D) with Kh == 1 (MQA) or Kh == H
        mask: optional (B, T) bool validity mask.

    Returns:
        (B, H, T, D) context, fp32.
    """
    return _flash_attention_vjp(q, k, v, mask, block_q)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _flash_attention_vjp(q, k, v, mask, block_q):
    return _flash_attention_fwd_impl(q, k, v, mask, block_q)


def _flash_fwd_rule(q, k, v, mask, block_q):
    out = _flash_attention_fwd_impl(q, k, v, mask, block_q)
    return out, (q, k, v, mask)


def _flash_bwd_rule(block_q, residuals, g):
    q, k, v, mask = residuals
    B, H, T, D = q.shape
    Kh = k.shape[1]
    scale = 1.0 / math.sqrt(D)
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    if Kh != H:
        kf = jnp.broadcast_to(kf, (B, H, T, D))
        vf = jnp.broadcast_to(vf, (B, H, T, D))
    scores = jnp.einsum("bhtd,bhsd->bhts", qf, kf,
                        preferred_element_type=jnp.float32) * scale
    if mask is not None:
        scores = jnp.where(mask[:, None, None, :], scores, -1e9)
    p = jax.nn.softmax(scores, axis=-1)
    gf = g.astype(jnp.float32)
    dv = jnp.einsum("bhts,bhtd->bhsd", p, gf,
                    preferred_element_type=jnp.float32)
    dp = jnp.einsum("bhtd,bhsd->bhts", gf, vf,
                    preferred_element_type=jnp.float32)
    delta = jnp.sum(dp * p, axis=-1, keepdims=True)
    ds = p * (dp - delta) * scale
    dq = jnp.einsum("bhts,bhsd->bhtd", ds, kf,
                    preferred_element_type=jnp.float32)
    dk = jnp.einsum("bhts,bhtd->bhsd", ds, qf,
                    preferred_element_type=jnp.float32)
    if Kh != H:  # fold gradients of the broadcast KV head
        dk = jnp.sum(dk, axis=1, keepdims=True)
        dv = jnp.sum(dv, axis=1, keepdims=True)
    dmask = None
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype), dmask)


_flash_attention_vjp.defvjp(_flash_fwd_rule, _flash_bwd_rule)


def _flash_attention_fwd_impl(q, k, v, mask, block_q):
    B, H, T, D = q.shape
    Kh = k.shape[1]
    scale = 1.0 / math.sqrt(D)

    if mask is None:
        maskf = jnp.ones((B, 1, T), dtype=jnp.float32)
    else:
        maskf = mask.astype(jnp.float32)[:, None, :]

    if Kh == 1:
        # Fold heads into rows: (B, H*T, D); all rows share the one KV head.
        qf = q.reshape(B, H * T, D)
        grid = (B, pl.cdiv(H * T, block_q))

        def kernel(q_r, k_r, v_r, m_r, o_r):
            o_r[0] = _attend(q_r[0], k_r[0, 0], v_r[0, 0], m_r[0],
                             scale, o_r.dtype)

        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, block_q, D), lambda b, i: (b, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, T, D), lambda b, i: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, T, D), lambda b, i: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, T), lambda b, i: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, block_q, D), lambda b, i: (b, i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, H * T, D), jnp.float32),
        )(qf, k, v, maskf)
        return out.reshape(B, H, T, D)

    # MHA: per-head KV.
    grid = (B, H, pl.cdiv(T, block_q))

    def kernel(q_r, k_r, v_r, m_r, o_r):
        o_r[0, 0] = _attend(q_r[0, 0], k_r[0, 0], v_r[0, 0], m_r[0],
                            scale, o_r.dtype)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_q, D), lambda b, h, i: (b, h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, T, D), lambda b, h, i: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, T, D), lambda b, h, i: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, T), lambda b, h, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, D), lambda b, h, i: (b, h, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, T, D), jnp.float32),
    )(q, k, v, maskf)
    return out
