"""Pallas TPU fused attention kernel (MQA-aware), forward + tiled backward.

Replaces the reference's SDPA CUDA flash-attention dependency
(/root/reference/model/attention.py:103-115) with TPU kernels:

Forward:
- grid (B, q_blocks): each program computes one q tile against the full
  K/V of its batch element. ASR sequence lengths (post-subsample
  T <= ~8k frames) keep one sequence's K/V in VMEM, so no streaming inner
  loop is needed — one MXU matmul for scores, masked softmax on the VPU,
  one MXU matmul for the context. The row logsumexp is emitted alongside
  the context so the backward never re-normalizes.
- MQA: query heads are folded into the q-tile row axis, so the single
  shared KV head is loaded once per tile and serves every head — no
  H-way expanded KV copy (the reference expands, :233-235).
- padding mask (B, T) enters as float {0,1}; masked scores get -1e9 like
  the reference's dense path (:133).

Backward (flash-style, O(T) HBM — no (T, T) score matrix ever leaves
VMEM):
- delta = rowsum(dout * out) is a cheap XLA fusion outside the kernel.
- one kernel pass over q tiles recomputes the probability tile from the
  saved logsumexp, emits the dq tile, and accumulates dk/dv into
  revisited output blocks (the TPU grid is sequential, so read-modify-
  write accumulation across q tiles is well-defined).

Attention-weight dropout (training): generated INSIDE the kernel from the
TPU hardware PRNG (pltpu.prng_seed / prng_random_bits), seeded per
(seed, batch, tile) program — the (block_q, T) keep mask never exists in
HBM, which is the entire point (the einsum path materializes a
(B, H, T, T) mask plus the dropped probs; at T'=1600 that is the dominant
train-step HBM traffic). The backward re-seeds the same per-program
stream and regenerates bit-identical masks, so no residual is saved.
Gradient math under dropout (y = p.m where m = keep/(1-rate)):
    delta = rowsum(dout*out) still equals rowsum(y.dy)   (y@v = out)
    du    = (g @ v^T) . m
    ds    = p . (du - delta)        dq/dk from ds,   dv = y^T @ g
Equivalence note: the keep mask is Bernoulli(1-rate) i.i.d. per element,
identical in DISTRIBUTION to the einsum path's jax.random.bernoulli but a
different realization (hardware PRNG stream vs threefry/rbg key) — the
two paths train statistically equivalently but not bit-identically.
rate == 0 compiles the exact pre-dropout program (no seed input, no
bits draw).
"""

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


NEG = -1e9

# Seed decorrelation: per-program stream index is mixed into the user seed
# with a 32-bit golden-ratio odd multiplier before pltpu.prng_seed.
_SEED_MIX = -1640531527


def _keep_mask(shape, rate):
    """Draw a Bernoulli(1-rate) keep mask from the seeded per-core PRNG.
    Identical call order/shape in forward and backward regenerates the
    same bits."""
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    thresh = jnp.uint32(min(int(rate * 2.0 ** 32), 2 ** 32 - 1))
    return bits >= thresh


def _attend(q, k, v, maskf, scale, out_dtype, rate=0.0):
    """One q tile vs full K/V. Returns (context, logsumexp-rows).
    rate > 0 applies in-kernel attention-weight dropout (caller must have
    seeded the PRNG for this program)."""
    scores = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale                                        # (block_q, T)
    scores = scores + (maskf - 1.0) * 1e9            # masked keys -> -1e9
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    s = jnp.sum(e, axis=-1, keepdims=True)
    p = e / s
    lse = (m + jnp.log(s))[:, 0]                     # (block_q,)
    if rate > 0.0:
        keep = _keep_mask(p.shape, rate)
        p = jnp.where(keep, p * (1.0 / (1.0 - rate)), 0.0)
    ctx = jax.lax.dot_general(
        p.astype(v.dtype), v, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(out_dtype)
    return ctx, lse


@functools.partial(jax.jit,
                   static_argnames=("block_q", "block_k", "dropout_rate"))
def flash_attention(q, k, v, mask=None, *, block_q=256, block_k=None,
                    dropout_rate=0.0, seed=None):
    """Fused attention (differentiable — Pallas forward AND backward).

    Args:
        q: (B, H, T, D)
        k, v: (B, Kh, T, D) with Kh == 1 (MQA) or Kh == H
        mask: optional (B, T) bool validity mask.
        dropout_rate: attention-weight dropout (training); masks are
            generated in-kernel from the TPU PRNG and regenerated in the
            backward — see module docstring.
        seed: (1,) int32 array, required when dropout_rate > 0; vary it
            per step/layer (derive from the training rng key).

    Returns:
        (B, H, T, D) context, fp32.
    """
    rate = float(dropout_rate)
    if rate > 0.0 and seed is None:
        raise ValueError("dropout_rate > 0 requires a seed array")
    if not 0.0 <= rate < 1.0:
        raise ValueError(f"dropout_rate must be in [0, 1), got {rate}")
    if seed is None:
        seed = jnp.zeros((1,), jnp.int32)
    return _flash_attention_vjp(q, k, v, mask, seed, block_q, rate)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _flash_attention_vjp(q, k, v, mask, seed, block_q, rate):
    out, _ = _flash_attention_fwd_impl(q, k, v, mask, seed, block_q, rate)
    return out


def _flash_fwd_rule(q, k, v, mask, seed, block_q, rate):
    out, lse = _flash_attention_fwd_impl(q, k, v, mask, seed, block_q, rate)
    return out, (q, k, v, mask, seed, out, lse)


def _flash_bwd_rule(block_q, rate, residuals, g):
    q, k, v, mask, seed, out, lse = residuals
    dq, dk, dv = _flash_attention_bwd_impl(q, k, v, mask, seed, out, lse, g,
                                           block_q, rate)
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
            None, None)


_flash_attention_vjp.defvjp(_flash_fwd_rule, _flash_bwd_rule)


def _maskf_of(mask, B, T):
    if mask is None:
        return jnp.ones((B, 1, T), dtype=jnp.float32)
    return mask.astype(jnp.float32)[:, None, :]


def dump_keep_mask(B, H, T, block_q, seed, rate, mha=False):
    """Debug/test helper: materialize the EXACT keep mask the fwd/bwd
    kernels generate for this (seed, grid, block_q) — same per-program
    seeding and same single (block_q, T) draw. Lets tests rebuild the
    dropped attention explicitly (einsum + this mask) and compare values
    AND gradients against the kernel, which finite differences cannot do
    at fp32 scale. Returns (B, H, T, T) bool.
    """
    seed = jnp.asarray(seed, jnp.int32).reshape((1,))
    if not mha:
        N = H * T
        nq = pl.cdiv(N, block_q)

        def kernel(seed_r, o_r):
            pid = pl.program_id(0) * nq + pl.program_id(1)
            pltpu.prng_seed(seed_r[0] + pid * jnp.int32(_SEED_MIX))
            o_r[0] = _keep_mask((block_q, T), rate).astype(jnp.float32)

        out = pl.pallas_call(
            kernel,
            grid=(B, nq),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec((1, block_q, T), lambda b, i: (b, i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, nq * block_q, T),
                                           jnp.float32),
        )(seed)
        return out[:, :N].reshape(B, H, T, T) > 0.5

    nq = pl.cdiv(T, block_q)

    def kernel(seed_r, o_r):
        pid = (pl.program_id(0) * H + pl.program_id(1)) * nq \
            + pl.program_id(2)
        pltpu.prng_seed(seed_r[0] + pid * jnp.int32(_SEED_MIX))
        o_r[0, 0] = _keep_mask((block_q, T), rate).astype(jnp.float32)

    out = pl.pallas_call(
        kernel,
        grid=(B, H, nq),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((1, 1, block_q, T),
                               lambda b, h, i: (b, h, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, nq * block_q, T),
                                       jnp.float32),
    )(seed)
    return out[:, :, :T] > 0.5


def _seed_specs(rate):
    """The SMEM seed input is only present when dropout is active, so the
    rate == 0 program is byte-identical to the pre-dropout kernel."""
    if rate <= 0.0:
        return []
    return [pl.BlockSpec(memory_space=pltpu.SMEM)]


def _flash_attention_fwd_impl(q, k, v, mask, seed, block_q, rate):
    """Returns (out (B,H,T,D) fp32, lse) — lse layout is (B, H*T) for MQA
    (folded rows) or (B, H, T) for MHA."""
    B, H, T, D = q.shape
    Kh = k.shape[1]
    scale = 1.0 / math.sqrt(D)
    maskf = _maskf_of(mask, B, T)

    if Kh == 1:
        # Fold heads into rows: (B, H*T, D); all rows share the one KV head.
        N = H * T
        qf = q.reshape(B, N, D)
        nq = pl.cdiv(N, block_q)
        grid = (B, nq)

        def kernel(*refs):
            if rate > 0.0:
                seed_r, q_r, k_r, v_r, m_r, o_r, lse_r = refs
                pid = pl.program_id(0) * nq + pl.program_id(1)
                pltpu.prng_seed(seed_r[0] + pid * jnp.int32(_SEED_MIX))
            else:
                q_r, k_r, v_r, m_r, o_r, lse_r = refs
            ctx, lse = _attend(q_r[0], k_r[0, 0], v_r[0, 0], m_r[0],
                               scale, o_r.dtype, rate)
            o_r[0] = ctx
            lse_r[0, 0] = lse

        # lse rides in a (B, 1, N) layout: Mosaic requires the last two
        # block dims to be (divisible by 8, divisible by 128) or equal to
        # the array dims — a (1, block_q) block over (B, N) violates the
        # sublane rule whenever B > 1, but over (B, 1, N) the (1, block_q)
        # trailing block dims match (1, N). (Caught the first time the
        # kernel lowered on real hardware; interpret mode doesn't check.)
        operands = ([seed] if rate > 0.0 else []) + [qf, k, v, maskf]
        out, lse = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=_seed_specs(rate) + [
                pl.BlockSpec((1, block_q, D), lambda b, i: (b, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, T, D), lambda b, i: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, T, D), lambda b, i: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, T), lambda b, i: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, block_q, D), lambda b, i: (b, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, block_q), lambda b, i: (b, 0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((B, N, D), jnp.float32),
                jax.ShapeDtypeStruct((B, 1, N), jnp.float32),
            ],
        )(*operands)
        return out.reshape(B, H, T, D), lse

    # MHA: per-head KV.
    nq = pl.cdiv(T, block_q)
    grid = (B, H, nq)

    def kernel(*refs):
        if rate > 0.0:
            seed_r, q_r, k_r, v_r, m_r, o_r, lse_r = refs
            pid = (pl.program_id(0) * H + pl.program_id(1)) * nq \
                + pl.program_id(2)
            pltpu.prng_seed(seed_r[0] + pid * jnp.int32(_SEED_MIX))
        else:
            q_r, k_r, v_r, m_r, o_r, lse_r = refs
        ctx, lse = _attend(q_r[0, 0], k_r[0, 0], v_r[0, 0], m_r[0],
                           scale, o_r.dtype, rate)
        o_r[0, 0] = ctx
        lse_r[0, 0, 0] = lse

    # lse layout (B, H, 1, T): see the MQA branch note on Mosaic's
    # trailing-block-dim rule.
    operands = ([seed] if rate > 0.0 else []) + [q, k, v, maskf]
    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=_seed_specs(rate) + [
            pl.BlockSpec((1, 1, block_q, D), lambda b, h, i: (b, h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, T, D), lambda b, h, i: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, T, D), lambda b, h, i: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, T), lambda b, h, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, block_q, D), lambda b, h, i: (b, h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, block_q), lambda b, h, i: (b, h, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, T, D), jnp.float32),
            jax.ShapeDtypeStruct((B, H, 1, T), jnp.float32),
        ],
    )(*operands)
    return out, lse


def _bwd_tile(qb, gb, lseb, deltab, kf, vf, mf, rowmaskb, scale, rate=0.0):
    """Shared per-tile backward math (fp32 in VMEM).

    Args:
        qb, gb: (bq, D) q tile / dout tile
        lseb, deltab: (bq,) saved logsumexp / rowsum(dout*out)
        kf, vf: (T, D)
        mf: (1, T) key validity {0,1}
        rowmaskb: (bq, 1) bool — rows beyond N in a partial tile
        rate: dropout rate; > 0 regenerates the forward's keep mask from
            the (re-seeded) PRNG. With y = p.keep/(1-rate) the chain is
            dy = g@v^T, du = dy.m (m = keep/(1-rate)), ds = p.(du-delta);
            dv uses the DROPPED probs y. delta = rowsum(g*out) is
            unchanged because out = y@v.
    Returns:
        (dq (bq, D), dk_c (T, D), dv_c (T, D)) — dk/dv contributions.
    """
    # OOB rows of a partial tile hold unspecified values (NaN in interpret
    # mode); they contract into dk/dv below even with zero weights
    # (0 * NaN = NaN), so zero them at the source.
    qb = jnp.where(rowmaskb, qb, 0.0)
    gb = jnp.where(rowmaskb, gb, 0.0)
    s = jax.lax.dot_general(
        qb, kf, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale + (mf - 1.0) * 1e9                      # (bq, T)
    # Garbage rows of a partial tile must not poison dk/dv: force their
    # probabilities to exactly zero (exp(-1e9 - lse) could be inf*0=nan if
    # lse itself is garbage, so mask before the exp).
    s = jnp.where(rowmaskb, s - lseb[:, None], NEG)
    p = jnp.exp(s)                                    # (bq, T)
    dp = jax.lax.dot_general(
        gb, vf, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                 # (bq, T) == dy
    if rate > 0.0:
        # Same single draw per program as the forward -> identical bits.
        mkeep = jnp.where(_keep_mask(p.shape, rate),
                          jnp.float32(1.0 / (1.0 - rate)), 0.0)
        y = p * mkeep
        dp = dp * mkeep
    else:
        y = p
    ds = p * (dp - deltab[:, None]) * scale
    ds = jnp.where(rowmaskb, ds, 0.0)
    dq = jax.lax.dot_general(
        ds, kf, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                 # (bq, D)
    dk_c = jax.lax.dot_general(
        ds, qb, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                 # (T, D)
    dv_c = jax.lax.dot_general(
        y, gb, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                 # (T, D)
    return dq, dk_c, dv_c


def _flash_attention_bwd_impl(q, k, v, mask, seed, out, lse, g, block_q,
                              rate):
    B, H, T, D = q.shape
    Kh = k.shape[1]
    scale = 1.0 / math.sqrt(D)
    maskf = _maskf_of(mask, B, T)
    gf = g.astype(jnp.float32)
    delta = jnp.sum(gf * out, axis=-1)                # (B, H, T)

    if Kh == 1:
        N = H * T
        qf = q.reshape(B, N, D)
        gn = gf.reshape(B, N, D)
        deltan = delta.reshape(B, 1, N)
        nq = pl.cdiv(N, block_q)

        def kernel(*refs):
            if rate > 0.0:
                (seed_r, q_r, g_r, lse_r, d_r, k_r, v_r, m_r,
                 dq_r, dk_r, dv_r) = refs
                pid = pl.program_id(0) * nq + pl.program_id(1)
                pltpu.prng_seed(seed_r[0] + pid * jnp.int32(_SEED_MIX))
            else:
                (q_r, g_r, lse_r, d_r, k_r, v_r, m_r,
                 dq_r, dk_r, dv_r) = refs
            i = pl.program_id(1)
            rows = i * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, 1), 0)
            rowmaskb = rows < N
            dq, dk_c, dv_c = _bwd_tile(
                q_r[0].astype(jnp.float32), g_r[0], lse_r[0, 0], d_r[0, 0],
                k_r[0, 0].astype(jnp.float32), v_r[0, 0].astype(jnp.float32),
                m_r[0], rowmaskb, scale, rate)
            dq_r[0] = dq

            @pl.when(i == 0)
            def _init():
                dk_r[0] = jnp.zeros_like(dk_r[0])
                dv_r[0] = jnp.zeros_like(dv_r[0])

            dk_r[0] += dk_c
            dv_r[0] += dv_c

        operands = ([seed] if rate > 0.0 else []) + [qf, gn, lse, deltan,
                                                     k, v, maskf]
        dq, dk, dv = pl.pallas_call(
            kernel,
            grid=(B, nq),
            in_specs=_seed_specs(rate) + [
                pl.BlockSpec((1, block_q, D), lambda b, i: (b, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_q, D), lambda b, i: (b, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, block_q), lambda b, i: (b, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, block_q), lambda b, i: (b, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, T, D), lambda b, i: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, T, D), lambda b, i: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, T), lambda b, i: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, block_q, D), lambda b, i: (b, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, T, D), lambda b, i: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, T, D), lambda b, i: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((B, N, D), jnp.float32),
                jax.ShapeDtypeStruct((B, T, D), jnp.float32),
                jax.ShapeDtypeStruct((B, T, D), jnp.float32),
            ],
        )(*operands)
        return dq.reshape(B, H, T, D), dk[:, None], dv[:, None]

    # MHA: per-head KV; dk/dv accumulate across q tiles per (b, h).
    nq = pl.cdiv(T, block_q)
    delta = delta.reshape(B, H, 1, T)

    def kernel(*refs):
        if rate > 0.0:
            (seed_r, q_r, g_r, lse_r, d_r, k_r, v_r, m_r,
             dq_r, dk_r, dv_r) = refs
            pid = (pl.program_id(0) * H + pl.program_id(1)) * nq \
                + pl.program_id(2)
            pltpu.prng_seed(seed_r[0] + pid * jnp.int32(_SEED_MIX))
        else:
            q_r, g_r, lse_r, d_r, k_r, v_r, m_r, dq_r, dk_r, dv_r = refs
        i = pl.program_id(2)
        rows = i * block_q + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, 1), 0)
        rowmaskb = rows < T
        dq, dk_c, dv_c = _bwd_tile(
            q_r[0, 0].astype(jnp.float32), g_r[0, 0],
            lse_r[0, 0, 0], d_r[0, 0, 0],
            k_r[0, 0].astype(jnp.float32), v_r[0, 0].astype(jnp.float32),
            m_r[0], rowmaskb, scale, rate)
        dq_r[0, 0] = dq

        @pl.when(i == 0)
        def _init():
            dk_r[0, 0] = jnp.zeros_like(dk_r[0, 0])
            dv_r[0, 0] = jnp.zeros_like(dv_r[0, 0])

        dk_r[0, 0] += dk_c
        dv_r[0, 0] += dv_c

    operands = ([seed] if rate > 0.0 else []) + [q, gf, lse, delta,
                                                 k, v, maskf]
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=(B, H, nq),
        in_specs=_seed_specs(rate) + [
            pl.BlockSpec((1, 1, block_q, D), lambda b, h, i: (b, h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q, D), lambda b, h, i: (b, h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, block_q), lambda b, h, i: (b, h, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, block_q), lambda b, h, i: (b, h, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, T, D), lambda b, h, i: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, T, D), lambda b, h, i: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, T), lambda b, h, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, block_q, D), lambda b, h, i: (b, h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, T, D), lambda b, h, i: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, T, D), lambda b, h, i: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, T, D), jnp.float32),
            jax.ShapeDtypeStruct((B, H, T, D), jnp.float32),
            jax.ShapeDtypeStruct((B, H, T, D), jnp.float32),
        ],
    )(*operands)
    return dq, dk, dv
