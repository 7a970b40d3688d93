"""Conformer-CTC encoder, TPU-native.

Capability parity with /root/reference/model/conformer.py:
- SwiGLUFeedForward (:8-26): Linear(d, 2*4d) -> silu(x1)*x2 -> Linear(4d, d),
  dropout after the gate product and after the output projection.
- TransposeGroupNorm (:28-49): GroupNorm over channels with divisor fallback
  32 -> 16 -> 8 -> 4 -> 2 -> 1; statistics span (time, channels-in-group)
  per sample, exactly like torch.nn.GroupNorm on (N, C, L).
- ConformerConvModule (:51-88): GroupNorm -> pointwise conv d->2d -> GLU ->
  depthwise conv k=31 -> BatchNorm -> SiLU -> pointwise d->d. Padding is NOT
  masked before the convs/BatchNorm (reference quirk 3 in SURVEY.md §2) —
  preserved deliberately for parity.
- ConformerBlock (:90-135): macaron x += 0.5*ff1(norm(x)); x += attn(norm(x));
  x += conv(x); x += 0.5*ff2(norm(x)); final GroupNorm.
- TurkishASRModel (:137-211): two stride-2 Conv2d(k=3, p=1) + SiLU subsample,
  (C, F)-ordered flatten into Linear(d_model*(n_mels//4), d_model), padding
  mask from input_lengths // 4 (the reference's `//4` contract, quirk 2),
  n_blocks Conformer blocks, Linear classifier head.

TPU-first design:
- pure init/apply functions over param + batch-stat pytrees (hand-rolled,
  dependency-light; jit/pjit/shard_map compose without module plumbing).
- the block stack runs as one `lax.scan` over stacked per-block params:
  compile time is O(1) in n_blocks.
- convs run in NHWC/NWC layouts (XLA TPU-preferred); matmuls accumulate in
  fp32 with bf16 inputs under the bf16 policy.
- BatchNorm statistics are global-batch reductions: under pjit the batch
  axis is a sharded global array axis, so XLA inserts the cross-device
  reduction automatically (no NCCL analog needed).
"""

import math
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from turkish_asr_tpu.models.attention import init_attention, mqa_attention, _linear_init, _uniform


@dataclass(frozen=True)
class ModelConfig:
    n_mels: int = 80
    d_model: int = 256
    n_heads: int = 4
    n_blocks: int = 8
    n_classes: int = 31
    dropout: float = 0.1
    conv_kernel_size: int = 31
    use_mqa: bool = True
    ff_mult: int = 4
    # Opt-in improvement beyond reference parity: exclude padded frames
    # from GroupNorm/BatchNorm statistics (the reference lets padding leak
    # into norm stats — SURVEY.md §2 quirk 3 — which makes outputs depend
    # on the padded batch length). With masked_norm=True, a padded batch
    # element produces the same output as the unpadded utterance.
    masked_norm: bool = False


def groupnorm_groups(num_channels, preferred=32):
    """Reference divisor fallback: first divisor in [32,16,8,4,2], else 1."""
    if num_channels % preferred == 0:
        return preferred
    for g in (32, 16, 8, 4, 2):
        if num_channels % g == 0:
            return g
    return 1


# ---------------------------------------------------------------------------
# Primitive layers
# ---------------------------------------------------------------------------

def _init_groupnorm(num_channels):
    return {"scale": jnp.ones((num_channels,)), "bias": jnp.zeros((num_channels,))}


def _group_reduce(per_channel, num_groups):
    """(B, C) per-channel sums -> (B, C) per-GROUP sums, broadcast back.

    The group reduction happens on this tiny (B, C) array, never on the
    (B, T, C) activation: reshaping the full activation to
    (B, T, G, C/G) puts C/G (= 8 for d_model=256) elements in the
    128-wide lane dimension — a relayout XLA pays at every one of the
    40 norm sites per step (measured 9.6 ms of a 49 ms train
    micro-step, scripts/profile_block_parts.py)."""
    B, C = per_channel.shape
    s = per_channel.reshape(B, num_groups, C // num_groups).sum(-1)
    return jnp.repeat(s, C // num_groups, axis=-1)


def group_norm(p, x, num_groups, eps=1e-5, mask=None):
    """GroupNorm on (B, T, C): per (sample, group) stats over (T, C/G).

    Statistics in fp32; output in the input dtype (bf16 residual-stream
    policy — halves HBM traffic on the norm-heavy Conformer block, like
    torch AMP's fp16 activations in the reference).

    The (B, T, C) activation is only ever reduced over T in its native
    layout; the cross-channel group reduction runs on the resulting
    (B, C) sums (see _group_reduce — keeps C on the lane dimension).

    With ``mask`` (B, T) the statistics span only valid frames
    (masked_norm mode); without it, padding leaks like the reference."""
    B, T, C = x.shape
    cg = C // num_groups
    xf = x.astype(jnp.float32)
    if mask is None:
        mean = _group_reduce(jnp.sum(xf, axis=1), num_groups) / (T * cg)
        d = xf - mean[:, None, :]
        var = _group_reduce(jnp.sum(d * d, axis=1), num_groups) / (T * cg)
    else:
        m = mask.astype(jnp.float32)[:, :, None]
        denom = jnp.maximum(jnp.sum(m, axis=1) * cg, 1.0)  # (B, 1)
        mean = _group_reduce(jnp.sum(xf * m, axis=1), num_groups) / denom
        d = xf - mean[:, None, :]
        var = _group_reduce(jnp.sum(d * d * m, axis=1), num_groups) / denom
    xn = d * jax.lax.rsqrt(var + eps)[:, None, :]
    return (xn * p["scale"] + p["bias"]).astype(x.dtype)


def _init_batchnorm(num_channels):
    params = {"scale": jnp.ones((num_channels,)), "bias": jnp.zeros((num_channels,))}
    state = {"mean": jnp.zeros((num_channels,)), "var": jnp.ones((num_channels,))}
    return params, state


def batch_norm(p, state, x, train, momentum=0.1, eps=1e-5, mask=None):
    """BatchNorm over (B, T, C): per-channel stats over (B, T).

    Matches torch.nn.BatchNorm1d semantics: biased variance normalizes the
    batch; unbiased variance updates the running estimate. With ``mask``
    (B, T) the batch statistics span only valid frames.
    """
    xf = x.astype(jnp.float32)
    if train and mask is not None:
        m = mask.astype(jnp.float32)[:, :, None]
        n = jnp.maximum(jnp.sum(m), 1.0)
        mean = jnp.sum(xf * m, axis=(0, 1)) / n
        var = jnp.sum(jnp.where(m > 0, (xf - mean) ** 2, 0.0), axis=(0, 1)) / n
        unbiased = var * (n / jnp.maximum(n - 1.0, 1.0))
        new_state = {
            "mean": (1 - momentum) * state["mean"] + momentum * mean,
            "var": (1 - momentum) * state["var"] + momentum * unbiased,
        }
    elif train:
        mean = jnp.mean(xf, axis=(0, 1))
        var = jnp.mean((xf - mean) ** 2, axis=(0, 1))
        n = x.shape[0] * x.shape[1]
        unbiased = var * (n / max(n - 1, 1))
        new_state = {
            "mean": (1 - momentum) * state["mean"] + momentum * mean,
            "var": (1 - momentum) * state["var"] + momentum * unbiased,
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    xn = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (xn * p["scale"] + p["bias"]).astype(x.dtype), new_state


def _dense(p, x, compute_dtype):
    # fp32 accumulation on the MXU, activations carried in compute_dtype
    out = jnp.dot(x.astype(compute_dtype), p["w"].astype(compute_dtype),
                  preferred_element_type=jnp.float32) + p["b"]
    return out.astype(compute_dtype)


def _dropout(x, rate, rng, train):
    if not train or rate <= 0.0 or rng is None:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0)


# ---------------------------------------------------------------------------
# SwiGLU feed-forward
# ---------------------------------------------------------------------------

def _init_swiglu(key, d_model, d_ff):
    k1, k2 = jax.random.split(key)
    return {"in": _linear_init(k1, d_model, 2 * d_ff),
            "out": _linear_init(k2, d_ff, d_model)}


def swiglu_ffn(p, x, *, dropout, train, rng, compute_dtype):
    h = _dense(p["in"], x, compute_dtype)
    d_ff = h.shape[-1] // 2
    h1, h2 = h[..., :d_ff], h[..., d_ff:]
    h = jax.nn.silu(h1) * h2
    if rng is not None:
        r1, r2 = jax.random.split(rng)
    else:
        r1 = r2 = None
    h = _dropout(h, dropout, r1, train)
    h = _dense(p["out"], h, compute_dtype)
    return _dropout(h, dropout, r2, train)


# ---------------------------------------------------------------------------
# Convolution module
# ---------------------------------------------------------------------------

def _conv1d_init(key, k, c_in, c_out, groups=1):
    kw, kb = jax.random.split(key)
    fan_in = c_in // groups * k
    bound = 1.0 / math.sqrt(fan_in)
    # NWC/WIO layout: kernel (k, c_in/groups, c_out)
    return {"w": _uniform(kw, (k, c_in // groups, c_out), bound),
            "b": _uniform(kb, (c_out,), bound)}


def _conv1d(p, x, *, stride=1, padding, groups=1, compute_dtype=jnp.float32):
    # Same-dtype conv (the conv transpose rule requires matching operand
    # dtypes under autodiff); upcast to fp32 at the bias add.
    out = jax.lax.conv_general_dilated(
        x.astype(compute_dtype), p["w"].astype(compute_dtype),
        window_strides=(stride,), padding=[(padding, padding)],
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups,
        preferred_element_type=compute_dtype,
    )
    return (out.astype(jnp.float32) + p["b"]).astype(compute_dtype)


def _init_conv_module(key, d_model, kernel_size):
    k1, k2, k3 = jax.random.split(key, 3)
    bn_p, bn_s = _init_batchnorm(d_model)
    params = {
        "norm": _init_groupnorm(d_model),
        "pw1": _conv1d_init(k1, 1, d_model, 2 * d_model),
        "dw": _conv1d_init(k2, kernel_size, d_model, d_model, groups=d_model),
        "bn": bn_p,
        "pw2": _conv1d_init(k3, 1, d_model, d_model),
    }
    return params, {"bn": bn_s}


def conv_module(p, state, x, *, cfg, train, compute_dtype, norm_mask=None):
    """GroupNorm -> pointwise(2d) -> GLU -> depthwise(k) -> BN -> SiLU -> pointwise.

    With norm_mask (masked_norm mode) the input is zeroed at padded frames
    before the time convolution, so valid positions see exactly the zeros
    an unpadded utterance's edge padding would provide, and norm statistics
    span valid frames only."""
    d = cfg.d_model
    h = group_norm(p["norm"], x, groupnorm_groups(d), mask=norm_mask)
    if norm_mask is not None:
        h = jnp.where(norm_mask[:, :, None], h, 0)
    h = _conv1d(p["pw1"], h, padding=0, compute_dtype=compute_dtype)
    a, b = h[..., :d], h[..., d:]
    h = a * jax.nn.sigmoid(b)  # GLU over the channel dim
    if norm_mask is not None:
        h = jnp.where(norm_mask[:, :, None], h, 0)  # bias leaks via pw1
    h = _conv1d(p["dw"], h, padding=(cfg.conv_kernel_size - 1) // 2,
                groups=d, compute_dtype=compute_dtype)
    h, new_bn = batch_norm(p["bn"], state["bn"], h, train, mask=norm_mask)
    h = jax.nn.silu(h)
    h = _conv1d(p["pw2"], h, padding=0, compute_dtype=compute_dtype)
    return h, {"bn": new_bn}


# ---------------------------------------------------------------------------
# Conformer block
# ---------------------------------------------------------------------------

def _init_block(key, cfg):
    keys = jax.random.split(key, 4)
    conv_p, conv_s = _init_conv_module(keys[2], cfg.d_model, cfg.conv_kernel_size)
    d_ff = cfg.d_model * cfg.ff_mult
    params = {
        "ff1": _init_swiglu(keys[0], cfg.d_model, d_ff),
        "norm_ff1": _init_groupnorm(cfg.d_model),
        "attn": init_attention(keys[1], cfg.d_model, cfg.n_heads, cfg.use_mqa),
        "norm_attn": _init_groupnorm(cfg.d_model),
        "conv": conv_p,
        "ff2": _init_swiglu(keys[3], cfg.d_model, d_ff),
        "norm_ff2": _init_groupnorm(cfg.d_model),
        "final_norm": _init_groupnorm(cfg.d_model),
    }
    return params, conv_s


def conformer_block(p, state, x, mask, *, cfg, train, rng, compute_dtype, attn_kernel=None):
    g = groupnorm_groups(cfg.d_model)
    if rng is not None:
        r_ff1, r_attn, r_ff2 = jax.random.split(rng, 3)
    else:
        r_ff1 = r_attn = r_ff2 = None
    nm = mask if (cfg.masked_norm and mask is not None) else None

    x = x + 0.5 * swiglu_ffn(p["ff1"], group_norm(p["norm_ff1"], x, g, mask=nm),
                             dropout=cfg.dropout, train=train, rng=r_ff1,
                             compute_dtype=compute_dtype)
    attn_out = mqa_attention(
        p["attn"], group_norm(p["norm_attn"], x, g, mask=nm), mask,
        n_heads=cfg.n_heads, use_mqa=cfg.use_mqa, dropout=cfg.dropout,
        train=train, rng=r_attn, compute_dtype=compute_dtype, kernel=attn_kernel,
    )
    x = x + attn_out
    conv_out, new_state = conv_module(p["conv"], state, x, cfg=cfg, train=train,
                                      compute_dtype=compute_dtype, norm_mask=nm)
    x = x + conv_out
    x = x + 0.5 * swiglu_ffn(p["ff2"], group_norm(p["norm_ff2"], x, g, mask=nm),
                             dropout=cfg.dropout, train=train, rng=r_ff2,
                             compute_dtype=compute_dtype)
    return group_norm(p["final_norm"], x, g, mask=nm), new_state


# ---------------------------------------------------------------------------
# Full model
# ---------------------------------------------------------------------------

def _conv2d_init(key, k, c_in, c_out):
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(c_in * k * k)
    # NHWC/HWIO layout
    return {"w": _uniform(kw, (k, k, c_in, c_out), bound),
            "b": _uniform(kb, (c_out,), bound)}


def _conv2d(p, x, *, stride, padding, compute_dtype):
    out = jax.lax.conv_general_dilated(
        x.astype(compute_dtype), p["w"].astype(compute_dtype),
        window_strides=(stride, stride), padding=[(padding, padding)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=compute_dtype,
    )
    return (out.astype(jnp.float32) + p["b"]).astype(compute_dtype)


def init_model(key, cfg: ModelConfig):
    """Initialize all parameters and batch-norm state.

    Per-block params/state are stacked on a leading axis for lax.scan.

    Returns:
        (params, state) pytrees.
    """
    k_sub1, k_sub2, k_proj, k_blocks, k_fc = jax.random.split(key, 5)
    flattened = cfg.d_model * (cfg.n_mels // 4)
    block_keys = jax.random.split(k_blocks, cfg.n_blocks)
    blocks = [_init_block(bk, cfg) for bk in block_keys]
    stacked_params = jax.tree.map(lambda *xs: jnp.stack(xs), *[b[0] for b in blocks])
    stacked_state = jax.tree.map(lambda *xs: jnp.stack(xs), *[b[1] for b in blocks])
    params = {
        "sub1": _conv2d_init(k_sub1, 3, 1, cfg.d_model),
        "sub2": _conv2d_init(k_sub2, 3, cfg.d_model, cfg.d_model),
        "input_proj": _linear_init(k_proj, flattened, cfg.d_model),
        "blocks": stacked_params,
        "fc": _linear_init(k_fc, cfg.d_model, cfg.n_classes),
    }
    return params, {"blocks": stacked_state}


def count_params(params):
    return sum(x.size for x in jax.tree.leaves(params))


def apply_model(
    params,
    state,
    x,
    input_lengths=None,
    *,
    cfg: ModelConfig,
    train=False,
    rng=None,
    compute_dtype=jnp.float32,
    attn_kernel=None,
    act_constraint=None,
    remat=False,
    remat_policy=None,
    scan_unroll=1,
):
    """Forward pass.

    Args:
        x: (B, T, n_mels) float features.
        input_lengths: optional (B,) pre-subsampling frame counts; the mask
            uses the reference's `input_lengths // 4` contract.
        act_constraint: optional fn applying a sharding constraint to
            (B, T, D) activations (parallel/mesh.activation_constraint) —
            enables data and sequence parallelism declaratively.
        remat: rematerialize each Conformer block in the backward pass
            (jax.checkpoint on the scan body). Saves only the (B, T', D)
            block inputs instead of every intermediate — the dominant
            saved residual is the (B, H, T', T') attention-probs tensor
            per block, so remat trades one forward recompute (MXU time,
            cheap at the train step's ~14% MFU) for a large cut in HBM
            residual traffic. No effect on forward-only calls.

    Returns:
        (logits (B, T//4-ish, n_classes), new_state)
    """
    B, T, F = x.shape
    h = x[..., None]  # (B, T, F, 1) NHWC

    h = jax.nn.silu(_conv2d(params["sub1"], h, stride=2, padding=1,
                            compute_dtype=compute_dtype))
    h = jax.nn.silu(_conv2d(params["sub2"], h, stride=2, padding=1,
                            compute_dtype=compute_dtype))
    # (B, T', F', C) -> (B, T', C, F') -> (B, T', C*F'): the reference
    # flattens channel-major (conformer.py:182-184); kept for weight-porting.
    Bh, Th, Fh, Ch = h.shape
    h = h.transpose(0, 1, 3, 2).reshape(Bh, Th, Ch * Fh)
    h = _dense(params["input_proj"], h, compute_dtype)
    if act_constraint is not None:
        h = act_constraint(h)

    mask = None
    if input_lengths is not None:
        sub_lengths = input_lengths // 4
        mask = jnp.arange(Th)[None, :] < sub_lengths[:, None]  # (B, T')

    def _block_call(block_p, block_s, hidden, blk_mask, block_rng):
        return conformer_block(
            block_p, block_s, hidden, blk_mask, cfg=cfg, train=train,
            rng=block_rng, compute_dtype=compute_dtype, attn_kernel=attn_kernel,
        )

    if remat:
        _block_call = jax.checkpoint(_block_call, policy=remat_policy)

    def body(carry, xs):
        hidden, i = carry
        block_p, block_s = xs
        block_rng = jax.random.fold_in(rng, i) if rng is not None else None
        hidden, new_s = _block_call(block_p, block_s, hidden, mask, block_rng)
        if act_constraint is not None:
            hidden = act_constraint(hidden)
        return (hidden, i + 1), new_s

    (h, _), new_block_state = jax.lax.scan(
        body, (h, jnp.asarray(0)), (params["blocks"], state["blocks"]),
        unroll=scan_unroll,
    )

    logits = _dense(params["fc"], h, compute_dtype).astype(jnp.float32)
    return logits, {"blocks": new_block_state}
