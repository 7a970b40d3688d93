"""Pallas TPU kernels for the CTC loss forward/backward recursions.

Why a kernel: the CTC alpha recursion is inherently sequential over time,
and as a `lax.scan` each of the T' steps pays XLA's per-step scan overhead
— measured ~16 ms of a 37 ms training micro-step at B=32/T'=200/S=129
(AGENTS.md "CTC loss scan profile": NOT fixable by unroll, body fusion, or
chunk-parallel operator DP; ~13 ns/element is the XLA scan floor). The
arithmetic itself is tiny: the whole (B, S) state is a few f32 vregs. Here
the entire T' loop runs inside ONE Pallas program with the state resident
in VMEM, so a step costs VPU cycles instead of scan-step overhead.

Design:
- Emissions are pre-gathered in XLA to (T, B, Sp) (`log_probs[...,ext]`,
  Sp = S rounded up to the 128-lane boundary) — the gather is vectorized
  and cheap; the kernels see dense, statically-shaped blocks.
- The forward kernel iterates grid chunks of Tc frames; BlockSpec
  pipelining overlaps the next chunk's HBM->VMEM DMA with compute. The
  (B, Sp) alpha state lives in VMEM scratch (TPU grid steps run
  sequentially, scratch persists). It writes alpha for every step — the
  backward pass needs it.
- The backward kernel runs the beta recursion time-reversed (reversed
  block index_map) and emits the analytic CTC gradient
      d(-ll)/d emit[t, s] = -exp(alpha[t, s] + beta[t, s] - ll)
  where beta excludes the emission at t (standard forward-backward
  identity); the scatter back to vocabulary space is a one-hot matmul in
  XLA (`bts,bsv->btv` — gathers/scatters are slow on TPU, matmuls are not).
- Sample freezing mirrors the scan implementation exactly: alpha freezes
  at t >= input_length, beta anchors its final condition at
  t == input_length - 1, and gradients are zero at padded frames. Padded
  label lanes (s >= S) carry blank emissions forward but have beta = -inf,
  so their gradient is exactly 0.

Parity contract: identical NLL (same logaddexp association order) and
gradients matching autodiff of the scan to ~1e-5 (tests/test_ctc_pallas.py,
including against torch.nn.CTCLoss). Replaces the cuDNN CTC kernel the
reference leans on (/root/reference/trainer/trainer.py:76).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30  # finite sentinel, matches ops/ctc.py

_LANE = 128
# One-hot selection matrices above this element count fall back to gather
# (a 32k-vocab tokenizer at B=32/Sp=256 would need a 268M-element one-hot).
_ONEHOT_ELEM_LIMIT = 16 * 1024 * 1024


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _logaddexp(a, b):
    m = jnp.maximum(a, b)
    return m + jnp.log1p(jnp.exp(-jnp.abs(a - b)))


def _shift_right(x, n, interpret):
    """Shift lanes right by n (toward higher s), filling with NEG_INF."""
    B, Sp = x.shape
    if interpret:
        rolled = jnp.roll(x, n, axis=1)
    else:
        rolled = pltpu.roll(x, n, axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (B, Sp), 1)
    return jnp.where(lane >= n, rolled, NEG_INF)


def _shift_left(x, n, interpret):
    """Shift lanes left by n (toward lower s), filling with NEG_INF."""
    B, Sp = x.shape
    if interpret:
        rolled = jnp.roll(x, -n, axis=1)
    else:
        rolled = pltpu.roll(x, Sp - n, axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (B, Sp), 1)
    return jnp.where(lane < Sp - n, rolled, NEG_INF)


def _fwd_kernel(emit_ref, alpha0_ref, skip_ref, il_ref, alpha_out_ref,
                alpha_scratch, *, interpret):
    i = pl.program_id(0)
    Tc = emit_ref.shape[0]
    skip = skip_ref[:]          # (B, Sp) float32 {0,1}
    il = il_ref[:]              # (B, 1) int32

    @pl.when(i == 0)
    def _():
        alpha_scratch[:] = alpha0_ref[:]

    # Static python loop: k is a compile-time constant, so every ref
    # access is a static slice (dynamic VMEM indexing costs a copy).
    alpha = alpha_scratch[:]
    for k in range(Tc):
        t = i * Tc + k
        emit = emit_ref[k]
        a1 = _shift_right(alpha, 1, interpret)
        a2 = _shift_right(alpha, 2, interpret)
        acc = _logaddexp(alpha, a1)
        acc = jnp.where(skip > 0, _logaddexp(acc, a2), acc)
        new = acc + emit
        # freeze past each sample's last frame; t == 0 keeps alpha0
        active = (t > 0) & (t < il)
        alpha = jnp.where(active, new, alpha)
        alpha_out_ref[k] = alpha
    alpha_scratch[:] = alpha


def _bwd_kernel(emit_ref, alpha_ref, final_ref, skip2_ref, il_ref, ll_ref,
                grad_ref, beta_scratch, emit_next_scratch, *, interpret):
    i = pl.program_id(0)
    n = pl.num_programs(0)
    Tc = emit_ref.shape[0]
    skip2 = skip2_ref[:]        # (B, Sp): allow s -> s+2 (mask at target s)
    il = il_ref[:]              # (B, 1)
    ll = ll_ref[:]              # (B, 1) f32
    final = final_ref[:]        # (B, Sp): 0 at final positions else NEG_INF

    @pl.when(i == 0)
    def _():
        beta_scratch[:] = jnp.full_like(beta_scratch[:], NEG_INF)
        emit_next_scratch[:] = jnp.zeros_like(emit_next_scratch[:])

    beta_prev = beta_scratch[:]          # beta[t+1]
    emit_next = emit_next_scratch[:]     # emit[t+1]
    for k_rev in range(Tc):
        k = Tc - 1 - k_rev
        t = (n - 1 - i) * Tc + k
        y = emit_next + beta_prev
        y1 = _shift_left(y, 1, interpret)
        y2 = jnp.where(skip2 > 0, _shift_left(y, 2, interpret), NEG_INF)
        cand = _logaddexp(_logaddexp(y, y1), y2)
        is_final_t = (t == il - 1)
        beta_t = jnp.where(is_final_t, final,
                           jnp.where(t < il - 1, cand, beta_prev))
        grad = -jnp.exp(alpha_ref[k] + beta_t - ll)
        grad_ref[k] = jnp.where(t < il, grad, 0.0)
        beta_prev = beta_t
        emit_next = emit_ref[k]
    beta_scratch[:] = beta_prev
    emit_next_scratch[:] = emit_next


def _prep(log_probs, targets, input_lengths, target_lengths, blank_id):
    """Shared XLA-side prep: extended labels, emissions, masks."""
    from turkish_asr_tpu.ops.ctc import ctc_topology

    B, T, V = log_probs.shape
    L = targets.shape[1]
    S = 2 * L + 1
    Sp = _round_up(S, _LANE)

    ext, allow_skip = ctc_topology(targets, blank_id)

    ext_p = jnp.pad(ext, ((0, 0), (0, Sp - S)), constant_values=blank_id)
    skip = jnp.pad(allow_skip.astype(jnp.float32), ((0, 0), (0, Sp - S)))

    # Time-major (T, B, Sp) emissions. A one-hot matmul instead of
    # take_along_axis: the batched dynamic gather measured 22 ms at
    # B=32/T=200/Sp=256 — 10x the kernel it feeds (scripts/
    # probe_ctc_kernel.py) — while the MXU selection is ~0.2 GFLOP.
    # HIGHEST precision makes the selection exact: 1.0 is exact in every
    # bf16 decomposition pass, so value*1.0 accumulates to value in fp32.
    # The einsum emits (t, b, s) directly — the transpose fuses into the
    # matmul output layout instead of relaying out 3 MB afterwards.
    if B * V * Sp <= _ONEHOT_ELEM_LIMIT:
        onehot = (ext_p[:, None, :] == jnp.arange(V)[None, :, None])
        emit_tbs = jnp.einsum(
            "btv,bvs->tbs", log_probs, onehot.astype(jnp.float32),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
    else:
        # Huge-vocab fallback: gather, then relayout.
        emit = jnp.take_along_axis(
            log_probs, jnp.broadcast_to(ext_p[:, None, :], (B, T, Sp)),
            axis=2)
        emit_tbs = emit.transpose(1, 0, 2)

    posp = jnp.arange(Sp)[None, :]
    tl = target_lengths.astype(jnp.int32)
    alpha0 = jnp.where(posp == 0, emit_tbs[0], NEG_INF)
    alpha0 = jnp.where((posp == 1) & (tl[:, None] > 0), emit_tbs[0], alpha0)

    il = input_lengths.astype(jnp.int32)[:, None]
    return ext_p, skip, emit_tbs, alpha0, il, Sp


def _run_forward(emit_tbs, alpha0, skip, il, *, t_chunk, interpret):
    Tpad, B, Sp = emit_tbs.shape
    grid = (Tpad // t_chunk,)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, interpret=interpret),
        grid=grid,
        in_specs=[
            pl.BlockSpec((t_chunk, B, Sp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, Sp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, Sp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((t_chunk, B, Sp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Tpad, B, Sp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((B, Sp), jnp.float32)],
        interpret=interpret,
    )(emit_tbs, alpha0, skip, il)


def _run_backward(emit_tbs, alpha_all, final_cond, skip2, il, ll, *,
                  t_chunk, interpret):
    Tpad, B, Sp = emit_tbs.shape
    n = Tpad // t_chunk
    rev = lambda i: (n - 1 - i, 0, 0)
    whole = lambda i: (0, 0)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, interpret=interpret),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((t_chunk, B, Sp), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((t_chunk, B, Sp), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, Sp), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, Sp), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), whole, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((t_chunk, B, Sp), rev,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Tpad, B, Sp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((B, Sp), jnp.float32),
            pltpu.VMEM((B, Sp), jnp.float32),
        ],
        interpret=interpret,
    )(emit_tbs, alpha_all, final_cond, skip2, il, ll)


def _pick_chunk(T, B, Sp):
    """Chunk the time axis so blocks stay comfortably inside VMEM while
    amortizing per-grid-step overhead; Tpad = chunk * ceil(T / chunk).

    Kernel time is flat in the chunk size (measured 8..200 all ~2 ms,
    scripts/probe_ctc_kernel.py), so the only constraint is VMEM: the
    backward holds ~5 (tc, B, Sp) f32 buffers (emit + alpha in/out with
    double buffering, grad out), so cap each at ~2 MB."""
    row_bytes = B * Sp * 4
    budget = max(2 * 1024 * 1024 // row_bytes, 1)
    for c in (32, 16, 8):
        if T >= c and c <= budget:
            return c
    return max(min(T, budget), 1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def ctc_nll_pallas(log_probs, targets, input_lengths, target_lengths,
                   blank_id=0, interpret=False):
    """Per-sample CTC negative log-likelihood, Pallas forward/backward.

    Same contract as the scan path in ops/ctc.py with reduction="none"
    BEFORE zero_infinity masking; differentiable w.r.t. log_probs only.
    """
    nll, _ = _ctc_fwd(log_probs, targets, input_lengths, target_lengths,
                      blank_id, interpret)
    return nll


def _ctc_fwd(log_probs, targets, input_lengths, target_lengths, blank_id,
             interpret):
    B, T, V = log_probs.shape
    ext_p, skip, emit_tbs, alpha0, il, Sp = _prep(
        log_probs, targets, input_lengths, target_lengths, blank_id)

    tc = _pick_chunk(T, B, Sp)
    Tpad = _round_up(T, tc)
    if Tpad != T:
        emit_tbs = jnp.pad(emit_tbs, ((0, Tpad - T), (0, 0), (0, 0)))

    alpha_all = _run_forward(emit_tbs, alpha0, skip, il,
                             t_chunk=tc, interpret=interpret)

    alpha_last = alpha_all[Tpad - 1] if T > 1 else alpha0
    tl = target_lengths.astype(jnp.int32)
    hi = 2 * tl
    lo = jnp.maximum(2 * tl - 1, 0)
    a_hi = jnp.take_along_axis(alpha_last, hi[:, None], axis=1)[:, 0]
    a_lo = jnp.take_along_axis(alpha_last, lo[:, None], axis=1)[:, 0]
    ll = jnp.where(tl > 0, jnp.logaddexp(a_hi, a_lo), alpha_last[:, 0])

    residuals = (emit_tbs, alpha_all, ext_p, skip, il, ll, tl,
                 T, V, tc)
    return -ll, residuals


def _ctc_bwd(blank_id, interpret, residuals, g):
    emit_tbs, alpha_all, ext_p, skip, il, ll, tl, T, V, tc = residuals
    Tpad, B, Sp = emit_tbs.shape

    posp = jnp.arange(Sp)[None, :]
    hi = (2 * tl)[:, None]
    lo = jnp.maximum(2 * tl - 1, 0)[:, None]
    final_cond = jnp.where(
        (posp == hi) | ((posp == lo) & (tl[:, None] > 0)), 0.0, NEG_INF)
    # transition s -> s+2 allowed iff allow_skip at the TARGET lane; the
    # beta recursion masks the s+2 term at the source lane, so shift the
    # mask down by 2 (skip2[s] = allow_skip[s+2]).
    skip2 = jnp.pad(skip[:, 2:], ((0, 0), (0, 2)))

    grad_emit = _run_backward(emit_tbs, alpha_all, final_cond, skip2, il,
                              ll[:, None], t_chunk=tc, interpret=interpret)
    grad_emit = grad_emit[:T] * g[None, :, None]  # cotangent, (T, B, Sp)

    # Scatter ext lanes back to vocab space. One-hot matmul again (matmul
    # beats scatter on TPU); the (t, b, s) -> (b, t, v) relayout fuses
    # into the einsum output.
    B = grad_emit.shape[1]
    Sp = grad_emit.shape[2]
    if B * V * Sp <= _ONEHOT_ELEM_LIMIT:
        onehot = (ext_p[:, :, None] == jnp.arange(V)[None, None, :])
        grad_lp = jnp.einsum("tbs,bsv->btv", grad_emit,
                             onehot.astype(jnp.float32),
                             precision=jax.lax.Precision.HIGHEST,
                             preferred_element_type=jnp.float32)
    else:
        b_idx = jnp.arange(B)[:, None, None]
        t_idx = jnp.arange(T)[None, :, None]
        s_ext = jnp.broadcast_to(ext_p[:, None, :], (B, T, Sp))
        grad_lp = jnp.zeros((B, T, V), jnp.float32).at[
            b_idx, t_idx, s_ext].add(grad_emit.transpose(1, 0, 2))
    return grad_lp, None, None, None


ctc_nll_pallas.defvjp(_ctc_fwd, _ctc_bwd)
