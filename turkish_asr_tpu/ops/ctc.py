"""CTC loss as an on-device log-space forward recursion (`lax.scan`).

Replaces the reference's cuDNN-backed ``nn.CTCLoss(blank=0,
zero_infinity=True)`` with reduction='mean'
(/root/reference/trainer/trainer.py:76,173): per-sample negative
log-likelihoods are divided by their target lengths and averaged over the
batch; non-finite sample losses are zeroed (zero_infinity).

TPU-first: the alpha recursion runs as one `lax.scan` over time with a
static (B, 2L+1) state — fully vectorized over batch and extended-label
axes, no host fallback. Gradients flow through the scan via autodiff
(the forward-backward gradient identity is exactly autodiff of the
forward recursion). A numpy dynamic-program oracle is provided for tests.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1e30  # finite stand-in for -inf; keeps autodiff NaN-free


def _extended_targets(targets, blank_id):
    """(B, L) labels -> (B, 2L+1) blank-interleaved extended sequence."""
    B, L = targets.shape
    S = 2 * L + 1
    ext = jnp.full((B, S), blank_id, dtype=targets.dtype)
    return ext.at[:, 1::2].set(targets)


@partial(jax.jit, static_argnames=("blank_id", "reduction", "zero_infinity"))
def ctc_loss(
    log_probs,
    targets,
    input_lengths,
    target_lengths,
    *,
    blank_id=0,
    reduction="mean",
    zero_infinity=True,
):
    """CTC negative log-likelihood.

    Args:
        log_probs: (B, T, V) log-softmax outputs (batch-first; the reference
            permutes to (T, B, V) for torch — we keep batch-first).
        targets: (B, L) padded target ids.
        input_lengths: (B,) valid frame counts.
        target_lengths: (B,) valid target counts.
        reduction: "mean" (torch default: per-sample loss / target_length,
            then batch mean), "sum", or "none".

    Returns:
        scalar loss (or (B,) when reduction="none").
    """
    B, T, V = log_probs.shape
    L = targets.shape[1]
    S = 2 * L + 1

    ext = _extended_targets(targets.astype(jnp.int32), blank_id)  # (B, S)
    pos = jnp.arange(S)[None, :]

    # Transition structure: from s-1 always; from s-2 only for label positions
    # whose label differs from the label two slots back.
    ext_shift2 = jnp.pad(ext, ((0, 0), (2, 0)), constant_values=blank_id)[:, :S]
    allow_skip = (pos % 2 == 1) & (ext != ext_shift2)

    lp0 = log_probs[:, 0, :]
    emit0 = jnp.take_along_axis(lp0, ext, axis=1)  # (B, S)
    alpha0 = jnp.where(pos == 0, emit0, NEG_INF)
    alpha0 = jnp.where((pos == 1) & (target_lengths[:, None] > 0), emit0, alpha0)

    final_pos_hi = 2 * target_lengths  # blank after last label
    final_pos_lo = jnp.maximum(2 * target_lengths - 1, 0)

    def logaddexp(a, b):
        mx = jnp.maximum(a, b)
        return mx + jnp.log1p(jnp.exp(-jnp.abs(a - b)))

    def step(carry, t):
        alpha, final_ll = carry
        lp_t = jax.lax.dynamic_slice_in_dim(log_probs, t, 1, axis=1)[:, 0, :]
        emit = jnp.take_along_axis(lp_t, ext, axis=1)

        a_prev = alpha
        a_m1 = jnp.pad(alpha, ((0, 0), (1, 0)), constant_values=NEG_INF)[:, :S]
        a_m2 = jnp.pad(alpha, ((0, 0), (2, 0)), constant_values=NEG_INF)[:, :S]
        acc = logaddexp(a_prev, a_m1)
        acc = jnp.where(allow_skip, logaddexp(acc, a_m2), acc)
        new_alpha = acc + emit
        # Before a sample's first frame is irrelevant (t starts at 1); past its
        # last frame, freeze alpha so autodiff doesn't touch padded frames.
        active = (t < input_lengths)[:, None]
        new_alpha = jnp.where(active, new_alpha, alpha)

        at_end = t == (input_lengths - 1)
        ll = logaddexp(
            jnp.take_along_axis(new_alpha, final_pos_hi[:, None], axis=1)[:, 0],
            jnp.take_along_axis(new_alpha, final_pos_lo[:, None], axis=1)[:, 0],
        )
        # Empty-target edge: only the all-blank path at position 0 counts.
        ll_empty = jnp.take_along_axis(new_alpha, jnp.zeros((B, 1), jnp.int32), axis=1)[:, 0]
        ll = jnp.where(target_lengths > 0, ll, ll_empty)
        final_ll = jnp.where(at_end, ll, final_ll)
        return (new_alpha, final_ll), None

    # Handle length-1 inputs: final may be at t=0.
    ll0 = logaddexp(
        jnp.take_along_axis(alpha0, final_pos_hi[:, None], axis=1)[:, 0],
        jnp.take_along_axis(alpha0, final_pos_lo[:, None], axis=1)[:, 0],
    )
    ll0_empty = alpha0[:, 0]
    ll0 = jnp.where(target_lengths > 0, ll0, ll0_empty)
    final_init = jnp.where(input_lengths == 1, ll0, jnp.full((B,), NEG_INF))

    (_, final_ll), _ = jax.lax.scan(step, (alpha0, final_init), jnp.arange(1, T))

    loss = -final_ll
    if zero_infinity:
        loss = jnp.where(loss >= -NEG_INF * 0.5, 0.0, loss)
        loss = jnp.where(jnp.isfinite(loss), loss, 0.0)

    if reduction == "none":
        return loss
    if reduction == "sum":
        return jnp.sum(loss)
    # torch 'mean': divide by target_length then average over batch.
    return jnp.mean(loss / jnp.maximum(target_lengths, 1))


def ctc_loss_numpy_oracle(log_probs, targets, input_lengths, target_lengths,
                          blank_id=0):
    """Reference dynamic program (per-sample NLL), numpy, for tests."""
    log_probs = np.asarray(log_probs, dtype=np.float64)
    out = []
    for b in range(log_probs.shape[0]):
        T = int(input_lengths[b])
        tl = int(target_lengths[b])
        y = list(np.asarray(targets[b][:tl], dtype=np.int64))
        ext = [blank_id]
        for c in y:
            ext += [c, blank_id]
        S = len(ext)
        alpha = np.full((T, S), -np.inf)
        alpha[0, 0] = log_probs[b, 0, ext[0]]
        if S > 1:
            alpha[0, 1] = log_probs[b, 0, ext[1]]
        for t in range(1, T):
            for s in range(S):
                cands = [alpha[t - 1, s]]
                if s >= 1:
                    cands.append(alpha[t - 1, s - 1])
                if s >= 2 and ext[s] != blank_id and ext[s] != ext[s - 2]:
                    cands.append(alpha[t - 1, s - 2])
                m = max(cands)
                if m == -np.inf:
                    alpha[t, s] = -np.inf
                else:
                    alpha[t, s] = m + np.log(sum(np.exp(c - m) for c in cands))
                alpha[t, s] += log_probs[b, t, ext[s]]
        if S > 1:
            tail = [alpha[T - 1, S - 1], alpha[T - 1, S - 2]]
            m = max(tail)
            ll = -np.inf if m == -np.inf else m + np.log(sum(np.exp(c - m) for c in tail))
        else:
            ll = alpha[T - 1, 0]
        out.append(-ll)
    return np.array(out)
