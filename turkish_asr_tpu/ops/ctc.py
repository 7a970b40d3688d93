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


def ctc_topology(targets, blank_id):
    """Shared CTC transition structure: (ext, allow_skip).

    ext: (B, 2L+1) blank-interleaved extended labels. allow_skip: the
    s-2 transition is legal only for label positions whose label differs
    from the label two slots back. Used by BOTH the scan path and the
    Pallas kernel so the topology can never diverge between them.
    """
    ext = _extended_targets(targets.astype(jnp.int32), blank_id)
    S = ext.shape[1]
    pos = jnp.arange(S)[None, :]
    ext_shift2 = jnp.pad(ext, ((0, 0), (2, 0)),
                         constant_values=blank_id)[:, :S]
    allow_skip = (pos % 2 == 1) & (ext != ext_shift2)
    return ext, allow_skip


@partial(jax.jit, static_argnames=("blank_id", "reduction", "zero_infinity",
                                   "impl"))
def ctc_loss(
    log_probs,
    targets,
    input_lengths,
    target_lengths,
    *,
    blank_id=0,
    reduction="mean",
    zero_infinity=True,
    impl="auto",
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
        impl: "scan" (lax.scan recursion, any backend), "pallas" (TPU
            kernel: the whole time loop in one Pallas program, analytic
            forward-backward gradient — ~10x faster than the scan's
            per-step overhead), "pallas_interpret" (kernel correctness
            path for CPU tests), or "auto" (pallas on TPU, scan elsewhere).

    Returns:
        scalar loss (or (B,) when reduction="none").
    """
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "scan"
    if impl in ("pallas", "pallas_interpret"):
        from turkish_asr_tpu.ops._ctc_pallas_impl import ctc_nll_pallas
        loss = ctc_nll_pallas(log_probs, targets, input_lengths,
                              target_lengths, blank_id,
                              impl == "pallas_interpret")
        return _reduce(loss, target_lengths, reduction, zero_infinity)
    B, T, V = log_probs.shape
    L = targets.shape[1]
    S = 2 * L + 1

    ext, allow_skip = ctc_topology(targets, blank_id)  # (B, S) each
    pos = jnp.arange(S)[None, :]

    # Pre-gather all emissions in one vectorized gather (B, T, S); the scan
    # body is then pure arithmetic — no per-step gathers, and the backward
    # pass accumulates into one dense scatter.
    emit_all = jnp.take_along_axis(
        log_probs, jnp.broadcast_to(ext[:, None, :], (B, T, S)), axis=2)

    emit0 = emit_all[:, 0]
    alpha0 = jnp.where(pos == 0, emit0, NEG_INF)
    alpha0 = jnp.where((pos == 1) & (target_lengths[:, None] > 0), emit0, alpha0)

    final_pos_hi = 2 * target_lengths  # blank after last label
    final_pos_lo = jnp.maximum(2 * target_lengths - 1, 0)

    # jnp.logaddexp is NaN-safe here because NEG_INF is a finite sentinel.
    logaddexp = jnp.logaddexp

    def step(alpha, xs):
        emit, t = xs  # (B, S), scalar
        a_m1 = jnp.pad(alpha, ((0, 0), (1, 0)), constant_values=NEG_INF)[:, :S]
        a_m2 = jnp.pad(alpha, ((0, 0), (2, 0)), constant_values=NEG_INF)[:, :S]
        acc = logaddexp(alpha, a_m1)
        acc = jnp.where(allow_skip, logaddexp(acc, a_m2), acc)
        new_alpha = acc + emit
        # Past a sample's last frame, freeze alpha: after the scan it holds
        # the value at t = input_length - 1 for every sample, and autodiff
        # never touches padded frames.
        active = (t < input_lengths)[:, None]
        return jnp.where(active, new_alpha, alpha), None

    xs = (emit_all[:, 1:].transpose(1, 0, 2), jnp.arange(1, T))
    alpha, _ = jax.lax.scan(step, alpha0, xs)

    final_ll = logaddexp(
        jnp.take_along_axis(alpha, final_pos_hi[:, None], axis=1)[:, 0],
        jnp.take_along_axis(alpha, final_pos_lo[:, None], axis=1)[:, 0],
    )
    # Empty-target edge: only the all-blank path at position 0 counts.
    final_ll = jnp.where(target_lengths > 0, final_ll, alpha[:, 0])

    loss = -final_ll
    return _reduce(loss, target_lengths, reduction, zero_infinity)


def _reduce(loss, target_lengths, reduction, zero_infinity):
    if zero_infinity:
        # torch semantics: *infinite* losses (impossible alignments) are
        # zeroed; NaN losses pass through so callers' NaN-skip logic fires
        # (zeroing a NaN here would hide it while 0 * NaN grads still
        # poison the backward pass).
        loss = jnp.where(loss >= -NEG_INF * 0.5, 0.0, loss)

    if reduction == "none":
        return loss
    if reduction == "sum":
        return jnp.sum(loss)
    # torch 'mean': divide by target_length then average over batch.
    return jnp.mean(loss / jnp.maximum(target_lengths, 1))


def make_sharded_ctc(mesh, impl="pallas", axis="data"):
    """Per-sample CTC NLL under a multi-device mesh via shard_map.

    The Pallas kernel has no SPMD partitioning rules, so under plain pjit
    XLA would all-gather its operands. CTC is embarrassingly parallel over
    the batch, so shard_map over the data axis runs the kernel on each
    device's local rows instead; axes other than ``axis`` see replicated
    work (same as pjit would schedule for a replicated loss).

    Returns fn(log_probs, targets, input_lengths, target_lengths) -> (B,)
    per-sample NLL (reduction="none", pre-zero_infinity masking is applied
    inside, matching ctc_loss(reduction="none")).
    """
    from jax.sharding import PartitionSpec as P

    def local(lp, tg, il, tl):
        return ctc_loss(lp, tg, il, tl, reduction="none", impl=impl)

    specs = dict(
        in_specs=(P(axis, None, None), P(axis, None), P(axis), P(axis)),
        out_specs=P(axis))
    # Varying-across-mesh checking must be off either way: pallas_call's
    # out_shape carries no vma/replication annotation.
    try:
        from jax import shard_map
        return shard_map(local, mesh=mesh, check_vma=False, **specs)
    except ImportError:  # older jax: experimental API, check_rep analog
        from jax.experimental.shard_map import shard_map
        return shard_map(local, mesh=mesh, check_rep=False, **specs)


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
