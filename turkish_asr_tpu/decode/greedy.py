"""Greedy CTC decoding — argmax and collapse fully on device.

Reference: GreedyDecoder (/root/reference/utils/decoding.py:132-169) does
per-sample Python loops over token lists. Here the whole batch collapse
(drop repeats, drop blanks, left-pack) runs as vectorized jnp ops; the host
only detokenizes the packed id rows.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("blank_id",))
def greedy_collapse_batch(logits, lengths=None, *, blank_id=0):
    """Batch greedy decode: argmax -> CTC collapse -> left-packed ids.

    Args:
        logits: (B, T, V) logits (or log-probs — argmax invariant).
        lengths: optional (B,) valid frame counts.

    Returns:
        (ids (B, T) int32 left-packed with -1 padding, counts (B,) int32)
    """
    pred = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # (B, T)
    B, T = pred.shape
    prev = jnp.pad(pred, ((0, 0), (1, 0)), constant_values=-1)[:, :T]
    keep = (pred != prev) & (pred != blank_id)
    if lengths is not None:
        keep &= jnp.arange(T)[None, :] < lengths[:, None]
    counts = jnp.sum(keep, axis=1).astype(jnp.int32)
    # Left-pack kept ids: target position = cumsum(keep) - 1; dropped tokens
    # scatter into an overflow column that is sliced away.
    pos = jnp.cumsum(keep, axis=1) - 1
    scatter_pos = jnp.where(keep, pos, T)
    rows = jnp.broadcast_to(jnp.arange(B)[:, None], (B, T))
    out = jnp.full((B, T + 1), -1, dtype=jnp.int32)
    out = out.at[rows, scatter_pos].set(jnp.where(keep, pred, -1))
    return out[:, :T], counts


class GreedyDecoder:
    """Tokenizer-aware greedy decoder (reference-compatible API)."""

    def __init__(self, tokenizer, blank_id=0):
        self.tokenizer = tokenizer
        self.blank_id = blank_id

    def decode(self, logits):
        """(T, V) -> text."""
        pred_ids = np.asarray(jnp.argmax(jnp.asarray(logits), axis=-1)).tolist()
        return self.tokenizer.ctc_decode(pred_ids)

    def decode_batch(self, logits, lengths=None):
        """(B, T, V) -> list of texts (device collapse, host detokenize)."""
        blank = getattr(self.tokenizer, "pad_token_id", None)
        if blank is None:
            blank = self.blank_id
        ids, counts = greedy_collapse_batch(
            jnp.asarray(logits),
            None if lengths is None else jnp.asarray(lengths),
            blank_id=int(blank),
        )
        ids = np.asarray(ids)
        counts = np.asarray(counts)
        return [
            self.tokenizer.decode(ids[i, :counts[i]].tolist())
            for i in range(ids.shape[0])
        ]
