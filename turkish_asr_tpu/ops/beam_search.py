"""Vectorized CTC prefix beam search on device.

The reference's beam decoder is a per-timestep Python loop over a prefix
dict (/root/reference/utils/decoding.py:204-296) — T * beams * 2k host
iterations per utterance. Here the whole search runs inside one
`lax.scan`, batch-parallel under `vmap`, with fixed-shape state:

state per batch item (W = beam_width):
    prefixes  (W, L)  materialized token rows
    lengths   (W,)    prefix lengths
    last      (W,)    last token (-1 for the empty prefix)
    p_b, p_nb (W,)    log P(prefix ending in blank / non-blank)
    h1, h2    (W,)    two independent rolling hashes of the prefix

per step: W "stay" candidates (blank + same-token merge) and W*K "extend"
candidates (top-K tokens, K = 2W). Equal prefixes among candidates are
merged by sorting on the hash pair and log-sum-exp-ing adjacent equal
runs — the fixed-shape analog of the reference's dict merge. Top-W by
total probability survive.

LM shallow fusion on device comes in two flavors: a (V+1, V) token-bigram
bias matrix (lm_bias) and exact any-order ARPA backoff fusion via
precompiled state tables (lm_tables + a per-beam carried int32 LM state —
see decode/lm.build_arpa_fusion_tables). Word-bonus reranking is a
host-side post-step.
"""

from functools import partial

import jax
import jax.numpy as jnp

NEG_INF = -1e30
_P1, _M1 = 1000003, 2147483647   # rolling-hash params (int32-safe mod)
_P2, _M2 = 4097, 1073741789


def _lse(a, b):
    # jnp.logaddexp; safe here because NEG_INF is a finite sentinel.
    return jnp.logaddexp(a, b)


def _hash_step(h, tok, p, m):
    # (h * p + tok + 1) mod m, in int64-free int32 arithmetic via float64?
    # Use uint32 wraparound multiply then mod m — deterministic and cheap.
    hu = h.astype(jnp.uint32)
    out = (hu * jnp.uint32(p) + tok.astype(jnp.uint32) + jnp.uint32(1)) % jnp.uint32(m)
    return out.astype(jnp.int32)


def _merge_candidates(h1, h2, p_b, p_nb, parent, tok):
    """Sort candidates by hash pair; merge adjacent equal prefixes.

    Returns merged (h1, h2, p_b, p_nb, parent, tok) where duplicates have
    been folded into the first occurrence and the rest disabled (NEG_INF).
    """
    N = h1.shape[0]
    # Lexicographic sort on (h1, h2), carrying all four payload arrays
    # through the sort network. Measured on v5e: the "optimization" of
    # sorting (h1, h2, index) and gathering payloads afterwards is 3x
    # SLOWER end-to-end (4.2k -> 1.5k RTFx at beam-16/B=128) — batched
    # dynamic gathers under vmap cost far more than the extra payload
    # lanes in the compare-exchange network. Keep the payload sort.
    (h1s, h2s, pbs, pnbs, pars, toks) = jax.lax.sort(
        (h1, h2, p_b, p_nb, parent, tok), num_keys=2)

    same = (h1s == jnp.roll(h1s, 1)) & (h2s == jnp.roll(h2s, 1))
    same = same.at[0].set(False)

    # Segment-merge runs of equal prefixes via associative scan over
    # (value, is_segment_start) pairs in log space.
    def combine(a, b):
        (pb_a, pnb_a, start_a) = a
        (pb_b, pnb_b, start_b) = b
        pb = jnp.where(start_b, pb_b, _lse(pb_a, pb_b))
        pnb = jnp.where(start_b, pnb_b, _lse(pnb_a, pnb_b))
        return (pb, pnb, start_a | start_b)

    start = ~same
    pb_acc, pnb_acc, _ = jax.lax.associative_scan(
        combine, (pbs, pnbs, start))
    # The *last* element of each run holds the full merged sum. An element
    # is a run-end when the next element starts a new run.
    next_start = jnp.roll(start, -1).at[-1].set(True)
    is_run_end = next_start
    pb_m = jnp.where(is_run_end, pb_acc, NEG_INF)
    pnb_m = jnp.where(is_run_end, pnb_acc, NEG_INF)
    return h1s, h2s, pb_m, pnb_m, pars, toks


def _beam_step(state, logp_t, active, beam_width, blank_id, L,
               lm_bias=None, lm_weight=0.3, lm_tables=None):
    prefixes, lengths, last, p_b, p_nb, h1, h2, lm_state = state
    W = beam_width
    V = logp_t.shape[0]
    K = min(V, 2 * W)  # top-K expansion, K = 2W like the reference

    top_logp, top_tok = jax.lax.top_k(logp_t, K)       # (K,)
    total = _lse(p_b, p_nb)                            # (W,)
    lp_blank = logp_t[blank_id]

    # --- stay candidates (W): blank transition + same-token merge --------
    stay_pb = total + lp_blank
    lp_last = jnp.where(last >= 0, logp_t[jnp.clip(last, 0, V - 1)], NEG_INF)
    stay_pnb = jnp.where(last >= 0, p_nb + lp_last, NEG_INF)
    stay_parent = jnp.arange(W)
    stay_tok = jnp.full((W,), -1)                      # -1 = no extension
    stay_h1, stay_h2 = h1, h2

    # --- extend candidates (W*K) ------------------------------------------
    tok = jnp.broadcast_to(top_tok[None, :], (W, K))       # (W, K)
    lp = jnp.broadcast_to(top_logp[None, :], (W, K))
    is_blank = tok == blank_id
    is_repeat = tok == last[:, None]
    ext_pnb = jnp.where(is_repeat, p_b[:, None] + lp, total[:, None] + lp)
    if lm_bias is not None:
        # Shallow fusion on prefix extension — like the reference, LM score
        # is added only on the different-token extend case
        # (/root/reference/utils/decoding.py:261-263).
        lm_rows = lm_bias[jnp.clip(last + 1, 0, lm_bias.shape[0] - 1)]  # (W, V)
        lm = jnp.take_along_axis(lm_rows, jnp.clip(tok, 0, V - 1), axis=1)
        ext_pnb = jnp.where(is_repeat | is_blank, ext_pnb,
                            ext_pnb + lm_weight * lm)
    if lm_tables is not None:
        # Exact ARPA backoff fusion: each beam carries an int32 LM state;
        # the conditional log10-prob of every candidate token is one gather
        # (decode/lm.build_arpa_fusion_tables). Applied on different-token
        # extensions only, like the reference's KenLM branch.
        score_t, _ = lm_tables
        lm_rows = score_t[lm_state]                                  # (W, V)
        lm = jnp.take_along_axis(lm_rows, jnp.clip(tok, 0, V - 1), axis=1)
        ext_pnb = jnp.where(is_repeat | is_blank, ext_pnb,
                            ext_pnb + lm_weight * lm)
    ext_pnb = jnp.where(is_blank, NEG_INF, ext_pnb)
    # Dead parents must not spawn candidates.
    ext_pnb = jnp.where(total[:, None] <= NEG_INF * 0.5, NEG_INF, ext_pnb)
    ext_pb = jnp.full((W, K), NEG_INF)
    ext_parent = jnp.broadcast_to(jnp.arange(W)[:, None], (W, K))
    ext_h1 = _hash_step(jnp.broadcast_to(h1[:, None], (W, K)), tok, _P1, _M1)
    ext_h2 = _hash_step(jnp.broadcast_to(h2[:, None], (W, K)), tok, _P2, _M2)
    # Disable blank "extensions" in the hash space too. Real rolling hashes
    # are always >= 0, so unique NEGATIVE ids can never merge with a live
    # prefix (dead-beam seeds use -(1..W); these use -(W+1...)).
    dummy = -(jnp.arange(W * K).reshape(W, K) + jnp.int32(W + 1))
    ext_h1 = jnp.where(is_blank, dummy, ext_h1)
    ext_h2 = jnp.where(is_blank, dummy, ext_h2)
    # Dead parents (NEG_INF score) must not spawn mergeable hash ids either.
    parent_dead = (total <= NEG_INF * 0.5)[:, None]
    ext_h1 = jnp.where(parent_dead, dummy, ext_h1)
    ext_h2 = jnp.where(parent_dead, dummy, ext_h2)

    # --- pool, merge, select ----------------------------------------------
    c_h1 = jnp.concatenate([stay_h1, ext_h1.reshape(-1)])
    c_h2 = jnp.concatenate([stay_h2, ext_h2.reshape(-1)])
    c_pb = jnp.concatenate([stay_pb, ext_pb.reshape(-1)])
    c_pnb = jnp.concatenate([stay_pnb, ext_pnb.reshape(-1)])
    c_parent = jnp.concatenate([stay_parent, ext_parent.reshape(-1)])
    c_tok = jnp.concatenate([stay_tok, tok.reshape(-1)])

    m_h1, m_h2, m_pb, m_pnb, m_parent, m_tok = _merge_candidates(
        c_h1, c_h2, c_pb, c_pnb, c_parent, c_tok)

    score = _lse(m_pb, m_pnb)
    top_score, top_idx = jax.lax.top_k(score, W)

    n_h1 = m_h1[top_idx]
    n_h2 = m_h2[top_idx]
    n_pb = m_pb[top_idx]
    n_pnb = m_pnb[top_idx]
    sel_parent = m_parent[top_idx]
    sel_tok = m_tok[top_idx]

    n_prefixes = prefixes[sel_parent]                   # (W, L)
    n_lengths = lengths[sel_parent]
    n_last = last[sel_parent]
    extended = sel_tok >= 0
    n_lm_state = lm_state[sel_parent]
    if lm_tables is not None:
        # LM state advances on EVERY extension (including repeat-token
        # extends that add no LM score) — the reference recomputes its
        # context from the full prefix, which includes those tokens.
        _, next_t = lm_tables
        stepped = next_t[n_lm_state, jnp.clip(sel_tok, 0, next_t.shape[1] - 1)]
        n_lm_state = jnp.where(extended, stepped, n_lm_state)
    # Extensions past max_prefix_len spill into an overflow column that is
    # sliced away (documented truncation) rather than overwriting L-1.
    write_pos = jnp.where(extended & (n_lengths < L), n_lengths, L)
    rows = jnp.arange(W)
    padded = jnp.pad(n_prefixes, ((0, 0), (0, 1)))
    padded = padded.at[rows, write_pos].set(
        jnp.where(extended, sel_tok, padded[rows, write_pos]))
    n_prefixes = padded[:, :L]
    n_lengths = jnp.where(extended, jnp.minimum(n_lengths + 1, L), n_lengths)
    n_last = jnp.where(extended, sel_tok, n_last)

    new_state = (n_prefixes, n_lengths, n_last, n_pb, n_pnb, n_h1, n_h2,
                 n_lm_state)
    # Frames past the utterance end freeze the state (scalar `active`
    # broadcasts against every state tensor).
    return jax.tree.map(lambda new, old: jnp.where(active, new, old),
                        new_state, state)


def _beam_search_single(logp, length, beam_width, blank_id, max_prefix_len,
                        lm_bias=None, lm_weight=0.3, lm_tables=None,
                        lm_start_state=0, return_all_beams=False):
    T, V = logp.shape
    W, L = beam_width, max_prefix_len

    prefixes = jnp.zeros((W, L), dtype=jnp.int32)
    lengths = jnp.zeros((W,), dtype=jnp.int32)
    last = jnp.full((W,), -1, dtype=jnp.int32)
    p_b = jnp.full((W,), NEG_INF).at[0].set(0.0)
    p_nb = jnp.full((W,), NEG_INF)
    # Beam 0 (the live empty prefix) gets hash seed 0; dead beams get
    # distinct NEGATIVE seeds — real rolling hashes are >= 0, so a dead
    # row can never hash-merge with a live prefix (a zero-initialized
    # seed collided with single-token prefixes and silently dropped
    # tokens whenever beam_width exceeded the finite candidate count).
    h1 = -jnp.arange(W, dtype=jnp.int32)
    h2 = -jnp.arange(W, dtype=jnp.int32)
    lm_state = jnp.full((W,), lm_start_state, dtype=jnp.int32)
    state = (prefixes, lengths, last, p_b, p_nb, h1, h2, lm_state)

    def step(state, t):
        active = t < length
        new_state = _beam_step(state, logp[t], active, W, blank_id, L,
                               lm_bias=lm_bias, lm_weight=lm_weight,
                               lm_tables=lm_tables)
        return new_state, None

    state, _ = jax.lax.scan(step, state, jnp.arange(T))
    prefixes, lengths, last, p_b, p_nb, _, _, _ = state
    scores = _lse(p_b, p_nb)
    if return_all_beams:
        # All W beams + scores: callers apply the reference's final
        # word-count bonus (beta) as a host-side rerank over these.
        return prefixes, lengths, scores
    best = jnp.argmax(scores)
    return prefixes[best], lengths[best]


@partial(jax.jit, static_argnames=("beam_width", "blank_id", "max_prefix_len",
                                   "lm_weight", "lm_start_state",
                                   "return_all_beams"))
def ctc_beam_search(log_probs, lengths=None, *, beam_width=16, blank_id=0,
                    max_prefix_len=None, lm_bias=None, lm_weight=0.3,
                    lm_tables=None, lm_start_state=0, return_all_beams=False):
    """Batched on-device CTC prefix beam search.

    Args:
        log_probs: (B, T, V) log-softmax outputs.
        lengths: optional (B,) valid frame counts.
        lm_bias: optional (V+1, V) token-LM log-prob matrix for on-device
            shallow fusion (row 0 = empty context, row i+1 = last token i;
            see decode/lm.token_bigram_matrix). Added with weight
            ``lm_weight`` on different-token prefix extensions, exactly
            like the reference's LM fusion.
        lm_tables: optional (score (S, V), next_state (S, V)) arrays from
            decode/lm.build_arpa_fusion_tables — exact any-order ARPA
            backoff shallow fusion; each beam carries an int32 LM state
            starting at ``lm_start_state``. Mutually exclusive with
            ``lm_bias``.
        return_all_beams: when True, return every beam instead of the
            argmax — (ids (B, W, Lmax), counts (B, W), scores (B, W)) —
            so callers can apply the reference's final word-count bonus.

    Returns:
        (ids (B, Lmax) int32, counts (B,)) — best beam per batch item —
        or the all-beams triple described above.
    """
    if lm_bias is not None and lm_tables is not None:
        raise ValueError("pass lm_bias or lm_tables, not both")
    B, T, V = log_probs.shape
    L = max_prefix_len or T
    if lengths is None:
        lengths = jnp.full((B,), T, dtype=jnp.int32)
    fn = partial(_beam_search_single, beam_width=beam_width,
                 blank_id=blank_id, max_prefix_len=L,
                 lm_weight=lm_weight, return_all_beams=return_all_beams)
    if lm_bias is not None:
        out = jax.vmap(lambda lp, n: fn(lp, n, lm_bias=lm_bias))(
            log_probs, lengths)
    elif lm_tables is not None:
        score_t = jnp.asarray(lm_tables[0], dtype=jnp.float32)
        next_t = jnp.asarray(lm_tables[1], dtype=jnp.int32)
        out = jax.vmap(
            lambda lp, n: fn(lp, n, lm_tables=(score_t, next_t),
                             lm_start_state=lm_start_state))(
            log_probs, lengths)
    else:
        out = jax.vmap(fn)(log_probs, lengths)
    return out
