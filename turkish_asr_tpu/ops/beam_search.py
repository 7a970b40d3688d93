"""Vectorized CTC prefix beam search on device.

The reference's beam decoder is a per-timestep Python loop over a prefix
dict (/root/reference/utils/decoding.py:204-296) — T * beams * 2k host
iterations per utterance. Here the whole search runs inside one
`lax.scan`, batch-parallel under `vmap`, with fixed-shape state:

state per batch item (W = beam_width):
    last      (W,)    last token (-1 for the empty prefix)
    p_b, p_nb (W,)    log P(prefix ending in blank / non-blank)
    h1, h2    (W,)    two independent rolling hashes of the prefix
    lm_state  (W,)    ARPA fusion context state (when lm_tables given)
    lm_p      (W,)    partial-word trie node (trie fusion)
    lm_ctx    (W,)    cached complete(lm_state, lm_p) scoring context

No token buffer rides the scan: each step emits (parent, token) links and
the winning prefixes are reconstructed once at the end by a traceback
scan (eliminates a per-step (W, L) gather+scatter that dominated HBM
traffic on long utterances).

per step: W "stay" candidates (blank + same-token merge) and W*K "extend"
candidates (top-K tokens, K = 2W). Because live beams are pairwise-
distinct prefixes, the only possible duplicate is stay(P) vs
extend(parent, t) with parent + t == P, so the reference's dict merge
reduces to a (W, W*K) double-hash equality match (no sort) — matched
stays fold their mass into the extend. Top-W by total probability
survive.

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
# Rolling-hash params. Moduli sit BELOW 2^24 so hash values are exact in
# f32: the top-W merge selection runs as ONE one-hot matmul over all
# stacked payload columns (scores, parent, token, h1, h2) instead of six
# separate dynamic gathers — a single added payload gather measured ~4.5%
# of the whole config-4 pipeline (scripts/ab_trie_advance.py, round 4).
# Collision budget: 48 hash bits over W*(2W^2+W) candidate pairs/step is
# ~2^-34 per utterance-second at beam 16. The pair count grows ~W^3, so
# the budget degrades cubically with beam width: W=32 ~2^-31, W=64 ~2^-28,
# W=128 ~2^-25 — still < 1e-7 per utterance-second at the widest beam the
# bench sweeps (W=64, scripts/ab_beam_width.py), and a dual collision's
# failure mode is one wrongly-merged beam pair in one utterance, not a
# corrupted table. Revisit the moduli before offering W > 256.
_P1, _M1 = 1000003, 16777213     # largest prime < 2^24
_P2, _M2 = 4097, 16777183


def _lse(a, b):
    # jnp.logaddexp; safe here because NEG_INF is a finite sentinel.
    return jnp.logaddexp(a, b)


def _hash_step(h, tok, p, m):
    # (h * p + tok + 1) mod m, in int64-free int32 arithmetic via float64?
    # Use uint32 wraparound multiply then mod m — deterministic and cheap.
    hu = h.astype(jnp.uint32)
    out = (hu * jnp.uint32(p) + tok.astype(jnp.uint32) + jnp.uint32(1)) % jnp.uint32(m)
    return out.astype(jnp.int32)



# Measured crossover for table-row lookup inside the beam scan: below this
# many rows a one-hot matmul beats the batched dynamic gather — the
# slowest primitive on TPU; above it the O(W*S) one-hot work loses.
_ONEHOT_LOOKUP_MAX_ROWS = 4096


# Matmul precision for one-hot selection lookups. Default TPU f32 matmuls
# round operands through ONE bf16 pass (8-bit mantissa) — wrong for
# integer payloads > 256 and visibly lossy for scores. 'high' (bf16_3x,
# two 8-bit mantissa pieces per operand) is sufficient here because one
# operand is ONE-HOT: 0/1 entries are exact in a single bf16 piece, so
# every product is 1.0 * (hi + lo) of a table value — integer payloads
# < 2^16 (state/node ids, max ~4k) reconstruct exactly, and scores keep
# 16 mantissa bits (rel err 2^-17, orders below beam decision scales and
# the 1e-4 host-parity tolerance). Versus 'highest' (bf16_6x) this halves
# the MXU passes of the LM-fusion hot loop.
_LOOKUP_PRECISION = "high"


def _row_lookup(table, idx):
    """table[idx] for a (S, V) table and (W,) int rows, gather-free when
    S is small (one-hot selection matmul; see _LOOKUP_PRECISION)."""
    S = table.shape[0]
    if S <= _ONEHOT_LOOKUP_MAX_ROWS:
        oh = jax.nn.one_hot(idx, S, dtype=jnp.float32)
        return jnp.dot(oh, table.astype(jnp.float32),
                       precision=_LOOKUP_PRECISION)
    return table[idx].astype(jnp.float32)


def _pick_col(rows, cols, n_cols):
    """rows[i, cols[i]] for (W, C) rows and (W,) cols — masked one-hot sum
    (payloads exact in f32 up to 2^24; gathers are slow on TPU)."""
    oh = jax.nn.one_hot(cols, n_cols, dtype=jnp.float32)
    return jnp.sum(rows * oh, axis=1)


# Above this table size, cell lookups use a targeted 2D gather instead of
# the one-hot matmul sandwich (which reads the whole table per step).
# Measured NEUTRAL at the bench trie size (2389x2389, 1.00x —
# scripts/ab_trie_lookup.py), but it is what keeps production-scale ARPA
# word tables (100k+ words -> 1e9+ cells) usable at all.
_CELL_GATHER_MIN_ELEMS = 1 << 20
# One-hot intermediate cap for 1-D/vocab-vector lookups (per beam set;
# vmap multiplies by batch). One-hot sums beat vmapped dynamic gathers
# for small tables — the per-step vocab-vector gathers, NOT the big
# state-table lookups, carried the bulk of the trie-vs-word-table gap
# (scripts/ab_trie_noop.py: stubbing every cell lookup changed nothing;
# one-hot sums won 20%). Integer payloads are exact in f32 below 2^24.
# Above the cap the O(K * V) intermediate would dwarf the gather (a
# 100k-node trie from a production ARPA), so fall back.
_VEC_ONEHOT_MAX_ELEMS = 1 << 17


def _vec_lookup(vec, idx):
    """vec[idx] for a 1-D table -> f32. One-hot sum instead of a vmapped
    dynamic gather for small tables (see _VEC_ONEHOT_MAX_ELEMS).
    Integer payloads are exact in f32 below 2^24."""
    if idx.size * vec.shape[0] <= _VEC_ONEHOT_MAX_ELEMS:
        oh = jax.nn.one_hot(idx, vec.shape[0], dtype=jnp.float32)
        return jnp.sum(oh * vec.astype(jnp.float32)[None, :], axis=1)
    return vec[idx].astype(jnp.float32)


def _cell_lookup_outer(table, rows, cols):
    """table[rows[i], cols[j]] -> (W, K). One-hot matmul sandwich for
    small tables, targeted 2D gather for big ones (the sandwich
    materializes a (W, C) intermediate — full-table work per step)."""
    if table.size < _CELL_GATHER_MIN_ELEMS:
        r = _row_lookup(table, rows)
        oh = jax.nn.one_hot(cols, table.shape[1], dtype=jnp.float32)
        return jnp.dot(r, oh.T, precision=_LOOKUP_PRECISION)
    return table[rows[:, None], cols[None, :]].astype(jnp.float32)


def _cell_lookup_pair(table, rows, cols):
    """table[rows[i], cols[i]] -> (W,); same size policy as above."""
    if table.size < _CELL_GATHER_MIN_ELEMS:
        return _pick_col(_row_lookup(table, rows), cols, table.shape[1])
    return table[rows, cols].astype(jnp.float32)


def _cell_lookup_pair_dual(table2, rows, cols, n_cols):
    """Two paired cell lookups from ONE interleaved (P, 2*n_cols) table:
    returns (A[r, c], B[r, c]) where A = table2[:, :n_cols] and
    B = table2[:, n_cols:]. A single row matmul serves both — the fused
    trie advance needs pnext and wq at the same (row, col), and two
    independent one-hot sandwiches measured SLOWER than the op chain
    they replaced (scripts/ab_trie_advance.py)."""
    if table2.size < 2 * _CELL_GATHER_MIN_ELEMS:
        r = _row_lookup(table2, rows)                     # (W, 2*n_cols)
        oh = jax.nn.one_hot(cols, n_cols, dtype=jnp.float32)
        return (jnp.sum(r[:, :n_cols] * oh, axis=1),
                jnp.sum(r[:, n_cols:] * oh, axis=1))
    return (table2[rows, cols].astype(jnp.float32),
            table2[rows, n_cols + cols].astype(jnp.float32))


# ---------------------------------------------------------------------------
# Production-scale ARPA fusion: probing-hash n-gram scoring
# (decode/lm.build_hash_fusion_tables). Beams carry a context WINDOW of
# the last (order-1) ARPA word ids instead of a dense-state id; scoring
# is the exact _cond_score Katz recursion with fixed-depth hash probes.
# ---------------------------------------------------------------------------


def _hash_params():
    # Lazy: decode.lm owns the table-hash constants (the builder is
    # jax-free); importing it at module load would cycle through
    # decode/__init__ -> factory -> this module.
    from turkish_asr_tpu.decode.lm import (HASH_M1, HASH_M2, HASH_P1,
                                           HASH_P2)
    return HASH_P1, HASH_M1, HASH_P2, HASH_M2


def _hash_roll(ids, p, m):
    """Rolling hash over the LAST axis of ids (..., L) -> (...,) int32,
    matching decode/lm._roll_hash_np bit-for-bit."""
    h = jnp.zeros(ids.shape[:-1], jnp.int32)
    for i in range(ids.shape[-1]):
        h = _hash_step(h, ids[..., i], p, m)
    return h


def _hash_probe(ht, h1, h2):
    """Two-choice cuckoo probe: every entry sits at slot1 = (h1·P1 mod
    2^32) % size or slot2 = (h2·HASH_MIX2 mod 2^32) % size (decode/lm.
    _arpa_hash_table places them; must match bit-for-bit, uint32 wrap).
    Returns (found, prob, bo), each shaped like h1. Keys are compared as
    int32 — no f32 round-trip.

    Exactly 2 gathered rows per probe point: the gather is ~linear in
    fetched rows on v5e (scripts/ab_hash_probe_cost.py — the former
    depth-8 linear-probe chain cost 474 vs 178 ms/iter at depth 2 on the
    100k-ARPA config-4 bench), so the row count IS the probe cost. The
    slot mixes also de-cluster prefix-sharing n-grams whose raw rolling
    hashes are CONSECUTIVE integers (unigrams are id+1).

    Reads ride ONE fused (N, 4) slab [h1 h2 prob bo] (prob/bo bitcast to
    i32; built once per search in ctc_beam_search) so each probe row is
    a single contiguous 16-byte fetch instead of two random streams."""
    from turkish_asr_tpu.decode.lm import HASH_MIX2
    hp1 = _hash_params()[0]
    slab = ht.get("slab")
    if slab is None:  # direct-call convenience (tests): fuse on the fly
        slab = jnp.concatenate(
            [jnp.asarray(ht["keys"], jnp.int32),
             jax.lax.bitcast_convert_type(
                 jnp.asarray(ht["vals"], jnp.float32), jnp.int32)], axis=1)
    # Table size is the slab's STATIC leading dim — no separately-plumbed
    # meta int that could be mis-paired with a differently-sized table.
    size = jnp.uint32(slab.shape[0])
    m1 = h1.astype(jnp.uint32) * jnp.uint32(hp1)     # wraps mod 2^32
    m2 = h2.astype(jnp.uint32) * jnp.uint32(HASH_MIX2)
    idx = jnp.stack([(m1 % size).astype(jnp.int32),
                     (m2 % size).astype(jnp.int32)], axis=-1)  # (..., 2)
    rows = slab[idx]                                 # (..., D, 4) i32
    hit = (rows[..., 0] == h1[..., None]) & (rows[..., 1] == h2[..., None])
    # When an entry's two cuckoo slots COINCIDE (slot1 == slot2, ~1/size
    # odds per entry — expected ~0.5 entries per production table), both
    # gathered rows are the same slot and would hit twice, doubling the
    # summed prob/backoff. Mask the duplicate so at most one hit counts.
    hit = hit.at[..., 1].set(hit[..., 1] & (idx[..., 1] != idx[..., 0]))
    hitf = hit.astype(jnp.float32)                   # at most one hit now
    found = jnp.any(hit, axis=-1)
    pv = jax.lax.bitcast_convert_type(rows[..., 2], jnp.float32)
    bv = jax.lax.bitcast_convert_type(rows[..., 3], jnp.float32)
    prob = jnp.sum(pv * hitf, axis=-1)
    bo = jnp.sum(bv * hitf, axis=-1)
    return found, prob, bo


def _hash_lm_scores(ht, ctx, wids):
    """log10 p(w | ctx) for every (beam, candidate) pair — the exact
    ArpaLanguageModel._cond_score recursion, vectorized:

        s_0 = unigram(w)          (unk_prob when even that is missing)
        s_j = prob_j              if n-gram (ctx[-j:], w) exists
            = s_{j-1} + bo_j      otherwise (bo_j = backoff(ctx[-j:]),
                                  0 when that context n-gram is absent)

    ctx (W, m) i32 word-id windows (HASH_PAD_ID-padded on the left: a
    padded suffix simply never hits the table — found=False, bo=0 — which
    reproduces _cond_score's shorter-history behavior exactly).
    wids (K,) i32. Returns (W, m ignored...) -> (W, K) f32.
    """
    hp1, hm1, hp2, hm2 = _hash_params()
    W = ctx.shape[0]
    m = ctx.shape[1]
    K = wids.shape[0]
    # One probe call per point set (1 + 2m per step). Folding them all
    # into a single concatenated gather was MEASURED SLOWER (110.6 vs
    # 98.1 ms/iter on the 100k config-4 bench) — the (K + m(W+WK),)
    # concats cost more than the per-op overhead they save. Don't re-fuse.
    # j = 0: unigram (w,) — shared across beams AND (under probe-dedup,
    # where wids = the static uniq_q) across scan steps: the caller
    # hoists it out of the scan as "_s0" (ctc_beam_search) so the
    # unigram rows are fetched once per search, not once per frame.
    s0 = ht.get("_s0")
    if s0 is None:
        u1 = _hash_step(jnp.zeros((K,), jnp.int32), wids, hp1, hm1)
        u2 = _hash_step(jnp.zeros((K,), jnp.int32), wids, hp2, hm2)
        f0, p0, _ = _hash_probe(ht, u1, u2)
        s0 = jnp.where(f0, p0, ht["unk_prob"])
    s = jnp.broadcast_to(s0[None, :], (W, K))
    wk = jnp.broadcast_to(wids[None, :], (W, K))
    for j in range(1, m + 1):
        sfx = ctx[:, m - j:]                          # (W, j)
        c1 = _hash_roll(sfx, hp1, hm1)                # (W,)
        c2 = _hash_roll(sfx, hp2, hm2)
        fb, _, bo = _hash_probe(ht, c1, c2)           # context backoff
        bo = jnp.where(fb, bo, 0.0)
        n1 = _hash_step(c1[:, None], wk, hp1, hm1)    # (W, K)
        n2 = _hash_step(c2[:, None], wk, hp2, hm2)
        fj, pj, _ = _hash_probe(ht, n1, n2)
        s = jnp.where(fj, pj, s + bo[:, None])
    return s


def _window_append(win, wid):
    """Shift-append word ids into (W, m) context windows — the hash-mode
    complete(h, p): where wid < 0 the window is unchanged."""
    appended = jnp.concatenate([win[:, 1:], jnp.maximum(wid, 0)[:, None]],
                               axis=1)
    return jnp.where((wid < 0)[:, None], win, appended)


def _beam_step(state, logp_t, active, beam_width, blank_id,
               lm_bias=None, lm_weight=0.3, lm_tables=None, lm_trie=None,
               lm_hash=None):
    last, p_b, p_nb, h1, h2, lm_state, lm_p, lm_ctx = state
    W = beam_width
    V = logp_t.shape[0]
    K = min(V, 2 * W)  # top-K expansion, K = 2W like the reference

    top_logp, top_tok = jax.lax.top_k(logp_t, K)       # (K,)
    total = _lse(p_b, p_nb)                            # (W,)
    lp_blank = logp_t[blank_id]

    # --- stay candidates (W): blank transition + same-token merge --------
    stay_pb = total + lp_blank
    lp_last_rows = jnp.dot(
        jax.nn.one_hot(jnp.clip(last, 0, V - 1), V, dtype=jnp.float32),
        logp_t, precision=_LOOKUP_PRECISION)                                # (W,)
    lp_last = jnp.where(last >= 0, lp_last_rows, NEG_INF)
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
    # One-hot matmuls instead of gathers throughout the LM fusion: batched
    # dynamic gathers under vmap are the single slowest primitive on TPU
    # (measured: ARPA fusion via row gathers tripled the whole beam step).
    # The candidate token set is shared across beams (top_tok), so the
    # (W, V) row lookup and the (W, K) column pick both become small MXU
    # matmuls against one-hot matrices.
    oh_tok_t = None
    if lm_bias is not None or lm_tables is not None:
        oh_tok_t = jax.nn.one_hot(top_tok, V, dtype=jnp.float32).T  # (V, K)
    if lm_bias is not None:
        # Shallow fusion on prefix extension — like the reference, LM score
        # is added only on the different-token extend case
        # (/root/reference/utils/decoding.py:261-263).
        S = lm_bias.shape[0]
        lm_rows = _row_lookup(lm_bias,
                              jnp.clip(last + 1, 0, S - 1))         # (W, V)
        lm = jnp.dot(lm_rows, oh_tok_t, precision=_LOOKUP_PRECISION)        # (W, K)
        ext_pnb = jnp.where(is_repeat | is_blank, ext_pnb,
                            ext_pnb + lm_weight * lm)
    if lm_tables is not None:
        # Exact ARPA backoff fusion: each beam carries an int32 LM state
        # (decode/lm.build_arpa_fusion_tables). Applied on different-token
        # extensions only, like the reference's KenLM branch. Above a few
        # thousand LM states the one-hot matmul's O(W*S) work loses to the
        # gather and the row lookup falls back.
        score_t, _ = lm_tables
        lm_rows = _row_lookup(score_t, lm_state)                    # (W, V)
        lm = jnp.dot(lm_rows, oh_tok_t, precision=_LOOKUP_PRECISION)        # (W, K)
        ext_pnb = jnp.where(is_repeat | is_blank, ext_pnb,
                            ext_pnb + lm_weight * lm)
    if lm_trie is not None:
        # Trie-augmented ARPA fusion for subword/char tokenizers
        # (decode/lm.build_trie_fusion_tables): beam state = (h = word
        # FSM state of the COMPLETED words, p = trie node of the partial
        # word, ctx = complete(h, p)). Scoring context = ctx: the host
        # beam treats the partial word as a full context word
        # (decode(prefix).split() — beam.py _lm_score), so the context is
        # the state after emitting the partial's vocab word (<unk> when it
        # is no word). ctx rides the beam state — recomputing
        # complete(h, p) here cost a (W, S)x(S, Wa) next_w lookup every
        # step; the advance below maintains it with the one lookup it
        # already needs.
        q = _vec_lookup(lm_trie["qwid"], top_tok).astype(jnp.int32)  # (K,)
        kind_k = _vec_lookup(lm_trie["tok_kind"],
                             top_tok).astype(jnp.int32)            # (K,)
        scores_word = (kind_k == 1) | (kind_k == 3) | (kind_k == 4)
        lm = _cell_lookup_outer(lm_trie["score_w"], lm_ctx, q)      # (W, K)
        lm = jnp.where(scores_word[None, :], lm, 0.0)
        ext_pnb = jnp.where(is_repeat | is_blank, ext_pnb,
                            ext_pnb + lm_weight * lm)
    if lm_hash is not None:
        # Production-scale trie fusion: same trie front and scoring
        # semantics as lm_trie, but the scoring context is a WINDOW of
        # word ids (lm_ctx (W, m)) probed against the n-gram hash table —
        # exact _cond_score Katz backoff, linear memory in the ARPA
        # (decode/lm.build_hash_fusion_tables).
        kind_k = _vec_lookup(lm_hash["tok_kind"],
                             top_tok).astype(jnp.int32)            # (K,)
        scores_word = (kind_k == 1) | (kind_k == 3) | (kind_k == 4)
        uq = lm_hash.get("uniq_q")
        if uq is not None and uq.shape[0] < K:
            # Probe-dedup: qwid maps the V tokens onto K2 < K distinct
            # word ids (char tokenizers: nearly all fragments -> <unk>),
            # and the score depends only on (ctx, word id) — so probe the
            # K2 distinct ids once and select candidate columns with an
            # exact one-hot matmul ('highest': a*1.0 sums exactly).
            K2 = uq.shape[0]
            lm_all = _hash_lm_scores(lm_hash, lm_ctx, uq)           # (W, K2)
            col = _vec_lookup(lm_hash["qcol"], top_tok).astype(jnp.int32)
            oh = jax.nn.one_hot(col, K2, dtype=jnp.float32)         # (K, K2)
            # 'highest' keeps the column pick EXACT (1.0 decomposes into
            # a single bf16 piece), so the dedup branch is bit-identical
            # to per-candidate probing — not merely close.
            lm = jnp.dot(lm_all, oh.T, precision="highest")          # (W, K)
        else:
            q = _vec_lookup(lm_hash["qwid"], top_tok).astype(jnp.int32)
            # per-candidate wids vary by step: the hoisted "_s0" (computed
            # over the static uniq_q) does not apply here.
            ht2 = {k: v for k, v in lm_hash.items() if k != "_s0"}
            lm = _hash_lm_scores(ht2, lm_ctx, q)                    # (W, K)
        lm = jnp.where(scores_word[None, :], lm, 0.0)
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

    # --- merge, select ----------------------------------------------------
    # Structural fact that replaces a full sort-merge: live beams are
    # pairwise-distinct prefixes, so two EXTEND candidates can never be
    # equal (equal results need the same parent prefix and same token),
    # and two STAY candidates can never be equal. The only possible merge
    # is stay(prefix P) with extend(parent, t) where parent + t == P.
    # A (W, W*K) double-hash equality match therefore performs the exact
    # dict-merge of the reference without sorting 6 payload arrays over
    # W*(K+1) candidates (with the traceback + gather-free LM fusion:
    # 4.2k -> 8k+ RTFx at beam-16/B=128 on v5e).
    e_h1 = ext_h1.reshape(-1)
    e_h2 = ext_h2.reshape(-1)
    e_pnb = ext_pnb.reshape(-1)
    eq = ((stay_h1[:, None] == e_h1[None, :])
          & (stay_h2[:, None] == e_h2[None, :]))         # (W, W*K)
    stay_matched = jnp.any(eq, axis=1)                   # (W,)
    # Fold the matched stay's mass into the extend (extend pb is -inf).
    # Masked max over the W stay rows instead of a gather: at most one
    # row matches, and batched dynamic gathers are slow on TPU (see the
    # payload-sort note in git history for the measured pitfall).
    m_e_pb = jnp.max(jnp.where(eq, stay_pb[:, None], NEG_INF), axis=0)
    m_e_pnb = _lse(e_pnb, jnp.max(jnp.where(eq, stay_pnb[:, None], NEG_INF),
                                  axis=0))
    # Matched stays are disabled (their mass lives in the extend now).
    m_s_pb = jnp.where(stay_matched, NEG_INF, stay_pb)
    m_s_pnb = jnp.where(stay_matched, NEG_INF, stay_pnb)

    m_h1 = jnp.concatenate([stay_h1, e_h1])
    m_h2 = jnp.concatenate([stay_h2, e_h2])
    m_pb = jnp.concatenate([m_s_pb, m_e_pb])
    m_pnb = jnp.concatenate([m_s_pnb, m_e_pnb])
    m_parent = jnp.concatenate([stay_parent, ext_parent.reshape(-1)])
    m_tok = jnp.concatenate([stay_tok, tok.reshape(-1)])

    score = _lse(m_pb, m_pnb)
    top_score, top_idx = jax.lax.top_k(score, W)

    # Winner payload fetch as ONE one-hot selection matmul instead of six
    # dynamic gathers (each batched gather under vmap measured ~4.5% of
    # the whole config-4 pipeline). precision='highest' makes one-hot
    # selection EXACT: 1.0 decomposes into a single bf16 piece, so every
    # product returns the payload's full f32 bits (same trick as the CTC
    # kernel's emission lookup). Hash payloads are < 2^24 by construction
    # (_M1/_M2), parent/token ids are small ints, scores are f32.
    oh_sel = jax.nn.one_hot(top_idx, m_pb.shape[0], dtype=jnp.float32)
    payload = jnp.stack(
        [m_pb, m_pnb, m_parent.astype(jnp.float32),
         m_tok.astype(jnp.float32), m_h1.astype(jnp.float32),
         m_h2.astype(jnp.float32)], axis=1)            # (W*(K+1), 6)
    sel = jnp.dot(oh_sel, payload, precision="highest")  # (W, 6)
    n_pb = sel[:, 0]
    n_pnb = sel[:, 1]
    sel_parent = sel[:, 2].astype(jnp.int32)
    sel_tok = sel[:, 3].astype(jnp.int32)
    n_h1 = sel[:, 4].astype(jnp.int32)
    n_h2 = sel[:, 5].astype(jnp.int32)

    extended = sel_tok >= 0
    # Parent-state fetch: same one-hot trick folds all gathers into one
    # (W, W) selection matmul (ids < 2^24, exact under 'highest').
    # lm_state/lm_ctx are (W,) dense-state ids for lm_tables/lm_trie and
    # (W, m) word-id windows for lm_hash — stacked as columns either way
    # (HASH_PAD_ID = 2^22 < 2^24 stays exact).
    ls2 = lm_state if lm_state.ndim == 2 else lm_state[:, None]
    lc2 = lm_ctx if lm_ctx.ndim == 2 else lm_ctx[:, None]
    mS = ls2.shape[1]
    oh_par = jax.nn.one_hot(sel_parent, W, dtype=jnp.float32)
    pstack = jnp.concatenate(
        [last[:, None].astype(jnp.float32), ls2.astype(jnp.float32),
         lm_p[:, None].astype(jnp.float32), lc2.astype(jnp.float32)],
        axis=1)
    psel = jnp.dot(oh_par, pstack, precision="highest")  # (W, 2+2m)
    n_last = jnp.where(extended, sel_tok, psel[:, 0].astype(jnp.int32))
    n_lm_state = psel[:, 1:1 + mS].astype(jnp.int32)
    n_lm_p = psel[:, 1 + mS].astype(jnp.int32)
    n_lm_ctx = psel[:, 2 + mS:2 + 2 * mS].astype(jnp.int32)
    if lm_state.ndim == 1:
        n_lm_state = n_lm_state[:, 0]
        n_lm_ctx = n_lm_ctx[:, 0]
    if lm_trie is not None:
        # State advance per token kind (decode/lm.py _KIND_*):
        #   0 empty      : (h, p) unchanged
        #   1 "frag"     : p -> walk(p, frag)
        #   2 " "        : h -> complete(h, p), p -> root
        #   3 " frag"    : h -> complete(h, p), p -> walk(root, frag)
        #   4 "frag "    : h -> complete(h, walk(p, frag)), p -> root
        # Round-4 fused form: the kind dispatch over p' and the dependent
        # wid lookup are FOLDED into two precomputed tables (decode/lm.
        # derive_fused_trie_advance) — pnext[p, v] is the full p
        # transition, wq[p, v] the word id the scoring context completes
        # against (-1 = none). The two cell lookups are independent;
        # only the next_w completion remains on the dependent path.
        # The carried ctx' = complete(h', p') shares that one lookup
        # with h': base = h except kind 3 (whose new partial completes
        # against the just-advanced context):
        #   kind 0/2: ctx' = ctx (p empty or unchanged pair)
        #   kind 1/4: ctx' = complete(h, pw)        (base = h)
        #   kind 3  : ctx' = complete(ctx, pw)      (base = ctx)
        tok_c = jnp.clip(sel_tok, 0, V - 1)
        kind = _vec_lookup(lm_trie["tok_kind"],
                           tok_c).astype(jnp.int32)                # (W,)
        pn, wq = _cell_lookup_pair_dual(lm_trie["pnw"], n_lm_p,
                                        tok_c, V)                  # (W,)x2
        pn = pn.astype(jnp.int32)
        wq = wq.astype(jnp.int32)
        base = jnp.where(kind == 3, n_lm_ctx, n_lm_state)
        comp = _cell_lookup_pair(lm_trie["next_w"], base,
                                 jnp.maximum(wq, 0)).astype(jnp.int32)
        comp = jnp.where(wq < 0, base, comp)
        h_next = jnp.where(kind == 4, comp,
                           jnp.where(kind >= 2, n_lm_ctx, n_lm_state))
        ctx_next = jnp.where((kind == 0) | (kind == 2), n_lm_ctx, comp)
        n_lm_state = jnp.where(extended, h_next, n_lm_state)
        n_lm_p = jnp.where(extended, pn, n_lm_p)
        n_lm_ctx = jnp.where(extended, ctx_next, n_lm_ctx)
    if lm_hash is not None:
        # Same kind-dispatched advance as lm_trie, with word-id WINDOWS:
        # complete(h, p) = shift-append of wq — the dense path's next_w
        # lookup disappears entirely.
        tok_c = jnp.clip(sel_tok, 0, V - 1)
        kind = _vec_lookup(lm_hash["tok_kind"],
                           tok_c).astype(jnp.int32)                # (W,)
        pn, wq = _cell_lookup_pair_dual(lm_hash["pnw"], n_lm_p,
                                        tok_c, V)                  # (W,)x2
        pn = pn.astype(jnp.int32)
        wq = wq.astype(jnp.int32)
        base = jnp.where((kind == 3)[:, None], n_lm_ctx, n_lm_state)
        comp = _window_append(base, wq)                            # (W, m)
        k_col = kind[:, None]
        h_next = jnp.where(k_col == 4, comp,
                           jnp.where(k_col >= 2, n_lm_ctx, n_lm_state))
        ctx_next = jnp.where((k_col == 0) | (k_col == 2), n_lm_ctx, comp)
        ext_col = extended[:, None]
        n_lm_state = jnp.where(ext_col, h_next, n_lm_state)
        n_lm_p = jnp.where(extended, pn, n_lm_p)
        n_lm_ctx = jnp.where(ext_col, ctx_next, n_lm_ctx)
    if lm_tables is not None:
        # LM state advances on EVERY extension (including repeat-token
        # extends that add no LM score) — the reference recomputes its
        # context from the full prefix, which includes those tokens.
        _, next_t = lm_tables
        tok_c = jnp.clip(sel_tok, 0, next_t.shape[1] - 1)
        rows = _row_lookup(next_t, n_lm_state)                      # (W, V)
        # column pick via a masked row-wise sum (state-id payloads are
        # exact in f32 up to 2^24)
        stepped = jnp.sum(
            rows * jax.nn.one_hot(tok_c, next_t.shape[1],
                                  dtype=jnp.float32),
            axis=1).astype(jnp.int32)
        n_lm_state = jnp.where(extended, stepped, n_lm_state)

    new_state = (n_last, n_pb, n_pnb, n_h1, n_h2, n_lm_state, n_lm_p,
                 n_lm_ctx)
    # Frames past the utterance end freeze the state (scalar `active`
    # broadcasts against every state tensor).
    new_state = jax.tree.map(lambda new, old: jnp.where(active, new, old),
                             new_state, state)
    # Traceback record: no (W, L) prefix buffer rides the scan — prefixes
    # are reconstructed ONCE at the end from these per-step links, which
    # removes the per-step (W, L) gather+scatter entirely. Frozen frames
    # record identity links so chains pass through unchanged.
    y_parent = jnp.where(active, sel_parent, jnp.arange(W))
    y_tok = jnp.where(active, sel_tok, -1)
    return new_state, (y_parent, y_tok)


def _beam_search_single(logp, length, beam_width, blank_id, max_prefix_len,
                        lm_bias=None, lm_weight=0.3, lm_tables=None,
                        lm_trie=None, lm_hash=None, lm_start_state=0,
                        return_all_beams=False):
    T, V = logp.shape
    W, L = beam_width, max_prefix_len

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
    if lm_hash is not None:
        # Hash fusion: (W, m) word-id context windows (start = <s>).
        start = lm_hash["start_ctx"].astype(jnp.int32)         # (m,)
        lm_state = jnp.broadcast_to(start[None, :],
                                    (W, start.shape[0]))
        lm_ctx = lm_state
    else:
        lm_state = jnp.full((W,), lm_start_state, dtype=jnp.int32)
        # complete(start, root) == start: the carried scoring context
        # seeds to the start state (inert for non-trie modes).
        lm_ctx = jnp.full((W,), lm_start_state, dtype=jnp.int32)
    lm_p = jnp.zeros((W,), dtype=jnp.int32)  # trie root (empty partial)
    state = (last, p_b, p_nb, h1, h2, lm_state, lm_p, lm_ctx)

    def step(state, t):
        active = t < length
        return _beam_step(state, logp[t], active, W, blank_id,
                          lm_bias=lm_bias, lm_weight=lm_weight,
                          lm_tables=lm_tables, lm_trie=lm_trie,
                          lm_hash=lm_hash)

    state, (parents, toks) = jax.lax.scan(step, state, jnp.arange(T))
    p_b, p_nb = state[1], state[2]
    scores = _lse(p_b, p_nb)

    # Backtrace rides the per-step link rows as scan xs (no dynamic row
    # index) and picks the followed column with an exact one-hot dot —
    # zero dynamic gathers, like the merge selection above. parent < W
    # and token+1 < V+1 pack into one payload column.
    if W * (V + 2) >= 1 << 24:  # packed payload must stay f32-exact
        raise ValueError(f"beam_width*vocab too large for the packed "
                         f"backtrace payload: {W} * {V + 2} >= 2**24")
    packed_links = parents * (V + 2) + (toks + 1)        # (T, W)
    packed_rev = packed_links[::-1].astype(jnp.float32)

    def backtrace(final_idx):
        """Follow (parent, token) links backwards from a final beam and
        left-pack the emitted tokens -> (ids (L,), count)."""
        def bstep(cur, row):
            oh = jax.nn.one_hot(cur, W, dtype=jnp.float32)
            v = jnp.dot(oh, row, precision="highest").astype(jnp.int32)
            return v // (V + 2), v % (V + 2) - 1
        _, toks_rev = jax.lax.scan(bstep, final_idx, packed_rev)
        tf = toks_rev[::-1]                          # (T,) forward order
        emitted = tf >= 0
        pos = jnp.cumsum(emitted) - 1
        count = jnp.minimum(emitted.sum(), L).astype(jnp.int32)
        # Tokens beyond L and non-emitted frames land in dump slot L
        # (sliced away) — same truncation contract as the old carried
        # (W, L) buffer.
        slot = jnp.where(emitted & (pos < L), pos, L)
        buf = jnp.zeros((L + 1,), jnp.int32).at[slot].set(tf)
        return buf[:L], count

    if return_all_beams:
        # All W beams + scores: callers apply the reference's final
        # word-count bonus (beta) as a host-side rerank over these.
        ids, counts = jax.vmap(backtrace)(jnp.arange(W))
        return ids, counts, scores
    return backtrace(jnp.argmax(scores))


@partial(jax.jit, static_argnames=("beam_width", "blank_id", "max_prefix_len",
                                   "lm_weight", "lm_start_state",
                                   "return_all_beams"))
def ctc_beam_search(log_probs, lengths=None, *, beam_width=16, blank_id=0,
                    max_prefix_len=None, lm_bias=None, lm_weight=0.3,
                    lm_tables=None, lm_trie=None, lm_hash=None,
                    lm_start_state=0, return_all_beams=False):
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
        lm_trie: optional dict from decode/lm.build_trie_fusion_tables —
            trie-augmented ARPA fusion for char/subword tokenizers; each
            beam carries (word-FSM state, partial-word trie node). Its
            "start_h" seeds ``lm_start_state``.
        lm_hash: optional dict from decode/lm.build_hash_fusion_tables —
            PRODUCTION-SCALE trie fusion (100k+-word ARPAs): same
            semantics as lm_trie, with hash-probed n-gram scoring and
            (W, order-1) word-id context windows per beam. Array fields
            only (the table size is the keys array's static shape).
        return_all_beams: when True, return every beam instead of the
            argmax — (ids (B, W, Lmax), counts (B, W), scores (B, W)) —
            so callers can apply the reference's final word-count bonus.

    Returns:
        (ids (B, Lmax) int32, counts (B,)) — best beam per batch item —
        or the all-beams triple described above.
    """
    if sum(x is not None
           for x in (lm_bias, lm_tables, lm_trie, lm_hash)) > 1:
        raise ValueError(
            "pass at most one of lm_bias/lm_tables/lm_trie/lm_hash")
    B, T, V = log_probs.shape
    for name, tabs in (("lm_trie", lm_trie), ("lm_hash", lm_hash)):
        if tabs is None:
            continue
        if "pnext" not in tabs or "wq" not in tabs:
            # Pre-round-4 dicts carry ptrans/wid only; a bare KeyError
            # below would hide the actual problem. DeviceBeamDecoder
            # backfills old dicts automatically — direct callers must
            # rebuild (or derive) themselves because this function is
            # jitted and cannot run the host-side derivation.
            raise ValueError(
                f"{name} lacks the fused advance tables 'pnext'/'wq' "
                f"(added round 4) — rebuild the fusion tables, or derive "
                f"them with decode.lm.derive_fused_trie_advance(ptrans, "
                f"wid, tok_kind) as decode.factory.DeviceBeamDecoder does")
        if tabs["pnext"].shape[1] != V:
            raise ValueError(
                f"fusion tables were built for vocab_size="
                f"{tabs['pnext'].shape[1]} but log_probs has V={V} — "
                f"rebuild with the model's n_classes")
    L = max_prefix_len or T
    if lengths is None:
        lengths = jnp.full((B,), T, dtype=jnp.int32)
    fn = partial(_beam_search_single, beam_width=beam_width,
                 blank_id=blank_id, max_prefix_len=L,
                 lm_weight=lm_weight, return_all_beams=return_all_beams)
    if lm_bias is not None:
        out = jax.vmap(lambda lp, n: fn(lp, n, lm_bias=lm_bias))(
            log_probs, lengths)
    elif lm_trie is not None:
        # arrays only (jit arg): the start state rides the static
        # lm_start_state — callers pass lm_start_state=tables["start_h"].
        trie = {
            "score_w": jnp.asarray(lm_trie["score_w"], jnp.float32),
            "next_w": jnp.asarray(lm_trie["next_w"], jnp.int32),
            # Interleaved (P, 2V) [pnext | wq] — concatenated once per
            # call (outside the scan) so the per-step advance reads both
            # with one row lookup (_cell_lookup_pair_dual).
            "pnw": jnp.concatenate(
                [jnp.asarray(lm_trie["pnext"], jnp.int32),
                 jnp.asarray(lm_trie["wq"], jnp.int32)], axis=1),
            "tok_kind": jnp.asarray(lm_trie["tok_kind"], jnp.int32),
            "qwid": jnp.asarray(lm_trie["qwid"], jnp.int32),
        }
        out = jax.vmap(
            lambda lp, n: fn(lp, n, lm_trie=trie,
                             lm_start_state=lm_start_state))(
            log_probs, lengths)
    elif lm_hash is not None:
        ht = {
            # Fused probe slab [h1 h2 prob bo] — one contiguous fetch per
            # probe point (_hash_probe) instead of two random streams.
            "slab": jnp.concatenate(
                [jnp.asarray(lm_hash["keys"], jnp.int32),
                 jax.lax.bitcast_convert_type(
                     jnp.asarray(lm_hash["vals"], jnp.float32),
                     jnp.int32)], axis=1),
            "pnw": jnp.concatenate(
                [jnp.asarray(lm_hash["pnext"], jnp.int32),
                 jnp.asarray(lm_hash["wq"], jnp.int32)], axis=1),
            "tok_kind": jnp.asarray(lm_hash["tok_kind"], jnp.int32),
            "qwid": jnp.asarray(lm_hash["qwid"], jnp.int32),
            "start_ctx": jnp.asarray(lm_hash["start_ctx"], jnp.int32),
            "unk_prob": jnp.asarray(lm_hash["unk_prob"], jnp.float32),
        }
        if "uniq_q" in lm_hash:  # probe-dedup (builders emit since r4)
            ht["uniq_q"] = jnp.asarray(lm_hash["uniq_q"], jnp.int32)
            ht["qcol"] = jnp.asarray(lm_hash["qcol"], jnp.int32)
            # Hoist the unigram scores out of the scan: under probe-dedup
            # the candidate word-id set IS uniq_q (static), so the j=0
            # probe is step-invariant — fetch its rows once per search
            # instead of once per frame (round 5; _hash_lm_scores).
            hp1, hm1, hp2, hm2 = _hash_params()
            uq = ht["uniq_q"]
            z = jnp.zeros(uq.shape, jnp.int32)
            f0, p0, _ = _hash_probe(ht, _hash_step(z, uq, hp1, hm1),
                                    _hash_step(z, uq, hp2, hm2))
            ht["_s0"] = jnp.where(f0, p0, ht["unk_prob"])
        out = jax.vmap(lambda lp, n: fn(lp, n, lm_hash=ht))(
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
