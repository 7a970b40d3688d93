import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from turkish_asr_tpu.data.tokenizer import TurkishTokenizer
from turkish_asr_tpu.decode.greedy import GreedyDecoder, greedy_collapse_batch
from turkish_asr_tpu.decode.beam import CTCBeamDecoder
from turkish_asr_tpu.ops.beam_search import ctc_beam_search


def _tok():
    t = TurkishTokenizer()
    return t


def test_greedy_collapse_batch():
    # V=4, blank=0. Sequence argmax: [1,1,0,1,2,2] -> [1,1,2]
    T, V = 6, 4
    logits = np.full((1, T, V), -5.0, dtype=np.float32)
    for t, v in enumerate([1, 1, 0, 1, 2, 2]):
        logits[0, t, v] = 5.0
    ids, counts = greedy_collapse_batch(jnp.asarray(logits), blank_id=0)
    assert int(counts[0]) == 3
    assert np.asarray(ids)[0, :3].tolist() == [1, 1, 2]


def test_greedy_collapse_respects_lengths():
    logits = np.full((1, 4, 3), -5.0, dtype=np.float32)
    for t, v in enumerate([1, 2, 1, 2]):
        logits[0, t, v] = 5.0
    ids, counts = greedy_collapse_batch(jnp.asarray(logits),
                                        jnp.asarray([2]), blank_id=0)
    assert int(counts[0]) == 2
    assert np.asarray(ids)[0, :2].tolist() == [1, 2]


def _brute_force_ctc_best(probs, blank=0, max_len=None):
    """Enumerate all alignment paths; sum per collapsed label sequence."""
    T, V = probs.shape
    from itertools import product
    scores = {}
    for path in product(range(V), repeat=T):
        p = 1.0
        for t, v in enumerate(path):
            p *= probs[t, v]
        # collapse
        out = []
        last = None
        for v in path:
            if v != last and v != blank:
                out.append(v)
            last = v
        key = tuple(out)
        scores[key] = scores.get(key, 0.0) + p
    return max(scores.items(), key=lambda kv: kv[1])


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_host_beam_matches_brute_force(seed):
    rng = np.random.default_rng(seed)
    T, V = 4, 3
    probs = rng.dirichlet(np.ones(V), size=T)
    best_seq, _ = _brute_force_ctc_best(probs)

    class IdTok:
        def decode(self, ids):
            return " ".join(str(i) for i in ids)

    dec = CTCBeamDecoder(IdTok(), beam_width=8, word_bonus=0.0)
    got = dec.decode_ids(np.log(probs))
    assert got == best_seq


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_device_beam_matches_host_beam(seed):
    rng = np.random.default_rng(seed)
    T, V = 12, 6
    logits = rng.standard_normal((T, V)).astype(np.float32) * 2.0
    x = logits - logits.max(-1, keepdims=True)
    p = np.exp(x) / np.exp(x).sum(-1, keepdims=True)
    log_probs = np.log(p).astype(np.float32)

    class IdTok:
        def decode(self, ids):
            return " ".join(str(i) for i in ids)

    host = CTCBeamDecoder(IdTok(), beam_width=8, word_bonus=0.0)
    want = host.decode_ids(logits)

    ids, counts = ctc_beam_search(jnp.asarray(log_probs)[None],
                                  beam_width=8, blank_id=0)
    got = tuple(np.asarray(ids)[0, :int(counts[0])].tolist())
    assert got == want


def test_device_beam_batch_and_lengths():
    rng = np.random.default_rng(9)
    B, T, V = 3, 10, 5
    logits = rng.standard_normal((B, T, V)).astype(np.float32)
    lp = jnp.asarray(logits) - jnp.max(jnp.asarray(logits), -1, keepdims=True)
    lp = lp - jnp.log(jnp.sum(jnp.exp(lp), -1, keepdims=True))
    lengths = jnp.asarray([10, 6, 3])
    ids, counts = ctc_beam_search(lp, lengths, beam_width=4)
    assert ids.shape[0] == B
    # A truncated sequence must equal beam search on the truncated logits.
    ids2, counts2 = ctc_beam_search(lp[2:3, :3], beam_width=4)
    assert np.asarray(ids)[2, :int(counts[2])].tolist() == \
        np.asarray(ids2)[0, :int(counts2[0])].tolist()


def test_beam_wider_than_finite_candidates():
    """Regression: beam_width > finite candidate count used to admit
    NEG_INF 'zombie' rows whose hash seeds collided with live single-token
    prefixes, hash-merging real extensions onto an empty-prefix zombie and
    dropping tokens (found by review, reproduced: [2,10] decoded as [10])."""
    V, T, W = 11, 2, 16
    logits = np.full((T, V), -8.0, dtype=np.float32)
    logits[0, 2] = 6.0   # frame 0 -> token 2
    logits[1, 10] = 6.0  # frame 1 -> token 10
    lp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), -1))

    class IdTok:
        def decode(self, ids):
            return " ".join(str(i) for i in ids)

    host = CTCBeamDecoder(IdTok(), beam_width=W, word_bonus=0.0)
    want = host.decode_ids(logits)
    ids, counts = ctc_beam_search(jnp.asarray(lp)[None], beam_width=W,
                                  blank_id=0)
    got = tuple(np.asarray(ids)[0, :int(counts[0])].tolist())
    assert got == want == (2, 10)


def test_beam_max_prefix_len_truncates_cleanly():
    """Overflow past max_prefix_len must truncate, not overwrite L-1."""
    V, T = 4, 6
    logits = np.full((T, V), -8.0, dtype=np.float32)
    for t, v in enumerate([1, 2, 3, 1, 2, 3]):  # 6 distinct emissions
        logits[t, v] = 6.0
    lp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), -1))
    ids, counts = ctc_beam_search(jnp.asarray(lp)[None], beam_width=4,
                                  blank_id=0, max_prefix_len=3)
    got = np.asarray(ids)[0, :int(counts[0])].tolist()
    assert got == [1, 2, 3]  # first 3 tokens kept, overflow dropped


def test_greedy_decoder_text():
    tok = _tok()
    if tok.backend != "char":
        pytest.skip("char backend only")
    text = "ses"
    ids = tok.encode(text)
    T = 2 * len(ids) + 1
    V = tok.vocab_size
    logits = np.full((1, T, V), -5.0, dtype=np.float32)
    t = 0
    for i in ids:
        logits[0, t, 0] = 5.0  # blank between tokens (handles repeats)
        t += 1
        logits[0, t, i] = 5.0
        t += 1
    dec = GreedyDecoder(tok)
    assert dec.decode_batch(logits) == [text]
    assert dec.decode(logits[0]) == text
