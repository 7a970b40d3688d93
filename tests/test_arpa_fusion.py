"""On-device ARPA state-table fusion vs the host KenLM-style fusion.

The tables (decode/lm.build_arpa_fusion_tables) must reproduce the host
scoring path bit-for-bit when each token decodes to one word — the same
granularity the reference's KenLM branch scores at
(/root/reference/utils/decoding.py:298-307).
"""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from turkish_asr_tpu.decode.beam import CTCBeamDecoder
from turkish_asr_tpu.decode.lm import (
    ArpaLanguageModel, build_arpa_fusion_tables)
from turkish_asr_tpu.decode.factory import create_decoder, DeviceBeamDecoder
from turkish_asr_tpu.ops.beam_search import ctc_beam_search

ARPA = """\
\\data\\
ngram 1=7
ngram 2=8
ngram 3=4

\\1-grams:
-1.0\t<unk>\t-0.30
-0.8\t<s>\t-0.40
-0.9\t</s>
-0.5\ta\t-0.20
-0.6\tb\t-0.25
-0.7\tc\t-0.10
-1.1\td

\\2-grams:
-0.2\t<s> a\t-0.10
-0.4\t<s> b
-0.3\ta b\t-0.15
-0.5\ta c
-0.25\tb c\t-0.05
-0.6\tb a
-0.45\tc a
-0.7\tc d

\\3-grams:
-0.1\t<s> a b
-0.2\ta b c
-0.3\tb c a
-0.15\ta c a

\\end\\
"""

WORDS = ["<pad>", "a", "b", "c", "d"]  # token id -> word; 0 is CTC blank


class WordTok:
    """Each token is one word; decode joins with spaces (the tokenizer
    family for which host and device fusion granularity coincide)."""

    def __init__(self, words=WORDS):
        self.words = words
        self.vocab_size = len(words)

    def encode(self, text):
        return [self.words.index(w) for w in text.split()]

    def decode(self, ids):
        return " ".join(self.words[i] for i in ids)


@pytest.fixture(scope="module")
def arpa_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("lm") / "test.arpa"
    p.write_text(ARPA)
    return str(p)


@pytest.fixture(scope="module")
def model(arpa_path):
    return ArpaLanguageModel(arpa_path)


@pytest.fixture(scope="module")
def tables(model):
    t = build_arpa_fusion_tables(model, WordTok(), len(WORDS))
    assert t is not None
    return t


def _walk(tables, token_seq):
    """Run a token sequence through the next-state table from start."""
    score_t, next_t, start = tables
    s = start
    for tok in token_seq:
        s = int(next_t[s, tok])
    return s


def test_table_scores_match_score_word(model, tables):
    """score[walk(h), v] == score_word(word_v, " ".join(h)) for random
    histories — the exact host-side query the reference makes."""
    score_t, next_t, start = tables
    rng = np.random.default_rng(0)
    for _ in range(200):
        n = int(rng.integers(0, 6))
        hist = [int(rng.integers(1, len(WORDS))) for _ in range(n)]
        ctx = " ".join(WORDS[t] for t in hist)
        s = _walk(tables, hist)
        for v in range(1, len(WORDS)):
            want = model.score_word(WORDS[v], ctx)
            got = float(score_t[s, v])
            assert abs(got - want) < 1e-5, (hist, v, got, want)


def test_state_count_and_start(model, tables):
    score_t, next_t, start = tables
    # states: () + 6 unigrams with len<=order-1... all 7 unigrams + 8 bigrams
    assert score_t.shape[0] == 1 + 7 + 8
    assert next_t.shape == score_t.shape
    # start state is the <s> unigram context
    assert float(score_t[start, WORDS.index("a")]) == pytest.approx(
        model.score_word("a", ""), abs=1e-6)


def test_multiword_and_empty_tokens(model, arpa_path):
    class MixedTok(WordTok):
        def __init__(self):
            super().__init__(WORDS + ["a b", ""])

    tok = MixedTok()
    t = build_arpa_fusion_tables(model, tok, tok.vocab_size)
    score_t, next_t, start = t
    v_ab, v_empty = len(WORDS), len(WORDS) + 1
    # multi-word column scores the word chain and lands in the chained state
    ctx = "c"
    s = _walk(t, [WORDS.index("c")])
    want = (model.score("c a b", bos=True, eos=False)
            - model.score(ctx, bos=True, eos=False))
    assert float(score_t[s, v_ab]) == pytest.approx(want, abs=1e-5)
    s_ab = int(next_t[s, v_ab])
    s_direct = _walk(t, [WORDS.index("c"), WORDS.index("a"), WORDS.index("b")])
    assert s_ab == s_direct
    # empty-text column: no score, state unchanged
    assert float(score_t[s, v_empty]) == 0.0
    assert int(next_t[s, v_empty]) == s


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("beam_width", [4, 8])
def test_device_arpa_beam_matches_host(model, tables, seed, beam_width):
    tok = WordTok()
    V = tok.vocab_size
    rng = np.random.default_rng(seed)
    T = 20
    logits = rng.standard_normal((T, V)).astype(np.float32) * 2.0
    x = logits - logits.max(-1, keepdims=True)
    p = np.exp(x) / np.exp(x).sum(-1, keepdims=True)
    log_probs = np.log(p).astype(np.float32)

    host = CTCBeamDecoder(tok, beam_width=beam_width, lm=model,
                          lm_weight=0.3, word_bonus=0.0)
    want = host.decode_ids(logits)

    score_t, next_t, start = tables
    ids, counts = ctc_beam_search(
        jnp.asarray(log_probs)[None], beam_width=beam_width, blank_id=0,
        lm_tables=(jnp.asarray(score_t), jnp.asarray(next_t)),
        lm_start_state=start, lm_weight=0.3)
    got = tuple(np.asarray(ids)[0, :int(counts[0])].tolist())
    assert got == want


def test_flashlight_factory_uses_device_tables(arpa_path):
    dec = create_decoder(WordTok(), method="flashlight", lm_path=arpa_path,
                         beam_width=8)
    assert isinstance(dec._impl, DeviceBeamDecoder)
    assert dec._impl.lm_tables is not None
    rng = np.random.default_rng(0)
    logits = rng.standard_normal((2, 12, len(WORDS))).astype(np.float32)
    lp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    texts = dec.decode_batch(lp, lengths=[12, 9])
    assert len(texts) == 2


def test_tokenizer_granularity_probe():
    from turkish_asr_tpu.decode.lm import tokenizer_is_word_granular

    assert tokenizer_is_word_granular(WordTok(), len(WORDS))

    class CharTok:
        vocab_size = 5

        def decode(self, ids):
            return "".join("abcd "[i] for i in ids)  # joins without spaces

    assert not tokenizer_is_word_granular(CharTok(), 5)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_device_word_bonus_matches_host(model, tables, seed):
    """DeviceBeamDecoder with word_bonus reranks all beams exactly like
    the reference's final beta loop (decoding.py:282-287)."""
    tok = WordTok()
    rng = np.random.default_rng(100 + seed)
    logits = rng.standard_normal((18, tok.vocab_size)).astype(np.float32) * 2.0

    host = CTCBeamDecoder(tok, beam_width=8, lm=model,
                          lm_weight=0.3, word_bonus=0.5)
    want = host.decode(logits)

    dec = DeviceBeamDecoder(tok, beam_width=8, lm_tables=tables,
                            lm_weight=0.3, word_bonus=0.5)
    got = dec.decode(logits)
    assert got == want
