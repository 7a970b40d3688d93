"""Trie-augmented on-device ARPA fusion for char/subword tokenizers vs the
host beam (the bit-parity oracle, decode/beam.CTCBeamDecoder).

The host scores every extension as score_word(decode([tok]),
decode(prefix)) — the partial word counts as a full context word and each
token's text is its own query word (the reference's exact semantics,
/root/reference/utils/decoding.py:261-307). build_trie_fusion_tables must
reproduce that with beam state (word-FSM state, partial-word trie node).
VERDICT r2 next-step #3.
"""

import numpy as np
import pytest

from turkish_asr_tpu.data.tokenizer import TurkishTokenizer
from turkish_asr_tpu.decode.beam import CTCBeamDecoder
from turkish_asr_tpu.decode.lm import (
    ArpaLanguageModel, build_trie_fusion_tables)
from turkish_asr_tpu.decode.factory import DeviceBeamDecoder

# Word-level trigram ARPA over real (tiny) Turkish words. The char
# tokenizer emits one char per token, so partial words walk the trie and
# complete at spaces.
ARPA = """\
\\data\\
ngram 1=8
ngram 2=8
ngram 3=3

\\1-grams:
-1.0\t<unk>\t-0.30
-0.8\t<s>\t-0.40
-0.9\t</s>
-0.5\tbir\t-0.20
-0.6\tiki\t-0.25
-0.7\tbin\t-0.10
-1.1\tev\t-0.15
-1.2\to

\\2-grams:
-0.2\t<s> bir\t-0.10
-0.4\t<s> iki
-0.3\tbir iki\t-0.15
-0.5\tbir ev
-0.25\tiki bin\t-0.05
-0.6\tiki o
-0.45\tev bir
-0.7\to ev

\\3-grams:
-0.1\t<s> bir iki
-0.2\tbir iki bin
-0.3\tiki bin o

\\end\\
"""


@pytest.fixture(scope="module")
def arpa_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("lm") / "words.arpa"
    p.write_text(ARPA)
    return str(p)


@pytest.fixture(scope="module")
def model(arpa_path):
    return ArpaLanguageModel(arpa_path)


@pytest.fixture(scope="module")
def tok():
    return TurkishTokenizer()  # char fallback in this image


@pytest.fixture(scope="module")
def trie(model, tok):
    t = build_trie_fusion_tables(model, tok, tok.vocab_size)
    assert t is not None
    return t


def test_char_tokenizer_classifies(tok):
    """The char tokenizer passes the trie builder's actual precondition
    (_classify_tokens): every token is a pure fragment or the space."""
    from turkish_asr_tpu.decode.lm import _classify_tokens
    out = _classify_tokens(tok, tok.vocab_size)
    assert out is not None


def _host_machine_walk(trie, tok, ids):
    """Walk the device state machine on host -> (h, p, total_score)."""
    h = trie["start_h"]
    p = 0
    total = 0.0
    for v in ids:
        kind = int(trie["tok_kind"][v])
        ctx = h if p == 0 else int(trie["next_w"][h, trie["wid"][p]])
        if kind in (1, 3, 4):
            total += float(trie["score_w"][ctx, trie["qwid"][v]])
        pw = int(trie["ptrans"][p, v])
        if kind == 2 or kind == 3:
            h = ctx
        elif kind == 4:
            h = h if pw == 0 else int(trie["next_w"][h, trie["wid"][pw]])
        if kind in (1, 3):
            p = pw
        elif kind in (2, 4):
            p = 0
        # kind 0: unchanged
    return h, p, total


def test_machine_scores_match_host_lm(model, tok, trie):
    """Accumulated machine score over random char sequences ==
    sum of host score_word(char, decode(prefix)) — the exact per-extension
    LM increments the host beam applies."""
    rng = np.random.default_rng(0)
    host = CTCBeamDecoder(tok, lm=model)
    for trial in range(60):
        n = int(rng.integers(1, 14))
        ids = [int(rng.integers(2, tok.vocab_size)) for _ in range(n)]
        want = 0.0
        for i in range(n):
            want += host._lm_score(tuple(ids[:i]), ids[i])
        _, _, got = _host_machine_walk(trie, tok, ids)
        assert abs(got - want) < 1e-4, (trial, ids, got, want)


def test_machine_scores_known_words(model, tok, trie):
    """A real word completed char-by-char scores like the host does:
    'bir iki' walked through the machine."""
    host = CTCBeamDecoder(tok, lm=model)
    ids = tok.encode("bir iki")
    want = sum(host._lm_score(tuple(ids[:i]), ids[i])
               for i in range(len(ids)))
    _, _, got = _host_machine_walk(trie, tok, ids)
    assert abs(got - want) < 1e-4


def test_device_beam_matches_host_beam(model, tok, trie):
    """End-to-end: device beam with trie fusion == host beam with the same
    ARPA LM on random logits (the VERDICT 'bit-parity test vs the host
    beam')."""
    rng = np.random.default_rng(1)
    V = tok.vocab_size
    host = CTCBeamDecoder(tok, beam_width=8, lm=model, lm_weight=0.3,
                          word_bonus=0.5)
    dev = DeviceBeamDecoder(tok, beam_width=8, lm_trie=trie, lm_weight=0.3,
                            word_bonus=0.5)
    agree = 0
    for trial in range(8):
        T = int(rng.integers(6, 18))
        logits = rng.normal(0, 2.0, (T, V)).astype(np.float32)
        # bias away from blank so prefixes actually grow
        logits[:, 0] -= 1.0
        want = host.decode(logits)
        got = dev.decode(logits)
        assert got == want, (trial, got, want)
        agree += 1
    assert agree == 8


def test_device_beam_batched(model, tok, trie):
    rng = np.random.default_rng(2)
    V = tok.vocab_size
    host = CTCBeamDecoder(tok, beam_width=6, lm=model, lm_weight=0.3)
    dev = DeviceBeamDecoder(tok, beam_width=6, lm_trie=trie, lm_weight=0.3)
    logits = rng.normal(0, 2.0, (4, 12, V)).astype(np.float32)
    logits[..., 0] -= 1.0
    lengths = np.array([12, 9, 7, 12], dtype=np.int32)
    want = host.decode_batch(logits, lengths)
    got = dev.decode_batch(logits, lengths)
    assert got == want


def test_bpe_trie_tables_build(model):
    """Our JSON BPE decodes with ▁ word markers (decode strips the outer
    space) — the pair-decode classification must type its tokens (kinds
    0-3) and the device beam must match the host beam on it."""
    from turkish_asr_tpu.data.bpe import BPETokenizer, train_bpe
    vocab, merges = train_bpe(
        ["bir iki bin ev o bir iki", "iki bin o ev bir bin iki"],
        vocab_size=48)
    bpe = BPETokenizer(vocab, merges)
    t = build_trie_fusion_tables(model, bpe, bpe.vocab_size)
    assert t is not None
    host = CTCBeamDecoder(bpe, beam_width=6, lm=model, lm_weight=0.3)
    dev = DeviceBeamDecoder(bpe, beam_width=6, lm_trie=t, lm_weight=0.3)
    rng = np.random.default_rng(3)
    logits = rng.normal(0, 2.0, (2, 10, bpe.vocab_size)).astype(np.float32)
    logits[..., 0] -= 1.0
    assert dev.decode_batch(logits) == host.decode_batch(logits)


def test_cell_lookup_strategies_agree():
    """The one-hot matmul sandwich and the targeted 2D gather must return
    identical cells for the id/score payloads the beam uses. Integer-
    valued tables are exact under BOTH strategies on every backend (the
    one-hot path goes through _LOOKUP_PRECISION on TPU, which rounds
    float payloads in the last ~2^-17 bits — state ids must never be
    subject to that, and this test pins it)."""
    import numpy as np
    import jax.numpy as jnp
    from turkish_asr_tpu.ops import beam_search as bs

    rng = np.random.default_rng(3)
    table = jnp.asarray(
        rng.integers(-1000, 1000, (37, 53)).astype(np.float32))
    rows = jnp.asarray(rng.integers(0, 37, (16,)).astype(np.int32))
    cols = jnp.asarray(rng.integers(0, 53, (24,)).astype(np.int32))
    pair_cols = jnp.asarray(rng.integers(0, 53, (16,)).astype(np.int32))

    saved = bs._CELL_GATHER_MIN_ELEMS
    try:
        bs._CELL_GATHER_MIN_ELEMS = 1 << 62
        outer_oh = bs._cell_lookup_outer(table, rows, cols)
        pair_oh = bs._cell_lookup_pair(table, rows, pair_cols)
        bs._CELL_GATHER_MIN_ELEMS = 1
        outer_g = bs._cell_lookup_outer(table, rows, cols)
        pair_g = bs._cell_lookup_pair(table, rows, pair_cols)
    finally:
        bs._CELL_GATHER_MIN_ELEMS = saved
    np.testing.assert_array_equal(np.asarray(outer_oh), np.asarray(outer_g))
    np.testing.assert_array_equal(np.asarray(pair_oh), np.asarray(pair_g))


def test_pre_round4_trie_dict_raises_clear_error():
    """A fusion dict lacking the fused advance tables (pnext/wq — built
    before round 4) must raise the rebuild-your-tables ValueError, not a
    bare KeyError (round-4 ADVICE #2). DeviceBeamDecoder backfills such
    dicts; only direct ctc_beam_search callers see the error."""
    import numpy as np
    import jax.numpy as jnp
    import pytest
    from turkish_asr_tpu.ops.beam_search import ctc_beam_search

    V = 6
    old_dict = {  # ptrans/wid-only shape of a pre-round-4 build
        "score_w": np.zeros((2, 2), np.float32),
        "next_w": np.zeros((2, 2), np.int32),
        "ptrans": np.zeros((2, V), np.int32),
        "wid": np.zeros((2,), np.int32),
        "tok_kind": np.zeros((V,), np.int32),
        "qwid": np.zeros((V,), np.int32),
    }
    lp = jnp.zeros((1, 4, V), jnp.float32)
    with pytest.raises(ValueError, match="pnext"):
        ctc_beam_search(lp, beam_width=2, lm_trie=old_dict)


def test_trie_builder_refuses_f32_inexact_node_counts(monkeypatch):
    """Trie node counts >= 2^24 must make the builders return None (node
    ids round-trip through f32 one-hot payload matmuls in the device
    beam — silent id corruption otherwise; round-4 ADVICE #1). Pinned by
    stubbing the size estimator: building a real 16M-node trie would
    need gigabytes."""
    from turkish_asr_tpu.decode import lm as lm_mod
    from turkish_asr_tpu.data.tokenizer import TurkishTokenizer

    arpa_lines = ("\\data\\\nngram 1=4\n\n\\1-grams:\n"
                  "-1.0\t<unk>\n-0.8\t<s>\n-0.9\t</s>\n-0.5\tbir\n\n\\end\\\n")
    import tempfile, os
    with tempfile.NamedTemporaryFile("w", suffix=".arpa",
                                     delete=False) as f:
        f.write(arpa_lines)
        path = f.name
    try:
        tok = TurkishTokenizer()
        monkeypatch.setattr(lm_mod, "_word_trie_size",
                            lambda uni: 1 << 24)
        assert lm_mod.build_trie_fusion_tables(
            path, tok, tok.vocab_size) is None
        assert lm_mod.build_hash_fusion_tables(
            lm_mod.KenLMModel(path), tok, tok.vocab_size) is None
    finally:
        os.unlink(path)
