"""Production-scale hash-table ARPA fusion (decode/lm.build_hash_fusion_tables
+ ops/beam_search lm_hash mode) vs the host beam oracle and the dense trie
path.

The dense trie fusion (build_trie_fusion_tables) enumerates (S, Wa)
score/next tables — quadratic in the ARPA vocabulary and infeasible past
~3k words. The hash path keeps the identical partial-word trie front but
scores n-grams by probing an open-addressing hash table (KenLM-style,
/root/reference/utils/decoding.py:56-68 reads binary KenLM models built the
same way) with each beam carrying its last (order-1) word ids. Semantics
must be IDENTICAL to the trie path and to the host CTCBeamDecoder's
per-extension score_word increments. VERDICT r3 next-step #3.
"""

import numpy as np
import pytest

from turkish_asr_tpu.data.tokenizer import TurkishTokenizer
from turkish_asr_tpu.decode.beam import CTCBeamDecoder
from turkish_asr_tpu.decode.lm import (
    HASH_PAD_ID, ArpaLanguageModel, build_hash_fusion_tables,
    build_trie_fusion_tables)
from turkish_asr_tpu.decode.factory import DeviceBeamDecoder

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
def model(tmp_path_factory):
    p = tmp_path_factory.mktemp("lm") / "words.arpa"
    p.write_text(ARPA)
    return ArpaLanguageModel(str(p))


@pytest.fixture(scope="module")
def tok():
    return TurkishTokenizer()  # char fallback in this image


@pytest.fixture(scope="module")
def ht(model, tok):
    t = build_hash_fusion_tables(model, tok, tok.vocab_size)
    assert t is not None
    return t


def test_hash_table_probes_match_cond_score(model, tok, ht):
    """Every (context-window, word) probe of the device hash recursion ==
    ArpaLanguageModel._cond_score — the exact Katz backoff the host beam
    applies per completed word."""
    import jax.numpy as jnp
    from turkish_asr_tpu.ops import beam_search as bs

    uni = sorted(model._vocab)
    if "<unk>" not in model._vocab:
        uni.append("<unk>")
    widx = {w: i for i, w in enumerate(uni)}
    m = ht["ctx_len"]
    dev = {
        "keys": jnp.asarray(ht["keys"]),
        "vals": jnp.asarray(ht["vals"]),
        "unk_prob": jnp.asarray(ht["unk_prob"], jnp.float32),
        "table_size": ht["table_size"],
        "probe_depth": ht["probe_depth"],
    }
    rng = np.random.default_rng(0)
    words = [w for w in uni if w != "<s>"]
    n_checked = 0
    for _ in range(120):
        clen = int(rng.integers(0, m + 1))
        ctx_words = ["<s>"] * (clen > 0 and rng.random() < 0.3) + [
            words[int(rng.integers(len(words)))] for _ in range(clen)]
        ctx_words = ctx_words[-m:]
        w = words[int(rng.integers(len(words)))]
        want = model._cond_score(tuple(ctx_words), w)
        win = np.full((1, m), HASH_PAD_ID, np.int32)
        for j, cw in enumerate(ctx_words):
            win[0, m - len(ctx_words) + j] = widx[cw]
        got = float(np.asarray(bs._hash_lm_scores(
            dev, jnp.asarray(win), jnp.asarray([widx[w]], np.int32)))[0, 0])
        assert abs(got - want) < 1e-4, (ctx_words, w, got, want)
        n_checked += 1
    assert n_checked == 120


def test_device_hash_beam_matches_host_beam(model, tok, ht):
    """End-to-end: device beam with hash fusion == host beam with the same
    ARPA LM on random logits."""
    rng = np.random.default_rng(1)
    V = tok.vocab_size
    host = CTCBeamDecoder(tok, beam_width=8, lm=model, lm_weight=0.3,
                          word_bonus=0.5)
    dev = DeviceBeamDecoder(tok, beam_width=8, lm_hash=ht, lm_weight=0.3,
                            word_bonus=0.5)
    for trial in range(8):
        T = int(rng.integers(6, 18))
        logits = rng.normal(0, 2.0, (T, V)).astype(np.float32)
        logits[:, 0] -= 1.0
        want = host.decode(logits)
        got = dev.decode(logits)
        assert got == want, (trial, got, want)


def test_hash_beam_matches_trie_beam_batched(model, tok, ht):
    """The hash path and the dense trie path are two compilations of the
    SAME fusion semantics — batched decodes must agree exactly."""
    trie = build_trie_fusion_tables(model, tok, tok.vocab_size)
    assert trie is not None
    rng = np.random.default_rng(2)
    V = tok.vocab_size
    d_trie = DeviceBeamDecoder(tok, beam_width=6, lm_trie=trie,
                               lm_weight=0.3)
    d_hash = DeviceBeamDecoder(tok, beam_width=6, lm_hash=ht, lm_weight=0.3)
    logits = rng.normal(0, 2.0, (4, 12, V)).astype(np.float32)
    logits[..., 0] -= 1.0
    lengths = np.array([12, 9, 7, 12], dtype=np.int32)
    assert d_hash.decode_batch(logits, lengths) == \
        d_trie.decode_batch(logits, lengths)


def test_factory_falls_back_to_hash_when_trie_over_budget(model, tok,
                                                          monkeypatch):
    """FlashlightDecoder's auto chain: when the dense trie builder refuses
    (entry budget — the production-scale case), hash fusion engages."""
    import turkish_asr_tpu.decode.lm as lmmod
    import turkish_asr_tpu.decode.factory as fmod

    orig = lmmod.build_trie_fusion_tables
    monkeypatch.setattr(
        lmmod, "build_trie_fusion_tables",
        lambda lm, tk, v, max_entries=32_000_000: orig(
            lm, tk, v, max_entries=1))
    # KenLMModel wraps an ArpaLanguageModel when handed a text ARPA path.
    import tempfile
    with tempfile.NamedTemporaryFile("w", suffix=".arpa",
                                     delete=False) as f:
        f.write(ARPA)
        path = f.name
    dec = fmod.FlashlightDecoder(tok, lm_path=path, beam_size=6,
                                 lm_weight=0.3, word_score=0.0)
    assert isinstance(dec._impl, DeviceBeamDecoder)
    assert dec._impl.lm_hash is not None and dec._impl.lm_trie is None
    # And it decodes identically to the un-patched trie route.
    rng = np.random.default_rng(3)
    logits = rng.normal(0, 2.0, (2, 10, tok.vocab_size)).astype(np.float32)
    logits[..., 0] -= 1.0
    trie = orig(model, tok, tok.vocab_size)
    d_trie = DeviceBeamDecoder(tok, beam_width=6, lm_trie=trie,
                               lm_weight=0.3, word_bonus=0.0)
    assert dec.decode_batch(logits) == d_trie.decode_batch(logits)


def test_short_context_left_padding_misses_table(model, tok, ht):
    """A window still holding HASH_PAD_ID probes must miss every n-gram
    slot (the pad id is reserved above the ARPA vocabulary), reproducing
    _cond_score's shorter-history behavior at utterance start."""
    import jax.numpy as jnp
    from turkish_asr_tpu.ops import beam_search as bs

    m = ht["ctx_len"]
    dev = {
        "keys": jnp.asarray(ht["keys"]),
        "vals": jnp.asarray(ht["vals"]),
        "unk_prob": jnp.asarray(ht["unk_prob"], jnp.float32),
        "table_size": ht["table_size"],
        "probe_depth": ht["probe_depth"],
    }
    uni = sorted(model._vocab)
    widx = {w: i for i, w in enumerate(uni)}
    # all-pad window == empty context: score must equal the unigram.
    win = np.full((1, m), HASH_PAD_ID, np.int32)
    got = float(np.asarray(bs._hash_lm_scores(
        dev, jnp.asarray(win),
        jnp.asarray([widx["bir"]], np.int32)))[0, 0])
    assert abs(got - model._cond_score((), "bir")) < 1e-4


def test_cuckoo_table_places_every_entry_and_grows():
    """_arpa_hash_table direct: every n-gram must be findable at one of
    its two cuckoo slots (the device probe's whole contract), including
    when the initial size is tiny enough to force growth rounds."""
    from turkish_asr_tpu.decode.lm import (
        HASH_M1, HASH_M2, HASH_MIX2, HASH_P1, HASH_P2, _arpa_hash_table,
        _roll_hash_np)

    rng = np.random.default_rng(3)

    class FakeModel:
        # ~500 synthetic n-grams over a 60-word vocab, incl. dense
        # prefix-sharing runs (the historical linear-probe livelock case).
        logprob = {}
        backoff = {}

    words = [f"w{i}" for i in range(60)]
    for w in words:
        FakeModel.logprob[(w,)] = -float(rng.uniform(0.5, 3.0))
    for a in words[:20]:           # shared-prefix bigram runs
        for b in words:
            if rng.random() < 0.35:
                FakeModel.logprob[(a, b)] = -float(rng.uniform(0.5, 3.0))
                FakeModel.backoff[(a, b)] = -float(rng.uniform(0.0, 0.5))
    widx = {w: i for i, w in enumerate(words)}

    # load_factor > 0.5 exceeds the two-choice threshold -> must grow,
    # not fail
    keys, vals, size = _arpa_hash_table(FakeModel, widx, load_factor=0.9)
    n = len(FakeModel.logprob)
    assert (keys[:, 0] >= 0).sum() == n

    for ng, lp in FakeModel.logprob.items():
        ids = np.array([[widx[w] for w in ng]], np.uint32)
        h1 = int(_roll_hash_np(ids, HASH_P1, HASH_M1)[0])
        h2 = int(_roll_hash_np(ids, HASH_P2, HASH_M2)[0])
        p1 = ((h1 * HASH_P1) & 0xFFFFFFFF) % size
        p2 = ((h2 * HASH_MIX2) & 0xFFFFFFFF) % size
        at1 = keys[p1, 0] == h1 and keys[p1, 1] == h2
        at2 = keys[p2, 0] == h1 and keys[p2, 1] == h2
        assert at1 or at2, ng
        got = vals[p1, 0] if at1 else vals[p2, 0]
        assert abs(got - lp) < 1e-5
        bo = FakeModel.backoff.get(ng, 0.0)
        gbo = vals[p1, 1] if at1 else vals[p2, 1]
        assert abs(gbo - bo) < 1e-5


def test_probe_coinciding_cuckoo_slots_counts_once():
    """When an entry's two cuckoo slots COINCIDE (slot1 == slot2, odds
    ~1/size per entry — expected in 1 of ~2 production tables), the probe
    gathers the same row twice; the duplicate hit must be masked or the
    summed prob/backoff silently doubles (regression: probe returned -1.0
    for a stored logprob of -0.5)."""
    import jax.numpy as jnp
    from turkish_asr_tpu.decode.lm import HASH_MIX2, HASH_P1
    from turkish_asr_tpu.ops.beam_search import _hash_probe

    size = 64
    hit = None
    for h1 in range(1, 20000):
        s1 = ((h1 * HASH_P1) & 0xFFFFFFFF) % size
        for h2 in range(1, 400):
            if ((h2 * HASH_MIX2) & 0xFFFFFFFF) % size == s1:
                hit = (h1, h2, s1)
                break
        if hit:
            break
    assert hit is not None
    h1, h2, slot = hit
    keys = np.full((size, 2), -1, np.int32)
    vals = np.zeros((size, 2), np.float32)
    keys[slot] = [h1, h2]
    vals[slot] = [-0.5, -0.25]
    ht = {"keys": keys, "vals": vals, "table_size": size}
    f, p, b = _hash_probe(ht, jnp.asarray([h1], jnp.int32),
                          jnp.asarray([h2], jnp.int32))
    assert bool(np.asarray(f)[0])
    assert abs(float(np.asarray(p)[0]) - (-0.5)) < 1e-6
    assert abs(float(np.asarray(b)[0]) - (-0.25)) < 1e-6


def test_builder_skips_ngrams_without_unigram_entry(tok):
    """Hand-pruned ARPA files may contain higher-order n-grams whose words
    have no unigram entry. Those entries are unreachable in the host
    oracle (_cond_score maps every word to <unk> before lookup), so the
    hash builder must skip them — not crash with KeyError — and the device
    scores must still match _cond_score everywhere."""
    import tempfile

    import jax.numpy as jnp
    from turkish_asr_tpu.ops import beam_search as bs

    pruned = ARPA.replace(
        "\\2-grams:", "\\2-grams:\n-0.35\tghost ev", 1).replace(
        "ngram 2=8", "ngram 2=9", 1)
    with tempfile.NamedTemporaryFile("w", suffix=".arpa",
                                     delete=False) as f:
        f.write(pruned)
        path = f.name
    model = ArpaLanguageModel(path)
    assert ("ghost", "ev") in model.logprob  # the file really has it
    ht = build_hash_fusion_tables(model, tok, tok.vocab_size)  # no crash
    assert ht is not None

    uni = sorted(model._vocab)
    if "<unk>" not in model._vocab:
        uni.append("<unk>")
    widx = {w: i for i, w in enumerate(uni)}
    m = ht["ctx_len"]
    dev = {"keys": jnp.asarray(ht["keys"]),
           "vals": jnp.asarray(ht["vals"]),
           "unk_prob": jnp.asarray(ht["unk_prob"], jnp.float32),
           "table_size": ht["table_size"],
           "probe_depth": ht["probe_depth"]}
    # "ghost" is OOV -> <unk> in both stacks; "ev" after it must score
    # identically (and every other pair stays in parity).
    for ctx_words, w in [(("ghost",), "ev"), ((), "ev"), (("bir",), "iki"),
                         (("iki", "bin"), "o")]:
        want = model._cond_score(tuple(ctx_words), w)
        win = np.full((1, m), HASH_PAD_ID, np.int32)
        for j, cw in enumerate(ctx_words):
            wid = widx.get(cw, widx["<unk>"])
            win[0, m - len(ctx_words) + j] = wid
        got = float(np.asarray(bs._hash_lm_scores(
            dev, jnp.asarray(win), jnp.asarray([widx[w]], np.int32)))[0, 0])
        assert abs(got - want) < 1e-4, (ctx_words, w, got, want)
