import math

from turkish_asr_tpu.decode.lm import ArpaLanguageModel, KenLMModel, NGramLanguageModel

ARPA = """\\data\\
ngram 1=5
ngram 2=3

\\1-grams:
-1.0\t<s>\t-0.30103
-0.8\tmerhaba\t-0.30103
-0.9\tdünya\t-0.30103
-1.2\t</s>
-1.5\t<unk>

\\2-grams:
-0.3\t<s> merhaba
-0.4\tmerhaba dünya
-0.5\tdünya </s>

\\end\\
"""


def _write(tmp_path):
    p = tmp_path / "lm.arpa"
    p.write_text(ARPA, encoding="utf-8")
    return str(p)


def test_arpa_parses(tmp_path):
    lm = ArpaLanguageModel(_write(tmp_path))
    assert lm.order == 2
    assert lm.logprob[("merhaba",)] == -0.8
    assert lm.logprob[("merhaba", "dünya")] == -0.4


def test_arpa_scoring_direct_hits(tmp_path):
    lm = ArpaLanguageModel(_write(tmp_path))
    # "merhaba dünya" with bos+eos: p(merhaba|<s>) + p(dünya|merhaba) + p(</s>|dünya)
    want = -0.3 + -0.4 + -0.5
    assert abs(lm.score("merhaba dünya", bos=True, eos=True) - want) < 1e-9


def test_arpa_backoff(tmp_path):
    lm = ArpaLanguageModel(_write(tmp_path))
    # p(merhaba | dünya): no bigram -> backoff(dünya) + p(merhaba)
    got = lm._cond_score(("dünya",), "merhaba")
    assert abs(got - (-0.30103 + -0.8)) < 1e-9
    # unseen word -> <unk>
    got = lm._cond_score((), "yok")
    assert abs(got - (-1.5)) < 1e-9


def test_arpa_score_word(tmp_path):
    lm = ArpaLanguageModel(_write(tmp_path))
    sw = lm.score_word("dünya", "merhaba")
    assert abs(sw - (-0.4)) < 1e-9  # conditional from the bigram


def test_kenlm_wrapper_falls_back(tmp_path):
    lm = KenLMModel(_write(tmp_path))
    assert lm.backend in ("kenlm", "arpa")
    assert lm.score("merhaba dünya") < 0


def test_kenlm_matches_real_kenlm_if_available(tmp_path):
    import pytest
    kenlm = pytest.importorskip("kenlm")
    path = _write(tmp_path)
    ours = ArpaLanguageModel(path)
    theirs = kenlm.Model(path)
    for text in ["merhaba dünya", "dünya merhaba", "yok böyle"]:
        assert abs(ours.score(text) - theirs.score(text)) < 1e-4


def test_ngram_lm_reference_semantics():
    lm = NGramLanguageModel(order=2)
    lm.train(["a b", "a b", "a c"])
    # p(b|a) = 2/3
    assert abs(lm.score(("a",), "b") - math.log(2 / 3 + 1e-10)) < 1e-9
    assert lm.score(("zzz",), "b") == -10.0
