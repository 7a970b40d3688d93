import numpy as np
import pytest

from turkish_asr_tpu.utils.metrics import wer, cer, _edit_distance, ASRMetrics
from turkish_asr_tpu.data.tokenizer import TurkishTokenizer


def test_edit_distance():
    assert _edit_distance(list("kitten"), list("sitting")) == 3
    assert _edit_distance([], list("ab")) == 2
    assert _edit_distance(list("abc"), list("abc")) == 0


def test_wer_corpus_level():
    refs = ["bir iki üç", "dört beş"]
    hyps = ["bir iki dört", "dört beş"]
    # 1 substitution over 5 reference words
    assert abs(wer(refs, hyps) - 1 / 5) < 1e-9


def test_cer():
    assert abs(cer(["abc"], ["abd"]) - 1 / 3) < 1e-9


def test_wer_matches_jiwer_if_available():
    jiwer = pytest.importorskip("jiwer")
    refs = ["merhaba dünya", "nasılsın bugün iyi misin"]
    hyps = ["merhaba dünyaa", "nasılsın dün iyi"]
    assert abs(wer(refs, hyps) - jiwer.wer(refs, hyps)) < 1e-9
    assert abs(cer(refs, hyps) - jiwer.cer(refs, hyps)) < 1e-9


def test_asr_metrics_compute():
    tok = TurkishTokenizer()
    if tok.backend != "char":
        pytest.skip("char backend only")
    text = "ev"
    ids = tok.encode(text)
    V = tok.vocab_size
    # logits that greedy-decode exactly to `text`
    T = 2 * len(ids)
    logits = np.full((1, T, V), -5.0, dtype=np.float32)
    t = 0
    for i in ids:
        logits[0, t, i] = 5.0
        logits[0, t + 1, 0] = 5.0
        t += 2
    targets = np.zeros((1, 8), dtype=np.int32)
    targets[0, :len(ids)] = ids
    m = ASRMetrics(tok)
    result, preds, targs = m.compute(logits, targets)
    assert preds == [text] and targs == [text]
    assert result["wer"] == 0.0 and result["cer"] == 0.0
