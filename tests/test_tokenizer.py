from turkish_asr_tpu.data.tokenizer import TurkishTokenizer, CharTokenizer, _ctc_collapse


def test_char_tokenizer_roundtrip():
    tok = CharTokenizer()
    text = "merhaba dünya çğıöşü"
    ids = tok.encode(text)
    assert tok.decode(ids) == text
    assert tok.pad_token_id == 0


def test_ctc_collapse_reference_semantics():
    # blank=0: "a a _ a b b" -> "aab"; consecutive repeats collapse,
    # blank resets the repeat tracking (reference tokenizer.py:33-56).
    assert _ctc_collapse([1, 1, 0, 1, 2, 2], 0) == [1, 1, 2]
    assert _ctc_collapse([0, 0, 0], 0) == []
    assert _ctc_collapse([], 0) == []
    assert _ctc_collapse([3, 0, 3, 0, 3], 0) == [3, 3, 3]


def test_turkish_tokenizer_fallback_offline():
    tok = TurkishTokenizer()
    assert tok.backend in ("hf", "char")
    ids = tok.encode("selam")
    assert tok.vocab_size > 0
    if tok.backend == "char":
        assert tok.pad_token_id == 0
        assert tok.decode(ids) == "selam"
        assert tok.ctc_decode([0] + ids + [0]) == "selam"


def test_ctc_decode_collapses():
    tok = TurkishTokenizer(model_name=None, fallback="char") if False else TurkishTokenizer()
    if tok.backend != "char":
        return
    a = tok.encode("a")[0]
    b = tok.encode("b")[0]
    assert tok.ctc_decode([a, a, 0, a, b, b, 0]) == "aab"
