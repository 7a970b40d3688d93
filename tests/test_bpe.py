from turkish_asr_tpu.data.bpe import train_bpe, BPETokenizer


CORPUS = ["merhaba dünya", "merhaba arkadaş", "dünya güzel",
          "merhaba merhaba dünya"] * 5


def test_train_and_roundtrip():
    vocab, merges = train_bpe(CORPUS, vocab_size=60)
    tok = BPETokenizer(vocab, merges)
    assert tok.pad_token_id == 0
    assert vocab[0] == "<blank>" and vocab[1] == "<unk>"
    text = "merhaba dünya"
    ids = tok.encode(text)
    assert len(ids) >= 1
    assert tok.decode(ids) == text


def test_merges_compress():
    vocab, merges = train_bpe(CORPUS, vocab_size=80)
    tok_big = BPETokenizer(vocab, merges)
    vocab_c, _ = train_bpe(CORPUS, vocab_size=0)
    tok_char = BPETokenizer(vocab_c, [])
    assert len(tok_big.encode("merhaba")) < len(tok_char.encode("merhaba"))


def test_save_load(tmp_path):
    vocab, merges = train_bpe(CORPUS, vocab_size=50)
    tok = BPETokenizer(vocab, merges)
    p = tmp_path / "bpe.json"
    tok.save(str(p))
    tok2 = BPETokenizer.load(str(p))
    text = "güzel dünya"
    assert tok.encode(text) == tok2.encode(text)
    assert tok2.ctc_decode([0] + tok.encode(text) + [0]) == text


def test_unknown_chars_map_to_unk():
    vocab, merges = train_bpe(CORPUS, vocab_size=50)
    tok = BPETokenizer(vocab, merges)
    ids = tok.encode("qxqx")  # q/x absent from the training corpus
    assert all(i == tok.unk_token_id or i < tok.vocab_size for i in ids)
    assert tok.decode(ids) == ""  # all-unk decodes empty
