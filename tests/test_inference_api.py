"""Inference engine API tests: batched transcription, torch-checkpoint
loading, long-form chunking."""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from turkish_asr_tpu.audio.wavio import write_wav
from turkish_asr_tpu.data.tokenizer import TurkishTokenizer, load_tokenizer
from turkish_asr_tpu.models.conformer import ModelConfig, init_model
from turkish_asr_tpu.train.checkpoint import save_checkpoint_file


@pytest.fixture(scope="module")
def asr(tmp_path_factory):
    from inference import ASRInference
    d = tmp_path_factory.mktemp("inf")
    tok = TurkishTokenizer()
    cfg = ModelConfig(n_mels=80, d_model=32, n_heads=2, n_blocks=1,
                      n_classes=tok.vocab_size, dropout=0.0)
    params, state = init_model(jax.random.PRNGKey(0), cfg)
    path = str(d / "m.ckpt")
    save_checkpoint_file(path, {"model_config": {
        "n_mels": 80, "d_model": 32, "n_heads": 2, "n_blocks": 1,
        "n_classes": tok.vocab_size, "dropout": 0.0}}, params, state)
    return ASRInference(path, compute_dtype=jnp.float32)


@pytest.fixture(scope="module")
def wav_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("wavs")
    sr = 16000
    rng = np.random.default_rng(0)
    paths = []
    for i, dur in enumerate([0.3, 0.5, 1.2, 2.0]):
        x = (0.2 * rng.standard_normal(int(sr * dur))).astype(np.float32)
        p = str(d / f"w{i}.wav")
        write_wav(p, x, sr)
        paths.append(p)
    return paths


def test_transcribe_files_batched(asr, wav_dir):
    texts = asr.transcribe_files(wav_dir, batch_size=4)
    assert len(texts) == len(wav_dir)
    assert all(isinstance(t, str) for t in texts)
    # batched result must match per-file greedy result
    seq = [asr.transcribe(p) for p in wav_dir]
    assert texts == seq


def test_transcribe_files_error_capture(asr, wav_dir, tmp_path):
    bad = str(tmp_path / "bad.wav")
    with open(bad, "wb") as f:
        f.write(b"nope")
    texts = asr.transcribe_files(wav_dir + [bad], batch_size=4)
    assert texts[-1] == ""
    assert texts[:-1] == asr.transcribe_files(wav_dir, batch_size=4)


def test_long_form_chunking(asr, tmp_path):
    # 40 s > largest bucket (32 s): must go through the chunked path and
    # produce frames covering the whole file.
    sr = 16000
    x = (0.1 * np.random.default_rng(2).standard_normal(40 * sr)).astype(np.float32)
    p = str(tmp_path / "long.wav")
    write_wav(p, x, sr)
    logits, out_len = asr._logits(p)
    # ~25 frames/sec post-subsample; chunking trims small overlap margins
    assert out_len > 35 * 25
    text = asr.transcribe(p)
    assert isinstance(text, str)


@pytest.mark.skipif(not os.path.isdir("/root/reference"), reason="no reference")
def test_loads_reference_pt_checkpoint(tmp_path, wav_dir):
    torch = pytest.importorskip("torch")
    sys.path.insert(0, "/root/reference")
    try:
        from model.conformer import TurkishASRModel
    finally:
        sys.path.remove("/root/reference")
    tok = TurkishTokenizer()
    m = TurkishASRModel(n_mel_channels=80, d_model=32, n_heads=2,
                        n_blocks=1, n_classes=tok.vocab_size, dropout=0.0)
    pt = str(tmp_path / "ref.pt")
    torch.save({"model_state_dict": m.state_dict()}, pt)

    from inference import ASRInference
    asr = ASRInference(pt, n_heads=2, compute_dtype=jnp.float32)
    assert asr.cfg.d_model == 32 and asr.cfg.n_blocks == 1
    text = asr.transcribe(wav_dir[0])
    assert isinstance(text, str)


def test_load_tokenizer_bpe(tmp_path):
    from turkish_asr_tpu.data.bpe import train_bpe, BPETokenizer
    vocab, merges = train_bpe(["merhaba dünya"] * 3, vocab_size=40)
    p = str(tmp_path / "tok.json")
    BPETokenizer(vocab, merges).save(p)
    tok = load_tokenizer(p)
    assert tok.pad_token_id == 0
    assert tok.decode(tok.encode("merhaba")) == "merhaba"


def test_data_parallel_batched_matches_single(asr, wav_dir, tmp_path_factory):
    """Mesh-sharded batched inference (8 virtual CPU devices via
    conftest) must produce the same transcripts as the unsharded path —
    the BASELINE v5e-8 data-parallel batched-greedy story."""
    from inference import ASRInference
    assert asr._mesh is not None  # conftest provides 8 devices
    # rebuild an unsharded engine from the same checkpoint
    d = tmp_path_factory.mktemp("inf2")
    # reuse the asr fixture's params by saving them again
    save_checkpoint_file(str(d / "m.ckpt"), {"model_config": {
        "n_mels": 80, "d_model": 32, "n_heads": 2, "n_blocks": 1,
        "n_classes": asr.cfg.n_classes, "dropout": 0.0}},
        jax.tree.map(np.asarray, asr.params),
        jax.tree.map(np.asarray, asr.model_state))
    single = ASRInference(str(d / "m.ckpt"), compute_dtype=jnp.float32,
                          data_parallel=False)
    assert single._mesh is None
    sharded_out = asr.transcribe_files(wav_dir, batch_size=4)
    single_out = single.transcribe_files(wav_dir, batch_size=4)
    assert sharded_out == single_out


def test_evaluate_reports_corpus_metrics(tmp_path, capsys):
    """--evaluate scores hypotheses against sibling .txt references with
    the trainer's corpus WER/CER; files without references and empty
    references are skipped; references normalize through the tokenizer
    round trip exactly like the trainer's validation targets."""
    from inference import _report_metrics

    files = []
    for i in range(5):
        p = tmp_path / f"w{i}.wav"
        p.write_bytes(b"")  # only the path matters to the scorer
        files.append(str(p))
    refs = ["bir iki", "evet", "merhaba"]
    for p, r in zip(files[:3], refs):
        (tmp_path / f"{os.path.splitext(os.path.basename(p))[0]}.txt"
         ).write_text(r, encoding="utf-8")
    (tmp_path / "w4.txt").write_text("   ", encoding="utf-8")  # empty ref
    # w3 has no reference at all

    # perfect hypotheses for scored files -> 0% WER/CER
    _report_metrics(files, refs + ["no ref", "empty ref"])
    out = capsys.readouterr().out
    assert "skipped 1 files" in out
    assert "skipped 1 empty references" in out
    assert "WER: 0.00%" in out and "CER: 0.00%" in out

    # one wrong word out of four reference words -> 25% WER
    _report_metrics(files[:3], ["bir yedi", "evet", "merhaba"])
    out = capsys.readouterr().out
    assert "WER: 25.00%" in out

    # tokenizer normalization: punctuation/case in the reference must not
    # count as errors (the trainer's targets go through encode/decode)
    tok = TurkishTokenizer()
    (tmp_path / "w0.txt").write_text("Bir, iki!", encoding="utf-8")
    norm = tok.decode(tok.encode("Bir, iki!")).strip()
    _report_metrics(files[:1], [norm], tok)
    out = capsys.readouterr().out
    assert "WER: 0.00%" in out


def test_transcribe_timestamps_segments(asr, tmp_path):
    """Word segments from a synthetic prediction: times are emission
    frames x 40 ms, words split at the tokens' space boundaries."""
    tok = asr.tokenizer
    sp = tok.encode(" ")[0] if tok.encode(" ") else None
    ids_a = tok.encode("ab")
    ids_c = tok.encode("cd")
    assert sp is not None and len(ids_a) == 2 and len(ids_c) == 2
    # frames: a@1, a@2 (repeat collapses), b@4, space@6, c@8, d@9
    pred = np.zeros(12, dtype=np.int64)
    pred[1] = ids_a[0]; pred[2] = ids_a[0]; pred[4] = ids_a[1]
    pred[6] = sp; pred[8] = ids_c[0]; pred[9] = ids_c[1]
    out = asr._with_segments(pred)
    assert out["text"] == "ab cd"
    assert [s["word"] for s in out["segments"]] == ["ab", "cd"]
    s0, s1 = out["segments"]
    assert s0["start"] == pytest.approx(1 * 0.04)
    assert s0["end"] == pytest.approx((4 + 1) * 0.04)
    assert s1["start"] == pytest.approx(8 * 0.04)
    assert s1["end"] == pytest.approx((9 + 1) * 0.04)


def test_transcribe_timestamps_end_to_end(asr, wav_dir):
    out = asr.transcribe(wav_dir[0], timestamps=True)
    assert set(out) == {"text", "segments"}
    joined = " ".join(s["word"] for s in out["segments"])
    assert joined == out["text"].strip()
    for s in out["segments"]:
        assert 0.0 <= s["start"] < s["end"]


def test_timestamps_under_beam_rejected_before_forward(tmp_path):
    """timestamps + beam search raises the dedicated client-error type
    BEFORE any audio is read or the model runs (the path given does not
    even exist — an eager check must not cost a transcription)."""
    from inference import ASRInference, TimestampsUnsupportedError

    tok = TurkishTokenizer()
    cfg = ModelConfig(n_mels=80, d_model=32, n_heads=2, n_blocks=1,
                      n_classes=tok.vocab_size, dropout=0.0)
    params, state = init_model(jax.random.PRNGKey(0), cfg)
    path = str(tmp_path / "m.ckpt")
    save_checkpoint_file(path, {"model_config": {
        "n_mels": 80, "d_model": 32, "n_heads": 2, "n_blocks": 1,
        "n_classes": tok.vocab_size, "dropout": 0.0}}, params, state)
    asr = ASRInference(path, compute_dtype=jnp.float32,
                       use_beam_search=True, beam_width=2)
    with pytest.raises(TimestampsUnsupportedError):
        asr.transcribe("/nonexistent/never_read.wav", timestamps=True)


def test_error_type_importable_from_package():
    """The canonical TimestampsUnsupportedError lives in the package so
    server code can classify it without the top-level script on sys.path;
    inference.py re-exports the SAME class object."""
    from turkish_asr_tpu.utils.errors import TimestampsUnsupportedError as pkg
    from inference import TimestampsUnsupportedError as script
    assert pkg is script


def test_beam_transcribe_files_batched_with_error_capture(wav_dir, tmp_path):
    """Directory-mode beam decoding goes through the batched
    transcribe_files path: results match per-file beam transcription, and
    one corrupt wav yields a "" row instead of aborting the corpus run
    (the greedy path's reference contract, now shared by beam)."""
    from inference import ASRInference

    tok = TurkishTokenizer()
    cfg = ModelConfig(n_mels=80, d_model=32, n_heads=2, n_blocks=1,
                      n_classes=tok.vocab_size, dropout=0.0)
    params, state = init_model(jax.random.PRNGKey(0), cfg)
    path = str(tmp_path / "m.ckpt")
    save_checkpoint_file(path, {"model_config": {
        "n_mels": 80, "d_model": 32, "n_heads": 2, "n_blocks": 1,
        "n_classes": tok.vocab_size, "dropout": 0.0}}, params, state)
    asr = ASRInference(path, compute_dtype=jnp.float32,
                       use_beam_search=True, beam_width=2,
                       data_parallel=False)
    bad = str(tmp_path / "bad.wav")
    with open(bad, "wb") as f:
        f.write(b"nope")
    texts = asr.transcribe_files(wav_dir + [bad], batch_size=4)
    assert texts[-1] == ""
    per_file = [asr.transcribe(p) for p in wav_dir]
    assert texts[:-1] == per_file


def test_lm_fusion_hash_end_to_end(wav_dir, tmp_path):
    """--lm_fusion hash through the full ASRInference engine: the hash
    decoder is selected, transcription runs, and transcripts match the
    auto-selected trie fusion on the same checkpoint + ARPA (both are
    host-beam-parity-tested, so they must agree end to end)."""
    from inference import ASRInference
    from turkish_asr_tpu.decode.factory import DeviceBeamDecoder

    arpa = str(tmp_path / "words.arpa")
    with open(arpa, "w") as f:
        f.write("""\\
\\data\\
ngram 1=5
ngram 2=3

\\1-grams:
-1.0\t<unk>\t-0.30
-0.8\t<s>\t-0.40
-0.9\t</s>
-0.5\tbir\t-0.20
-0.6\tiki

\\2-grams:
-0.2\t<s> bir\t-0.10
-0.3\tbir iki
-0.4\tiki bir

\\end\\
""")
    tok = TurkishTokenizer()
    cfg = ModelConfig(n_mels=80, d_model=32, n_heads=2, n_blocks=1,
                      n_classes=tok.vocab_size, dropout=0.0)
    params, state = init_model(jax.random.PRNGKey(0), cfg)
    path = str(tmp_path / "m.ckpt")
    save_checkpoint_file(path, {"model_config": {
        "n_mels": 80, "d_model": 32, "n_heads": 2, "n_blocks": 1,
        "n_classes": tok.vocab_size, "dropout": 0.0}}, params, state)

    kw = dict(compute_dtype=jnp.float32, use_beam_search=True,
              beam_width=4, lm_path=arpa, data_parallel=False)
    asr_hash = ASRInference(path, lm_fusion="hash", **kw)
    assert isinstance(asr_hash.decoder, DeviceBeamDecoder)
    assert asr_hash.decoder.lm_hash is not None
    asr_trie = ASRInference(path, lm_fusion="auto", **kw)
    assert asr_trie.decoder.lm_trie is not None

    got_hash = asr_hash.transcribe_files(wav_dir, batch_size=4)
    got_trie = asr_trie.transcribe_files(wav_dir, batch_size=4)
    assert got_hash == got_trie


def test_lm_weight_word_bonus_plumbing(wav_dir, tmp_path):
    """--lm_weight / --word_bonus reach the decoder (both fusion flavors
    and the host fallback), and a zero word_bonus actually changes the
    rerank configuration vs the default."""
    from inference import ASRInference

    arpa = str(tmp_path / "w.arpa")
    with open(arpa, "w") as f:
        f.write("""\\
\\data\\
ngram 1=4

\\1-grams:
-1.0\t<unk>
-0.8\t<s>
-0.9\t</s>
-0.5\tbir

\\end\\
""")
    tok = TurkishTokenizer()
    cfg = ModelConfig(n_mels=80, d_model=32, n_heads=2, n_blocks=1,
                      n_classes=tok.vocab_size, dropout=0.0)
    params, state = init_model(jax.random.PRNGKey(0), cfg)
    path = str(tmp_path / "m.ckpt")
    save_checkpoint_file(path, {"model_config": {
        "n_mels": 80, "d_model": 32, "n_heads": 2, "n_blocks": 1,
        "n_classes": tok.vocab_size, "dropout": 0.0}}, params, state)

    kw = dict(compute_dtype=jnp.float32, use_beam_search=True,
              beam_width=4, lm_path=arpa, data_parallel=False,
              lm_weight=0.7, word_bonus=0.0)
    dev = ASRInference(path, lm_fusion="device", **kw)
    assert dev.decoder.lm_weight == 0.7 and dev.decoder.word_bonus == 0.0
    host = ASRInference(path, lm_fusion="host", **kw)
    assert host.decoder.lm_weight == 0.7 and host.decoder.word_bonus == 0.0


def test_long_form_beam_lm(tmp_path):
    """Long-form chunked logits (40 s > largest bucket) feed the fused
    device beam: merged-chunk frame counts, the decoder's prefix cap, and
    the fusion state machine must compose without shape errors."""
    from inference import ASRInference
    from turkish_asr_tpu.decode.factory import DeviceBeamDecoder

    arpa = str(tmp_path / "w.arpa")
    with open(arpa, "w") as f:
        f.write("""\\
\\data\\
ngram 1=4

\\1-grams:
-1.0\t<unk>
-0.8\t<s>
-0.9\t</s>
-0.5\tbir

\\end\\
""")
    tok = TurkishTokenizer()
    cfg = ModelConfig(n_mels=80, d_model=32, n_heads=2, n_blocks=1,
                      n_classes=tok.vocab_size, dropout=0.0)
    params, state = init_model(jax.random.PRNGKey(0), cfg)
    path = str(tmp_path / "m.ckpt")
    save_checkpoint_file(path, {"model_config": {
        "n_mels": 80, "d_model": 32, "n_heads": 2, "n_blocks": 1,
        "n_classes": tok.vocab_size, "dropout": 0.0}}, params, state)

    sr = 16000
    x = (0.1 * np.random.default_rng(3)
         .standard_normal(40 * sr)).astype(np.float32)
    wav = str(tmp_path / "long.wav")
    write_wav(wav, x, sr)

    asr = ASRInference(path, compute_dtype=jnp.float32,
                       use_beam_search=True, beam_width=4, lm_path=arpa,
                       lm_fusion="device", data_parallel=False)
    assert isinstance(asr.decoder, DeviceBeamDecoder)
    logits, out_len = asr._logits(wav)
    assert out_len > 35 * 25  # chunked path covered the whole file
    text = asr.transcribe(wav)
    assert isinstance(text, str)
