import os
import random

import numpy as np
import pytest

from turkish_asr_tpu.audio.wavio import write_wav
from turkish_asr_tpu.data.tokenizer import TurkishTokenizer
from turkish_asr_tpu.data.dataset import (
    find_files, create_datasets, ASRDataset, BucketingSampler,
    collate_batch, bucket_table, PrefetchLoader,
    DEFAULT_WAVEFORM_BUCKETS)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("ds")
    rng = np.random.default_rng(0)
    sr = 16000
    for i in range(10):
        n = sr // 4 + i * 1000  # varied lengths
        x = (0.2 * rng.standard_normal(n)).astype(np.float32)
        write_wav(root / f"u{i}.wav", x, sr)
        (root / f"u{i}.txt").write_text(f"kelime {i}", encoding="utf-8")
    # a wav without transcript must be ignored by discovery
    write_wav(root / "orphan.wav", np.zeros(1000, np.float32), sr)
    return str(root)


def test_find_files(corpus):
    pairs = find_files(corpus)
    assert len(pairs) == 10
    assert all(w.endswith(".wav") and t.endswith(".txt") for w, t in pairs)


def test_create_datasets_split_deterministic(corpus):
    class Cfg:
        data_path = corpus
        train_path = valid_path = test_path = None
        val_split = 0.2
        test_split = 0.2
        seed = 42
        n_mel_channels = 80
        noise_dir = None
    tok = TurkishTokenizer()
    tr1, va1, te1 = create_datasets(Cfg(), tok, augment_train=False)
    tr2, va2, te2 = create_datasets(Cfg(), tok, augment_train=False)
    assert len(tr1) == 6 and len(va1) == 2 and len(te1) == 2
    assert tr1.file_pairs == tr2.file_pairs  # seeded split is stable


def test_bucketing_sampler_orders_by_size(corpus):
    tok = TurkishTokenizer()
    ds = ASRDataset(find_files(corpus), tok)
    sampler = BucketingSampler(ds, batch_size=3, shuffle=False)
    batches = list(sampler)
    assert len(batches) == 4  # 10 items / 3 -> 3 full + 1 ragged (kept whole)
    assert sum(len(b) for b in batches) == 10
    flat = [i for b in batches for i in b]
    sizes = [sampler.lengths[i] for i in flat]
    assert sizes == sorted(sizes)  # shuffle=False keeps global size order


def test_collate_static_shapes(corpus):
    tok = TurkishTokenizer()
    ds = ASRDataset(find_files(corpus), tok)
    items = [ds.get_waveform(i) for i in range(4)]
    out = collate_batch(items, batch_size=8)
    assert out["waveforms"].shape[0] == 8  # padded to full batch
    assert out["waveforms"].shape[1] in DEFAULT_WAVEFORM_BUCKETS
    assert out["sample_mask"].sum() == 4
    assert out["sample_mask"][4:].sum() == 0
    # bucket choice: smallest bucket >= max length
    max_len = max(w.shape[0] for w, _ in items)
    assert out["waveforms"].shape[1] == bucket_table(max_len, DEFAULT_WAVEFORM_BUCKETS)


def test_error_recovery_skips_bad_sample(corpus, tmp_path):
    tok = TurkishTokenizer()
    pairs = find_files(corpus)
    bad = str(tmp_path / "bad.wav")
    with open(bad, "wb") as f:
        f.write(b"not a wav")
    (tmp_path / "bad.txt").write_text("x")
    pairs_with_bad = [(bad, str(tmp_path / "bad.txt"))] + pairs
    ds = ASRDataset(pairs_with_bad, tok)
    w, t = ds.get_waveform(0)  # falls through to index 1
    assert w.shape[0] > 0


def test_prefetch_loader_yields_all(corpus):
    tok = TurkishTokenizer()
    ds = ASRDataset(find_files(corpus), tok)
    sampler = BucketingSampler(ds, batch_size=4, shuffle=True, seed=1)
    loader = PrefetchLoader(ds, sampler, batch_size=4, num_workers=2)
    total = 0
    for batch in loader:
        assert set(batch) == {"waveforms", "wav_lengths", "targets",
                              "target_lengths", "sample_mask"}
        total += int(batch["sample_mask"].sum())
    assert total == 10
    # re-iterable
    assert sum(int(b["sample_mask"].sum()) for b in loader) == 10


def test_getitem_returns_features(corpus):
    tok = TurkishTokenizer()
    ds = ASRDataset(find_files(corpus), tok, n_mel_channels=80)
    feats, target = ds[0]
    assert feats.ndim == 2 and feats.shape[1] == 80
    assert len(target) > 0
