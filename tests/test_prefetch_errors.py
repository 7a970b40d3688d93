"""PrefetchLoader failure modes: producer errors must surface, not hang."""

import numpy as np
import pytest

from turkish_asr_tpu.data.dataset import PrefetchLoader, BucketingSampler
from turkish_asr_tpu.data.tokenizer import TurkishTokenizer


class _AllCorruptDataset:
    """Every sample raises — get_waveform must raise RuntimeError which the
    loader must propagate to the consumer instead of hanging."""

    def __init__(self, n=6):
        self.file_pairs = [(f"/nonexistent/{i}.wav", f"/nonexistent/{i}.txt")
                           for i in range(n)]

    def __len__(self):
        return len(self.file_pairs)

    def get_waveform(self, idx):
        raise RuntimeError("No decodable samples in dataset")


def test_producer_error_propagates_instead_of_hanging():
    ds = _AllCorruptDataset()
    sampler = BucketingSampler(ds, batch_size=2, shuffle=False)
    loader = PrefetchLoader(ds, sampler, batch_size=2, num_workers=2)
    with pytest.raises(RuntimeError, match="No decodable samples"):
        for _ in loader:
            pass


def test_iterative_error_recovery_many_corrupt(tmp_path):
    """~1500 consecutive corrupt files must skip iteratively (the old
    recursive recovery hit Python's recursion limit around 1000)."""
    from turkish_asr_tpu.audio.wavio import write_wav
    from turkish_asr_tpu.data.dataset import ASRDataset
    n_bad = 1500
    pairs = []
    bad = tmp_path / "bad.wav"
    bad.write_bytes(b"not a wav")
    (tmp_path / "bad.txt").write_text("x")
    for i in range(n_bad):
        pairs.append((str(bad), str(tmp_path / "bad.txt")))
    good = tmp_path / "good.wav"
    write_wav(good, np.zeros(4000, np.float32), 16000)
    (tmp_path / "good.txt").write_text("iyi")
    pairs.append((str(good), str(tmp_path / "good.txt")))

    ds = ASRDataset(pairs, TurkishTokenizer())
    w, t = ds.get_waveform(0)  # must reach the good sample without overflow
    assert w.shape[0] == 4000
