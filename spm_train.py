"""BPE tokenizer training side-tool.

Reference counterpart: /root/reference/spm_train.py (SentencePiece BPE over
all transcript .txt files, pad_id=0 reserved as the CTC blank, unk_id=1,
no bos/eos). sentencepiece is not a dependency here — training uses the
self-contained BPE implementation in turkish_asr_tpu/data/bpe.py and saves
``tokenizer_bpe.json`` (loadable via BPETokenizer.load).
"""

import glob
import os

from turkish_asr_tpu.utils.config import get_config
from turkish_asr_tpu.data.bpe import train_bpe, BPETokenizer


def train_tokenizer():
    config = get_config()
    data_path = config.data_path
    vocab_size = config.vocab_size
    out_path = "tokenizer_bpe.json"

    print(f"Data path: {data_path}")
    print(f"Target vocab size: {vocab_size}")

    txt_files = glob.glob(os.path.join(data_path, "**", "*.txt"), recursive=True)
    if not txt_files:
        print("ERROR: no .txt files found!")
        return

    print(f"Found {len(txt_files)} transcript files. Training BPE...")
    texts = []
    for fpath in txt_files:
        with open(fpath, "r", encoding="utf-8") as f:
            texts.append(f.read().strip())

    vocab, merges = train_bpe(texts, vocab_size=vocab_size)
    tok = BPETokenizer(vocab, merges)
    tok.save(out_path)
    print(f"Training done! Vocab size: {tok.vocab_size}. Saved: {out_path}")


if __name__ == "__main__":
    train_tokenizer()
