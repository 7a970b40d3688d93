from turkish_asr_tpu.data.tokenizer import TurkishTokenizer, CharTokenizer
from turkish_asr_tpu.data.dataset import (
    ASRDataset,
    BucketingSampler,
    find_files,
    create_datasets,
    collate_batch,
    bucket_table,
)

__all__ = [
    "TurkishTokenizer",
    "CharTokenizer",
    "ASRDataset",
    "BucketingSampler",
    "find_files",
    "create_datasets",
    "collate_batch",
    "bucket_table",
]
