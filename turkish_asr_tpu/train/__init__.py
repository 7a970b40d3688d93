from turkish_asr_tpu.train.optim import make_optimizer
from turkish_asr_tpu.train.checkpoint import (
    save_checkpoint_file,
    load_checkpoint_file,
    latest_checkpoint,
)
from turkish_asr_tpu.train.trainer import Trainer

__all__ = [
    "make_optimizer",
    "save_checkpoint_file",
    "load_checkpoint_file",
    "latest_checkpoint",
    "Trainer",
]
