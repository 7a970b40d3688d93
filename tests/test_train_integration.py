"""End-to-end training integration tests on a tiny synthetic corpus."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from turkish_asr_tpu.audio.wavio import write_wav
from turkish_asr_tpu.utils.config import get_config
from turkish_asr_tpu.utils.logger import get_logger
from turkish_asr_tpu.data.tokenizer import TurkishTokenizer
from turkish_asr_tpu.data.dataset import (
    create_datasets, BucketingSampler, PrefetchLoader)
from turkish_asr_tpu.models.conformer import ModelConfig, init_model
from turkish_asr_tpu.train.optim import make_optimizer
from turkish_asr_tpu.train.trainer import Trainer
from turkish_asr_tpu.parallel.mesh import make_mesh


WORDS = ["bir", "iki", "üç", "dört", "beş", "altı"]


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus")
    rng = np.random.default_rng(0)
    sr = 16000
    for i, word in enumerate(WORDS):
        # distinct tones per word so the task is learnable
        t = np.arange(int(sr * 0.4)) / sr
        freq = 200.0 + 120.0 * i
        x = (0.3 * np.sin(2 * np.pi * freq * t)
             + 0.01 * rng.standard_normal(len(t))).astype(np.float32)
        write_wav(root / f"sample_{i}.wav", x, sr)
        (root / f"sample_{i}.txt").write_text(word, encoding="utf-8")
    return str(root)


def _build(corpus, tmp_path, epochs=2, batch_size=8, resume=False):
    config = get_config([
        "--data_path", corpus,
        "--val_split", "0.0", "--test_split", "0.0",
        "--checkpoint_dir", str(tmp_path / "runs"),
        "--n_mel_channels", "80", "--d_model", "32",
        "--n_heads", "2", "--n_blocks", "1",
        "--batch_size", str(batch_size),
        "--epochs", str(epochs),
        "--learning_rate", "3e-3",
        "--save_interval", "1",
        "--log_interval", "1",
        "--precision", "fp32",
    ] + (["--resume"] if resume else []))
    logger = get_logger("test_train", log_file=str(tmp_path / "train.log"))
    tokenizer = TurkishTokenizer()
    train_ds, _, _ = create_datasets(config, tokenizer, augment_train=False)
    sampler = BucketingSampler(train_ds, batch_size=batch_size, shuffle=True,
                               seed=0)
    loader = PrefetchLoader(train_ds, sampler, batch_size, num_workers=2)
    model_cfg = ModelConfig(n_mels=80, d_model=32, n_heads=2, n_blocks=1,
                            n_classes=tokenizer.vocab_size, dropout=0.0)
    params, model_state = init_model(jax.random.PRNGKey(0), model_cfg)
    tx, schedule = make_optimizer(config.learning_rate, 1e-6,
                                  total_steps=len(loader) * epochs)
    mesh = make_mesh(None, devices=jax.devices()[:1])
    trainer = Trainer(
        model_cfg=model_cfg, params=params, model_state=model_state,
        optimizer=tx, schedule=schedule, config=config, logger=logger,
        tokenizer=tokenizer, train_loader=loader, valid_loader=loader,
        mesh=mesh, compute_dtype=jnp.float32)
    return trainer, config


def test_loss_decreases_and_checkpoints(corpus, tmp_path):
    trainer, config = _build(corpus, tmp_path, epochs=3)
    first = trainer.train_epoch(1)
    for e in range(2, 4):
        last = trainer.train_epoch(e)
    assert np.isfinite(first) and np.isfinite(last)
    assert last < first  # optimizing

    trainer.save_checkpoint(3)
    ckpt = os.path.join(config.checkpoint_dir, "checkpoint_epoch_3.ckpt")
    assert os.path.exists(ckpt)

    val = trainer.validate(3)
    assert val is not None and np.isfinite(val)


def test_resume_restores_counters(corpus, tmp_path):
    trainer, config = _build(corpus, tmp_path, epochs=2)
    trainer.train_epoch(1)
    trainer.best_val_loss = 1.23
    # save_checkpoint syncs global_step from the device opt state (the
    # host mirror can't be hand-poked out of step anymore).
    trainer.save_checkpoint(1)
    saved_step = trainer.global_step
    assert saved_step > 0

    trainer2, _ = _build(corpus, tmp_path, epochs=2, resume=True)
    trainer2.load_checkpoint()
    assert trainer2.start_epoch == 2
    assert trainer2.global_step == saved_step
    trainer2.sync_global_step()  # restored opt state agrees with meta
    assert trainer2.global_step == saved_step
    assert abs(trainer2.best_val_loss - 1.23) < 1e-9
    # params restored identically
    p1 = jax.tree.leaves(trainer.params)
    p2 = jax.tree.leaves(trainer2.params)
    for a, b in zip(p1, p2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # resumed training still steps fine
    loss = trainer2.train_epoch(2)
    assert np.isfinite(loss)


def test_inference_roundtrip(corpus, tmp_path):
    trainer, config = _build(corpus, tmp_path, epochs=1)
    trainer.train_epoch(1)
    trainer.save_checkpoint(1, name="final.ckpt")
    path = os.path.join(config.checkpoint_dir, "final.ckpt")

    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from inference import ASRInference
    asr = ASRInference(path, compute_dtype=jnp.float32)
    wavs = sorted([os.path.join(corpus, f) for f in os.listdir(corpus)
                   if f.endswith(".wav")])
    text = asr.transcribe(wavs[0])
    assert isinstance(text, str)
    batch = asr.transcribe_batch(wavs[:2])
    assert len(batch) == 2
