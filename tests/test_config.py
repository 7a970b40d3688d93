"""Flag-surface parity with the reference CLI (part of the parity
contract per SURVEY.md §2 get_config row)."""

from turkish_asr_tpu.utils.config import get_config

REFERENCE_FLAGS_AND_DEFAULTS = {
    # name: default (None for paths, as in the reference)
    "data_path": None, "train_path": None, "valid_path": None,
    "test_path": None, "noise_dir": None,
    "val_split": 0.1, "test_split": 0.1,
    "vocab_size": 1000,
    "checkpoint_dir": "./runs", "resume": False,
    "n_mel_channels": 80, "d_model": 256, "n_heads": 4, "n_blocks": 8,
    "encoder_dropout": 0.1,
    "batch_size": 32, "epochs": 70, "learning_rate": 5e-4,
    "weight_decay": 1e-6, "num_workers": 4,
    "gradient_clip": 1.0, "accumulation_steps": 1,
    "augment": False, "speed_perturb": False,
    "spec_augment_freq": 27, "spec_augment_time": 100,
    "seed": 42, "log_interval": 10, "save_interval": 5,
}


def test_reference_flags_present_with_same_defaults():
    cfg = get_config([])
    for name, default in REFERENCE_FLAGS_AND_DEFAULTS.items():
        assert hasattr(cfg, name), f"missing reference flag --{name}"
        assert getattr(cfg, name) == default, (
            f"--{name} default {getattr(cfg, name)} != reference {default}")


def test_reference_invocation_parses():
    cfg = get_config([
        "--data_path", "/data", "--augment", "--speed_perturb",
        "--batch_size", "16", "--epochs", "3", "--learning_rate", "1e-4",
        "--gradient_clip", "0.5", "--accumulation_steps", "4",
        "--resume", "--noise_dir", "/noise",
    ])
    assert cfg.augment and cfg.speed_perturb and cfg.resume
    assert cfg.batch_size == 16 and cfg.accumulation_steps == 4


def test_tpu_additions_have_safe_defaults():
    cfg = get_config([])
    assert cfg.mesh_shape is None
    assert cfg.precision == "bf16"
    assert cfg.bucket_lengths is None
    assert cfg.use_pallas is False
