"""Training/CLI configuration.

Flag surface mirrors the reference CLI exactly (names and defaults are part
of the parity contract; see /root/reference/utils/config.py:3-61), with
additive TPU-specific flags kept at the bottom so reference invocations work
unchanged.
"""

import argparse


def get_config(argv=None):
    """Parse command line arguments and hyperparameters.

    Returns:
        argparse.Namespace: Configuration object with all parameters.
    """
    parser = argparse.ArgumentParser(description="Turkish ASR Model Training (TPU)")

    # --- Data Paths ---
    parser.add_argument("--data_path", type=str, default=None, help="Main data directory (wav + txt files)")
    parser.add_argument("--train_path", type=str, default=None, help="Training data directory (optional)")
    parser.add_argument("--valid_path", type=str, default=None, help="Validation data directory (optional)")
    parser.add_argument("--test_path", type=str, default=None, help="Test data directory (optional)")
    parser.add_argument("--noise_dir", type=str, default=None, help="Directory with noise files for augmentation")

    # Split ratios
    parser.add_argument("--val_split", type=float, default=0.1, help="Validation split ratio")
    parser.add_argument("--test_split", type=float, default=0.1, help="Test split ratio")

    # Tokenizer
    parser.add_argument("--vocab_size", type=int, default=1000, help="Vocabulary size")

    # Checkpoints
    parser.add_argument("--checkpoint_dir", type=str, default="./runs", help="Checkpoint save directory")
    parser.add_argument("--resume", action="store_true", help="Resume from latest checkpoint")
    parser.add_argument("--output_model_path", type=str, default="turkish_conformer_final.ckpt", help="Final model filename")

    # --- Model Architecture ---
    parser.add_argument("--n_mel_channels", type=int, default=80, help="Number of mel filterbanks")
    parser.add_argument("--d_model", type=int, default=256, help="Model dimension")
    parser.add_argument("--n_heads", type=int, default=4, help="Number of attention heads")
    parser.add_argument("--n_blocks", type=int, default=8, help="Number of Conformer blocks")
    parser.add_argument("--encoder_dropout", type=float, default=0.1, help="Dropout rate")

    # --- Training Hyperparameters ---
    parser.add_argument("--batch_size", type=int, default=32, help="Batch size (global, across all devices)")
    parser.add_argument("--epochs", type=int, default=70, help="Number of epochs")
    parser.add_argument("--learning_rate", type=float, default=5e-4, help="Max learning rate")
    parser.add_argument("--weight_decay", type=float, default=1e-6, help="Weight decay")
    parser.add_argument("--num_workers", type=int, default=4, help="Data pipeline worker threads")

    # Gradient Management
    parser.add_argument("--gradient_clip", type=float, default=1.0, help="Gradient clipping max norm")
    parser.add_argument("--accumulation_steps", type=int, default=1, help="Gradient accumulation steps")

    # Augmentation
    parser.add_argument("--augment", action="store_true", help="Enable data augmentation")
    parser.add_argument("--speed_perturb", action="store_true", help="Enable speed perturbation")
    parser.add_argument("--spec_augment_freq", type=int, default=27, help="SpecAugment frequency mask param")
    parser.add_argument("--spec_augment_time", type=int, default=100, help="SpecAugment time mask param")

    # --- Other ---
    parser.add_argument("--seed", type=int, default=42, help="Random seed")
    parser.add_argument("--log_interval", type=int, default=10, help="Logging frequency (batches)")
    parser.add_argument("--save_interval", type=int, default=5, help="Checkpoint save frequency (epochs)")

    # --- TPU-native additions (absent in the reference; defaults preserve
    # reference semantics on a single chip) ---
    parser.add_argument("--mesh_shape", type=str, default=None,
                        help="Device mesh, e.g. 'data=8' or 'data=4,model=2'. Default: all devices on 'data'.")
    parser.add_argument("--precision", type=str, default="bf16", choices=["bf16", "fp32"],
                        help="Compute precision for matmuls/convs (params stay fp32)")
    parser.add_argument("--bucket_lengths", type=str, default=None,
                        help="Comma-separated static padded frame lengths, e.g. '400,800,1600'. Default: auto.")
    parser.add_argument("--use_pallas", action="store_true",
                        help="Enable Pallas TPU kernels for attention/front-end hot paths")
    parser.add_argument("--profile_dir", type=str, default=None,
                        help="If set, capture a jax.profiler trace of the first training steps here")
    parser.add_argument("--tokenizer_path", type=str, default=None,
                        help="Tokenizer: a .json BPE vocab from spm_train.py, or an HF model name")
    parser.add_argument("--masked_norm", action="store_true",
                        help="Exclude padded frames from GroupNorm/BatchNorm statistics "
                             "(improvement beyond reference parity: outputs become independent "
                             "of padded batch length)")
    parser.add_argument("--distributed", action="store_true",
                        help="Multi-host: call jax.distributed.initialize() (TPU pod slices); "
                             "coordinator/process env comes from the TPU runtime")
    parser.add_argument("--rng_impl", type=str, default="rbg",
                        choices=["rbg", "threefry2x32"],
                        help="PRNG for dropout/SpecAugment masks inside the train step. "
                             "'rbg' uses the TPU hardware bit generator (measured 9 ms/step "
                             "faster than JAX's default threefry at B=32 — dropout masks are "
                             "~172M draws/step); 'threefry2x32' is JAX's default software PRNG")
    parser.add_argument("--ctc_impl", type=str, default="auto",
                        choices=["auto", "scan", "pallas"],
                        help="CTC loss implementation: 'pallas' runs the whole "
                             "time recursion in one TPU kernel (measured 8x the "
                             "lax.scan path at B=32); 'scan' works on any backend; "
                             "'auto' picks pallas on TPU. Under a multi-device mesh "
                             "the kernel computes per-sample losses, so data-parallel "
                             "sharding stays valid")
    parser.add_argument("--no_remat", action="store_true",
                        help="Disable per-block rematerialization in the backward pass. "
                             "Remat (default on) saves only block inputs instead of every "
                             "intermediate — measured 14%% faster micro-steps at B=32 "
                             "(the (B,H,T',T') attention-probs residuals are HBM-bound); "
                             "mathematically identical (same RNG draws), so mainly for debugging")
    parser.add_argument("--remat_policy", type=str, default="full",
                        choices=["full", "dots"],
                        help="Rematerialization policy for the per-block checkpoint "
                             "(active unless --no_remat): 'full' recomputes everything "
                             "(d=256 winner); 'dots' saves weight-side matmul outputs "
                             "(dots_with_no_batch_dims_saveable) — candidate for "
                             "kernel-on long-form training where full remat re-runs "
                             "the flash-attention kernel's forward in the backward "
                             "(measured in scripts/ab_remat_L.py)")

    config = parser.parse_args(argv)
    return config
