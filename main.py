"""Turkish ASR Model — main training script (TPU-native).

Flag parity with /root/reference/main.py; TPU specifics (mesh shape,
precision, bucket table, Pallas kernels) are additive flags in
utils/config.py.
"""

import random

import numpy as np
import jax
import jax.numpy as jnp

from turkish_asr_tpu.utils.config import get_config
from turkish_asr_tpu.utils.logger import get_logger
from turkish_asr_tpu.data.tokenizer import load_tokenizer
from turkish_asr_tpu.data.dataset import (
    create_datasets, BucketingSampler, PrefetchLoader,
    DEFAULT_WAVEFORM_BUCKETS)
from turkish_asr_tpu.models.conformer import ModelConfig, init_model, count_params
from turkish_asr_tpu.train.optim import make_optimizer
from turkish_asr_tpu.train.trainer import Trainer
from turkish_asr_tpu.parallel.mesh import make_mesh


def set_seed(seed):
    """Seed python/numpy/JAX-host RNGs (device RNG keys are derived from
    the config seed inside the trainer)."""
    random.seed(seed)
    np.random.seed(seed)


def parse_buckets(spec):
    if not spec:
        return DEFAULT_WAVEFORM_BUCKETS
    return tuple(int(x) for x in spec.split(","))


def main():
    from turkish_asr_tpu.utils.runtime import enable_compilation_cache
    enable_compilation_cache()
    config = get_config()
    logger = get_logger(__name__)

    logger.info("=" * 60)
    logger.info("Turkish ASR Model Training (TPU)")
    logger.info("=" * 60)

    if config.distributed:
        # Multi-host (pod slice): one process per host; mesh axes span all
        # global devices, collectives ride ICI/DCN. No-op on a single host.
        jax.distributed.initialize()
        logger.info(f"Distributed: process {jax.process_index()}/{jax.process_count()}")

    set_seed(config.seed)
    logger.info(f"Devices: {jax.devices()}")

    tokenizer = load_tokenizer(config.tokenizer_path)
    backend = getattr(tokenizer, "backend", type(tokenizer).__name__)
    logger.info(f"Tokenizer loaded ({backend}). Vocab size: {tokenizer.vocab_size}")

    logger.info("Preparing datasets...")
    train_dataset, valid_dataset, test_dataset = create_datasets(
        config, tokenizer, augment_train=config.augment)

    if train_dataset is None or len(train_dataset) == 0:
        logger.error("Training dataset is empty! Check --data_path or --train_path.")
        return

    logger.info(
        f"Datasets: Train={len(train_dataset)}, "
        f"Valid={len(valid_dataset) if valid_dataset else 0}, "
        f"Test={len(test_dataset) if test_dataset else 0}")

    buckets = parse_buckets(config.bucket_lengths)
    # Multi-host: --batch_size is the GLOBAL batch. Every process samples
    # the same batches (seed-driven shuffle) and loads its interleaved
    # 1/process_count slice; parallel/mesh.shard_batch assembles the
    # global device array from the per-process slices.
    nproc, pidx = jax.process_count(), jax.process_index()
    if config.batch_size % nproc != 0:
        logger.error(f"--batch_size {config.batch_size} must be divisible "
                     f"by the process count {nproc}")
        return
    per_proc_bs = config.batch_size // nproc
    train_sampler = BucketingSampler(train_dataset, batch_size=config.batch_size,
                                     shuffle=True, seed=config.seed,
                                     process_index=pidx, process_count=nproc)
    train_loader = PrefetchLoader(train_dataset, train_sampler,
                                  per_proc_bs,
                                  num_workers=config.num_workers,
                                  waveform_buckets=buckets)
    valid_loader = None
    if valid_dataset:
        valid_sampler = BucketingSampler(valid_dataset, batch_size=config.batch_size,
                                         shuffle=False,
                                         process_index=pidx,
                                         process_count=nproc)
        valid_loader = PrefetchLoader(valid_dataset, valid_sampler,
                                      per_proc_bs,
                                      num_workers=config.num_workers,
                                      waveform_buckets=buckets)

    logger.info("Building model...")
    model_cfg = ModelConfig(
        n_mels=config.n_mel_channels,
        d_model=config.d_model,
        n_heads=config.n_heads,
        n_blocks=config.n_blocks,
        n_classes=tokenizer.vocab_size,
        dropout=config.encoder_dropout,
        masked_norm=config.masked_norm,
    )
    params, model_state = init_model(jax.random.PRNGKey(config.seed), model_cfg)
    logger.info(f"Model Parameters: {count_params(params):,} total")

    # ceil: a partial accumulation window is flushed at epoch end and
    # consumes one schedule step (see Trainer.flush_accumulation).
    steps_per_epoch = max(-(-len(train_loader) // config.accumulation_steps), 1)
    total_steps = steps_per_epoch * config.epochs
    optimizer, schedule = make_optimizer(
        config.learning_rate, config.weight_decay, total_steps,
        pct_start=0.1, gradient_clip=config.gradient_clip,
        accumulation_steps=config.accumulation_steps)

    mesh = make_mesh(config.mesh_shape)
    compute_dtype = jnp.bfloat16 if config.precision == "bf16" else jnp.float32

    attn_kernel = None
    if config.use_pallas:
        from turkish_asr_tpu.ops.flash_attention import make_flash_attention
        # mesh-aware: on multi-chip meshes the kernel runs under shard_map
        # over the data axis (same reason as the sharded CTC kernel).
        attn_kernel = make_flash_attention(mesh=mesh)

    trainer = Trainer(
        model_cfg=model_cfg,
        params=params,
        model_state=model_state,
        optimizer=optimizer,
        schedule=schedule,
        config=config,
        logger=logger,
        tokenizer=tokenizer,
        train_loader=train_loader,
        valid_loader=valid_loader,
        mesh=mesh,
        gradient_clip=config.gradient_clip,
        accumulation_steps=config.accumulation_steps,
        compute_dtype=compute_dtype,
        augment=config.augment,
        attn_kernel=attn_kernel,
    )

    try:
        trainer.fit()
    except KeyboardInterrupt:
        logger.info("Training interrupted by user.")
        trainer.save_checkpoint(trainer.start_epoch, name="interrupted_checkpoint.ckpt")
    except Exception as e:
        logger.exception(f"Training failed: {e}")
        raise


if __name__ == "__main__":
    main()
