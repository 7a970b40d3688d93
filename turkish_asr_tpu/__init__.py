"""turkish_asr_tpu — TPU-native Turkish Conformer-CTC ASR framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
Eminkorkut/Turkish-ASR-Model reference (PyTorch, single-GPU):

- log-mel front-end with SpecAugment / speed / noise augmentation
  (reference: data/preprocessing.py)
- Conformer encoder with RoPE + Multi-Query attention, SwiGLU FFN,
  GroupNorm, depthwise-conv module (reference: model/conformer.py,
  model/attention.py)
- CTC training with bf16 mixed precision, gradient accumulation,
  clipping, resumable checkpoints (reference: trainer/trainer.py)
- greedy / LM-fused prefix-beam CTC decoding (reference: utils/decoding.py)
- CLI inference, HTTP serving, model export (reference: inference.py,
  serve/api.py, export_onnx.py)

Design principles (TPU-first, NOT a port):
- every compute-path op is a jit-compiled pure function on static shapes
- batches are padded to a static bucket-length table (bounded compile count)
- multi-device scaling is a `jax.sharding.Mesh` + NamedSharding program,
  with XLA inserting the collectives — no hand-written comm layer
- hot kernels (attention, mel front-end) have Pallas TPU implementations
  with jnp fallbacks so correctness never depends on kernels
"""

__version__ = "0.1.0"
