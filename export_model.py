"""Model export for the Turkish ASR model (StableHLO + TF SavedModel).

The reference exports to ONNX via torch.onnx (/root/reference/
export_onnx.py:16-121: rebuild model, load checkpoint, wrapper dropping the
length mask, opset-14 export with dynamic batch/seq axes, checker verify,
size report). Two artifacts here:

- ``--format stablehlo`` (default): the TPU-native artifact via
  ``jax.export`` — dynamic batch and sequence dims as symbolic shapes,
  numeric-parity verification against the live model, size report.
- ``--format savedmodel``: a **TensorFlow SavedModel** via ``jax2tf`` —
  the deployment-ecosystem artifact standing in for the reference's ONNX
  file: consumable by TF Serving / TFLite converters / ``tf2onnx`` (the
  standard SavedModel->ONNX path) with the same dynamic batch/time axes
  and the same parity verification.

CLI mirrors the reference's flags (--checkpoint --output --n_mel_channels
--d_model --n_heads --n_blocks); ``--opset`` is accepted for flag parity.
"""

import argparse
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax import export as jax_export

from turkish_asr_tpu.data.tokenizer import TurkishTokenizer
from turkish_asr_tpu.models.conformer import ModelConfig, init_model, apply_model
from turkish_asr_tpu.train.checkpoint import load_checkpoint_file


def _load_forward(checkpoint_path, n_mel_channels, d_model, n_heads,
                  n_blocks):
    """Rebuild the model from a checkpoint; return (forward, cfg).

    Like the reference's ONNXWrapper the forward omits the length mask
    (dense attention over the provided frames)."""
    print(f"Loading checkpoint: {checkpoint_path}")
    ckpt = load_checkpoint_file(checkpoint_path)
    meta = ckpt.get("meta", {}) or {}
    mc = meta.get("model_config", {}) or {}
    tokenizer = TurkishTokenizer()
    cfg = ModelConfig(
        n_mels=int(mc.get("n_mels", n_mel_channels)),
        d_model=int(mc.get("d_model", d_model)),
        n_heads=int(mc.get("n_heads", n_heads)),
        n_blocks=int(mc.get("n_blocks", n_blocks)),
        n_classes=int(mc.get("n_classes", tokenizer.vocab_size)),
        dropout=0.0,
    )
    params = jax.tree.map(jnp.asarray, ckpt["params"])
    model_state = ckpt.get("model_state") or {}
    if model_state:
        state = jax.tree.map(jnp.asarray, model_state)
    else:
        _, state = init_model(jax.random.PRNGKey(0), cfg)

    def forward(feats):
        logits, _ = apply_model(params, state, feats, None, cfg=cfg,
                                train=False, compute_dtype=jnp.float32)
        return logits

    return forward, cfg, params, state


def export_stablehlo(
    checkpoint_path,
    output_path,
    n_mel_channels=80,
    d_model=256,
    n_heads=4,
    n_blocks=8,
    verify=True,
):
    """Export the model forward (features -> logits) to serialized StableHLO."""
    forward, cfg, _, _ = _load_forward(checkpoint_path, n_mel_channels,
                                       d_model, n_heads, n_blocks)

    # Dynamic batch; time must stay a multiple of 4 so the two stride-2
    # subsampling convs and the (C,F) flatten see consistent shapes.
    scope = jax_export.SymbolicScope()
    b = jax_export.symbolic_shape("b", scope=scope)[0]
    t = jax_export.symbolic_shape("4*t", scope=scope)[0]
    spec = jax.ShapeDtypeStruct((b, t, cfg.n_mels), jnp.float32)

    print("Exporting to StableHLO (symbolic batch/time)...")
    exported = jax_export.export(jax.jit(forward))(spec)
    blob = exported.serialize()
    with open(output_path, "wb") as f:
        f.write(blob)
    print(f"Exported: {output_path}")

    if verify:
        print("Verifying numeric parity...")
        rehydrated = jax_export.deserialize(blob)
        x = np.random.default_rng(0).standard_normal((2, 200, cfg.n_mels)).astype(np.float32)
        want = np.asarray(forward(jnp.asarray(x)))
        got = np.asarray(rehydrated.call(jnp.asarray(x)))
        err = float(np.max(np.abs(want - got)))
        print(f"Max abs diff vs live model: {err:.3e}")
        if err > 1e-4:
            raise RuntimeError(f"Export verification failed: max diff {err}")
        print("Verification passed.")

    file_size = os.path.getsize(output_path) / (1024 * 1024)
    print(f"Model size: {file_size:.2f} MB")
    return output_path


def export_savedmodel(
    checkpoint_path,
    output_path,
    n_mel_channels=80,
    d_model=256,
    n_heads=4,
    n_blocks=8,
    verify=True,
):
    """Export to a TensorFlow SavedModel via jax2tf (dynamic batch/time).

    The SavedModel is the ecosystem bridge artifact: serve with TF
    Serving, or convert onward with `python -m tf2onnx.convert
    --saved-model <dir> --output model.onnx` to produce the reference's
    exact artifact format where tf2onnx is installed.
    """
    import tensorflow as tf
    from jax.experimental import jax2tf

    forward, cfg, _, _ = _load_forward(checkpoint_path, n_mel_channels,
                                       d_model, n_heads, n_blocks)

    print("Converting with jax2tf (symbolic batch/time)...")
    tf_fn = jax2tf.convert(
        forward,
        polymorphic_shapes=[f"(b, 4*t, {cfg.n_mels})"],
        with_gradient=False,
    )
    module = tf.Module()
    module.serve = tf.function(
        tf_fn,
        autograph=False,
        input_signature=[tf.TensorSpec([None, None, cfg.n_mels],
                                       tf.float32, name="features")],
    )
    # Concretize once so the SavedModel carries the traced graph.
    module.serve.get_concrete_function()
    tf.saved_model.save(module, output_path)
    print(f"Exported SavedModel: {output_path}")

    if verify:
        print("Verifying numeric parity...")
        loaded = tf.saved_model.load(output_path)
        x = np.random.default_rng(0).standard_normal(
            (2, 200, cfg.n_mels)).astype(np.float32)
        want = np.asarray(forward(jnp.asarray(x)))
        got = loaded.serve(tf.constant(x)).numpy()
        err = float(np.max(np.abs(want - got)))
        print(f"Max abs diff vs live model: {err:.3e}")
        if err > 1e-3:
            raise RuntimeError(f"Export verification failed: max diff {err}")
        print("Verification passed.")

    size = sum(os.path.getsize(os.path.join(dp, f))
               for dp, _, fs in os.walk(output_path) for f in fs)
    print(f"Model size: {size / (1024 * 1024):.2f} MB")
    return output_path


def export_torch(
    checkpoint_path,
    output_path,
    n_mel_channels=80,
    d_model=256,
    n_heads=4,
    n_blocks=8,
    verify=True,
):
    """Export to a reference-format PyTorch ``.pt`` checkpoint.

    The reverse of ``--model foo.pt`` import: a model trained here loads
    directly into the reference stack (inference.py:89-99 contract) and
    its ``export_onnx.py`` then emits the literal ONNX artifact.
    Verification round-trips the state dict through utils/torch_import
    and checks forward parity against the live model.
    """
    from turkish_asr_tpu.utils.torch_export import export_torch_checkpoint

    forward, cfg, params, state = _load_forward(
        checkpoint_path, n_mel_channels, d_model, n_heads, n_blocks)

    print("Writing reference-format torch checkpoint...")
    export_torch_checkpoint(output_path, params, state, cfg)
    print(f"Exported: {output_path}")

    if verify:
        print("Verifying round-trip parity (export -> import -> forward)...")
        import torch
        from turkish_asr_tpu.utils.torch_import import import_torch_state_dict
        blob = torch.load(output_path, map_location="cpu", weights_only=True)
        p2, s2 = import_torch_state_dict(blob["model_state_dict"],
                                         cfg.n_blocks)
        x = np.random.default_rng(0).standard_normal(
            (2, 200, cfg.n_mels)).astype(np.float32)
        want = np.asarray(forward(jnp.asarray(x)))
        got, _ = apply_model(p2, s2, jnp.asarray(x), None, cfg=cfg,
                             train=False, compute_dtype=jnp.float32)
        err = float(np.max(np.abs(want - np.asarray(got))))
        print(f"Max abs diff vs live model: {err:.3e}")
        if err > 1e-4:
            raise RuntimeError(f"Export verification failed: max diff {err}")
        print("Verification passed.")

    file_size = os.path.getsize(output_path) / (1024 * 1024)
    print(f"Model size: {file_size:.2f} MB")
    return output_path


def main():
    parser = argparse.ArgumentParser(
        description="Export ASR model (StableHLO or TF SavedModel)")
    parser.add_argument("--checkpoint", type=str, required=True, help="Path to model checkpoint")
    parser.add_argument("--output", type=str, default="model.stablehlo", help="Output path")
    parser.add_argument("--format", type=str, default="stablehlo",
                        choices=["stablehlo", "savedmodel", "torch"],
                        help="Artifact format: TPU-native StableHLO, "
                             "jax2tf SavedModel (TF Serving / tf2onnx "
                             "bridge), or a reference-format torch .pt "
                             "(loads in the reference stack / its ONNX "
                             "exporter)")
    parser.add_argument("--n_mel_channels", type=int, default=80, help="Mel channels")
    parser.add_argument("--d_model", type=int, default=256, help="Model dimension")
    parser.add_argument("--n_heads", type=int, default=4, help="Attention heads")
    parser.add_argument("--n_blocks", type=int, default=8, help="Conformer blocks")
    parser.add_argument("--opset", type=int, default=None,
                        help="Unused (ONNX-parity flag); artifact versioning is automatic")
    args = parser.parse_args()

    exporter = {"savedmodel": export_savedmodel,
                "torch": export_torch}.get(args.format, export_stablehlo)
    exporter(
        checkpoint_path=args.checkpoint,
        output_path=args.output,
        n_mel_channels=args.n_mel_channels,
        d_model=args.d_model,
        n_heads=args.n_heads,
        n_blocks=args.n_blocks,
    )


if __name__ == "__main__":
    main()
