"""StableHLO export round-trip tests."""

import os
import sys

import jax
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from turkish_asr_tpu.data.tokenizer import TurkishTokenizer
from turkish_asr_tpu.models.conformer import ModelConfig, init_model
from turkish_asr_tpu.train.checkpoint import save_checkpoint_file


def test_export_and_verify(tmp_path):
    from export_model import export_stablehlo
    tok = TurkishTokenizer()
    cfg = ModelConfig(n_mels=80, d_model=32, n_heads=2, n_blocks=1,
                      n_classes=tok.vocab_size, dropout=0.0)
    params, state = init_model(jax.random.PRNGKey(0), cfg)
    ckpt = str(tmp_path / "m.ckpt")
    save_checkpoint_file(ckpt, {"model_config": {
        "n_mels": 80, "d_model": 32, "n_heads": 2, "n_blocks": 1,
        "n_classes": tok.vocab_size, "dropout": 0.0}}, params, state)
    out = str(tmp_path / "m.stablehlo")
    # export_stablehlo verifies numeric parity internally (raises on drift)
    export_stablehlo(ckpt, out)
    assert os.path.getsize(out) > 1000


def test_exported_dynamic_shapes(tmp_path):
    from export_model import export_stablehlo
    import numpy as np
    import jax.numpy as jnp
    from jax import export as jax_export

    tok = TurkishTokenizer()
    cfg = ModelConfig(n_mels=80, d_model=32, n_heads=2, n_blocks=1,
                      n_classes=tok.vocab_size, dropout=0.0)
    params, state = init_model(jax.random.PRNGKey(1), cfg)
    ckpt = str(tmp_path / "m.ckpt")
    save_checkpoint_file(ckpt, {"model_config": {
        "n_mels": 80, "d_model": 32, "n_heads": 2, "n_blocks": 1,
        "n_classes": tok.vocab_size, "dropout": 0.0}}, params, state)
    out = str(tmp_path / "m.stablehlo")
    export_stablehlo(ckpt, out, verify=False)

    with open(out, "rb") as f:
        exported = jax_export.deserialize(f.read())
    # Different batch/time than the export example must work.
    for B, T in [(1, 100), (3, 96)]:
        x = np.zeros((B, T, 80), dtype=np.float32)
        y = exported.call(jnp.asarray(x))
        assert y.shape[0] == B and y.shape[2] == tok.vocab_size


@pytest.mark.slow
def test_export_savedmodel(tmp_path):
    """jax2tf SavedModel: dynamic batch/time + numeric parity (the
    reference-ONNX-artifact equivalent; export_model.py docstring)."""
    tf = pytest.importorskip("tensorflow")
    from export_model import export_savedmodel

    tok = TurkishTokenizer()
    cfg = ModelConfig(n_mels=80, d_model=32, n_heads=2, n_blocks=1,
                      n_classes=tok.vocab_size, dropout=0.0)
    params, state = init_model(jax.random.PRNGKey(0), cfg)
    ckpt = str(tmp_path / "m.ckpt")
    save_checkpoint_file(ckpt, {"model_config": {
        "n_mels": 80, "d_model": 32, "n_heads": 2, "n_blocks": 1,
        "n_classes": tok.vocab_size, "dropout": 0.0}}, params, state)
    out = str(tmp_path / "sm")
    # export_savedmodel verifies numeric parity internally (raises on drift)
    export_savedmodel(ckpt, out)
    loaded = tf.saved_model.load(out)
    import numpy as np
    for B, T in [(1, 100), (3, 96)]:
        y = loaded.serve(tf.constant(np.zeros((B, T, 80), np.float32)))
        assert y.shape[0] == B and y.shape[2] == tok.vocab_size
