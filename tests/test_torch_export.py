"""Reverse weight-level interop: our params -> reference torch checkpoint.

Counterpart of test_torch_import.py: a model trained in this framework
must load into the actual reference PyTorch model (strict=True — proving
full state-dict key coverage, buffers included) and produce the same
logits, so TPU-trained checkpoints deploy in the reference stack
(inference.py:89-99) and its export_onnx.py.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference mount not present")

ARCH = dict(n_mels=80, d_model=64, n_heads=4, n_blocks=2, n_classes=40)


def _ref_model():
    sys.path.insert(0, REF)
    try:
        from model.conformer import TurkishASRModel
    finally:
        sys.path.remove(REF)
    m = TurkishASRModel(n_mel_channels=ARCH["n_mels"], d_model=ARCH["d_model"],
                        n_heads=ARCH["n_heads"], n_blocks=ARCH["n_blocks"],
                        n_classes=ARCH["n_classes"], dropout=0.0)
    return m.eval()


def _our_model(seed=3):
    import jax
    from turkish_asr_tpu.models.conformer import ModelConfig, init_model
    cfg = ModelConfig(dropout=0.0, **ARCH)
    params, state = init_model(jax.random.PRNGKey(seed), cfg)
    # Non-trivial BN running stats so the stats path is exercised too.
    state = jax.tree.map(lambda a: a + 0.01, state)
    return cfg, params, state


def test_strict_load_and_forward_parity():
    import jax.numpy as jnp
    from turkish_asr_tpu.models.conformer import apply_model
    from turkish_asr_tpu.utils.torch_export import export_torch_state_dict

    cfg, params, state = _our_model()
    sd = export_torch_state_dict(params, state, cfg.n_heads)

    ref = _ref_model()
    ref.load_state_dict(sd, strict=True)  # every key must exist and match

    rng = np.random.default_rng(0)
    B, T = 2, 64
    x = rng.standard_normal((B, T, cfg.n_mels)).astype(np.float32)
    lengths = np.array([64, 40], dtype=np.int32)

    with torch.no_grad():
        want = ref(torch.tensor(x),
                   input_lengths=torch.tensor(lengths)).numpy()
    got, _ = apply_model(params, state, jnp.asarray(x), jnp.asarray(lengths),
                         cfg=cfg, train=False)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=2e-4)


def test_roundtrip_identity():
    """export -> import reproduces the exact param/state pytrees."""
    import jax
    from turkish_asr_tpu.utils.torch_export import export_torch_state_dict
    from turkish_asr_tpu.utils.torch_import import import_torch_state_dict

    cfg, params, state = _our_model(seed=5)
    sd = export_torch_state_dict(params, state, cfg.n_heads)
    p2, s2 = import_torch_state_dict(sd, cfg.n_blocks)

    flat1, tree1 = jax.tree.flatten(params)
    flat2, tree2 = jax.tree.flatten(p2)
    assert tree1 == tree2
    for a, b in zip(flat1, flat2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(s2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_export_cli_writes_reference_checkpoint(tmp_path):
    """export_model.py --format torch end-to-end from our checkpoint file."""
    from export_model import export_torch
    from turkish_asr_tpu.train.checkpoint import save_checkpoint_file

    cfg, params, state = _our_model(seed=7)
    ckpt = tmp_path / "model.ckpt"
    save_checkpoint_file(str(ckpt), params=params, model_state=state,
                         meta={"model_config": {
                             "n_mels": cfg.n_mels, "d_model": cfg.d_model,
                             "n_heads": cfg.n_heads, "n_blocks": cfg.n_blocks,
                             "n_classes": cfg.n_classes}})
    out = tmp_path / "model.pt"
    export_torch(str(ckpt), str(out), n_mel_channels=cfg.n_mels,
                 d_model=cfg.d_model, n_heads=cfg.n_heads,
                 n_blocks=cfg.n_blocks)

    blob = torch.load(str(out), map_location="cpu", weights_only=True)
    assert blob["config"]["d_model"] == cfg.d_model
    ref = _ref_model()
    ref.load_state_dict(blob["model_state_dict"], strict=True)


def test_reference_export_onnx_runs_on_our_pt(tmp_path, monkeypatch):
    """The LITERAL last hop: the reference's own export_onnx.py executed on
    a .pt exported from this framework, verified with onnx.checker.

    Skips where the `onnx` package is absent (it is not pip-installable in
    the zero-egress build image — checked 2026-08-18); runs end-to-end in
    any environment that has it. The hub tokenizer (network) is stubbed —
    export_onnx only reads vocab_size from it, and our checkpoint pins
    n_classes."""
    pytest.importorskip("onnx")
    import importlib.util

    from export_model import export_torch
    from turkish_asr_tpu.train.checkpoint import save_checkpoint_file

    cfg, params, state = _our_model(seed=11)
    ckpt = tmp_path / "model.ckpt"
    save_checkpoint_file(str(ckpt), params=params, model_state=state,
                         meta={"model_config": {
                             "n_mels": cfg.n_mels, "d_model": cfg.d_model,
                             "n_heads": cfg.n_heads, "n_blocks": cfg.n_blocks,
                             "n_classes": cfg.n_classes}})
    pt = tmp_path / "model.pt"
    export_torch(str(ckpt), str(pt), n_mel_channels=cfg.n_mels,
                 d_model=cfg.d_model, n_heads=cfg.n_heads,
                 n_blocks=cfg.n_blocks)

    sys.path.insert(0, REF)
    try:
        spec = importlib.util.spec_from_file_location(
            "ref_export_onnx", os.path.join(REF, "export_onnx.py"))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        sys.path.remove(REF)

    class _StubTok:
        vocab_size = ARCH["n_classes"]

    monkeypatch.setattr(mod, "TurkishTokenizer", _StubTok)
    onnx_out = tmp_path / "model.onnx"
    mod.export_onnx(checkpoint_path=str(pt), output_path=str(onnx_out),
                    n_mel_channels=cfg.n_mels, d_model=cfg.d_model,
                    n_heads=cfg.n_heads, n_blocks=cfg.n_blocks)
    import onnx
    onnx.checker.check_model(onnx.load(str(onnx_out)))
