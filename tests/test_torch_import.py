"""Weight-level interop: reference torch checkpoints -> our params.

The strongest parity proof in the suite: run the actual reference PyTorch
model (imported from the read-only mount as a test oracle) and our JAX
model on identical inputs with identical (imported) weights — outputs must
match.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference mount not present")


class Sneaky:
    """Module-level so torch.save can pickle it by reference."""


def _ref_model(n_mels=80, d_model=64, n_heads=4, n_blocks=2, n_classes=40):
    sys.path.insert(0, REF)
    try:
        from model.conformer import TurkishASRModel
    finally:
        sys.path.remove(REF)
    torch.manual_seed(0)
    m = TurkishASRModel(n_mel_channels=n_mels, d_model=d_model,
                        n_heads=n_heads, n_blocks=n_blocks,
                        n_classes=n_classes, dropout=0.0)
    return m.eval()


def test_forward_parity_with_reference_torch_model():
    import jax
    import jax.numpy as jnp
    from turkish_asr_tpu.models.conformer import ModelConfig, apply_model
    from turkish_asr_tpu.utils.torch_import import import_torch_state_dict

    n_mels, d, heads, blocks, classes = 80, 64, 4, 2, 40
    ref = _ref_model(n_mels, d, heads, blocks, classes)
    params, state = import_torch_state_dict(ref.state_dict(), blocks)
    cfg = ModelConfig(n_mels=n_mels, d_model=d, n_heads=heads,
                      n_blocks=blocks, n_classes=classes, dropout=0.0)

    rng = np.random.default_rng(0)
    B, T = 2, 64
    x = rng.standard_normal((B, T, n_mels)).astype(np.float32)
    lengths = np.array([64, 40], dtype=np.int32)

    with torch.no_grad():
        want = ref(torch.tensor(x),
                   input_lengths=torch.tensor(lengths)).numpy()

    got, _ = apply_model(params, state, jnp.asarray(x), jnp.asarray(lengths),
                         cfg=cfg, train=False)
    got = np.asarray(got)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-4)


def test_forward_parity_no_lengths():
    import jax.numpy as jnp
    from turkish_asr_tpu.models.conformer import ModelConfig, apply_model
    from turkish_asr_tpu.utils.torch_import import import_torch_state_dict

    ref = _ref_model()
    params, state = import_torch_state_dict(ref.state_dict(), 2)
    cfg = ModelConfig(n_mels=80, d_model=64, n_heads=4, n_blocks=2,
                      n_classes=40, dropout=0.0)
    x = np.random.default_rng(1).standard_normal((1, 52, 80)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.tensor(x)).numpy()
    got, _ = apply_model(params, state, jnp.asarray(x), None, cfg=cfg)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=2e-4)


def test_checkpoint_file_roundtrip(tmp_path):
    from turkish_asr_tpu.utils.torch_import import load_torch_checkpoint

    ref = _ref_model()
    path = str(tmp_path / "ref.pt")
    torch.save({"model_state_dict": ref.state_dict(), "epoch": 3}, path)
    cfg, params, state = load_torch_checkpoint(path)
    assert cfg.d_model == 64 and cfg.n_blocks == 2 and cfg.n_classes == 40
    assert cfg.n_mels == 80

    # bare state dict form
    path2 = str(tmp_path / "bare.pt")
    torch.save(ref.state_dict(), path2)
    cfg2, _, _ = load_torch_checkpoint(path2)
    assert cfg2.d_model == 64


def test_n_mels_from_config_blob(tmp_path):
    """n_mels not divisible by 4 is only recoverable from the embedded
    config (input_proj pins n_mels//4, reference conformer.py:157)."""
    from turkish_asr_tpu.utils.torch_import import load_torch_checkpoint

    ref = _ref_model(n_mels=78)
    path = str(tmp_path / "ref78.pt")
    torch.save({"model_state_dict": ref.state_dict(),
                "config": {"n_mel_channels": 78, "n_heads": 4}}, path)
    cfg, _, _ = load_torch_checkpoint(path)
    assert cfg.n_mels == 78

    # without the blob, inference rounds to the divisible-by-4 member
    bare = str(tmp_path / "bare78.pt")
    torch.save(ref.state_dict(), bare)
    cfg2, _, _ = load_torch_checkpoint(bare)
    assert cfg2.n_mels == 76  # ambiguity documented: 76..79 share //4

    # an inconsistent blob must raise, not silently misalign
    bad = str(tmp_path / "bad.pt")
    torch.save({"model_state_dict": ref.state_dict(),
                "config": {"n_mel_channels": 120}}, bad)
    with pytest.raises(ValueError, match="n_mel"):
        load_torch_checkpoint(bad)


def test_weights_only_rejects_pickle_payload(tmp_path):
    """Untrusted checkpoints load under weights_only=True; arbitrary-object
    payloads require the explicit allow_pickle opt-in."""
    from turkish_asr_tpu.utils.torch_import import load_torch_checkpoint

    ref = _ref_model()
    path = str(tmp_path / "sneaky.pt")
    torch.save({"model_state_dict": ref.state_dict(), "obj": Sneaky()}, path)
    with pytest.raises(Exception):
        load_torch_checkpoint(path)  # default: no pickle execution
    cfg, _, _ = load_torch_checkpoint(path, allow_pickle=True)
    assert cfg.d_model == 64
