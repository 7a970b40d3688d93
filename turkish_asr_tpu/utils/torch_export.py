"""Export our params to a reference-loadable PyTorch checkpoint.

Inverse of utils/torch_import.py: maps our functional param/state pytrees
onto the module tree of /root/reference/model/conformer.py +
model/attention.py, so models trained on TPU here deploy unmodified in the
reference stack — its inference.py (checkpoint contract inference.py:89-99),
serve/api.py, and export_onnx.py (which then produces the literal ONNX
artifact via torch.onnx.export, export_onnx.py:94-104).

Layout mapping (ours -> torch):
- Linear ``w (in, out)``        -> ``weight (out, in)`` (transpose)
- Conv2d ``w (H, W, I, O)`` HWIO -> ``weight (O, I, H, W)`` OIHW
- Conv1d ``w (K, I/g, O)`` WIO   -> ``weight (O, I/g, K)``
- ``scale``/``bias``             -> GroupNorm/BatchNorm ``weight``/``bias``
- batch-stat state tree          -> BatchNorm running stats
- stacked (n_blocks, ...) arrays -> per-block ``blocks.{i}.*`` keys

Reference-only entries we synthesize so ``load_state_dict(strict=True)``
succeeds (proving full key coverage):
- ``attn.rotary_emb.inv_freq`` buffers: recomputed as
  ``1 / base^(arange(0, d_head, 2) / d_head)`` (attention.py:29-33).
- ``conv.batch_norm.num_batches_tracked``: 0 (torch counts batches only
  to derive a momentum when momentum=None; the reference uses the 0.1
  default, so the counter is inert).
- ``norm_conv`` (declared-but-unused module, conformer.py:105): identity
  GroupNorm init (weight=1, bias=0) — it never runs in the forward.
"""

import numpy as np


def _np(x):
    return np.asarray(x, dtype=np.float32)


def _to_torch(arr):
    import torch
    # copy: jax buffers surface as non-writable numpy views, which torch
    # tensors must not alias
    return torch.from_numpy(np.array(arr, copy=True))


def _linear(out, prefix, p):
    out[prefix + ".weight"] = _np(p["w"]).T
    out[prefix + ".bias"] = _np(p["b"])


def _norm(out, prefix, p):
    out[prefix + ".weight"] = _np(p["scale"])
    out[prefix + ".bias"] = _np(p["bias"])


def _conv1d(out, prefix, p):
    out[prefix + ".weight"] = _np(p["w"]).transpose(2, 1, 0)
    out[prefix + ".bias"] = _np(p["b"])


def _conv2d(out, prefix, p):
    out[prefix + ".weight"] = _np(p["w"]).transpose(3, 2, 0, 1)
    out[prefix + ".bias"] = _np(p["b"])


def export_torch_state_dict(params, state, n_heads):
    """(params, model_state) pytrees -> reference-keyed torch state dict.

    Returns a dict of torch tensors covering EVERY key of the reference
    ``TurkishASRModel.state_dict()`` for the matching architecture, so a
    strict load succeeds.
    """
    import jax

    sd = {}
    _conv2d(sd, "subsample.0", params["sub1"])
    _conv2d(sd, "subsample.2", params["sub2"])
    _linear(sd, "input_proj", params["input_proj"])
    _linear(sd, "fc", params["fc"])

    d_model = _np(params["input_proj"]["b"]).shape[0]
    d_head = d_model // n_heads
    inv_freq = 1.0 / (10000.0 ** (np.arange(0, d_head, 2,
                                             dtype=np.float32) / d_head))

    blocks = params["blocks"]
    bstate = state["blocks"]
    n_blocks = _np(blocks["norm_ff1"]["scale"]).shape[0]
    for i in range(n_blocks):
        bp = jax.tree.map(lambda a: a[i], blocks)
        p = f"blocks.{i}"
        _linear(sd, f"{p}.ff1.linear1", bp["ff1"]["in"])
        _linear(sd, f"{p}.ff1.linear2", bp["ff1"]["out"])
        _norm(sd, f"{p}.norm_ff1.norm", bp["norm_ff1"])
        sd[f"{p}.attn.rotary_emb.inv_freq"] = inv_freq
        _linear(sd, f"{p}.attn.linear_q", bp["attn"]["q"])
        _linear(sd, f"{p}.attn.linear_k", bp["attn"]["k"])
        _linear(sd, f"{p}.attn.linear_v", bp["attn"]["v"])
        _linear(sd, f"{p}.attn.linear_out", bp["attn"]["out"])
        _norm(sd, f"{p}.norm_attn.norm", bp["norm_attn"])
        _norm(sd, f"{p}.conv.norm.norm", bp["conv"]["norm"])
        _conv1d(sd, f"{p}.conv.pointwise_conv1", bp["conv"]["pw1"])
        _conv1d(sd, f"{p}.conv.depthwise_conv", bp["conv"]["dw"])
        _norm(sd, f"{p}.conv.batch_norm", bp["conv"]["bn"])
        sd[f"{p}.conv.batch_norm.running_mean"] = _np(bstate["bn"]["mean"][i])
        sd[f"{p}.conv.batch_norm.running_var"] = _np(bstate["bn"]["var"][i])
        sd[f"{p}.conv.batch_norm.num_batches_tracked"] = np.asarray(
            0, dtype=np.int64)
        _conv1d(sd, f"{p}.conv.pointwise_conv2", bp["conv"]["pw2"])
        # Dead module (never in the reference forward): identity init.
        sd[f"{p}.norm_conv.norm.weight"] = np.ones((d_model,), np.float32)
        sd[f"{p}.norm_conv.norm.bias"] = np.zeros((d_model,), np.float32)
        _linear(sd, f"{p}.ff2.linear1", bp["ff2"]["in"])
        _linear(sd, f"{p}.ff2.linear2", bp["ff2"]["out"])
        _norm(sd, f"{p}.norm_ff2.norm", bp["norm_ff2"])
        _norm(sd, f"{p}.final_norm.norm", bp["final_norm"])

    return {k: _to_torch(v) for k, v in sd.items()}


def export_torch_checkpoint(path, params, state, cfg, *, n_heads=None,
                            config_snapshot=None):
    """Write a reference-format ``.pt`` training checkpoint.

    Payload mirrors the reference trainer's save (trainer.py:89-98)
    minus optimizer/scheduler/scaler states (not meaningful across
    frameworks): ``model_state_dict`` + a ``config`` dict carrying at
    least the architecture flags the reference CLIs take.
    """
    import torch

    heads = n_heads if n_heads is not None else cfg.n_heads
    sd = export_torch_state_dict(params, state, heads)
    config = {
        "n_mel_channels": cfg.n_mels,
        "d_model": cfg.d_model,
        "n_heads": heads,
        "n_blocks": cfg.n_blocks,
        "dropout": cfg.dropout,
    }
    if config_snapshot:
        config.update(config_snapshot)
    torch.save({"model_state_dict": sd, "config": config}, path)
    return sd
