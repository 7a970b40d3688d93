"""Import reference PyTorch checkpoints into this framework.

Users of the reference (Eminkorkut/Turkish-ASR-Model) hold ``.pt``
checkpoints whose ``model_state_dict`` follows the module tree of
/root/reference/model/conformer.py + model/attention.py. This module maps
that state dict onto our functional param/state pytrees so reference-trained
models run unmodified on TPU (weight-level interop — the swap-in story).

Layout mapping (torch -> ours):
- Linear ``weight (out, in)``            -> ``w (in, out)`` (transpose)
- Conv2d ``weight (O, I, H, W)`` OIHW    -> ``w (H, W, I, O)`` HWIO
- Conv1d ``weight (O, I/g, K)``          -> ``w (K, I/g, O)`` WIO
- GroupNorm/BatchNorm ``weight/bias``    -> ``scale``/``bias``
- BatchNorm running stats               -> batch-stat state tree
- per-block modules                     -> stacked (n_blocks, ...) arrays
Skipped (not parameters of the math): ``rotary_emb.inv_freq`` buffers,
``num_batches_tracked``, and the reference's dead ``norm_conv`` module
(declared but never used in its forward — conformer.py:105 vs :114-135).
"""

import numpy as np
import jax.numpy as jnp


def _t(state_dict, key):
    v = state_dict[key]
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    return np.asarray(v, dtype=np.float32)


def _linear(sd, prefix):
    return {"w": jnp.asarray(_t(sd, prefix + ".weight").T),
            "b": jnp.asarray(_t(sd, prefix + ".bias"))}


def _norm(sd, prefix):
    return {"scale": jnp.asarray(_t(sd, prefix + ".weight")),
            "bias": jnp.asarray(_t(sd, prefix + ".bias"))}


def _conv1d(sd, prefix):
    return {"w": jnp.asarray(_t(sd, prefix + ".weight").transpose(2, 1, 0)),
            "b": jnp.asarray(_t(sd, prefix + ".bias"))}


def _conv2d(sd, prefix):
    return {"w": jnp.asarray(_t(sd, prefix + ".weight").transpose(2, 3, 1, 0)),
            "b": jnp.asarray(_t(sd, prefix + ".bias"))}


def import_torch_state_dict(state_dict, n_blocks):
    """Map a reference ``model_state_dict`` to (params, model_state).

    Accepts either raw tensors or numpy arrays as values. ``n_blocks`` must
    match the checkpoint (blocks.{i}.* keys).
    """
    sd = state_dict
    params = {
        "sub1": _conv2d(sd, "subsample.0"),
        "sub2": _conv2d(sd, "subsample.2"),
        "input_proj": _linear(sd, "input_proj"),
        "fc": _linear(sd, "fc"),
    }

    block_params = []
    block_state = []
    for i in range(n_blocks):
        p = f"blocks.{i}"
        block_params.append({
            "ff1": {"in": _linear(sd, f"{p}.ff1.linear1"),
                    "out": _linear(sd, f"{p}.ff1.linear2")},
            "norm_ff1": _norm(sd, f"{p}.norm_ff1.norm"),
            "attn": {
                "q": _linear(sd, f"{p}.attn.linear_q"),
                "k": _linear(sd, f"{p}.attn.linear_k"),
                "v": _linear(sd, f"{p}.attn.linear_v"),
                "out": _linear(sd, f"{p}.attn.linear_out"),
            },
            "norm_attn": _norm(sd, f"{p}.norm_attn.norm"),
            "conv": {
                "norm": _norm(sd, f"{p}.conv.norm.norm"),
                "pw1": _conv1d(sd, f"{p}.conv.pointwise_conv1"),
                "dw": _conv1d(sd, f"{p}.conv.depthwise_conv"),
                "bn": _norm(sd, f"{p}.conv.batch_norm"),
                "pw2": _conv1d(sd, f"{p}.conv.pointwise_conv2"),
            },
            "ff2": {"in": _linear(sd, f"{p}.ff2.linear1"),
                    "out": _linear(sd, f"{p}.ff2.linear2")},
            "norm_ff2": _norm(sd, f"{p}.norm_ff2.norm"),
            "final_norm": _norm(sd, f"{p}.final_norm.norm"),
        })
        block_state.append({
            "bn": {"mean": jnp.asarray(_t(sd, f"{p}.conv.batch_norm.running_mean")),
                   "var": jnp.asarray(_t(sd, f"{p}.conv.batch_norm.running_var"))},
        })

    import jax
    params["blocks"] = jax.tree.map(lambda *xs: jnp.stack(xs), *block_params)
    state = {"blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *block_state)}
    return params, state


def infer_arch_from_state_dict(state_dict, n_mels=None):
    """(n_mels, d_model, n_heads?, n_blocks, n_classes) from tensor shapes.

    n_heads is not recoverable from shapes alone (MQA stores one shared
    head); returns None for it. The input_proj shape only pins
    ``n_mels // 4`` (reference conformer.py:157), so an explicit ``n_mels``
    (e.g. from the checkpoint's embedded config) takes precedence; it is
    validated against the flattened dim and a mismatch raises rather than
    silently misaligning features.
    """
    d_model = _t(state_dict, "subsample.0.weight").shape[0]
    flattened = _t(state_dict, "input_proj.weight").shape[1]
    if flattened % d_model != 0:
        raise ValueError(
            f"input_proj in-dim {flattened} is not a multiple of "
            f"d_model {d_model}; not a reference-shaped checkpoint")
    mels_div4 = flattened // d_model
    if n_mels is not None:
        if int(n_mels) // 4 != mels_div4:
            raise ValueError(
                f"checkpoint config says n_mel_channels={n_mels} but "
                f"input_proj implies n_mels//4 == {mels_div4}")
        n_mels = int(n_mels)
    else:
        n_mels = mels_div4 * 4
    n_classes = _t(state_dict, "fc.weight").shape[0]
    n_blocks = 0
    while f"blocks.{n_blocks}.ff1.linear1.weight" in state_dict:
        n_blocks += 1
    return n_mels, d_model, None, n_blocks, n_classes


def load_torch_checkpoint(path, n_heads=4, allow_pickle=False):
    """Load a reference ``.pt`` checkpoint file -> (cfg, params, state).

    Accepts either a full training checkpoint (``model_state_dict`` inside)
    or a bare state dict — the reference's own loading contract
    (inference.py:93-98). Loads with ``weights_only=True`` (no arbitrary
    pickle execution); pass ``allow_pickle=True`` to opt into full
    unpickling for trusted checkpoints that older torch saved with
    non-tensor payloads.
    """
    import torch
    from turkish_asr_tpu.models.conformer import ModelConfig
    try:
        blob = torch.load(path, map_location="cpu", weights_only=True)
    except Exception as e:
        if not allow_pickle:
            raise RuntimeError(
                f"Safe (weights_only) load of {path} failed: {e}\n"
                "The checkpoint contains non-tensor pickled payloads "
                "(e.g. embedded config/optimizer objects). If the file "
                "is trusted, re-run with --trust_checkpoint "
                "(allow_pickle=True) to permit full unpickling.") from e
        blob = torch.load(path, map_location="cpu", weights_only=False)
    sd = blob.get("model_state_dict", blob) if isinstance(blob, dict) else blob
    # Full reference checkpoints embed vars(config) incl. n_heads and
    # n_mel_channels (reference trainer.py:97) — heads are not recoverable
    # from MQA weight shapes and mels are only pinned modulo //4, so prefer
    # the stored values over arguments/inference.
    stored_mels = None
    if isinstance(blob, dict):
        stored = blob.get("config") or {}
        n_heads = int(stored.get("n_heads", n_heads))
        if stored.get("n_mel_channels") is not None:
            stored_mels = int(stored["n_mel_channels"])
    n_mels, d_model, _, n_blocks, n_classes = infer_arch_from_state_dict(
        sd, n_mels=stored_mels)
    params, state = import_torch_state_dict(sd, n_blocks)
    cfg = ModelConfig(n_mels=n_mels, d_model=d_model, n_heads=n_heads,
                      n_blocks=n_blocks, n_classes=n_classes, dropout=0.0)
    return cfg, params, state
