"""Checkpointing — msgpack snapshots with the reference's resume contract.

Reference (/root/reference/trainer/trainer.py:84-145):
- payload: epoch, global_step, model/optimizer/scheduler/scaler state,
  best_val_loss, vars(config)
- files ``checkpoint_epoch_{E}.ckpt`` and ``best_model.ckpt`` in
  checkpoint_dir; resume picks the latest ``checkpoint_epoch_*`` by mtime.

Layout here:
- "meta": python scalars (epoch, global_step, best_val_loss, config).
- "params" / "model_state": plain nested dicts of arrays (our param trees
  are pure dicts) — directly loadable by inference without any template.
- "opt_leaves": the optax state flattened to a leaf list; restored by
  unflattening against a freshly-initialized optimizer state's treedef
  (bit-exact resume incl. Adam moments and the schedule counter; bf16
  training needs no GradScaler analog).
"""

import glob
import os

import jax
import numpy as np
from flax import serialization


def _to_host(tree):
    return jax.tree.map(lambda x: np.asarray(jax.device_get(x)), tree)


def save_checkpoint_file(path, meta, params, model_state, opt_state=None):
    """Write a checkpoint (atomic rename)."""
    payload = {
        "meta": dict(meta),
        "params": _to_host(params),
        "model_state": _to_host(model_state),
    }
    if opt_state is not None:
        payload["opt_leaves"] = [np.asarray(jax.device_get(x))
                                 for x in jax.tree.leaves(opt_state)]
    blob = serialization.msgpack_serialize(payload)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)


def load_checkpoint_file(path, opt_state_template=None):
    """Read a checkpoint.

    Returns:
        dict with "meta", "params", "model_state" and (if present and a
        template is given) "opt_state".
    """
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    out = {
        "meta": payload.get("meta", {}),
        "params": payload.get("params", {}),
        "model_state": payload.get("model_state", {}),
    }
    leaves = payload.get("opt_leaves")
    if leaves is not None and opt_state_template is not None:
        treedef = jax.tree.structure(opt_state_template)
        # msgpack may deserialize the leaf list as a dict {index: leaf}
        if isinstance(leaves, dict):
            leaves = [leaves[k] for k in sorted(leaves, key=int)]
        out["opt_state"] = jax.tree.unflatten(treedef, leaves)
    return out


def latest_checkpoint(checkpoint_dir, pattern="checkpoint_epoch_*.ckpt"):
    """Newest epoch checkpoint by mtime (reference resume rule)."""
    candidates = sorted(
        glob.glob(os.path.join(checkpoint_dir, pattern)),
        key=os.path.getmtime,
    )
    return candidates[-1] if candidates else None
