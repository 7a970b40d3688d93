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
- "opt_named": the optax state flattened to a {keypath: leaf} dict (key
  paths from ``jax.tree_util.tree_flatten_with_path``, e.g.
  ``[0].mu['blocks']['attn']['q']['w']``); restored by looking each leaf of
  a freshly-initialized optimizer state up **by name**, with shape
  validation — an optax version bump or optimizer-chain change fails
  loudly instead of silently misassigning Adam moments (VERDICT r1 #8).
  Bit-exact resume incl. moments and the schedule counter; bf16 training
  needs no GradScaler analog. Legacy round-1 checkpoints carry a
  positional "opt_leaves" list and are still readable.
"""

import glob
import os

import jax
import numpy as np
from flax import serialization


def _to_host(tree):
    return jax.tree.map(lambda x: np.asarray(jax.device_get(x)), tree)


def _named_leaves(tree):
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    return {jax.tree_util.keystr(path): leaf for path, leaf in flat}


def save_checkpoint_file(path, meta, params, model_state, opt_state=None):
    """Write a checkpoint (atomic rename)."""
    payload = {
        "meta": dict(meta),
        "params": _to_host(params),
        "model_state": _to_host(model_state),
    }
    if opt_state is not None:
        payload["opt_named"] = {
            k: np.asarray(jax.device_get(v))
            for k, v in _named_leaves(opt_state).items()
        }
    blob = serialization.msgpack_serialize(payload)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)


def _restore_opt_named(named, template):
    flat, _ = jax.tree_util.tree_flatten_with_path(template)
    treedef = jax.tree.structure(template)
    want = {jax.tree_util.keystr(p) for p, _ in flat}
    missing = sorted(want - set(named))
    extra = sorted(set(named) - want)
    if missing or extra:
        raise KeyError(
            "optimizer state structure mismatch between checkpoint and "
            f"current optimizer: missing={missing[:5]} extra={extra[:5]} "
            "(optax version bump or optimizer-chain change?)")
    leaves = []
    for p, tmpl in flat:
        k = jax.tree_util.keystr(p)
        v = named[k]
        if np.shape(v) != np.shape(tmpl):
            raise ValueError(
                f"optimizer leaf {k} shape {np.shape(v)} != expected "
                f"{np.shape(tmpl)}")
        leaves.append(v)
    return jax.tree.unflatten(treedef, leaves)


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
    named = payload.get("opt_named")
    if named is not None and opt_state_template is not None:
        out["opt_state"] = _restore_opt_named(named, opt_state_template)
    else:
        leaves = payload.get("opt_leaves")  # legacy positional format
        if leaves is not None and opt_state_template is not None:
            treedef = jax.tree.structure(opt_state_template)
            # msgpack may deserialize the leaf list as a dict {index: leaf}
            if isinstance(leaves, dict):
                leaves = [leaves[k] for k in sorted(leaves, key=int)]
            n_want = treedef.num_leaves
            if len(leaves) != n_want:
                raise ValueError(
                    f"legacy checkpoint has {len(leaves)} optimizer leaves, "
                    f"current optimizer expects {n_want}")
            out["opt_state"] = jax.tree.unflatten(treedef, leaves)
    return out


def latest_checkpoint(checkpoint_dir, pattern="checkpoint_epoch_*.ckpt"):
    """Newest epoch checkpoint by mtime (reference resume rule)."""
    candidates = sorted(
        glob.glob(os.path.join(checkpoint_dir, pattern)),
        key=os.path.getmtime,
    )
    return candidates[-1] if candidates else None
