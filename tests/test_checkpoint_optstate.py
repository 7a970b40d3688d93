"""Named optimizer-state serialization (VERDICT r1 #8).

The round-1 format flattened optax state to an anonymous positional leaf
list — an optax version bump or optimizer-chain change could silently
misassign Adam moments. The named format must (a) round-trip bit-exact,
(b) fail LOUDLY on any structure mismatch, never reorder silently.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from turkish_asr_tpu.train.checkpoint import (
    save_checkpoint_file, load_checkpoint_file)


def _params():
    return {"a": {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.ones((3,))},
            "c": jnp.full((4,), 2.0)}


def _opt(lr=1e-3):
    return optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(lr))


def test_named_roundtrip_bit_exact(tmp_path):
    params = _params()
    tx = _opt()
    opt_state = tx.init(params)
    # advance a few steps so moments are nontrivial
    for i in range(3):
        grads = jax.tree.map(lambda x: x * 0.1 * (i + 1), params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)

    path = str(tmp_path / "ck.ckpt")
    save_checkpoint_file(path, {"epoch": 3}, params, {}, opt_state=opt_state)
    restored = load_checkpoint_file(path, opt_state_template=tx.init(_params()))

    want = jax.tree.leaves(opt_state)
    got = jax.tree.leaves(restored["opt_state"])
    assert len(want) == len(got)
    for w, g in zip(want, got):
        np.testing.assert_array_equal(np.asarray(w), np.asarray(g))


def test_structure_change_raises(tmp_path):
    params = _params()
    tx = _opt()
    path = str(tmp_path / "ck.ckpt")
    save_checkpoint_file(path, {}, params, {}, opt_state=tx.init(params))

    # a different optimizer chain must fail loudly, not misassign
    other = optax.chain(optax.clip_by_global_norm(1.0),
                        optax.sgd(1e-3, momentum=0.9))
    with pytest.raises((KeyError, ValueError)):
        load_checkpoint_file(path, opt_state_template=other.init(params))


def test_shape_change_raises(tmp_path):
    params = _params()
    tx = _opt()
    path = str(tmp_path / "ck.ckpt")
    save_checkpoint_file(path, {}, params, {}, opt_state=tx.init(params))

    grown = {"a": {"w": jnp.zeros((2, 5)), "b": jnp.ones((3,))},
             "c": jnp.zeros((4,))}
    with pytest.raises(ValueError, match="shape"):
        load_checkpoint_file(path, opt_state_template=tx.init(grown))


def test_legacy_positional_format_still_loads(tmp_path):
    """Round-1 checkpoints carry "opt_leaves"; they must restore when the
    leaf count matches and raise when it doesn't."""
    from flax import serialization

    params = _params()
    tx = _opt()
    opt_state = tx.init(params)
    payload = {
        "meta": {}, "params": jax.tree.map(np.asarray, params),
        "model_state": {},
        "opt_leaves": [np.asarray(x) for x in jax.tree.leaves(opt_state)],
    }
    path = str(tmp_path / "legacy.ckpt")
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(payload))

    restored = load_checkpoint_file(path, opt_state_template=tx.init(_params()))
    for w, g in zip(jax.tree.leaves(opt_state),
                    jax.tree.leaves(restored["opt_state"])):
        np.testing.assert_array_equal(np.asarray(w), np.asarray(g))

    other = optax.sgd(1e-3)
    with pytest.raises(ValueError, match="leaves"):
        load_checkpoint_file(path, opt_state_template=other.init(params))
