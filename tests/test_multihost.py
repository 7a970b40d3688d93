"""Multi-host data feed: 2-process CPU cluster runs one sharded train step.

Validates VERDICT r1 missing #5: `shard_batch` must assemble global device
arrays from process-local slices (jax.make_array_from_process_local_data)
— a plain device_put cannot address another process's devices — and the
BucketingSampler must hand each process an equal slice of every batch.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = """
import os
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address="localhost:%(port)d",
                           num_processes=2, process_id=%(pid)d)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == %(ndev)d, jax.devices()

import jax.numpy as jnp
from turkish_asr_tpu.models.conformer import ModelConfig, init_model
from turkish_asr_tpu.train.optim import make_optimizer
from turkish_asr_tpu.train.trainer import Trainer
from turkish_asr_tpu.utils.config import get_config
from turkish_asr_tpu.utils.logger import get_logger
from turkish_asr_tpu.parallel.mesh import make_mesh, shard_batch

cfg = ModelConfig(n_mels=80, d_model=32, n_heads=2, n_blocks=1,
                  n_classes=12, dropout=0.0)
params, model_state = init_model(jax.random.PRNGKey(0), cfg)
tx, schedule = make_optimizer(1e-3, 1e-6, total_steps=10)
mesh = make_mesh("%(mesh)s")
trainer = Trainer(model_cfg=cfg, params=params, model_state=model_state,
                  optimizer=tx, schedule=schedule, config=get_config([]),
                  logger=get_logger("mh%(pid)d", log_file="/tmp/mh%(pid)d.log"),
                  mesh=mesh, compute_dtype=jnp.float32)

# Global batch of 4: every process holds rows [pid::2] (the interleaved
# BucketingSampler slice contract).
rng = np.random.default_rng(0)
B, S = 4, 8000
gbatch = {
    "waveforms": (rng.standard_normal((B, S)) * 0.1).astype(np.float32),
    "wav_lengths": np.full((B,), S, dtype=np.int32),
    "targets": rng.integers(2, cfg.n_classes, (B, 6)).astype(np.int32),
    "target_lengths": np.full((B,), 6, dtype=np.int32),
    "sample_mask": np.ones((B,), dtype=np.float32),
}
local = {k: v[%(pid)d::2] for k, v in gbatch.items()}
device_batch = shard_batch(mesh, local)
# train_step donates params/model_state/opt_state: keep the returned ones
new_p, new_ms, new_opt, loss = trainer._train_step(
    trainer.params, trainer.model_state, trainer.opt_state, device_batch,
    jax.random.PRNGKey(0))
print("MHLOSS", float(loss))

# _local_rows must return exactly this process's batch rows, deduped
# across any replicating (model) axis.
_, ids, counts = trainer._eval_step(new_p, new_ms, device_batch)
rows = Trainer._local_rows(counts)
assert rows.shape[0] == local["waveforms"].shape[0], rows.shape
print("MHROWS", rows.shape[0])
"""


CHILD_FIT = """
import os
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address="localhost:%(port)d",
                           num_processes=2, process_id=%(pid)d)

import jax.numpy as jnp
from turkish_asr_tpu.models.conformer import ModelConfig, init_model
from turkish_asr_tpu.train.optim import make_optimizer
from turkish_asr_tpu.train.trainer import Trainer
from turkish_asr_tpu.utils.config import get_config
from turkish_asr_tpu.utils.logger import get_logger
from turkish_asr_tpu.data.tokenizer import TurkishTokenizer
from turkish_asr_tpu.parallel.mesh import make_mesh

tok = TurkishTokenizer()
cfg = ModelConfig(n_mels=80, d_model=32, n_heads=2, n_blocks=1,
                  n_classes=tok.vocab_size, dropout=0.0)
params, model_state = init_model(jax.random.PRNGKey(0), cfg)
tx, schedule = make_optimizer(1e-3, 1e-6, total_steps=10)
mesh = make_mesh("%(mesh)s")
config = get_config(["--epochs", "1", "--save_interval", "1",
                     "--checkpoint_dir", "%(ckpt_dir)s",
                     "--log_interval", "1"])

rng = np.random.default_rng(0)
B, S = 4, 8000
def make_local(seed):
    r = np.random.default_rng(seed)
    g = {
        "waveforms": (r.standard_normal((B, S)) * 0.1).astype(np.float32),
        "wav_lengths": np.full((B,), S, dtype=np.int32),
        "targets": r.integers(2, cfg.n_classes, (B, 6)).astype(np.int32),
        "target_lengths": np.full((B,), 6, dtype=np.int32),
        "sample_mask": np.ones((B,), dtype=np.float32),
    }
    return {k: v[%(pid)d::2] for k, v in g.items()}

trainer = Trainer(model_cfg=cfg, params=params, model_state=model_state,
                  optimizer=tx, schedule=schedule, config=config,
                  logger=get_logger("mhfit%(pid)d",
                                    log_file="/tmp/mhfit%(pid)d.log"),
                  tokenizer=tok,
                  train_loader=[make_local(1), make_local(2)],
                  valid_loader=[make_local(3)],
                  mesh=mesh, compute_dtype=jnp.float32)
trainer.fit()
print("FITBEST", trainer.best_val_loss)
print("FITSTEP", trainer.global_step)
"""


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
@pytest.mark.parametrize("mesh,devs_per_proc", [
    ("data=2", 1),
    # data x model: batch shards replicate over the model axis, so
    # _local_rows must dedup replicated shards (one range per replica).
    ("data=2,model=2", 2),
])
def test_two_process_train_step(mesh, devs_per_proc):
    port = _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_PLATFORM_NAME"] = "cpu"
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={devs_per_proc}")
    env.pop("JAX_COMPILATION_CACHE_DIR", None)
    procs = [
        subprocess.Popen(
            [sys.executable, "-c",
             CHILD % {"port": port, "pid": pid, "mesh": mesh,
                      "ndev": 2 * devs_per_proc}],
            env=env, cwd=REPO, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True)
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"
    losses = []
    for out in outs:
        lines = [ln for ln in out.splitlines() if ln.startswith("MHLOSS")]
        assert lines, out
        losses.append(float(lines[0].split()[1]))
    # Both processes observe the same global loss.
    assert losses[0] == pytest.approx(losses[1], rel=1e-5), losses


@pytest.mark.slow
@pytest.mark.parametrize("mesh,devs_per_proc", [
    ("data=2", 1),
    ("data=2,model=2", 2),  # checkpoint fetch must gather model shards
])
def test_two_process_fit_single_writer(mesh, devs_per_proc, tmp_path):
    """A full mini fit() on a 2-process cluster: exactly ONE process
    writes checkpoints (no concurrent os.replace on a shared FS), and
    both processes agree on the best-val decision and step counters
    (VERDICT r2 weak #4)."""
    port = _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_PLATFORM_NAME"] = "cpu"
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={devs_per_proc}")
    env.pop("JAX_COMPILATION_CACHE_DIR", None)
    ckpt_dir = str(tmp_path / "ckpts")
    procs = [
        subprocess.Popen(
            [sys.executable, "-c",
             CHILD_FIT % {"port": port, "pid": pid, "mesh": mesh,
                          "ckpt_dir": ckpt_dir}],
            env=env, cwd=REPO, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True)
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"
    # single writer: only process 0 logs checkpoint writes
    assert "Checkpoint saved" in outs[0]
    assert "Checkpoint saved" not in outs[1]
    assert os.path.exists(os.path.join(ckpt_dir, "best_model.ckpt"))
    # identical best-val decision and step counters on both processes

    def grab(tag, out):
        lines = [ln for ln in out.splitlines() if ln.startswith(tag)]
        assert lines, out
        return float(lines[0].split()[1])

    assert grab("FITBEST", outs[0]) == pytest.approx(
        grab("FITBEST", outs[1]), rel=1e-6)
    assert grab("FITSTEP", outs[0]) == grab("FITSTEP", outs[1])
    # the checkpoint written by process 0 is loadable and complete
    from turkish_asr_tpu.train.checkpoint import load_checkpoint_file
    ckpt = load_checkpoint_file(os.path.join(ckpt_dir, "best_model.ckpt"))
    assert ckpt["params"] and ckpt["meta"]["global_step"] >= 1


def test_sampler_process_slicing():
    """Every process gets an equal, disjoint slice of each global batch."""
    from turkish_asr_tpu.data.dataset import BucketingSampler

    class FakeDS:
        file_pairs = [(f"/nonexistent/{i}.wav", "") for i in range(10)]

        def __len__(self):
            return 10

    b0 = list(BucketingSampler(FakeDS(), 4, shuffle=False,
                               process_index=0, process_count=2))
    b1 = list(BucketingSampler(FakeDS(), 4, shuffle=False,
                               process_index=1, process_count=2))
    # ragged final batch (2 items) dropped in multi-process mode
    assert len(b0) == len(b1) == 2
    for x, y in zip(b0, b1):
        assert len(x) == len(y) == 2
        assert not set(x) & set(y)
    with pytest.raises(ValueError):
        BucketingSampler(FakeDS(), 5, process_index=0, process_count=2)
