"""Device mesh + sharding layout.

The reference is single-process/single-GPU — no distributed anything
(SURVEY.md §2, "Parallelism strategies: ABSENT"). Scaling here is
first-class and entirely declarative: pick a `jax.sharding.Mesh`, annotate
array shardings, and let XLA insert the collectives over ICI.

Axes:
- "data": batch-dimension sharding (default: all devices). Gradient
  all-reduce is inserted by XLA because replicated params consume sharded
  batch gradients.
- "model": optional tensor parallelism for wide configs (Conformer-L):
  SwiGLU hidden dim and attention head projections are sharded; XLA
  inserts the reduce-scatter/all-gather pairs at the block boundaries.

No NCCL/MPI analog exists or is needed: `psum` & friends are compiler
artifacts of the sharding annotations.
"""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(spec=None, devices=None):
    """Build a Mesh from a spec string like "data=4,model=2".

    Default: all devices on the "data" axis. A trailing axis size of -1 is
    inferred from the device count.
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if not spec:
        return Mesh(np.array(devices), axis_names=("data",))
    names, sizes = [], []
    for part in spec.split(","):
        k, v = part.split("=")
        names.append(k.strip())
        sizes.append(int(v))
    if -1 in sizes:
        known = int(np.prod([s for s in sizes if s != -1]))
        sizes[sizes.index(-1)] = n // known
    total = int(np.prod(sizes))
    if total != n:
        raise ValueError(f"mesh {spec} needs {total} devices, have {n}")
    dev_array = np.array(devices).reshape(sizes)
    return Mesh(dev_array, axis_names=tuple(names))


def batch_sharding(mesh, ndim=1):
    """Shard the leading (batch) axis over "data", replicate the rest.
    Fully replicated when the mesh has no "data" axis or for scalars."""
    if "data" not in mesh.axis_names or ndim == 0:
        return NamedSharding(mesh, P())
    spec = ("data",) + (None,) * (ndim - 1)
    return NamedSharding(mesh, P(*spec))


def replicated_sharding(mesh):
    return NamedSharding(mesh, P())


def shard_batch(mesh, batch):
    """Place a dict of host arrays with the batch axis sharded on "data".

    Single-process: a plain sharded ``device_put``. Multi-process
    (``jax.process_count() > 1``): each process passes its process-LOCAL
    slice of the global batch (``BucketingSampler(process_index=...,
    process_count=...)`` hands every process an equal slice of each
    batch), and the global array is assembled with
    ``jax.make_array_from_process_local_data`` — ``device_put`` cannot
    address another process's devices.
    """
    nproc = jax.process_count()
    if "data" in mesh.axis_names:
        data_size = mesh.shape["data"]
        local_devices = max(1, data_size // nproc)
        for k, v in batch.items():
            if np.ndim(v) >= 1 and np.shape(v)[0] % local_devices != 0:
                raise ValueError(
                    f"per-process batch axis {np.shape(v)[0]} of '{k}' not "
                    f"divisible by the {local_devices} local devices on the "
                    f"mesh 'data' axis; pick --batch_size as a multiple of "
                    f"the data-parallel size")
    if nproc > 1:
        return {
            k: jax.make_array_from_process_local_data(
                batch_sharding(mesh, np.ndim(v)), np.asarray(v))
            for k, v in batch.items()
        }
    return {
        k: jax.device_put(v, batch_sharding(mesh, np.ndim(v)))
        for k, v in batch.items()
    }


def activation_constraint(mesh):
    """Sharding-constraint fn for (B, T, D) activations, or None.

    Shards batch over "data" and, when a "seq" axis exists, time over
    "seq" — sequence/context parallelism for long-form audio. XLA inserts
    the halo exchanges for the depthwise time-convs and the K/V
    all-gathers for attention (cheap under MQA: one shared KV head).
    The reference has no long-form or multi-device story (SURVEY.md §5).
    """
    names = mesh.axis_names
    if "seq" in names:
        spec = P("data" if "data" in names else None, "seq", None)
    elif "data" in names:
        spec = P("data", None, None)
    else:
        return None
    sharding = NamedSharding(mesh, spec)

    def constrain(x):
        if x.ndim == 3:
            return jax.lax.with_sharding_constraint(x, sharding)
        return x

    return constrain


def _spec_for_param(path, leaf, mesh):
    """Tensor-parallel layout rules (active only when a "model" axis exists).

    - SwiGLU in-projection  (..., d_model, 2*d_ff): shard output dim.
      Known inefficiency: the gate/value split at d_ff crosses shard
      boundaries, so GSPMD inserts a reshard inside each FF (the
      Megatron-style fix — sharding each half separately — needs an
      interleaved weight layout and is deferred; correctness is tested)
    - SwiGLU out-projection (..., d_ff, d_model):  shard input dim
    - attention q/out projections: shard the head (output / input) dim
    - everything else replicated (conv kernels, norms, classifier)
    """
    if "model" not in mesh.axis_names:
        return P()
    names = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
    joined = "/".join(str(n) for n in names)
    nd = leaf.ndim
    def spec_last(axis_from_end):
        s = [None] * nd
        s[nd - 1 - axis_from_end] = "model"
        return P(*s)
    if "ff1/in" in joined or "ff2/in" in joined:
        return spec_last(0)      # (..., 2*d_ff) sharded
    if "ff1/out" in joined or "ff2/out" in joined:
        if joined.endswith("/w"):
            return spec_last(1)  # (..., d_ff, d_model): shard d_ff
        return P()
    if "attn/q" in joined or "attn/out" in joined:
        if joined.endswith("/w"):
            if "attn/q" in joined:
                return spec_last(0)   # output heads
            return spec_last(1)       # input heads
        if "attn/q" in joined:
            return spec_last(0)
        return P()
    return P()


def param_shardings(params, mesh):
    """NamedShardings for the whole param pytree under the mesh's rules."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, _spec_for_param(path, leaf, mesh)),
        params,
    )
