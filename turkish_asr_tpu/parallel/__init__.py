from turkish_asr_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated_sharding,
    param_shardings,
    shard_batch,
    activation_constraint,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "param_shardings",
    "shard_batch",
    "activation_constraint",
]
