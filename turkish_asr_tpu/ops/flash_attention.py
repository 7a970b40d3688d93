"""Fused MQA flash attention (Pallas TPU kernel) — public wiring.

Replaces the reference's dependency on PyTorch SDPA CUDA flash kernels
(/root/reference/model/attention.py:103-115). See _flash_attention_impl.py
for the kernel itself.

``make_flash_attention()`` returns a callable with the attention-kernel
contract used by models/attention.py:
    kernel(q (B,H,T,D), k (B,Kh,T,D), v (B,Kh,T,D), mask (B,T) bool|None)
        -> context (B,H,T,D)
or None when Pallas is unavailable on the current backend.

Dispatch: measured on TPU v5e at constant total query rows (B*T = 25.6k,
MQA H=4 D=64): einsum/kernel time ratio 0.83 at T=256, 1.05 at T=512,
1.42 at T=1024, 1.64 at T=2048 — the kernel wins from T ~ 512 post-
subsample frames (~20 s of audio) upward, so the shipped 24 s / 32 s
buckets and all long-form paths engage it; shorter utterances keep XLA's
einsum fusion, which is already optimal there. The callable auto-selects
per (static) sequence length — T is a trace-time constant, so the
dispatch is free at runtime. End-to-end artifact: bench.py config 5
(Conformer-L, B=16 x 64 s) runs 1.23x faster kernel-on than kernel-off.
"""

import jax
import jax.numpy as jnp

MIN_KERNEL_SEQ_LEN = 512

# Decorrelates the in-kernel PRNG stream across data-parallel shards: the
# same user seed must not replay identical dropout bits on every shard
# (odd 32-bit constant, distinct from the per-program _SEED_MIX).
_SHARD_SEED_MIX = 0x6A09E667  # odd, < 2^31


def make_flash_attention(block_q=None, min_seq_len=MIN_KERNEL_SEQ_LEN,
                         mesh=None, interpret=False):
    """Build the length-dispatching Pallas attention callable, or None.

    block_q=None picks the tile size per (static) T: 512 rows while the
    fp32 score tile (block_q x T) stays within ~8 MB of VMEM (measured
    ~3% faster than 256 at T=1600), stepping down for very long
    sequences so the tile plus resident K/V never spills. With dropout
    active the uint32 keep-mask tile doubles the per-row budget, so the
    tile shrinks accordingly.

    The callable accepts optional ``dropout``/``rng`` kwargs (training):
    attention-weight dropout runs INSIDE the kernel via the TPU hardware
    PRNG, with the mask regenerated (not stored) in the backward — the
    capability the reference gets from SDPA's fused dropout
    (/root/reference/model/attention.py:238-241, training-only flash).

    ``mesh``: on a multi-device mesh with a "data" axis the kernel routes
    through shard_map over that axis — same pattern (and reason) as
    ops/ctc.make_sharded_ctc: a plain pallas_call has no GSPMD
    partitioning rules, so under pjit XLA would all-gather its operands
    onto every device. Attention is batch-parallel; seq-sharded
    activations ("seq" axis) are gathered at shard_map entry, which is
    semantically required anyway (attention is global over T).

    ``interpret=True`` runs the kernel in Pallas interpret mode so CPU
    tests (the virtual 8-device mesh) can exercise the exact mesh
    routing; on TPU leave it False.
    """
    if not interpret and jax.default_backend() != "tpu":
        return None
    try:
        from turkish_asr_tpu.ops._flash_attention_impl import flash_attention
    except ImportError:
        return None

    data_size = 0
    if mesh is not None and "data" in mesh.axis_names \
            and mesh.devices.size > 1:
        data_size = mesh.shape["data"]

    def _call(q, k, v, mask, bq, rate, seed):
        if interpret:
            from jax.experimental.pallas import tpu as pltpu
            with pltpu.force_tpu_interpret_mode():
                return flash_attention(q, k, v, mask, block_q=bq,
                                       dropout_rate=rate, seed=seed)
        return flash_attention(q, k, v, mask, block_q=bq,
                               dropout_rate=rate, seed=seed)

    def _sharded_call(q, k, v, mask, bq, rate, seed):
        from jax.sharding import PartitionSpec as P
        if mask is None:
            # shard_map in_specs need a concrete leaf per operand.
            mask = jnp.ones((q.shape[0], q.shape[2]), jnp.bool_)
        if seed is None:
            seed = jnp.zeros((1,), jnp.int32)

        def local(q, k, v, mask, seed):
            if rate > 0.0:
                seed = seed + (jax.lax.axis_index("data").astype(jnp.int32)
                               * jnp.int32(_SHARD_SEED_MIX))
            return _call(q, k, v, mask, bq, rate, seed)

        specs = dict(
            in_specs=(P("data"), P("data"), P("data"), P("data"), P()),
            out_specs=P("data"))
        # Varying-across-mesh checking off: pallas_call's out_shape
        # carries no vma/replication annotation (same as make_sharded_ctc).
        try:
            from jax import shard_map
            f = shard_map(local, mesh=mesh, check_vma=False, **specs)
        except ImportError:  # older jax: experimental API, check_rep analog
            from jax.experimental.shard_map import shard_map
            f = shard_map(local, mesh=mesh, check_rep=False, **specs)
        return f(q, k, v, mask, seed)

    def kernel(q, k, v, mask, dropout=0.0, rng=None):
        T = q.shape[2]
        if T < min_seq_len:
            return None  # caller falls back to the einsum path
        rate = float(dropout)
        if rate > 0.0 and rng is None:
            return None  # dropout without a key: let the einsum path run
        bq = block_q
        if bq is None:
            bytes_per_row = 4 * T * (2 if rate > 0.0 else 1)
            budget = 8 * 1024 * 1024 // bytes_per_row  # score(+mask) rows
            bq = min(512, (budget // 64) * 64)
            if bq < 64:
                # T so long that even a 64-row tile blows the budget
                # (T > 32k frames ~ 21 min of audio in one window):
                # decline rather than spill VMEM; einsum path handles it.
                return None
            # Never exceed the kernel's total row count (MQA folds heads
            # into rows): a block larger than the array deadlocks the
            # interpret emulation under shard_map and buys nothing on
            # hardware. Only reachable when min_seq_len is lowered (tests).
            rows = q.shape[1] * T if k.shape[1] == 1 else T
            if bq > rows:
                bq = max(8, ((rows + 7) // 8) * 8)
        seed = None
        if rate > 0.0:
            seed = jax.lax.bitcast_convert_type(
                jax.random.bits(rng, (1,), jnp.uint32), jnp.int32)
        if data_size > 1:
            if q.shape[0] % data_size != 0:
                # Indivisible batch: decline — the einsum path under
                # GSPMD handles ragged shards correctly.
                return None
            return _sharded_call(q, k, v, mask, bq, rate, seed)
        return _call(q, k, v, mask, bq, rate, seed)

    # Capability flag read by models/attention.py: kernels WITHOUT it
    # (legacy/test callables with a (q, k, v, mask)-only signature) are
    # never offered dropout. Feature detection by attribute, not by
    # catching TypeError — tracing errors inside the kernel also raise
    # TypeError and must propagate, not silently divert to einsum.
    kernel.supports_dropout = True
    return kernel
