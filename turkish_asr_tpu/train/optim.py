"""Optimizer/schedule stack.

Reference semantics being mapped (/root/reference/main.py:106-122,
trainer/trainer.py:184-198):
- AdamW(lr, weight_decay)
- OneCycleLR(max_lr=lr, total_steps, pct_start=0.1, cos anneal) stepped
  once per *optimizer* step (i.e. per accumulation_steps batches)
- global-norm gradient clipping (after unscale, before step)
- gradient accumulation
- CUDA AMP GradScaler — on TPU bf16 has fp32 range, so no loss scaling is
  needed; the bf16 policy lives in the model's compute_dtype instead.

optax equivalents: torch-exact OneCycle schedule (see
torch_onecycle_schedule), clip_by_global_norm -> adamw chain, MultiSteps
for accumulation (its inner count advances once per k micro-batches,
matching the reference's scheduler.step cadence).
"""

import optax


def torch_onecycle_schedule(peak_value, total_steps, pct_start=0.1,
                            div_factor=25.0, final_div_factor=1e4):
    """OneCycleLR with torch's EXACT step indexing.

    torch's phase boundaries are ``float(pct_start*total_steps) - 1`` and
    ``total_steps - 1`` (optim/lr_scheduler OneCycleLR), i.e. the warmup
    cosine spans one step FEWER than optax.cosine_onecycle_schedule's —
    measured 1-3.5% LR deltas early in warmup against the live reference
    trainer (tests/test_train_parity.py). Same cos-anneal formula:
    ``end + (start-end)/2 * (1 + cos(pi*pct))``, pct clipped to [0, 1].
    """
    import jax.numpy as jnp
    init = peak_value / div_factor
    final = init / final_div_factor
    end1 = max(float(pct_start * total_steps) - 1.0, 1.0)
    end2 = max(float(total_steps - 1), end1 + 1.0)

    def schedule(count):
        s = jnp.asarray(count, jnp.float32)
        pct1 = jnp.clip(s / end1, 0.0, 1.0)
        lr1 = peak_value + (init - peak_value) / 2.0 * (
            1.0 + jnp.cos(jnp.pi * pct1))
        pct2 = jnp.clip((s - end1) / (end2 - end1), 0.0, 1.0)
        lr2 = final + (peak_value - final) / 2.0 * (
            1.0 + jnp.cos(jnp.pi * pct2))
        return jnp.where(s <= end1, lr1, lr2)

    return schedule


def make_optimizer(
    learning_rate,
    weight_decay,
    total_steps,
    pct_start=0.1,
    gradient_clip=1.0,
    accumulation_steps=1,
):
    """Returns (optimizer, schedule_fn)."""
    # >=10 steps so the warmup interval (pct_start * steps) is never empty
    schedule = torch_onecycle_schedule(
        peak_value=learning_rate,
        total_steps=max(int(total_steps), 10),
        pct_start=pct_start,
        div_factor=25.0,
        final_div_factor=1e4,
    )
    tx = optax.chain(
        optax.clip_by_global_norm(gradient_clip),
        optax.adamw(schedule, b1=0.9, b2=0.999, eps=1e-8,
                    weight_decay=weight_decay),
    )
    if accumulation_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accumulation_steps)
    return tx, schedule
