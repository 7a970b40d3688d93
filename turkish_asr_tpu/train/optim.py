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

optax equivalents: cosine_onecycle_schedule (torch defaults div_factor=25,
final_div_factor=1e4), clip_by_global_norm -> adamw chain, MultiSteps for
accumulation (its inner count advances once per k micro-batches, matching
the reference's scheduler.step cadence).
"""

import optax


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
    schedule = optax.cosine_onecycle_schedule(
        transition_steps=max(int(total_steps), 10),
        peak_value=learning_rate,
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
