"""Optimizer factory + parameter EMA.

The reference delegates these to anemoi-training (Lightning); owned here:
AdamW with warmup+cosine schedule and global-norm clipping — the standard
AIFS-class training recipe — plus a params EMA for evaluation checkpoints.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import optax

__all__ = ["make_optimizer", "ema_update"]


def make_optimizer(
    peak_lr: float = 1e-3,
    *,
    warmup_steps: int = 1000,
    total_steps: int = 100_000,
    end_lr_ratio: float = 0.01,
    weight_decay: float = 0.0,
    clip_norm: Optional[float] = 32.0,
    b1: float = 0.9,
    b2: float = 0.95,
) -> optax.GradientTransformation:
    """AdamW + linear warmup + cosine decay + global-norm clipping."""
    schedule = optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=peak_lr,
        warmup_steps=warmup_steps,
        decay_steps=max(total_steps, warmup_steps + 1),
        end_value=peak_lr * end_lr_ratio,
    )
    parts = []
    if clip_norm is not None:
        parts.append(optax.clip_by_global_norm(clip_norm))
    parts.append(optax.adamw(schedule, b1=b1, b2=b2, weight_decay=weight_decay))
    return optax.chain(*parts)


def ema_update(ema_params: Any, params: Any, decay: float = 0.999) -> Any:
    """One EMA step over a parameter pytree (use the result for eval/ckpt)."""
    return jax.tree_util.tree_map(lambda e, p: decay * e + (1.0 - decay) * p, ema_params, params)
