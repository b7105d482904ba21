"""Optimizer + LR schedules (reference ``utils.py:2-18``; AdamW per driver,
e.g. ``compress_nlvr_dtp.py:150``)."""

from __future__ import annotations

import math

import optax


def cosine_lr(epoch: int, max_epoch: int, init_lr: float, min_lr: float) -> float:
    """Per-epoch cosine decay (reference utils.py:2-6)."""
    return (init_lr - min_lr) * 0.5 * (
        1.0 + math.cos(math.pi * epoch / max_epoch)
    ) + min_lr


def warmup_lr(step: int, max_step: int, init_lr: float, warmup_lr_v: float) -> float:
    """Linear warmup (reference utils.py:8-11)."""
    return min(init_lr, warmup_lr_v + (init_lr - warmup_lr_v) * step / max(max_step, 1))


def make_adamw(lr: float, weight_decay: float) -> optax.GradientTransformation:
    """AdamW with torch defaults (betas 0.9/0.999, eps 1e-8) matching the
    reference's ``torch.optim.AdamW`` setup."""
    return optax.adamw(
        learning_rate=lr, b1=0.9, b2=0.999, eps=1e-8, weight_decay=weight_decay
    )


def make_adamw_injectable(weight_decay: float) -> optax.GradientTransformation:
    """AdamW whose LR is injected per step (for the per-epoch cosine schedule
    driven from the host, like the reference mutating param_groups)."""
    return optax.inject_hyperparams(
        lambda learning_rate: optax.adamw(
            learning_rate=learning_rate, b1=0.9, b2=0.999, eps=1e-8,
            weight_decay=weight_decay,
        )
    )(learning_rate=1e-5)


def step_lr(epoch: int, init_lr: float, min_lr: float, decay_rate: float = 1.0) -> float:
    """Exponential step decay (reference utils.py:13-18)."""
    return max(min_lr, init_lr * (decay_rate ** epoch))
