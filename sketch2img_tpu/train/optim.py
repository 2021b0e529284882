"""Optimizers and LR schedules (optax) — XLA-native replacement for
bitsandbytes AdamW8bit + diffusers get_scheduler (SURVEY.md §2.2 D7/D11).

The reference selects its optimizer by class path string in train.yaml:31
(``bitsandbytes.optim.AdamW8bit``); we keep a name->factory registry with
the same config surface (lr / weight_decay / eps, train.yaml:32-35).
"""

from __future__ import annotations

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
def _adamw8bit(learning_rate, weight_decay=1e-2, eps=1e-8, b1=0.9, b2=0.999,
               block_size=2048):
    """8-bit-state AdamW — blockwise-quantized int8 moments, the memory
    lever the reference gets from bitsandbytes (trainer.py:118-121).

    Both Adam moments are stored as int8 with one fp32 absmax scale per
    ``block_size``-element block (bitsandbytes' blockwise scheme with a
    linear codebook). The update dequantizes, runs exact fp32 AdamW math,
    and requantizes — 4x less optimizer HBM than fp32 state.
    """
    return _quantized_adamw(learning_rate, b1, b2, eps, weight_decay, block_size)


def _blockwise_quantize(x, block_size):
    """Signed quadratic 8-bit code per block:
        code = round(sign(x) * sqrt(|x| / absmax) * 127)
        value = sign(code) * (|code|/127)^2 * absmax
    The quadratic map concentrates resolution near zero (relative step
    ~6e-5 of the block absmax vs 8e-3 for a linear code) — the same reason
    bitsandbytes uses a dynamic map: Adam's second moment spans decades and
    a linear code rounds small entries to zero, exploding mu/sqrt(nu)."""
    import jax.numpy as jnp

    flat = x.reshape(-1)
    n = flat.shape[0]
    pad = (-n) % block_size
    flat = jnp.pad(flat, (0, pad))
    blocks = flat.reshape(-1, block_size)
    absmax = jnp.max(jnp.abs(blocks), axis=1, keepdims=True)
    safe = jnp.where(absmax == 0, 1.0, absmax)
    m = jnp.sqrt(jnp.abs(blocks) / safe)
    q = jnp.clip(jnp.round(jnp.sign(blocks) * m * 127.0), -127, 127)
    return q.astype(jnp.int8), absmax.astype(jnp.float32)


def _blockwise_dequantize(q, absmax, shape):
    import jax.numpy as jnp

    qf = q.astype(jnp.float32)
    m = (jnp.abs(qf) / 127.0) ** 2
    flat = (jnp.sign(qf) * m * absmax).reshape(-1)
    n = 1
    for s in shape:
        n *= s
    return flat[:n].reshape(shape)


def _quantized_adamw(learning_rate, b1, b2, eps, weight_decay, block_size):
    import jax
    import jax.numpy as jnp

    def init(params):
        def init_leaf(p):
            q, s = _blockwise_quantize(jnp.zeros_like(p, jnp.float32), block_size)
            return {"q": q, "scale": s}

        zeros = jax.tree_util.tree_map(init_leaf, params)
        import copy

        return {
            "count": jnp.zeros((), jnp.int32),
            "mu": zeros,
            "nu": copy.deepcopy(zeros),
        }

    def update(grads, state, params):
        assert params is not None, "adamw8bit requires params (weight decay)"
        count = state["count"] + 1
        c1 = 1 - b1 ** count.astype(jnp.float32)
        c2 = 1 - b2 ** count.astype(jnp.float32)
        lr = learning_rate(count) if callable(learning_rate) else learning_rate

        def leaf(g, mu_s, nu_s, p):
            g32 = g.astype(jnp.float32)
            mu = _blockwise_dequantize(mu_s["q"], mu_s["scale"], g.shape)
            nu = _blockwise_dequantize(nu_s["q"], nu_s["scale"], g.shape)
            mu = b1 * mu + (1 - b1) * g32
            nu = b2 * nu + (1 - b2) * g32 * g32
            step = mu / c1 / (jnp.sqrt(nu / c2) + eps)
            upd = -lr * (step + weight_decay * p.astype(jnp.float32))
            mq, msc = _blockwise_quantize(mu, block_size)
            nq, nsc = _blockwise_quantize(nu, block_size)
            return upd.astype(p.dtype), {"q": mq, "scale": msc}, {"q": nq, "scale": nsc}

        flat_g, treedef = jax.tree_util.tree_flatten(grads)
        flat_mu = treedef.flatten_up_to(state["mu"])
        flat_nu = treedef.flatten_up_to(state["nu"])
        flat_p = treedef.flatten_up_to(params)
        out = [leaf(g, m, n, p) for g, m, n, p in zip(flat_g, flat_mu, flat_nu, flat_p)]
        updates = treedef.unflatten([o[0] for o in out])
        new_mu = treedef.unflatten([o[1] for o in out])
        new_nu = treedef.unflatten([o[2] for o in out])
        return updates, {"count": count, "mu": new_mu, "nu": new_nu}

    return optax.GradientTransformation(init, update)


def make_optimizer(name: str, learning_rate, **params) -> optax.GradientTransformation:
    key = name if name in _REGISTRY else name.lower()
    if key not in _REGISTRY:
        raise ValueError(f"unknown optimizer {name!r}; known: {sorted(_REGISTRY)}")
    return _REGISTRY[key](learning_rate, **params)
