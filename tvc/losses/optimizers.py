"""Optimizer factory + LR warmup (reference: losses/__init__.py:4-23) in optax."""

from __future__ import annotations

import optax

from tvc.core.config import Config


def warmup_schedule(base_lr: float, warmup: int) -> optax.Schedule:
    """Linear warmup then constant (losses/__init__.py:17-23)."""
    if warmup <= 0:
        return optax.constant_schedule(base_lr)

    def sched(step):
        import jax.numpy as jnp

        frac = jnp.minimum(step / warmup, 1.0)
        return base_lr * frac

    return sched


def get_optimizer(cfg: Config) -> optax.GradientTransformation:
    """Adam / RMSProp / SGD per config.optim (losses/__init__.py:4-14),
    with grad clipping (configs/mine.yml optim.grad_clip)."""
    o = cfg.optim
    lr = warmup_schedule(o.lr, o.warmup)
    name = o.optimizer.lower()
    if name == "adam":
        tx = optax.adam(lr, b1=o.beta1, b2=0.999, eps=max(o.eps, 1e-8))
        if o.weight_decay > 0:
            tx = optax.adamw(lr, b1=o.beta1, b2=0.999, eps=max(o.eps, 1e-8),
                             weight_decay=o.weight_decay)
    elif name == "rmsprop":
        tx = optax.rmsprop(lr, decay=0.9, eps=max(o.eps, 1e-8))
    elif name == "sgd":
        tx = optax.sgd(lr, momentum=0.9)
    else:
        raise NotImplementedError(f"optimizer {o.optimizer}")
    if o.grad_clip and o.grad_clip > 0:
        tx = optax.chain(optax.clip_by_global_norm(o.grad_clip), tx)
    return tx
