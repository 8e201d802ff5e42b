"""Denoising score matching training loss.

Replicates `anneal_dsm_score_estimation` (losses/dsm.py:7-52): sample a step
label per example, perturb x with the forward process (Gaussian or Gamma),
predict the noise with the conditional UNet, and take L2 (or L1) on (z - eps).
Supports conditional frames, cond_mask, and the all_frames variant.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tvc.samplers.schedules import Schedule


def anneal_dsm_score_estimation(
    key: jax.Array,
    eps_fn: Callable,
    x: jax.Array,
    schedule: Schedule,
    cond: Optional[jax.Array] = None,
    cond_mask: Optional[jax.Array] = None,
    l1: bool = False,
    gamma: bool = False,
    all_frames: bool = False,
    version: str = "DDPM",  # DDPM/DDIM/FPNDM (alpha path) | SMLD (sigma path)
    sigmas=None,  # required for SMLD: the noise-level ladder
) -> jax.Array:
    """eps_fn(x_t, labels, cond, cond_mask) -> eps-hat. Returns scalar loss."""
    b = x.shape[0]
    k_label, k_noise = jax.random.split(key)

    if all_frames and cond is not None:
        x = jnp.concatenate([x, cond], axis=-1)
        cond = None

    if version.upper() == "SMLD":
        # losses/dsm.py:18-24: perturbed_x = x + sigma * z
        sig = jnp.asarray(sigmas, jnp.float32)
        labels = jax.random.randint(k_label, (b,), 0, len(sig))
        used = sig[labels].reshape((b,) + (1,) * (x.ndim - 1))
        z = jax.random.normal(k_noise, x.shape, x.dtype)
        x_t = x + used * z
    else:
        alphas = jnp.asarray(schedule.alphas, jnp.float32)
        labels = jax.random.randint(k_label, (b,), 0, len(schedule.alphas))
        used = alphas[labels].reshape((b,) + (1,) * (x.ndim - 1))
        if gamma:
            k_cum = jnp.asarray(schedule.k_cum, jnp.float32)[labels].reshape(used.shape)
            theta = jnp.asarray(schedule.theta_t, jnp.float32)[labels].reshape(used.shape)
            z = jax.random.gamma(k_noise, jnp.broadcast_to(k_cum, x.shape)) * theta
            z = (z - k_cum * theta) / jnp.sqrt(1.0 - used)
        else:
            z = jax.random.normal(k_noise, x.shape, x.dtype)
        x_t = jnp.sqrt(used) * x + jnp.sqrt(1.0 - used) * z
    pred = eps_fn(x_t, labels, cond, cond_mask)

    if l1:
        per = jnp.sum(jnp.abs(z - pred).reshape(b, -1), axis=-1)
    else:
        per = 0.5 * jnp.sum(jnp.square(z - pred).reshape(b, -1), axis=-1)
    return jnp.mean(per)
