"""Annealed Langevin dynamics samplers (NCSN/SMLD legacy capability).

Replicates `anneal_Langevin_dynamics` and variants
(`models/__init__.py:346-773`). Not on the benchmark path (the shipped config
is DDPM), but part of the reference's capability surface. The double loop
(noise levels x inner steps) compiles to a single `lax.scan` over the
flattened (L * n_steps_each) schedule.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

EpsFn = Callable[[jax.Array, jax.Array, Optional[jax.Array]], jax.Array]


def _hmean(x: np.ndarray) -> float:
    return len(x) / np.sum(1.0 / x)


def anneal_langevin_dynamics(
    key: jax.Array,
    x_init: jax.Array,
    eps_fn: EpsFn,
    sigmas: np.ndarray,
    cond: Optional[jax.Array] = None,
    n_steps_each: int = 200,
    step_lr: float = 8e-6,
    denoise: bool = True,
    harm_mean: bool = False,
    same_noise: bool = False,
    frac_steps: Optional[float] = None,
    final_only: bool = True,
):
    """models/__init__.py:346-412. `eps_fn` returns z (score = -z/sigma)."""
    sigmas = np.asarray(sigmas, dtype=np.float64)
    labels_all = np.arange(len(sigmas))
    if frac_steps is not None:
        keep = slice(int((1 - frac_steps) * len(sigmas)), None)
        labels_all = labels_all[keep]
        sigmas = sigmas[keep]
    L = len(sigmas)
    hm = _hmean(sigmas) if harm_mean else None

    b = x_init.shape[0]
    dtype = x_init.dtype
    noise_val = x_init if same_noise else None

    # flatten (level, inner-step) into one scan axis
    lvl = np.repeat(np.arange(L), n_steps_each)
    sig = jnp.asarray(sigmas, jnp.float32)
    lvl_j = jnp.asarray(lvl, jnp.int32)
    n_total = len(lvl)
    keys = jax.random.split(key, n_total)

    step_sizes = jnp.asarray(step_lr * (sigmas / sigmas[-1]) ** 2, jnp.float32)

    def body(x, scan_in):
        i, k_i = scan_in
        c = lvl_j[i]
        sigma = sig[c]
        step_size = step_sizes[c]
        label = jnp.full((b,), c, dtype=jnp.int32)
        grad = eps_fn(x, label, cond).astype(jnp.float32)
        if harm_mean:
            grad = grad * (hm / sigma)
        noise = noise_val.astype(jnp.float32) if same_noise else jax.random.normal(k_i, x.shape, jnp.float32)
        x_new = x.astype(jnp.float32) - step_size / sigma * grad + jnp.sqrt(step_size * 2.0) * noise
        x_new = x_new.astype(dtype)
        return x_new, (x_new if not final_only else None)

    x, traj = jax.lax.scan(body, x_init, (jnp.arange(n_total), keys))

    if denoise:
        label = jnp.full((b,), L - 1, dtype=jnp.int32)
        x = (x.astype(jnp.float32) - sig[-1] * eps_fn(x, label, cond).astype(jnp.float32)).astype(dtype)

    if final_only:
        return x[None]
    traj = jnp.concatenate([traj, x[None]], axis=0) if denoise else traj
    return traj


def sparse_anneal_langevin_dynamics(
    key: jax.Array,
    x_sparse: jax.Array,
    sparsity: float,
    eps_fn: EpsFn,
    sigmas: np.ndarray,
    cond: Optional[jax.Array] = None,
    n_steps_each: int = 200,
    step_lr: float = 8e-6,
    harm_mean: bool = False,
    frac_steps: Optional[float] = None,
    final_only: bool = True,
):
    """models/__init__.py:416-...: tracks a sparsity-scaled twin chain."""
    sigmas = np.asarray(sigmas, dtype=np.float64)
    if frac_steps is not None:
        sigmas = sigmas[int((1 - frac_steps) * len(sigmas)):]
    L = len(sigmas)
    hm = _hmean(sigmas) if harm_mean else None
    b = x_sparse.shape[0]
    dtype = x_sparse.dtype
    lvl = np.repeat(np.arange(L), n_steps_each)
    sig = jnp.asarray(sigmas, jnp.float32)
    lvl_j = jnp.asarray(lvl, jnp.int32)
    keys = jax.random.split(key, len(lvl))
    step_sizes = jnp.asarray(step_lr * (sigmas / sigmas[-1]) ** 2, jnp.float32)

    def body(carry, scan_in):
        x, xs = carry
        i, k_i = scan_in
        c = lvl_j[i]
        sigma, step_size = sig[c], step_sizes[c]
        label = jnp.full((b,), c, dtype=jnp.int32)
        grad = eps_fn(x, label, cond).astype(jnp.float32)
        if harm_mean:
            grad = grad * (hm / sigma)
        noise = jax.random.normal(k_i, x.shape, jnp.float32)
        x_new = (x.astype(jnp.float32) - step_size / sigma * grad + jnp.sqrt(step_size * 2.0) * noise).astype(dtype)
        xs_new = (
            xs.astype(jnp.float32)
            - step_size / sigma * (grad / sparsity)
            + jnp.sqrt(step_size * 2.0) * (sparsity * noise)
        ).astype(dtype)
        return (x_new, xs_new), (xs_new if not final_only else None)

    (x, xs), traj = jax.lax.scan(body, (x_sparse, x_sparse), (jnp.arange(len(lvl)), keys))
    if final_only:
        return xs[None]
    return traj
