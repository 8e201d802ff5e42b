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


def anneal_langevin_dynamics_consistent(
    key: jax.Array,
    x_init: jax.Array,
    eps_fn: EpsFn,  # called with sigma VALUES, not labels (y_is_label=False)
    sigmas: np.ndarray,
    cond: Optional[jax.Array] = None,
    n_steps_each: int = 200,
    step_lr: float = 8e-6,
    denoise: bool = True,
    harm_mean: bool = False,
    frac_steps: Optional[float] = None,
    final_only: bool = True,
):
    """Consistent annealed sampling (models/__init__.py:489-581): geometric
    sigma ladder with eta = step_lr / sigma_L^2 and beta-scaled noise."""
    sigmas = np.asarray(sigmas, dtype=np.float64)
    L = len(sigmas)
    consistent = np.geomspace(sigmas[0], sigmas[-1], (L - 1) * n_steps_each + 1)

    inv_gamma = consistent[-1] / consistent[-2]
    lower = sigmas[-1] ** 2 * (1 - inv_gamma)
    upper = sigmas[-1] ** 2 * (1 + inv_gamma)
    assert lower < step_lr < upper, f"Could not satisfy {lower} < {step_lr} < {upper}"
    eta = step_lr / (sigmas[-1] ** 2)
    hm = _hmean(consistent) if harm_mean else None

    if frac_steps is not None:
        keep = slice(int((1 - frac_steps) * L), None)
        consistent = consistent[np.arange(L)[keep]]

    cl = len(consistent)
    sig = jnp.asarray(consistent, jnp.float32)
    # next sigma for each step (last entry unused on the final step)
    sig_next = jnp.concatenate([sig[1:], sig[-1:]])
    b = x_init.shape[0]
    dtype = x_init.dtype
    keys = jax.random.split(key, cl)

    def body(x, scan_in):
        i, k_i = scan_in
        c_sigma = sig[i]
        used = jnp.full((b,), c_sigma, jnp.float32)
        grad = eps_fn(x, used, cond).astype(jnp.float32)
        if harm_mean:
            grad = grad * (hm / c_sigma)
        x_new = x.astype(jnp.float32) - eta * c_sigma * grad
        nxt = sig_next[i]
        gamma = c_sigma / nxt
        beta = jnp.sqrt(1.0 - (gamma * (1.0 - eta)) ** 2)
        noise = jax.random.normal(k_i, x.shape, jnp.float32)
        x_noised = x_new + beta * nxt * noise
        x_out = jnp.where(i == cl - 1, x_new, x_noised).astype(dtype)
        return x_out, (x_out if not final_only else None)

    x, traj = jax.lax.scan(body, x_init, (jnp.arange(cl), keys))

    if denoise:
        # final denoise uses integer label L-1 (models/__init__.py:544-547)
        label = jnp.full((b,), L - 1, jnp.float32)
        x = (x.astype(jnp.float32) - float(sigmas[-1]) * eps_fn(x, label, cond).astype(jnp.float32)).astype(dtype)

    if final_only:
        return x[None]
    traj = jnp.concatenate([traj, x[None]], axis=0) if denoise else traj
    return traj


def anneal_langevin_dynamics_inpainting(
    key: jax.Array,
    x_init: jax.Array,
    refer_image: jax.Array,
    eps_fn: EpsFn,  # score convention here: x += step*grad (ref :683-712)
    sigmas: np.ndarray,
    cond: Optional[jax.Array] = None,
    n_steps_each: int = 100,
    step_lr: float = 8e-6,
):
    """Half-image inpainting (models/__init__.py:683-712): the left half is
    re-noised from the reference image at every step. NHWC; left half = first
    W/2 columns. Returns the full trajectory like the reference."""
    sigmas = np.asarray(sigmas, dtype=np.float64)
    L = len(sigmas)
    b = x_init.shape[0]
    dtype = x_init.dtype
    cols = x_init.shape[2] // 2
    half_ref = refer_image[:, :, :cols, :]

    lvl = np.repeat(np.arange(L), n_steps_each)
    sig = jnp.asarray(sigmas, jnp.float32)
    step_sizes = jnp.asarray(step_lr * (sigmas / sigmas[-1]) ** 2, jnp.float32)
    keys = jax.random.split(key, len(lvl))
    lvl_j = jnp.asarray(lvl, jnp.int32)

    def body(x, scan_in):
        i, k_i = scan_in
        c = lvl_j[i]
        sigma, step_size = sig[c], step_sizes[c]
        k1, k2 = jax.random.split(k_i)
        corrupted = half_ref + jax.random.normal(k1, half_ref.shape, jnp.float32) * sigma
        x = x.at[:, :, :cols, :].set(corrupted.astype(dtype))
        noise = jax.random.normal(k2, x.shape, jnp.float32) * jnp.sqrt(step_size * 2.0)
        label = jnp.full((b,), c, jnp.int32)
        grad = eps_fn(x, label, cond).astype(jnp.float32)
        x_new = (x.astype(jnp.float32) + step_size * grad + noise).astype(dtype)
        return x_new, x_new

    _, traj = jax.lax.scan(body, x_init, (jnp.arange(len(lvl)), keys))
    return traj


def anneal_langevin_dynamics_interpolation(
    key: jax.Array,
    x_init: jax.Array,
    eps_fn: EpsFn,  # score convention (ref :722-773)
    sigmas: np.ndarray,
    n_interpolations: int,
    cond: Optional[jax.Array] = None,
    n_steps_each: int = 200,
    step_lr: float = 8e-6,
    final_only: bool = True,
):
    """Spherical noise interpolation (models/__init__.py:722-773): each row is
    expanded to n_interpolations chains sharing slerped noise."""
    sigmas = np.asarray(sigmas, dtype=np.float64)
    L = len(sigmas)
    n_rows = x_init.shape[0]
    x = jnp.repeat(x_init[:, None], n_interpolations, axis=1)
    x = x.reshape((-1,) + x_init.shape[1:])
    b = x.shape[0]
    dtype = x.dtype

    lvl = np.repeat(np.arange(L), n_steps_each)
    sig = jnp.asarray(sigmas, jnp.float32)
    step_sizes = jnp.asarray(step_lr * (sigmas / sigmas[-1]) ** 2, jnp.float32)
    keys = jax.random.split(key, len(lvl))
    lvl_j = jnp.asarray(lvl, jnp.int32)
    angles = jnp.linspace(0.0, np.pi / 2.0, n_interpolations)

    def body(xc, scan_in):
        i, k_i = scan_in
        c = lvl_j[i]
        step_size = step_sizes[c]
        label = jnp.full((b,), c, jnp.int32)
        grad = eps_fn(xc, label, cond).astype(jnp.float32)
        k1, k2 = jax.random.split(k_i)
        shape_row = (n_rows,) + x_init.shape[1:]
        noise_p = jax.random.normal(k1, shape_row, jnp.float32)
        noise_q = jax.random.normal(k2, shape_row, jnp.float32)
        ang = angles.reshape(1, n_interpolations, 1, 1, 1)
        noise = noise_p[:, None] * jnp.cos(ang) + noise_q[:, None] * jnp.sin(ang)
        noise = noise.reshape(xc.shape)
        x_new = (xc.astype(jnp.float32) + step_size * grad
                 + noise * jnp.sqrt(step_size * 2.0)).astype(dtype)
        return x_new, (x_new if not final_only else None)

    x, traj = jax.lax.scan(body, x, (jnp.arange(len(lvl)), keys))
    if final_only:
        return x[None]
    return traj
