"""DDPM / DDIM samplers as single-compilation `lax.scan` loops.

Replaces the reference's Python-loop samplers (`models/__init__.py:104-342`,
one dispatch per step, model reloaded per call) with a scan over stacked
per-step constants: 100 UNet applications compile to ONE XLA program with
static shapes, donated carries, and on-device noise generation.

Numerics follow `ddpm_sampler` / `ddim_sampler` exactly, including:
- x0-estimate clipping to [-1,1] before the posterior update (`clip_before`)
- no added noise at the last step
- the final extra denoise step using label L-1 (a reference quirk: the loop
  passes raw step values 0,10,...,990 as labels but the denoise step passes
  L-1=99; kept verbatim for parity — models/__init__.py:332-337)
- optional Gamma noise (model.gamma), `just_beta`, `same_noise`, `t_min`.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tvc.samplers.schedules import Schedule, SubSchedule

# eps_fn(x, labels, cond) -> predicted noise epsilon-hat
EpsFn = Callable[[jax.Array, jax.Array, Optional[jax.Array]], jax.Array]


def _gamma_noise(key, shape, k, theta, alpha, dtype):
    """Centered Gamma noise (models/__init__.py:321-324)."""
    z = jax.random.gamma(key, jnp.full(shape, k, dtype=jnp.float32)) * theta
    return ((z - k * theta) / jnp.sqrt(1.0 - alpha)).astype(dtype)


def ddpm_sampler(
    key: jax.Array,
    x_init: jax.Array,
    eps_fn: EpsFn,
    sub: SubSchedule,
    cond: Optional[jax.Array] = None,
    denoise: bool = True,
    clip_before: bool = True,
    just_beta: bool = False,
    gamma: bool = False,
    final_only: bool = True,
    t_min: float = -1.0,
    same_noise: bool = False,
):
    """Ancestral DDPM sampling (reference models/__init__.py:208-342)."""
    L = len(sub)
    dtype = x_init.dtype
    steps = jnp.asarray(sub.steps, dtype=jnp.int32)
    alphas = jnp.asarray(sub.alphas, dtype=jnp.float32)
    alphas_prev = jnp.asarray(sub.alphas_prev, dtype=jnp.float32)
    betas = jnp.asarray(sub.betas, dtype=jnp.float32)
    if gamma:
        k_cum = jnp.asarray(sub.k_cum, dtype=jnp.float32)
        theta_t = jnp.asarray(sub.theta_t, dtype=jnp.float32)

    keys = jax.random.split(key, L + 1)
    noise_val = x_init if same_noise else None
    b = x_init.shape[0]

    # t_min warm start: the first executed step replaces x with
    # sqrt(a)x + sqrt(1-a)z (models/__init__.py:271-282)
    start_mask = jnp.asarray(sub.steps >= t_min * len(sub.alphas), dtype=bool) if t_min > 0 else None

    def body(carry, scan_in):
        x, transformed = carry
        i, k_i = scan_in
        a = alphas[i]
        a_prev = alphas_prev[i]
        beta = betas[i]
        label = jnp.full((b,), steps[i], dtype=jnp.int32)

        if t_min > 0:
            active = start_mask[i]

            def warm(x):
                kz = jax.random.fold_in(k_i, 1)
                if gamma:
                    z = _gamma_noise(kz, x.shape, k_cum[i], theta_t[i], a, dtype)
                else:
                    z = jax.random.normal(kz, x.shape, dtype)
                return jnp.sqrt(a) * x + jnp.sqrt(1.0 - a) * z

            x = jnp.where(active & ~transformed, warm(x), x)
            transformed = transformed | active
        else:
            active = jnp.asarray(True)

        eps = eps_fn(x, label, cond).astype(jnp.float32)
        xf = x.astype(jnp.float32)
        x0 = (xf - jnp.sqrt(1.0 - a) * eps) / jnp.sqrt(a)
        if clip_before:
            x0 = jnp.clip(x0, -1.0, 1.0)
        x_new = (jnp.sqrt(a_prev) * beta / (1.0 - a)) * x0 + (
            jnp.sqrt(1.0 - beta) * (1.0 - a_prev) / (1.0 - a)
        ) * xf

        # trajectory records the PRE-noise state (reference appends before
        # adding noise, models/__init__.py:294-295 vs :317-330)
        x_pre = jnp.where(active, x_new.astype(dtype), x)

        if same_noise:
            noise = noise_val.astype(jnp.float32)
        elif gamma:
            noise = _gamma_noise(k_i, x.shape, k_cum[i], theta_t[i], a, jnp.float32)
        else:
            noise = jax.random.normal(k_i, x.shape, jnp.float32)
        sigma = jnp.sqrt(beta) if just_beta else jnp.sqrt((1.0 - a_prev) / (1.0 - a) * beta)
        last = i == L - 1
        x_new = jnp.where(last, x_new, x_new + sigma * noise)

        # skip the update entirely until this step becomes active (t_min mode)
        x_out = jnp.where(active, x_new.astype(dtype), x)
        return (x_out, transformed), (x_pre if not final_only else None)

    init = (x_init, jnp.asarray(False))
    (x, _), traj = jax.lax.scan(body, init, (jnp.arange(L), keys[:L]))

    if denoise:
        label = jnp.full((b,), L - 1, dtype=jnp.int32)  # reference quirk: L-1, not steps[-1]
        eps = eps_fn(x, label, cond).astype(jnp.float32)
        x = (x.astype(jnp.float32) - jnp.sqrt(1.0 - alphas[-1]) * eps).astype(dtype)

    if final_only:
        return x[None]
    traj = jnp.concatenate([traj, x[None]], axis=0) if denoise else traj
    return traj


def ddim_sampler(
    key: jax.Array,
    x_init: jax.Array,
    eps_fn: EpsFn,
    sub: SubSchedule,
    cond: Optional[jax.Array] = None,
    denoise: bool = True,
    clip_before: bool = True,
    gamma: bool = False,
    final_only: bool = True,
    t_min: float = -1.0,
):
    """Deterministic DDIM sampling (reference models/__init__.py:104-204)."""
    L = len(sub)
    dtype = x_init.dtype
    steps = jnp.asarray(sub.steps, dtype=jnp.int32)
    alphas = jnp.asarray(sub.alphas, dtype=jnp.float32)
    alphas_prev = jnp.asarray(sub.alphas_prev, dtype=jnp.float32)
    if gamma:
        k_cum = jnp.asarray(sub.k_cum, dtype=jnp.float32)
        theta_t = jnp.asarray(sub.theta_t, dtype=jnp.float32)
    b = x_init.shape[0]
    keys = jax.random.split(key, L)
    start_mask = jnp.asarray(sub.steps >= t_min * len(sub.alphas), dtype=bool) if t_min > 0 else None

    def body(carry, scan_in):
        x, transformed = carry
        i, k_i = scan_in
        a, a_prev = alphas[i], alphas_prev[i]
        label = jnp.full((b,), steps[i], dtype=jnp.int32)

        if t_min > 0:
            active = start_mask[i]

            def warm(x):
                if gamma:
                    z = _gamma_noise(k_i, x.shape, k_cum[i], theta_t[i], a, dtype)
                else:
                    z = jax.random.normal(k_i, x.shape, dtype)
                return jnp.sqrt(a) * x + jnp.sqrt(1.0 - a) * z

            x = jnp.where(active & ~transformed, warm(x), x)
            transformed = transformed | active
        else:
            active = jnp.asarray(True)

        eps = eps_fn(x, label, cond).astype(jnp.float32)
        xf = x.astype(jnp.float32)
        x0 = (xf - jnp.sqrt(1.0 - a) * eps) / jnp.sqrt(a)
        if clip_before:
            x0 = jnp.clip(x0, -1.0, 1.0)
        x_new = jnp.sqrt(a_prev) * x0 + jnp.sqrt(1.0 - a_prev) * eps
        x_out = jnp.where(active, x_new.astype(dtype), x)
        return (x_out, transformed), (x_out if not final_only else None)

    (x, _), traj = jax.lax.scan(body, (x_init, jnp.asarray(False)), (jnp.arange(L), keys))

    if denoise:
        label = jnp.full((b,), L - 1, dtype=jnp.int32)
        eps = eps_fn(x, label, cond).astype(jnp.float32)
        x = (x.astype(jnp.float32) - jnp.sqrt(1.0 - alphas[-1]) * eps).astype(dtype)

    if final_only:
        return x[None]
    traj = jnp.concatenate([traj, x[None]], axis=0) if denoise else traj
    return traj
