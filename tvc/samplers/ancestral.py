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
    eps_fn_hi: Optional[EpsFn] = None,
    hi_steps: int = 0,
):
    """Ancestral DDPM sampling (reference models/__init__.py:208-342).

    Mixed-precision schedule (``sampling.precision_schedule = "f32:K"``):
    when ``eps_fn_hi``/``hi_steps`` are given, the first ``hi_steps``
    (highest-t) steps run through ``eps_fn_hi`` (an f32-compute UNet) and the
    remainder through ``eps_fn`` — two sequential scans sharing one
    per-step-constant table and ONE key split, so ``hi_steps >= L+1`` is
    bit-identical to an all-``eps_fn_hi`` run. The carry stays in
    ``x_init.dtype`` (f32) across both scans; precision differs only inside
    the UNet (each eps_fn's own compute dtype), which is where all the FLOPs
    and all the bf16 rounding live."""
    L = len(sub)
    dtype = x_init.dtype
    if gamma:
        k_cum = jnp.asarray(sub.k_cum, dtype=jnp.float32)
        theta_t = jnp.asarray(sub.theta_t, dtype=jnp.float32)

    keys = jax.random.split(key, L + 1)
    noise_val = x_init if same_noise else None
    b = x_init.shape[0]

    # The final denoise step runs INSIDE the scan as one more step with its
    # own per-step combine coefficients — the compiled program then contains
    # exactly ONE UNet instance (an out-of-loop denoise call would duplicate
    # the full 262M-param HLO, doubling compile time and program size).
    # Per-step update: x_new = c0*clip(x0) + c1*x + c2*eps + sigma*noise
    #   regular step (models/__init__.py:289-292): c0 = sqrt(a_prev)*beta/(1-a),
    #     c1 = sqrt(1-beta)(1-a_prev)/(1-a), c2 = 0
    #   denoise step (:333-337): c0 = 0, c1 = 1, c2 = -sqrt(1-alphas[-1])
    n_scan = L + 1 if denoise else L
    sigma_v = np.sqrt(sub.betas) if just_beta else np.sqrt(
        (1.0 - sub.alphas_prev) / (1.0 - sub.alphas) * sub.betas
    )
    sigma_v[L - 1] = 0.0  # no noise at the last regular step
    c0_v = np.sqrt(sub.alphas_prev) * sub.betas / (1.0 - sub.alphas)
    c1_v = np.sqrt(1.0 - sub.betas) * (1.0 - sub.alphas_prev) / (1.0 - sub.alphas)
    c2_v = np.zeros(L)
    labels_v = np.asarray(sub.steps, np.int32)
    a_v = np.asarray(sub.alphas, np.float64)
    if denoise:
        # reference quirk: the denoise label is L-1, not steps[-1]
        labels_v = np.concatenate([labels_v, [L - 1]])
        a_v = np.concatenate([a_v, [sub.alphas[-1]]])  # x0 estimate unused (c0=0)
        c0_v = np.concatenate([c0_v, [0.0]])
        c1_v = np.concatenate([c1_v, [1.0]])
        c2_v = np.concatenate([c2_v, [-np.sqrt(1.0 - sub.alphas[-1])]])
        sigma_v = np.concatenate([sigma_v, [0.0]])
    consts = tuple(
        jnp.asarray(v, jnp.float32) for v in (a_v, c0_v, c1_v, c2_v, sigma_v)
    )
    a_arr, c0, c1, c2, sigma_arr = consts
    labels_arr = jnp.asarray(labels_v, jnp.int32)

    # t_min warm start: the first executed step replaces x with
    # sqrt(a)x + sqrt(1-a)z (models/__init__.py:271-282); never the denoise step
    if t_min > 0:
        start_mask = sub.steps >= t_min * len(sub.alphas)
        warm_mask = jnp.asarray(np.concatenate([start_mask, [False]])[:n_scan], bool)
        active_mask = jnp.asarray(np.concatenate([start_mask, [True]])[:n_scan], bool)
    else:
        start_mask = None

    def make_body(fn):
        def body(carry, scan_in):
            x, transformed = carry
            i, k_i = scan_in
            a = a_arr[i]
            label = jnp.full((b,), labels_arr[i], dtype=jnp.int32)
            gi = jnp.minimum(i, L - 1)  # gamma-noise params have no denoise row

            if t_min > 0:
                active = active_mask[i]

                def warm(x):
                    kz = jax.random.fold_in(k_i, 1)
                    if gamma:
                        z = _gamma_noise(kz, x.shape, k_cum[gi], theta_t[gi], a, dtype)
                    else:
                        z = jax.random.normal(kz, x.shape, dtype)
                    return jnp.sqrt(a) * x + jnp.sqrt(1.0 - a) * z

                x = jnp.where(warm_mask[i] & ~transformed, warm(x), x)
                transformed = transformed | active
            else:
                active = jnp.asarray(True)

            eps = fn(x, label, cond).astype(jnp.float32)
            xf = x.astype(jnp.float32)
            x0 = (xf - jnp.sqrt(1.0 - a) * eps) / jnp.sqrt(a)
            if clip_before:
                x0 = jnp.clip(x0, -1.0, 1.0)
            x_new = c0[i] * x0 + c1[i] * xf + c2[i] * eps

            # trajectory records the PRE-noise state (reference appends before
            # adding noise, models/__init__.py:294-295 vs :317-330)
            x_pre = jnp.where(active, x_new.astype(dtype), x)

            if same_noise:
                noise = noise_val.astype(jnp.float32)
            elif gamma:
                noise = _gamma_noise(k_i, x.shape, k_cum[gi], theta_t[gi], a, jnp.float32)
            else:
                noise = jax.random.normal(k_i, x.shape, jnp.float32)
            x_new = x_new + sigma_arr[i] * noise

            # skip the update entirely until this step becomes active (t_min mode)
            x_out = jnp.where(active, x_new.astype(dtype), x)
            return (x_out, transformed), (x_pre if not final_only else None)

        return body

    init = (x_init, jnp.asarray(False))
    if eps_fn_hi is not None and hi_steps > 0:
        assert final_only, "mixed-precision schedule is final_only"
        hi = min(int(hi_steps), n_scan)
        carry, _ = jax.lax.scan(
            make_body(eps_fn_hi), init, (jnp.arange(hi), keys[:hi]))
        if hi < n_scan:
            carry, _ = jax.lax.scan(
                make_body(eps_fn), carry, (jnp.arange(hi, n_scan), keys[hi:n_scan]))
        return carry[0][None]

    (x, _), traj = jax.lax.scan(make_body(eps_fn), init, (jnp.arange(n_scan), keys[:n_scan]))

    if final_only:
        return x[None]
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
    if gamma:
        k_cum = jnp.asarray(sub.k_cum, dtype=jnp.float32)
        theta_t = jnp.asarray(sub.theta_t, dtype=jnp.float32)
    b = x_init.shape[0]

    # Same single-UNet-instance scan design as ddpm_sampler: the denoise step
    # is one more scan step with per-step coefficients
    #   x_new = d0*clip(x0) + d1*x + d2*eps
    #   regular (models/__init__.py:163-168): d0 = sqrt(a_prev), d1 = 0,
    #     d2 = sqrt(1-a_prev); denoise (:196-200): d0 = 0, d1 = 1,
    #     d2 = -sqrt(1-alphas[-1]), label L-1
    n_scan = L + 1 if denoise else L
    keys = jax.random.split(key, n_scan)
    labels_v = np.asarray(sub.steps, np.int32)
    a_v = np.asarray(sub.alphas, np.float64)
    d0_v = np.sqrt(np.asarray(sub.alphas_prev, np.float64))
    d1_v = np.zeros(L)
    d2_v = np.sqrt(1.0 - np.asarray(sub.alphas_prev, np.float64))
    if denoise:
        labels_v = np.concatenate([labels_v, [L - 1]])
        a_v = np.concatenate([a_v, [sub.alphas[-1]]])  # x0 estimate unused (d0=0)
        d0_v = np.concatenate([d0_v, [0.0]])
        d1_v = np.concatenate([d1_v, [1.0]])
        d2_v = np.concatenate([d2_v, [-np.sqrt(1.0 - sub.alphas[-1])]])
    a_arr, d0, d1, d2 = (
        jnp.asarray(v, jnp.float32) for v in (a_v, d0_v, d1_v, d2_v)
    )
    labels_arr = jnp.asarray(labels_v, jnp.int32)
    if t_min > 0:
        start_mask = sub.steps >= t_min * len(sub.alphas)
        warm_mask = jnp.asarray(np.concatenate([start_mask, [False]])[:n_scan], bool)
        active_mask = jnp.asarray(np.concatenate([start_mask, [True]])[:n_scan], bool)

    def body(carry, scan_in):
        x, transformed = carry
        i, k_i = scan_in
        a = a_arr[i]
        label = jnp.full((b,), labels_arr[i], dtype=jnp.int32)
        gi = jnp.minimum(i, L - 1)

        if t_min > 0:
            active = active_mask[i]

            def warm(x):
                if gamma:
                    z = _gamma_noise(k_i, x.shape, k_cum[gi], theta_t[gi], a, dtype)
                else:
                    z = jax.random.normal(k_i, x.shape, dtype)
                return jnp.sqrt(a) * x + jnp.sqrt(1.0 - a) * z

            x = jnp.where(warm_mask[i] & ~transformed, warm(x), x)
            transformed = transformed | active
        else:
            active = jnp.asarray(True)

        eps = eps_fn(x, label, cond).astype(jnp.float32)
        xf = x.astype(jnp.float32)
        x0 = (xf - jnp.sqrt(1.0 - a) * eps) / jnp.sqrt(a)
        if clip_before:
            x0 = jnp.clip(x0, -1.0, 1.0)
        x_new = d0[i] * x0 + d1[i] * xf + d2[i] * eps
        x_out = jnp.where(active, x_new.astype(dtype), x)
        return (x_out, transformed), (x_out if not final_only else None)

    (x, _), traj = jax.lax.scan(
        body, (x_init, jnp.asarray(False)), (jnp.arange(n_scan), keys)
    )

    if final_only:
        return x[None]
    return traj
