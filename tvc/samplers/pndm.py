"""F-PNDM sampler (pseudo-numerical methods) as a `lax.scan` loop.

Replicates `FPNDM_sampler` (`models/__init__.py:40-100`) and the helpers in
`models/pndm.py:3-52`: a Runge–Kutta bootstrap for the first 3 steps followed
by 4th-order Adams–Bashforth over the epsilon history
``(55 e1 - 59 e2 + 37 e3 - 9 e4) / 24``. The epsilon history is carried in the
scan state as a fixed (4, ...) ring buffer; the bootstrap/AB choice is a
`lax.cond`, so the whole trajectory is one compiled program.

Reference quirks kept verbatim:
- ``alphas_cump`` is the *flipped* alpha buffer indexed at ``t+1``
  (pndm.py:20-21), and model labels may be fractional midpoints.
- ``steps_next = [-1] + steps[:-1]`` walks labels toward -1.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tvc.samplers.schedules import Schedule

EpsFn = Callable[[jax.Array, jax.Array, Optional[jax.Array]], jax.Array]


def _transfer(x, t, t_next, et, alphas_cump, clip_before):
    """pndm.py:19-33 (floats truncate toward zero when indexing, like .long())."""
    it = jnp.asarray(t, jnp.float32).astype(jnp.int32) + 1
    itn = jnp.asarray(t_next, jnp.float32).astype(jnp.int32) + 1
    at = alphas_cump[it]
    at_next = alphas_cump[itn]
    sat, satn = jnp.sqrt(at), jnp.sqrt(at_next)
    x_delta = (at_next - at) * (
        (1.0 / (sat * (sat + satn))) * x
        - 1.0 / (sat * (jnp.sqrt((1 - at_next) * at) + jnp.sqrt((1 - at) * at_next))) * et
    )
    x_next = x + x_delta
    if clip_before:
        x_next = jnp.clip(x_next, -1.0, 1.0)
    return x_next


def fpndm_sampler(
    key: jax.Array,
    x_init: jax.Array,
    eps_fn: EpsFn,
    schedule: Schedule,
    subsample_steps: int,
    cond: Optional[jax.Array] = None,
    clip_before: bool = True,
    final_only: bool = True,
    denoise: bool = True,  # accepted for API parity; FPNDM ignores it (ref :40-100)
):
    del key, denoise  # deterministic sampler
    T = len(schedule.alphas)
    skip = T // subsample_steps
    steps = np.arange(0, T, skip)
    steps_next = np.concatenate([[-1], steps[:-1]])
    L = len(steps)

    alphas_cump = jnp.asarray(schedule.alphas[::-1].copy(), dtype=jnp.float32)
    steps_j = jnp.asarray(steps, dtype=jnp.float32)
    steps_next_j = jnp.asarray(steps_next, dtype=jnp.float32)
    b = x_init.shape[0]
    dtype = x_init.dtype

    def model(x, t_scalar):
        label = jnp.full((b,), t_scalar, dtype=jnp.float32)
        return eps_fn(x, label, cond).astype(jnp.float32)

    def runge_kutta(x, t, t_mid, t_next):
        e1 = model(x, t)
        x2 = _transfer(x, t, t_mid, e1, alphas_cump, clip_before)
        e2 = model(x2, t_mid)
        x3 = _transfer(x, t, t_mid, e2, alphas_cump, clip_before)
        e3 = model(x3, t_mid)
        x4 = _transfer(x, t, t_next, e3, alphas_cump, clip_before)
        e4 = model(x4, t_next)
        et = (e1 + 2 * e2 + 2 * e3 + e4) / 6.0
        return et, e1

    def body(carry, i):
        x, ets, n = carry
        t = steps_j[i]
        t_next = steps_next_j[i]
        t_mid = (t + t_next) / 2.0
        xf = x.astype(jnp.float32)

        def ab4(_):
            e_new = model(xf, t)
            ets_new = jnp.roll(ets, shift=-1, axis=0).at[3].set(e_new)
            noise = (55 * ets_new[3] - 59 * ets_new[2] + 37 * ets_new[1] - 9 * ets_new[0]) / 24.0
            return noise, ets_new

        def rk(_):
            noise, e1 = runge_kutta(xf, t, t_mid, t_next)
            ets_new = jnp.roll(ets, shift=-1, axis=0).at[3].set(e1)
            return noise, ets_new

        noise, ets_new = jax.lax.cond(n > 2, ab4, rk, operand=None)
        x_new = _transfer(xf, t, t_next, noise, alphas_cump, clip_before).astype(dtype)
        return (x_new, ets_new, n + 1), (x_new if not final_only else None)

    ets0 = jnp.zeros((4,) + x_init.shape, dtype=jnp.float32)
    (x, _, _), traj = jax.lax.scan(body, (x_init, ets0, jnp.asarray(0)), jnp.arange(L))

    if final_only:
        return x[None]
    return traj
