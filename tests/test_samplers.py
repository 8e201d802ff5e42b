"""Schedule algebra + sampler correctness tests.

The analytic test uses a linear-Gaussian model where the exact posterior
noise-predictor is known in closed form: if x0 ~ N(0, s^2 I) then
E[eps | x_t] = sqrt(1-a_t) x_t / (a_t s^2 + 1 - a_t). Running DDPM/DDIM with
this oracle must reproduce samples with variance ~ s^2.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tvc.core.config import Config
from tvc.samplers import Schedule, ddim_sampler, ddpm_sampler, fpndm_sampler, get_sampler
from tvc.samplers.langevin import anneal_langevin_dynamics


def make_schedule(T=1000):
    cfg = Config()
    cfg.model.num_classes = T
    return Schedule.from_config(cfg)


def test_schedule_matches_flip_cumprod_identity():
    sched = make_schedule()
    betas = sched.betas
    # alphas[i] must equal prod_{m>=i} (1 - betas[m]) (ncsnpp_more.py:738)
    for i in [0, 1, 500, 998, 999]:
        want = np.prod(1.0 - betas[i:])
        np.testing.assert_allclose(sched.alphas[i], want, rtol=1e-10)
    np.testing.assert_allclose(sched.alphas_prev[:-1], sched.alphas[1:], rtol=0)
    assert sched.alphas_prev[-1] == 1.0
    assert sched.alphas[0] < 1e-3 and sched.alphas[-1] > 0.999


def test_subsample_schedule():
    sched = make_schedule()
    sub = sched.subsample(100)
    assert len(sub) == 100
    np.testing.assert_array_equal(sub.steps, np.arange(0, 1000, 10))
    np.testing.assert_allclose(sub.betas, 1.0 - sub.alphas / sub.alphas_prev, rtol=1e-12)


def _oracle_eps_fn(alphas_full, s2):
    a = jnp.asarray(alphas_full, jnp.float32)

    def eps_fn(x, labels, cond):
        at = a[labels.astype(jnp.int32)].reshape((-1,) + (1,) * (x.ndim - 1))
        return jnp.sqrt(1.0 - at) * x / (at * s2 + 1.0 - at)

    return eps_fn


@pytest.mark.parametrize("sampler", [ddpm_sampler, ddim_sampler])
def test_ancestral_samplers_match_analytic_variance(sampler):
    sched = make_schedule()
    sub = sched.subsample(100)
    s2 = 0.25
    eps_fn = _oracle_eps_fn(sched.alphas, s2)
    key = jax.random.PRNGKey(0)
    x_init = jax.random.normal(jax.random.PRNGKey(1), (64, 8, 8, 1), jnp.float32)
    out = sampler(key, x_init, eps_fn, sub, cond=None, denoise=True, clip_before=False)
    assert out.shape == (1, 64, 8, 8, 1)
    var = float(jnp.var(out))
    assert abs(var - s2) < 0.05, var


def test_ddim_is_deterministic():
    sched = make_schedule()
    sub = sched.subsample(20)
    eps_fn = _oracle_eps_fn(sched.alphas, 1.0)
    x_init = jax.random.normal(jax.random.PRNGKey(2), (4, 4, 4, 1))
    a = ddim_sampler(jax.random.PRNGKey(0), x_init, eps_fn, sub)
    b = ddim_sampler(jax.random.PRNGKey(99), x_init, eps_fn, sub)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)


def test_ddpm_trajectory_mode():
    sched = make_schedule(100)
    sub = sched.subsample(10)
    eps_fn = _oracle_eps_fn(sched.alphas, 1.0)
    x_init = jnp.zeros((2, 4, 4, 1))
    traj = ddpm_sampler(jax.random.PRNGKey(0), x_init, eps_fn, sub, final_only=False)
    assert traj.shape == (11, 2, 4, 4, 1)  # 10 steps + final denoise


def test_fpndm_runs_and_is_deterministic():
    sched = make_schedule(100)
    eps_fn = _oracle_eps_fn(sched.alphas, 1.0)
    x_init = jax.random.normal(jax.random.PRNGKey(3), (2, 4, 4, 1))
    a = fpndm_sampler(jax.random.PRNGKey(0), x_init, eps_fn, sched, subsample_steps=10)
    b = fpndm_sampler(jax.random.PRNGKey(7), x_init, eps_fn, sched, subsample_steps=10)
    assert a.shape == (1, 2, 4, 4, 1)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)
    assert np.all(np.isfinite(np.asarray(a)))


def test_langevin_runs():
    sigmas = np.logspace(1, -2, 10)
    # score-model convention: eps = -sigma * score; for N(0,I) score = -x
    sig = jnp.asarray(sigmas, jnp.float32)

    def eps_fn(x, labels, cond):
        return x / sig[labels.astype(jnp.int32)].reshape((-1,) + (1,) * (x.ndim - 1)) * sig[labels.astype(jnp.int32)].reshape((-1,) + (1,) * (x.ndim - 1))

    x_init = jax.random.normal(jax.random.PRNGKey(4), (4, 4, 4, 1))
    out = anneal_langevin_dynamics(
        jax.random.PRNGKey(0), x_init, eps_fn, sigmas, n_steps_each=5, step_lr=1e-4
    )
    assert out.shape == (1, 4, 4, 1, 1) or out.shape == (1, 4, 4, 4, 1)
    assert np.all(np.isfinite(np.asarray(out)))


def test_langevin_variants_run():
    from tvc.samplers.langevin import (
        anneal_langevin_dynamics_consistent,
        anneal_langevin_dynamics_inpainting,
        anneal_langevin_dynamics_interpolation,
    )

    sigmas = np.geomspace(10.0, 0.01, 8)

    def eps_fn(x, labels, cond):
        return -0.1 * x  # crude score stand-in

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 1))

    # consistent: step_lr must sit inside the (lower, upper) window
    inv_gamma = (sigmas[-1] / sigmas[-2]) ** 0  # placeholder; compute properly
    consistent = np.geomspace(sigmas[0], sigmas[-1], (len(sigmas) - 1) * 2 + 1)
    step_lr = float(sigmas[-1] ** 2)
    out = anneal_langevin_dynamics_consistent(
        jax.random.PRNGKey(1), x, eps_fn, sigmas, n_steps_each=2, step_lr=step_lr
    )
    assert out.shape == (1, 2, 8, 8, 1) and np.all(np.isfinite(np.asarray(out)))

    ref = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 8, 1))
    traj = anneal_langevin_dynamics_inpainting(
        jax.random.PRNGKey(3), x, ref, eps_fn, sigmas, n_steps_each=2, step_lr=1e-4
    )
    assert traj.shape == (16, 2, 8, 8, 1)

    out2 = anneal_langevin_dynamics_interpolation(
        jax.random.PRNGKey(4), x, eps_fn, sigmas, n_interpolations=3,
        n_steps_each=2, step_lr=1e-4
    )
    assert out2.shape == (1, 6, 8, 8, 1)
    assert np.all(np.isfinite(np.asarray(out2)))


def test_get_sampler_registry():
    assert get_sampler("ddpm") is ddpm_sampler
    assert get_sampler("DDIM") is ddim_sampler
    with pytest.raises(ValueError):
        get_sampler("nope")
