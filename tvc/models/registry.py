"""Model registry + score-function wrappers.

Replicates the capability of `models/better/utils.py:27-186`
(register_model/get_model/create_model and the SDE-style
get_model_fn/get_score_fn glue): a name->constructor registry dispatching on
`config.model.arch`, and eps->score conversion helpers.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tvc.core.config import Config

_MODELS: Dict[str, Callable] = {}


def register_model(cls=None, *, name: Optional[str] = None):
    def wrap(c):
        n = name or c.__name__
        if n in _MODELS:
            raise ValueError(f"model {n} already registered")
        _MODELS[n] = c
        return c

    return wrap if cls is None else wrap(cls)


def get_model(name: str):
    try:
        return _MODELS[name]
    except KeyError:
        raise ValueError(f"unknown model: {name} (have {sorted(_MODELS)})") from None


def create_model(cfg: Config, dtype=jnp.float32):
    """Dispatch on config.model.arch like the reference's sampler setup."""
    arch = cfg.model.arch
    if arch in ("unetmore", "unetmore3d", "unetmorepseudo3d"):
        from tvc.models.diffusion.ncsnpp import UNetMoreDDPM

        return UNetMoreDDPM(cfg=cfg, dtype=dtype)
    if arch == "unet":
        from tvc.models.diffusion.unet_legacy import UNetDDPM, UNetSMLD

        if cfg.model.version.upper() == "SMLD":
            return UNetSMLD(cfg=cfg, dtype=dtype)
        return UNetDDPM(cfg=cfg, dtype=dtype)
    if arch in _MODELS:
        return _MODELS[arch](cfg=cfg, dtype=dtype)
    raise ValueError(f"unknown arch: {arch}")


def get_model_fn(model, variables, train: bool = False):
    """models/better/utils.py get_model_fn: a plain (x, labels, cond) closure."""

    def model_fn(x, labels, cond=None, cond_mask=None):
        return model.apply(variables, x, labels, cond)

    return model_fn


def get_score_fn(model, variables, cfg: Config):
    """eps-prediction -> score conversion (models/better/utils.py:150-186):
    SMLD: s = -z / sigma;  DDPM: s = -z / sqrt(1 - alpha)."""
    from tvc.samplers.schedules import Schedule, get_sigmas

    model_fn = get_model_fn(model, variables)
    version = cfg.model.version.upper()
    if version == "SMLD":
        sigmas = jnp.asarray(get_sigmas(cfg), jnp.float32)

        def score_fn(x, labels, cond=None):
            z = model_fn(x, labels, cond)
            s = sigmas[labels].reshape((-1,) + (1,) * (x.ndim - 1))
            return -z / s

    else:
        alphas = jnp.asarray(Schedule.from_config(cfg).alphas, jnp.float32)

        def score_fn(x, labels, cond=None):
            z = model_fn(x, labels, cond)
            a = alphas[labels].reshape((-1,) + (1,) * (x.ndim - 1))
            return -z / jnp.sqrt(1.0 - a)

    return score_fn
