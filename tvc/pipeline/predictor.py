"""Diffusion frame predictor: the TPU-native `generate_frame` path.

Replaces SenderCity.get_model/generate_frame (city_sender.py:304-351), fixing
the reference's checkpoint-reload-per-call bug (:337): the UNet parameters are
bound ONCE, the full sampler trajectory is ONE jitted program (lax.scan), and
batching across the prediction batch rides the batch axis.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from tvc.core.config import Config
from tvc.models.diffusion.ncsnpp import UNetMoreDDPM
from tvc.pipeline.transforms import data_transform, inverse_data_transform
from tvc.samplers import Schedule, get_sampler
from tvc.samplers.pndm import fpndm_sampler


class FramePredictor:
    """Bundles UNet params + schedule + jitted sampling closure."""

    def __init__(self, cfg: Config, variables: dict, sampler_version: Optional[str] = None,
                 dtype=jnp.float32, mesh=None, data_sharding=None,
                 params_dtype=None):
        self.cfg = cfg
        self.dtype = dtype
        self.model = UNetMoreDDPM(cfg=cfg, dtype=dtype)
        # Mixed-precision schedule "f32:K" (sampling.precision_schedule,
        # docs/BF16.md): a second f32-compute UNet over the SAME variables
        # handles the first K high-t steps. Requires f32 master params.
        ps = cfg.sampling.precision_schedule
        self.hi_steps = 0
        if ps:
            if not ps.startswith("f32:"):
                raise ValueError(f"precision_schedule must be 'f32:K', got {ps!r}")
            self.hi_steps = int(ps.split(":", 1)[1])
            if self.hi_steps > 0:
                assert params_dtype is None, \
                    "precision_schedule needs f32 master params (params_dtype=None)"
        self.model_hi = (UNetMoreDDPM(cfg=cfg, dtype=jnp.float32)
                         if self.hi_steps > 0 and dtype != jnp.float32 else None)
        if self.model_hi is not None and \
                (sampler_version or cfg.model.version).upper() != "DDPM":
            raise ValueError(
                "precision_schedule is supported for DDPM (got "
                f"{(sampler_version or cfg.model.version).upper()})")
        # fourier embedding consumes CONTINUOUS noise levels (the reference
        # applies log() to time_cond, ncsnpp_more.py:264-268); every sampler
        # here passes integer step labels (log(0) = -inf at step 0), so the
        # combination cannot work — same as the reference, where the fourier
        # branch is unreachable. The capability exists at the NCSNpp level
        # (pass sigmas yourself); the predictor refuses the footgun.
        if cfg.model.embedding_type == "fourier":
            raise ValueError(
                "embedding_type='fourier' expects continuous noise-level "
                "conditioning; the DDPM/DDIM/FPNDM samplers pass integer "
                "step labels. Use NCSNpp directly with sigma inputs.")
        if params_dtype is not None:
            # Store the weights in the compute dtype (usually bf16). At B=1
            # the deep UNet levels are weight-streaming-bound, so keeping f32
            # masters on device doubles the per-step HBM traffic for a cast
            # the model would do anyway. Quality paths keep f32 (default).
            variables = jax.tree_util.tree_map(
                lambda a: a.astype(params_dtype)
                if hasattr(a, "dtype") and a.dtype == jnp.float32 else a,
                variables,
            )
        self.variables = variables
        self.schedule = Schedule.from_config(cfg)
        self.version = (sampler_version or cfg.model.version).upper()
        self.sub = self.schedule.subsample(cfg.sampling.subsample)

        samp = self.cfg.sampling
        model = self.model

        # params are an explicit jit argument — closing over them would embed
        # 262M constants into the program and balloon compile time
        if self.version == "FPNDM":
            def sample(variables, key, x_init, cond):
                def eps_fn(x, labels, c):
                    return model.apply(variables, x, labels, c)

                return fpndm_sampler(
                    key, x_init, eps_fn, self.schedule, samp.subsample, cond=cond,
                    clip_before=samp.clip_before,
                )
        elif self.model_hi is not None:
            from tvc.samplers.ancestral import ddpm_sampler
            model_hi = self.model_hi
            hi_steps = self.hi_steps

            def sample(variables, key, x_init, cond):
                def eps_fn(x, labels, c):
                    return model.apply(variables, x, labels, c)

                def eps_fn_hi(x, labels, c):
                    return model_hi.apply(variables, x, labels, c)

                return ddpm_sampler(
                    key, x_init, eps_fn, self.sub, cond=cond,
                    denoise=samp.denoise, clip_before=samp.clip_before,
                    gamma=cfg.model.gamma, t_min=samp.init_prev_t, final_only=True,
                    eps_fn_hi=eps_fn_hi, hi_steps=hi_steps,
                )
        else:
            sampler = get_sampler(self.version)

            def sample(variables, key, x_init, cond):
                def eps_fn(x, labels, c):
                    return model.apply(variables, x, labels, c)

                return sampler(
                    key, x_init, eps_fn, self.sub, cond=cond,
                    denoise=samp.denoise, clip_before=samp.clip_before,
                    gamma=cfg.model.gamma, t_min=samp.init_prev_t, final_only=True,
                )

        # raw (untraced) sampler body — reused by the fused whole-GOP program
        # (tvc/pipeline/fused_gop.py), which traces it inside its own loop
        self.sample_fn = sample
        self._sample = jax.jit(sample)

    @classmethod
    def create(cls, cfg: Config, rng: Optional[jax.Array] = None,
               fast_init: bool = False, **kw) -> "FramePredictor":
        """Random-init predictor (for tests/benchmarks without a checkpoint).

        fast_init=True materializes zero weights from eval_shape instead of
        tracing the full init program — identical compute cost per step, much
        faster bring-up for throughput benchmarking of the 262M UNet."""
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        model = UNetMoreDDPM(cfg=cfg, dtype=kw.get("dtype", jnp.float32))
        size = cfg.data.image_size
        c = cfg.data.channels
        x = jnp.zeros((1, size, size, c * cfg.data.num_frames), model.dtype)
        cond = jnp.zeros(
            (1, size, size, c * (cfg.data.num_frames_cond + cfg.data.num_frames_future)),
            model.dtype,
        )
        if fast_init:
            shapes = jax.eval_shape(model.init, rng, x, jnp.zeros((1,), jnp.int32), cond)
            variables = jax.tree_util.tree_map(
                lambda s: jnp.full(s.shape, 0.01, s.dtype), shapes
            )
        else:
            variables = model.init(rng, x, jnp.zeros((1,), jnp.int32), cond)
        return cls(cfg, variables, **kw)

    def generate(self, key: jax.Array, cond_frames: jax.Array) -> jax.Array:
        """cond_frames: (B, H, W, C*num_frames_cond) in [0,1].
        Returns (B, num_frames, H, W, C) predicted frames in [0,1]."""
        cfg = self.cfg
        b = cond_frames.shape[0]
        size = cfg.data.image_size
        c = cfg.data.channels
        # mixed-precision schedule keeps the carry (and noise) in f32; the
        # per-step compute dtype is each UNet's own
        carry_dtype = jnp.float32 if self.model_hi is not None else self.dtype
        cond = data_transform(cfg, cond_frames.astype(carry_dtype))
        knoise, ksamp = jax.random.split(key)
        x_init = jax.random.normal(
            knoise, (b, size, size, c * cfg.data.num_frames), carry_dtype
        )
        out = self._sample(self.variables, ksamp, x_init, cond)[-1]
        out = inverse_data_transform(cfg, out.astype(jnp.float32))
        # (B,H,W,C*F) -> (B,F,H,W,C): frames are channel-stacked [f0 c0..2, f1 ...]
        out = out.reshape(b, size, size, cfg.data.num_frames, c)
        return jnp.transpose(out, (0, 3, 1, 2, 4))
