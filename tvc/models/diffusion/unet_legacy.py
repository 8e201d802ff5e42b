"""Legacy DDPM UNet (`arch: unet`) in Flax (NHWC).

Port of the capability surface of `models/unet.py:175-371` (UNet +
UNet_SMLD/UNet_DDPM wrappers) — the pre-NCSN++ architecture kept behind the
arch registry; unused by the shipped `unetmore` config but part of the
reference's model family.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tvc.core.config import Config
from tvc.models.diffusion.layers import get_timestep_embedding, num_groups_for
from tvc.samplers.schedules import Schedule, get_sigmas


class LegacyGroupNorm(nn.Module):
    """`Normalize` (models/unet.py:45-46): fixed 32-group GroupNorm, eps=1e-6.

    Unlike NCSN++'s group-count rule, the legacy net always uses 32 groups;
    channel counts not divisible by 32 (tiny test nets) fall back to the
    NCSN++ rule (torch would reject them outright)."""

    ch: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        ng = 32 if self.ch % 32 == 0 else num_groups_for(self.ch)
        y = nn.GroupNorm(num_groups=ng, epsilon=1e-6, dtype=jnp.float32, name="gn")(
            x.astype(jnp.float32))
        return y.astype(self.dtype)


class LegacyResnetBlock(nn.Module):
    """models/unet.py:66-98: norm-act-conv x2 with temb injection + NIN skip."""

    out_ch: int
    temb: bool = True
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, temb=None, deterministic=True):
        in_ch = x.shape[-1]
        h = nn.silu(LegacyGroupNorm(ch=in_ch, dtype=self.dtype, name="norm1")(x))
        h = nn.Conv(self.out_ch, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name="conv1")(h)
        if self.temb and temb is not None:
            # no act here: the legacy temb_dense Sequential already ends in
            # Swish (models/unet.py:248-253); the block adds dense(temb) raw
            # (:94-95) — parity-checked in test_reference_parity.py
            h = h + nn.Dense(self.out_ch, dtype=self.dtype, name="temb_proj")(temb)[:, None, None, :]
        h = nn.silu(LegacyGroupNorm(ch=self.out_ch, dtype=self.dtype, name="norm2")(h))
        if self.dropout > 0:
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = nn.Conv(self.out_ch, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name="conv2")(h)
        if in_ch != self.out_ch:
            x = nn.Dense(self.out_ch, dtype=self.dtype, name="nin")(x)
        return x + h


class LegacyAttnBlock(nn.Module):
    """models/unet.py:100-121: single-head spatial attention."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        hx = LegacyGroupNorm(ch=c, dtype=self.dtype, name="norm")(x)
        q = nn.Dense(c, dtype=self.dtype, name="q")(hx).reshape(b, h * w, c)
        k = nn.Dense(c, dtype=self.dtype, name="k")(hx).reshape(b, h * w, c)
        v = nn.Dense(c, dtype=self.dtype, name="v")(hx).reshape(b, h * w, c)
        wts = jax.nn.softmax(jnp.einsum("bqc,bkc->bqk", q, k) * (c ** -0.5), axis=-1)
        out = jnp.einsum("bqk,bkc->bqc", wts, v).reshape(b, h, w, c)
        out = nn.Dense(c, dtype=self.dtype, name="proj")(out)
        return x + out


class LegacyUNet(nn.Module):
    """models/unet.py:175-299; depth modes deep/deeper/deepest."""

    cfg: Config
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, y=None, cond=None):
        cfg = self.cfg
        ch = cfg.model.ngf
        mode = cfg.model.depth
        n_channels = cfg.data.channels
        num_frames = cfg.data.num_frames
        num_frames_cond = cfg.data.num_frames_cond + cfg.data.num_frames_future
        mults = {"deep": (1, 2, 2, 2), "deeper": (1, 2, 2, 4, 4),
                 "deepest": (1, 2, 2, 2, 4, 4)}[mode]
        ch_mult = [ch * m for m in mults]

        if y is not None and cfg.model.time_conditional:
            temb = get_timestep_embedding(y, ch)
            temb = nn.Dense(ch * 4, dtype=self.dtype, name="temb_dense1")(temb)
            temb = nn.Dense(ch * 4, dtype=self.dtype, name="temb_dense2")(nn.silu(temb))
            temb = nn.silu(temb)
        else:
            temb = None

        if cond is not None:
            x = jnp.concatenate([x, cond], axis=-1)
        if not cfg.data.logit_transform and not cfg.data.rescaled:
            x = 2 * x - 1.0

        hs = []
        h = nn.Conv(ch, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name="conv_in")(x)
        hs.append(h)
        prev = ch_mult[0]
        k = 0
        for i, ich in enumerate(ch_mult):
            for first in (prev, ich):
                h = LegacyResnetBlock(ich, dropout=cfg.model.dropout, dtype=self.dtype,
                                      name=f"down_res{k}")(h, temb)
                if i == 1:
                    # attn replaces the last skip (unet.py:277-279)
                    h = LegacyAttnBlock(dtype=self.dtype, name=f"down_attn{k}")(h)
                hs.append(h)
                k += 1
            if i != len(ch_mult) - 1:
                h = nn.Conv(ich, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                            dtype=self.dtype, name=f"down_conv{i}")(h)
                hs.append(h)
            prev = ich

        h = LegacyResnetBlock(ch_mult[-1], dropout=cfg.model.dropout, dtype=self.dtype, name="mid_res1")(h, temb)
        h = LegacyAttnBlock(dtype=self.dtype, name="mid_attn")(h)
        h = LegacyResnetBlock(ch_mult[-1], dropout=cfg.model.dropout, dtype=self.dtype, name="mid_res2")(h, temb)

        k = 0
        for i, ich in reversed(list(enumerate(ch_mult))):
            for _ in range(3):
                h = LegacyResnetBlock(ich, dropout=cfg.model.dropout, dtype=self.dtype,
                                      name=f"up_res{k}")(jnp.concatenate([h, hs.pop()], -1), temb)
                if i == 1:
                    h = LegacyAttnBlock(dtype=self.dtype, name=f"up_attn{k}")(h)
                k += 1
            if i != 0:
                b, hh, ww, cc = h.shape
                h = jax.image.resize(h, (b, hh * 2, ww * 2, cc), "nearest")
                h = nn.Conv(ich, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                            name=f"up_conv{i}")(h)
        assert not hs

        h = nn.silu(LegacyGroupNorm(ch=ch, dtype=self.dtype, name="norm_out")(h))
        out_ch = n_channels * (num_frames + num_frames_cond) if cfg.model.output_all_frames \
            else n_channels * num_frames
        out = nn.Conv(out_ch, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name="conv_out")(h)
        if cfg.model.output_all_frames and cond is not None:
            out = out[..., num_frames_cond * n_channels:]
        return out


class UNetSMLD(nn.Module):
    """models/unet.py:301-320: sigma-noise conditioning wrapper."""

    cfg: Config
    dtype: Any = jnp.float32

    def setup(self):
        self.unet = LegacyUNet(cfg=self.cfg, dtype=self.dtype, name="unet")
        self.sigmas = jnp.asarray(get_sigmas(self.cfg), jnp.float32)

    def __call__(self, x, y, cond=None):
        if self.cfg.model.noise_in_cond and cond is not None:
            used = self.sigmas[y].reshape((cond.shape[0],) + (1,) * (cond.ndim - 1))
            z = jax.random.normal(self.make_rng("noise"), cond.shape, cond.dtype)
            cond = cond + used * z
        return self.unet(x, y, cond)


class UNetDDPM(nn.Module):
    """models/unet.py:323-371: alpha-schedule conditioning wrapper."""

    cfg: Config
    dtype: Any = jnp.float32

    def setup(self):
        self.unet = LegacyUNet(cfg=self.cfg, dtype=self.dtype, name="unet")
        self.alphas = jnp.asarray(Schedule.from_config(self.cfg).alphas, jnp.float32)

    def __call__(self, x, y, cond=None, cond_mask=None):
        if self.cfg.model.noise_in_cond and cond is not None:
            used = self.alphas[y].reshape((cond.shape[0],) + (1,) * (cond.ndim - 1))
            z = jax.random.normal(self.make_rng("noise"), cond.shape, cond.dtype)
            cond = jnp.sqrt(used) * cond + jnp.sqrt(1.0 - used) * z
        return self.unet(x, y, cond)
