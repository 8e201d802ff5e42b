"""SPADE-conditioned NCSN++ variant (`model.spade: true`).

Re-implements `SPADE_NCSNpp` (ncsnpp_more.py:396-718) and its layer pieces
(`MySPADE` layerspp.py:101-173, `ResnetBlockBigGANppSPADE` layerspp.py:628-705,
spade-mode `get_act_norm` layerspp.py:486-549): conditioning enters through
spatially-adaptive group norms on every resblock instead of channel concat.
NHWC; the cond map is nearest-resized to each feature resolution.
"""

from __future__ import annotations

from typing import Any, Callable, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tvc.core.config import Config
from tvc.models.diffusion.layers import (
    AttnBlockpp,
    DDPMConv,
    GroupNormRef,
    default_init,
    get_timestep_embedding,
)
from tvc.ops.resample import downsample_2d, upsample_2d


def _nearest_resize_torch(x: jax.Array, h: int, w: int) -> jax.Array:
    """Nearest-neighbor resize with torch's `F.interpolate(mode='nearest')`
    index convention: src = floor(dst * in/out) (top-left asymmetric).

    `jax.image.resize(..., 'nearest')` aligns sample CENTERS instead, which
    picks different source pixels for every 2x downsample (1,3,5,... instead
    of 0,2,4,...) — caught by the reference parity battery
    (test_reference_parity.py::test_spade_forward_parity; reference call:
    layerspp.py MySPADE.forward `F.interpolate(segmap, mode='nearest')`)."""
    _, H, W, _ = x.shape
    if (H, W) == (h, w):
        return x
    iy = (jnp.arange(h) * H) // h
    ix = (jnp.arange(w) * W) // w
    return x[:, iy][:, :, ix]


class MySPADE(nn.Module):
    """Affine-free GroupNorm modulated by a conv net over the cond map."""

    norm_nc: int
    spade_dim: int = 128
    act: Callable = nn.silu
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, segmap):
        normalized = GroupNormRef(ch=self.norm_nc, eps=1e-6, use_affine=False,
                                  dtype=self.dtype, name="param_free_norm")(x)
        b, h, w, _ = x.shape
        seg = _nearest_resize_torch(segmap, h, w)
        actv = self.act(DDPMConv(self.spade_dim, 3, dtype=self.dtype, name="mlp_shared")(seg))
        gamma = DDPMConv(self.norm_nc, 3, dtype=self.dtype, name="mlp_gamma")(actv)
        beta = DDPMConv(self.norm_nc, 3, dtype=self.dtype, name="mlp_beta")(actv)
        return normalized * (1 + gamma) + beta


class GetActNormSPADE(nn.Module):
    """spade-mode get_act_norm: SPADE + ada temb scale/shift + act."""

    ch: int
    emb: bool = True
    spade_dim: int = 128
    act: Callable = nn.silu
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, emb=None, cond=None):
        y = MySPADE(norm_nc=self.ch, spade_dim=self.spade_dim, act=self.act,
                    dtype=self.dtype, name="Norm_0")(x, cond)
        if self.emb:
            emb_out = nn.Dense(2 * self.ch, kernel_init=default_init(),
                               bias_init=nn.initializers.zeros, dtype=self.dtype,
                               name="Dense_0")(self.act(emb))
            scale, shift = jnp.split(emb_out[:, None, None, :], 2, axis=-1)
            y = y * (1 + scale) + shift
        return self.act(y)


class ResnetBlockBigGANSPADE(nn.Module):
    """layerspp.py:628-705."""

    in_ch: int
    out_ch: Optional[int] = None
    temb: bool = True
    up: bool = False
    down: bool = False
    dropout: float = 0.0
    spade_dim: int = 128
    fir_kernel: Tuple[int, ...] = (1, 3, 3, 1)
    skip_rescale: bool = True
    init_scale: float = 0.0
    act: Callable = nn.silu
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, temb=None, cond=None, deterministic=True):
        out_ch = self.out_ch or self.in_ch
        h = GetActNormSPADE(ch=self.in_ch, emb=self.temb, spade_dim=self.spade_dim,
                            act=self.act, dtype=self.dtype, name="actnorm0")(x, temb, cond)
        if self.up:
            h = upsample_2d(h, self.fir_kernel, factor=2)
            x = upsample_2d(x, self.fir_kernel, factor=2)
        elif self.down:
            h = downsample_2d(h, self.fir_kernel, factor=2)
            x = downsample_2d(x, self.fir_kernel, factor=2)
        h = DDPMConv(out_ch, 3, dtype=self.dtype, name="Conv_0")(h)
        h = GetActNormSPADE(ch=out_ch, emb=self.temb, spade_dim=self.spade_dim,
                            act=self.act, dtype=self.dtype, name="actnorm1")(h, temb, cond)
        if self.dropout > 0:
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = DDPMConv(out_ch, 3, init_scale=self.init_scale, dtype=self.dtype, name="Conv_1")(h)
        if self.in_ch != out_ch or self.up or self.down:
            x = DDPMConv(out_ch, 1, dtype=self.dtype, name="Conv_2")(x)
        if not self.skip_rescale:
            return x + h
        return (x + h) / np.sqrt(2.0)


class SPADENCSNpp(nn.Module):
    """SPADE NCSN++ (ncsnpp_more.py:396-718); module order mirrors the
    reference `all_modules` for checkpoint conversion (names m{i})."""

    cfg: Config
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, time_cond, cond=None, cond_mask=None):
        cfg = self.cfg
        nf = cfg.model.ngf
        num_res = len(cfg.model.ch_mult)
        all_res = [cfg.data.image_size // (2 ** i) for i in range(num_res)]
        spade_dim = cfg.model.spade_dim
        m_idx = 0

        def nm():
            nonlocal m_idx
            n = f"m{m_idx}"
            m_idx += 1
            return n

        if cfg.model.time_conditional:
            temb = get_timestep_embedding(time_cond, nf).astype(self.dtype)
            temb = nn.Dense(nf * 4, kernel_init=default_init(),
                            bias_init=nn.initializers.zeros, dtype=self.dtype, name=nm())(temb)
            temb = nn.Dense(nf * 4, kernel_init=default_init(),
                            bias_init=nn.initializers.zeros, dtype=self.dtype,
                            name=nm())(nn.silu(temb))
        else:
            temb = None

        def res(in_ch, out_ch=None, up=False, down=False):
            return ResnetBlockBigGANSPADE(
                in_ch=in_ch, out_ch=out_ch, temb=cfg.model.time_conditional, up=up,
                down=down, dropout=cfg.model.dropout, spade_dim=spade_dim,
                dtype=self.dtype, name=nm())

        def attn(ch):
            return AttnBlockpp(channels=ch, skip_rescale=True, init_scale=0.0,
                               n_head_channels=cfg.model.n_head_channels,
                               dtype=self.dtype, name=nm())

        x = x.astype(self.dtype)
        hs = [DDPMConv(nf, 3, dtype=self.dtype, name=nm())(x)]
        in_ch = nf
        for i_level in range(num_res):
            for _ in range(cfg.model.num_res_blocks):
                out_ch = nf * cfg.model.ch_mult[i_level]
                h = res(in_ch, out_ch)(hs[-1], temb, cond)
                in_ch = out_ch
                if all_res[i_level] in cfg.model.attn_resolutions:
                    h = attn(in_ch)(h)
                hs.append(h)
            if i_level != num_res - 1:
                hs.append(res(in_ch, down=True)(hs[-1], temb, cond))

        h = hs[-1]
        h = res(in_ch)(h, temb, cond)
        h = attn(in_ch)(h)
        h = res(in_ch)(h, temb, cond)

        for i_level in reversed(range(num_res)):
            for _ in range(cfg.model.num_res_blocks + 1):
                out_ch = nf * cfg.model.ch_mult[i_level]
                prev = hs.pop()
                h = res(h.shape[-1] + prev.shape[-1], out_ch)(
                    jnp.concatenate([h, prev], -1), temb, cond)
            if all_res[i_level] in cfg.model.attn_resolutions:
                h = attn(h.shape[-1])(h)
            if i_level != 0:
                h = res(h.shape[-1], up=True)(h, temb, cond)

        assert not hs
        h = GetActNormSPADE(ch=h.shape[-1], emb=False, spade_dim=spade_dim,
                            dtype=self.dtype, name=nm())(h, None, cond)
        h = DDPMConv(cfg.data.channels * cfg.data.num_frames, 3, init_scale=0.0,
                     dtype=self.dtype, name=nm())(h)
        return h
