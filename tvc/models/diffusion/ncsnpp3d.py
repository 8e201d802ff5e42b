"""3D / pseudo-3D NCSN++ variants (`arch: unetmore3d` / `unetmorepseudo3d`).

Re-implements the is3d branches of the reference UNet
(ncsnpp_more.py:40-51,101-123,215-218,226-232,259-262,327-334,344-354,387-390):
frames are carried channel-major ((c, n) interleaved so 3D convs see a
(frames, H, W) volume per channel group), widths scale with the frame count
(nf = ngf * n_frames), attention runs over the time axis, and 1x1 frame
converters reduce n_frames -> num_frames at the middle block and on every
skip connection.

NHWC(+frames) layout: activations are (B, H, W, C*N) channel-major stacks;
`tvc.models.diffusion.layers3d` provides the volume views.
"""

from __future__ import annotations

from typing import Any, Callable, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tvc.core.config import Config
from tvc.models.diffusion.layers import (
    DDPMConv,
    GroupNormRef,
    default_init,
    get_timestep_embedding,
    num_groups_for,
)
from tvc.models.diffusion.layers3d import (
    AttnBlockpp3d,
    Conv3dDDPM,
    FrameConverter1x1,
    PseudoConv3d,
    stacked_to_volume,
    volume_to_stacked,
)
from tvc.ops.resample import downsample_2d, upsample_2d


def frame_major_to_channel_major(x: jax.Array, n_frames: int) -> jax.Array:
    """(B,H,W,N*C frame-major) -> (B,H,W,C*N channel-major) (ncsnpp_more.py:259-262)."""
    b, h, w, nc = x.shape
    c = nc // n_frames
    return jnp.transpose(x.reshape(b, h, w, n_frames, c), (0, 1, 2, 4, 3)).reshape(b, h, w, nc)


def channel_major_to_frame_major(x: jax.Array, n_frames: int) -> jax.Array:
    """Inverse of the above (ncsnpp_more.py:387-390)."""
    b, h, w, cn = x.shape
    c = cn // n_frames
    return jnp.transpose(x.reshape(b, h, w, c, n_frames), (0, 1, 2, 4, 3)).reshape(b, h, w, cn)


class GetActNorm3D(nn.Module):
    """is3d get_act_norm (layerspp.py:486-549): per-frame GroupNorm over
    C = ch // n_frames channels; temb scale/shift broadcast over frames."""

    ch: int  # total channels C*N
    n_frames: int
    emb: bool = True
    act: Callable = nn.silu
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, emb=None):
        c = self.ch // self.n_frames
        b, h, w, _ = x.shape
        v = stacked_to_volume(x, self.n_frames)  # (B,N,H,W,C)
        # the reference normalizes the (B, C, N, H, W) volume with a GroupNorm
        # over C channels (layerspp.py:524-536), so the statistics span the
        # WHOLE (N, H, W) volume per channel group — folding frames into the
        # spatial axis reproduces that with a channels-last GroupNorm
        vv = v.reshape(b, self.n_frames * h, w, c)
        if self.emb:
            assert emb is not None
            emb_out = nn.Dense(2 * c, kernel_init=default_init(),
                               bias_init=nn.initializers.zeros, dtype=self.dtype,
                               name="Dense_0")(self.act(emb))
            scale, shift = jnp.split(emb_out, 2, axis=-1)
            y = GroupNormRef(ch=c, eps=1e-5, use_affine=False, dtype=self.dtype,
                             name="Norm_0")(vv)
            y = y.reshape(b, self.n_frames, h, w, c)
            y = y * (1 + scale[:, None, None, None, :]) + shift[:, None, None, None, :]
        else:
            y = GroupNormRef(ch=c, eps=1e-5, use_affine=True, dtype=self.dtype,
                             name="Norm_0")(vv).reshape(b, self.n_frames, h, w, c)
        return self.act(volume_to_stacked(y))


class ResnetBlockBigGAN3D(nn.Module):
    """is3d BigGAN resblock (layerspp.py:553-624 with 3D convs)."""

    in_ch: int
    n_frames: int
    out_ch: Optional[int] = None
    pseudo3d: bool = False
    temb: bool = True
    up: bool = False
    down: bool = False
    dropout: float = 0.0
    fir_kernel: Tuple[int, ...] = (1, 3, 3, 1)
    init_scale: float = 0.0
    act: Callable = nn.silu
    dtype: Any = jnp.float32

    def _conv(self, out_ch, k, init_scale, name):
        if self.pseudo3d:
            return PseudoConv3d(out_ch=out_ch // self.n_frames, n_frames=self.n_frames,
                                kernel_size=k, init_scale=init_scale, act=self.act,
                                dtype=self.dtype, name=name)
        return Conv3dDDPM(out_ch=out_ch // self.n_frames, n_frames=self.n_frames,
                          kernel_size=k, init_scale=init_scale, dtype=self.dtype, name=name)

    @nn.compact
    def __call__(self, x, temb=None, deterministic=True):
        out_ch = self.out_ch or self.in_ch
        h = GetActNorm3D(ch=self.in_ch, n_frames=self.n_frames, emb=self.temb,
                         act=self.act, dtype=self.dtype, name="actnorm0")(x, temb)
        if self.up:
            h = upsample_2d(h, self.fir_kernel, factor=2)
            x = upsample_2d(x, self.fir_kernel, factor=2)
        elif self.down:
            h = downsample_2d(h, self.fir_kernel, factor=2)
            x = downsample_2d(x, self.fir_kernel, factor=2)
        h = self._conv(out_ch, 3, 1.0, "Conv_0")(h)
        h = GetActNorm3D(ch=out_ch, n_frames=self.n_frames, emb=self.temb,
                         act=self.act, dtype=self.dtype, name="actnorm1")(h, temb)
        if self.dropout > 0:
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = self._conv(out_ch, 3, self.init_scale, "Conv_1")(h)
        if self.in_ch != out_ch or self.up or self.down:
            x = self._conv(out_ch, 1, 1.0, "Conv_2")(x)
        return (x + h) / np.sqrt(2.0)


class NCSNpp3D(nn.Module):
    """3D/pseudo-3D NCSN++ (arch unetmore3d / unetmorepseudo3d).

    Input x: (B,H,W,C*num_frames frame-major), cond (B,H,W,C*num_frames_cond);
    conditioning enters by channel concatenation like the 2D model, the
    combined n_frames rides the conv frame axis; the mid/skip converters bring
    the frame count back to num_frames (ncsnpp_more.py:215-232)."""

    cfg: Config
    pseudo3d: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, time_cond, cond=None, cond_mask=None):
        cfg = self.cfg
        ch = cfg.data.channels
        num_frames = cfg.data.num_frames
        num_frames_cond = cfg.data.num_frames_cond + cfg.data.num_frames_future
        n_frames = num_frames + (num_frames_cond if cond is not None else 0)

        nf = cfg.model.ngf * n_frames        # (ncsnpp_more.py:50)
        numf = cfg.model.ngf * num_frames
        num_res = len(cfg.model.ch_mult)
        all_res = [cfg.data.image_size // (2 ** i) for i in range(num_res)]
        m_idx = [0]

        def nm():
            n = f"m{m_idx[0]}"
            m_idx[0] += 1
            return n

        if cond is not None:
            x = jnp.concatenate([x, cond], axis=-1)
        x = frame_major_to_channel_major(x.astype(self.dtype), n_frames)

        if cfg.model.time_conditional:
            temb = get_timestep_embedding(time_cond, nf).astype(self.dtype)
            temb = nn.Dense(nf * 4, kernel_init=default_init(),
                            bias_init=nn.initializers.zeros, dtype=self.dtype,
                            name=nm())(temb)
            temb = nn.Dense(nf * 4, kernel_init=default_init(),
                            bias_init=nn.initializers.zeros, dtype=self.dtype,
                            name=nm())(nn.silu(temb))
        else:
            temb = None

        def res(in_ch, frames, out_ch=None, up=False, down=False):
            return ResnetBlockBigGAN3D(
                in_ch=in_ch, n_frames=frames, out_ch=out_ch, pseudo3d=self.pseudo3d,
                temb=cfg.model.time_conditional, up=up, down=down,
                dropout=cfg.model.dropout, dtype=self.dtype, name=nm())

        def attn(total_ch, frames):
            return AttnBlockpp3d(channels=total_ch // frames, n_frames=frames,
                                 n_head_channels=cfg.model.n_head_channels,
                                 dtype=self.dtype, name=nm())

        conv_in = (PseudoConv3d if self.pseudo3d else Conv3dDDPM)
        x = conv_in(out_ch=nf // n_frames, n_frames=n_frames, kernel_size=3,
                    dtype=self.dtype, name=nm())(x)

        hs = [x]
        in_ch = nf
        for i_level in range(num_res):
            for _ in range(cfg.model.num_res_blocks):
                out_ch = nf * cfg.model.ch_mult[i_level]
                h = res(in_ch, n_frames, out_ch)(hs[-1], temb)
                in_ch = out_ch
                if all_res[i_level] in cfg.model.attn_resolutions:
                    h = attn(in_ch, n_frames)(h)
                hs.append(h)
            if i_level != num_res - 1:
                hs.append(res(in_ch, n_frames, down=True)(hs[-1], temb))

        h = hs[-1]
        h = res(in_ch, n_frames)(h, temb)
        h = attn(in_ch, n_frames)(h)
        # frame converter: n_frames -> num_frames (ncsnpp_more.py:215-218)
        h = FrameConverter1x1(n_frames_in=n_frames, n_frames_out=num_frames,
                              dtype=self.dtype, name=nm())(h)
        in_ch = in_ch // n_frames * num_frames
        h = res(in_ch, num_frames)(h, temb)

        for i_level in reversed(range(num_res)):
            for _ in range(cfg.model.num_res_blocks + 1):
                out_ch = numf * cfg.model.ch_mult[i_level]
                prev = hs.pop()
                # skip converter n_frames -> num_frames (ncsnpp_more.py:226-232)
                prev = FrameConverter1x1(n_frames_in=n_frames, n_frames_out=num_frames,
                                         dtype=self.dtype, name=nm())(prev)
                h = res(h.shape[-1] + prev.shape[-1], num_frames, out_ch)(
                    jnp.concatenate([h, prev], -1), temb)
            if all_res[i_level] in cfg.model.attn_resolutions:
                h = attn(h.shape[-1], num_frames)(h)
            if i_level != 0:
                h = res(h.shape[-1], num_frames, up=True)(h, temb)

        assert not hs
        h = GetActNorm3D(ch=h.shape[-1], n_frames=num_frames, emb=False,
                         dtype=self.dtype, name=nm())(h)
        conv_out = (PseudoConv3d if self.pseudo3d else Conv3dDDPM)
        h = conv_out(out_ch=ch, n_frames=num_frames, kernel_size=3, init_scale=0.0,
                     dtype=self.dtype, name=nm())(h)
        return channel_major_to_frame_major(h, num_frames)
