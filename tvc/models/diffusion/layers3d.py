"""3D / pseudo-3D layer library for the `unetmore3d` / `unetmorepseudo3d` archs.

Re-implements the capability of `models/better/layers3d.py:13-310`: true 3D
convs over the (frame, H, W) volume, pseudo-3D (2D spatial conv followed by a
1D temporal conv), and time-axis attention. Layout: channel-stacked frames
(B, H, W, F*C) are reshaped to (B, F, H, W, C)-style volumes internally —
NDHWC, the TPU-native 3D conv layout.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tvc.models.diffusion.layers import GroupNormRef, NIN, default_init


def stacked_to_volume(x: jax.Array, n_frames: int) -> jax.Array:
    """(B, H, W, C*N) channel-major frames -> (B, N, H, W, C)."""
    b, h, w, cn = x.shape
    c = cn // n_frames
    return jnp.transpose(x.reshape(b, h, w, c, n_frames), (0, 4, 1, 2, 3))


def volume_to_stacked(v: jax.Array) -> jax.Array:
    """(B, N, H, W, C) -> (B, H, W, C*N)."""
    b, n, h, w, c = v.shape
    return jnp.transpose(v, (0, 2, 3, 4, 1)).reshape(b, h, w, c * n)


class Conv3dDDPM(nn.Module):
    """3x3x3 (or 1x1x1) conv over the frame volume (ddpm_conv3x3_3d)."""

    out_ch: int
    n_frames: int
    kernel_size: int = 3
    init_scale: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        v = stacked_to_volume(x, self.n_frames)
        v = nn.Conv(self.out_ch, (k, k, k), padding="SAME",
                    kernel_init=default_init(self.init_scale),
                    bias_init=nn.initializers.zeros, dtype=self.dtype, name="conv")(v)
        return volume_to_stacked(v)


class PseudoConv3d(nn.Module):
    """2D spatial conv + activated 1D temporal conv (ddpm_conv3x3_pseudo3d)."""

    out_ch: int
    n_frames: int
    kernel_size: int = 3
    init_scale: float = 1.0
    act: Optional[Callable] = nn.silu
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        b, h, w, cn = x.shape
        c = cn // self.n_frames
        # spatial conv per frame: fold frames into batch
        v = stacked_to_volume(x, self.n_frames).reshape(b * self.n_frames, h, w, c)
        v = nn.Conv(self.out_ch, (k, k), padding="SAME",
                    kernel_init=default_init(self.init_scale),
                    bias_init=nn.initializers.zeros, dtype=self.dtype, name="spatial")(v)
        if self.act is not None:
            v = self.act(v)
        # temporal conv: fold pixels into batch
        v = v.reshape(b, self.n_frames, h, w, self.out_ch)
        v = jnp.transpose(v, (0, 2, 3, 1, 4)).reshape(b * h * w, self.n_frames, self.out_ch)
        v = nn.Conv(self.out_ch, (k,), padding="SAME",
                    kernel_init=default_init(self.init_scale),
                    bias_init=nn.initializers.zeros, dtype=self.dtype, name="temporal")(v)
        v = v.reshape(b, h, w, self.n_frames, self.out_ch)
        return volume_to_stacked(jnp.transpose(v, (0, 3, 1, 2, 4)))


class TimeAttnBlock(nn.Module):
    """Per-pixel attention over the frame axis (AttnBlockpp1d,
    layers3d.py:82-124): input (B', N, C) where B' folds (batch, H, W); the
    GroupNorm statistics span (C/group, N) per pixel sample, exactly like the
    reference's GroupNorm on (B*H*W, C, N)."""

    channels: int
    n_head_channels: int = -1
    skip_rescale: bool = True
    init_scale: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        bp, n, c = x.shape
        hx = GroupNormRef(ch=c, eps=1e-6, dtype=self.dtype, name="GroupNorm_0")(x)
        q = NIN(c, dtype=self.dtype, name="NIN_0")(hx)
        k = NIN(c, dtype=self.dtype, name="NIN_1")(hx)
        val = NIN(c, dtype=self.dtype, name="NIN_2")(hx)

        if self.n_head_channels == -1 or c < self.n_head_channels:
            heads = 1
        else:
            heads = max(1, c // self.n_head_channels)
        ch = c // heads
        qs = q.reshape(bp, n, heads, ch)
        ks = k.reshape(bp, n, heads, ch)
        vs = val.reshape(bp, n, heads, ch)
        logits = jnp.einsum("bqhc,bkhc->bhqk", qs, ks) * (ch ** -0.5)
        wts = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bkhc->bqhc", wts, vs).reshape(bp, n, c)
        out = NIN(c, init_scale=self.init_scale, dtype=self.dtype, name="NIN_3")(out)
        res = x + out
        if self.skip_rescale:
            res = res / np.sqrt(2.0)
        return res


class AttnBlockpp3d(nn.Module):
    """Factorized space-then-time attention (layers3d.py:191-223): a full 2D
    spatial attention block per frame (frames folded into batch) followed by
    a per-pixel temporal attention block over the n_frames tokens — the
    reference's memory-friendly alternative to joint space-time attention
    (AttnBlockpp3d_old, layers3d.py:139-189). Each sub-block carries its own
    GroupNorm/QKV and applies its own skip, as in the reference."""

    channels: int  # per-frame channel count (C)
    n_frames: int
    n_head_channels: int = -1
    skip_rescale: bool = True
    init_scale: float = 0.0
    act: Optional[Callable] = None  # reference passes act=None (ncsnpp_more.py:118)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        from tvc.models.diffusion.layers import AttnBlockpp

        b, h, w, cn = x.shape
        c = cn // self.n_frames
        v = stacked_to_volume(x, self.n_frames)  # (B, N, H, W, C)

        # space attention: frames fold into batch (layers3d.py:211-213)
        s = AttnBlockpp(
            channels=c, skip_rescale=self.skip_rescale, init_scale=self.init_scale,
            n_head_channels=self.n_head_channels, dtype=self.dtype, name="space_att",
        )(v.reshape(b * self.n_frames, h, w, c))
        v = s.reshape(b, self.n_frames, h, w, c)

        if self.act is not None:
            v = self.act(v)

        # time attention: pixels fold into batch (layers3d.py:220-222)
        t = jnp.transpose(v, (0, 2, 3, 1, 4)).reshape(b * h * w, self.n_frames, c)
        t = TimeAttnBlock(
            channels=c, skip_rescale=self.skip_rescale, init_scale=self.init_scale,
            n_head_channels=self.n_head_channels, dtype=self.dtype, name="time_att",
        )(t)
        v = jnp.transpose(t.reshape(b, h, w, self.n_frames, c), (0, 3, 1, 2, 4))
        return volume_to_stacked(v)


class FrameConverter1x1(nn.Module):
    """1x1 conv over the frame axis: n_frames_in -> n_frames_out
    (the layerspp.conv1x1 converters in the 3D forward, ncsnpp_more.py:217)."""

    n_frames_in: int
    n_frames_out: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, cn = x.shape
        c = cn // self.n_frames_in
        v = stacked_to_volume(x, self.n_frames_in)  # (B, N_in, H, W, C)
        v = jnp.transpose(v, (0, 2, 3, 4, 1))  # (B,H,W,C,N_in)
        w_ = self.param("kernel", default_init(), (self.n_frames_in, self.n_frames_out))
        bias = self.param("bias", nn.initializers.zeros, (self.n_frames_out,))
        v = jnp.einsum("bhwcn,nm->bhwcm", v, w_.astype(self.dtype)) + bias.astype(self.dtype)
        v = jnp.transpose(v, (0, 4, 1, 2, 3))
        return volume_to_stacked(v)
