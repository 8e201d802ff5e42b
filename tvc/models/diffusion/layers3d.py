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


class AttnBlockpp3d(nn.Module):
    """Temporal attention over the frame axis (layers3d.py:191-223): each
    spatial position attends across its n_frames tokens."""

    channels: int  # per-frame channel count (C)
    n_frames: int
    n_head_channels: int = -1
    skip_rescale: bool = True
    init_scale: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, cn = x.shape
        c = cn // self.n_frames
        v = stacked_to_volume(x, self.n_frames)  # (B, N, H, W, C)
        hx = GroupNormRef(ch=c, eps=1e-6, dtype=self.dtype, name="GroupNorm_0")(
            v.reshape(b * self.n_frames, h, w, c)
        ).reshape(b, self.n_frames, h, w, c)

        q = NIN(c, dtype=self.dtype, name="NIN_0")(hx)
        k = NIN(c, dtype=self.dtype, name="NIN_1")(hx)
        val = NIN(c, dtype=self.dtype, name="NIN_2")(hx)

        if self.n_head_channels == -1 or c < self.n_head_channels:
            heads = 1
        else:
            heads = max(1, c // self.n_head_channels)
        ch = c // heads
        # tokens = frames, batch = (B, H, W)
        def split(t):
            return jnp.transpose(t, (0, 2, 3, 1, 4)).reshape(b, h, w, self.n_frames, heads, ch)

        qs, ks, vs = split(q), split(k), split(val)
        logits = jnp.einsum("bhwqnc,bhwknc->bhwnqk", qs, ks) * (ch ** -0.5)
        wts = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(self.dtype)
        out = jnp.einsum("bhwnqk,bhwknc->bhwqnc", wts, vs)
        out = out.reshape(b, h, w, self.n_frames, c)
        out = jnp.transpose(out, (0, 3, 1, 2, 4))  # (B,N,H,W,C)
        out = NIN(c, init_scale=self.init_scale, dtype=self.dtype, name="NIN_3")(out)
        res = v + out
        if self.skip_rescale:
            res = res / np.sqrt(2.0)
        return volume_to_stacked(res)


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
