"""NCSN++ layer library in Flax (NHWC, TPU-native).

Re-designs the reference layer stack — `models/better/layers.py`,
`models/better/layerspp.py`, `models/better/up_or_down_sampling.py` — as
functional Flax modules. Parameter layout and numerics (init distributions,
group-count quirks, eps values, skip rescaling) follow the reference exactly so
that converted PyTorch checkpoints reproduce activations; the execution model
(layout, fusion, resampling-as-dilated-conv) is JAX/XLA-first.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tvc.ops.resample import downsample_2d, upsample_2d

Dtype = Any


def variance_scaling_init(scale: float, mode: str = "fan_avg", distribution: str = "uniform"):
    """DDPM default initializer (reference: models/better/layers.py:43-80)."""
    scale = 1e-10 if scale == 0 else scale

    def init(key, shape, dtype=jnp.float32):
        # conv kernels are HWIO; dense kernels are (in, out)
        if len(shape) == 4:
            receptive = shape[0] * shape[1]
            fan_in, fan_out = shape[2] * receptive, shape[3] * receptive
        elif len(shape) == 2:
            fan_in, fan_out = shape[0], shape[1]
        else:
            fan_in = fan_out = int(np.prod(shape))
        if mode == "fan_in":
            denom = fan_in
        elif mode == "fan_out":
            denom = fan_out
        else:
            denom = (fan_in + fan_out) / 2
        variance = scale / denom
        if distribution == "normal":
            return jax.random.normal(key, shape, dtype) * jnp.sqrt(variance)
        return (jax.random.uniform(key, shape, dtype) * 2.0 - 1.0) * jnp.sqrt(3 * variance)

    return init


def default_init(scale: float = 1.0):
    return variance_scaling_init(scale, "fan_avg", "uniform")


def num_groups_for(ch: int) -> int:
    """Reference group-count quirk (layerspp.py:212-215, 350-352, 473-477)."""
    ng = max(min(ch // 4, 32), 1)  # max(,1): tolerate ch < 4 in tiny test nets
    while ch % ng != 0:
        ng -= 1
    return ng


def get_timestep_embedding(timesteps: jax.Array, embedding_dim: int, max_positions: int = 10000) -> jax.Array:
    """Sinusoidal embedding (reference: models/better/layers.py:504-518)."""
    assert timesteps.ndim == 1
    half_dim = embedding_dim // 2
    emb = math.log(max_positions) / (half_dim - 1)
    emb = jnp.exp(jnp.arange(half_dim, dtype=jnp.float32) * -emb)
    emb = timesteps.astype(jnp.float32)[:, None] * emb[None, :]
    emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=1)
    if embedding_dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class GaussianFourierProjection(nn.Module):
    """Gaussian Fourier feature embedding for continuous noise levels
    (reference: models/better/layerspp.py:176-185).

    ``W`` is a frozen random projection (requires_grad=False in the
    reference); held as a Flax param so converters can load it
    (torch key ``W`` -> param ``W``), but it should be masked out of any
    optimizer update (the reference never trains it either — this embedding
    type is dead code on every shipped config, ncsnpp_more.py:66 hardcodes
    'positional')."""

    embedding_size: int = 256
    scale: float = 1.0

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        w = self.param(
            "W",
            lambda key, shape: jax.random.normal(key, shape) * self.scale,
            (self.embedding_size,),
        )
        x_proj = x[:, None] * jax.lax.stop_gradient(w)[None, :] * 2 * jnp.pi
        return jnp.concatenate([jnp.sin(x_proj), jnp.cos(x_proj)], axis=-1)


class DDPMConv(nn.Module):
    """3x3 / 1x1 conv with DDPM `default_init` (layers.py:89-120). NHWC."""

    out_ch: int
    kernel_size: int = 3
    stride: int = 1
    init_scale: float = 1.0
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = self.kernel_size // 2
        y = nn.Conv(
            features=self.out_ch,
            kernel_size=(self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=((pad, pad), (pad, pad)),
            use_bias=self.use_bias,
            kernel_init=default_init(self.init_scale),
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="conv",
        )(x)
        return y


def conv3x3(out_ch: int, init_scale: float = 1.0, dtype=jnp.float32, name=None) -> DDPMConv:
    return DDPMConv(out_ch=out_ch, kernel_size=3, init_scale=init_scale, dtype=dtype, name=name)


def conv1x1(out_ch: int, init_scale: float = 1.0, dtype=jnp.float32, name=None) -> DDPMConv:
    return DDPMConv(out_ch=out_ch, kernel_size=1, init_scale=init_scale, dtype=dtype, name=name)


class NIN(nn.Module):
    """Network-in-network 1x1 dense over channels (layers.py:535-545)."""

    num_units: int
    init_scale: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        w = self.param("W", default_init(self.init_scale), (in_dim, self.num_units))
        b = self.param("b", nn.initializers.zeros, (self.num_units,))
        return jnp.einsum("...c,cd->...d", x.astype(self.dtype), w.astype(self.dtype)) + b.astype(self.dtype)


def _gn_bf16_io() -> bool:
    """TVC_GN_BF16_IO=1: keep GroupNorm inputs/outputs in the compute dtype
    (bf16) and compute only the statistics in f32 (docs/PERF.md lever).
    Default OFF: the round-5 B=8 ablation initially showed ~3% — but under
    fetch-free timing (scripts/bench_ablate_serving.py after the fix) base
    and bf16-I/O are IDENTICAL (28.68 vs 28.71 ms/step): XLA already fuses
    the f32 casts into neighbouring ops, so the apparent win was output-
    fetch noise. Kept as a tested flag + documented negative result; the
    conservative all-f32 GroupNorm stays the default for bf16 models."""
    import os

    return os.environ.get("TVC_GN_BF16_IO", "0") == "1"


class GroupNormRef(nn.Module):
    """GroupNorm with the reference's group-count rule; f32 statistics."""

    ch: int
    eps: float = 1e-6
    use_affine: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        ng = num_groups_for(self.ch)
        if _gn_bf16_io() and self.dtype != jnp.float32:
            # flax GroupNorm computes mean/var in f32 regardless of dtype
            # (normalization._compute_stats); dtype only sets the normalize
            # map's I/O precision — exactly the bf16-I/O / f32-stats split
            return nn.GroupNorm(
                num_groups=ng,
                epsilon=self.eps,
                use_bias=self.use_affine,
                use_scale=self.use_affine,
                dtype=self.dtype,
                name="gn",
            )(x)
        y = nn.GroupNorm(
            num_groups=ng,
            epsilon=self.eps,
            use_bias=self.use_affine,
            use_scale=self.use_affine,
            dtype=jnp.float32,
            name="gn",
        )(x.astype(jnp.float32))
        return y.astype(self.dtype)


class AttnBlockpp(nn.Module):
    """Multi-head spatial self-attention (layerspp.py:207-249).

    At <=32x32 resolution (<=1024 tokens) a plain einsum softmax attention maps
    straight onto the MXU; no flash-style kernel is needed at this size.
    """

    channels: int
    skip_rescale: bool = True
    init_scale: float = 0.0
    n_heads: int = 1
    n_head_channels: int = -1
    attn_backend: str = "einsum"  # "einsum" | "pallas" (tvc/ops/pallas_attention)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        if self.n_head_channels == -1:
            heads = self.n_heads
        elif c < self.n_head_channels:
            heads = 1
        else:
            assert c % self.n_head_channels == 0
            heads = c // self.n_head_channels

        hx = GroupNormRef(ch=c, eps=1e-6, dtype=self.dtype, name="GroupNorm_0")(x)
        q = NIN(c, dtype=self.dtype, name="NIN_0")(hx)
        k = NIN(c, dtype=self.dtype, name="NIN_1")(hx)
        v = NIN(c, dtype=self.dtype, name="NIN_2")(hx)

        ch = c // heads
        q = q.reshape(b, h * w, heads, ch)
        k = k.reshape(b, h * w, heads, ch)
        v = v.reshape(b, h * w, heads, ch)
        if self.attn_backend == "pallas":
            from tvc.ops.pallas_attention import attention_pallas

            out = attention_pallas(
                jnp.transpose(q, (0, 2, 1, 3)),
                jnp.transpose(k, (0, 2, 1, 3)),
                jnp.transpose(v, (0, 2, 1, 3)),
            )
            out = jnp.transpose(out, (0, 2, 1, 3))
        else:
            scale = ch ** -0.5
            logits = jnp.einsum("bqhc,bkhc->bhqk", q, k,
                                preferred_element_type=jnp.float32) * scale
            wts = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(self.dtype)
            out = jnp.einsum("bhqk,bkhc->bqhc", wts, v, preferred_element_type=jnp.float32)
        out = out.astype(self.dtype).reshape(b, h, w, c)
        out = NIN(c, init_scale=self.init_scale, dtype=self.dtype, name="NIN_3")(out)
        if not self.skip_rescale:
            return x + out
        return (x + out) / np.sqrt(2.0)


class GetActNorm(nn.Module):
    """norm -> (ada scale/shift from emb) -> act (layerspp.py:486-549).

    With ``emb_dim`` set, the GroupNorm is affine-free and scale/shift come from
    a Dense projection of the (activated) time embedding; eps = 1e-5 via the
    reference's `get_norm` path.
    """

    ch: int
    emb: bool = False  # whether an embedding is expected at call time
    act: Callable = nn.silu
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, emb: Optional[jax.Array] = None):
        if self.emb:
            assert emb is not None
            emb_out = nn.Dense(
                2 * self.ch,
                kernel_init=default_init(),
                bias_init=nn.initializers.zeros,
                dtype=self.dtype,
                name="Dense_0",
            )(self.act(emb))
            scale, shift = jnp.split(emb_out[:, None, None, :], 2, axis=-1)
            y = GroupNormRef(ch=self.ch, eps=1e-5, use_affine=False, dtype=self.dtype, name="Norm_0")(x)
            y = y * (1 + scale) + shift
        else:
            y = GroupNormRef(ch=self.ch, eps=1e-5, use_affine=True, dtype=self.dtype, name="Norm_0")(x)
        return self.act(y)


class ResnetBlockBigGAN(nn.Module):
    """BigGAN-style resblock with FIR resampling (layerspp.py:553-624)."""

    in_ch: int
    out_ch: Optional[int] = None
    temb: bool = True
    up: bool = False
    down: bool = False
    dropout: float = 0.0
    fir_kernel: Tuple[int, ...] = (1, 3, 3, 1)
    skip_rescale: bool = True
    init_scale: float = 0.0
    act: Callable = nn.silu
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb=None, deterministic: bool = True):
        out_ch = self.out_ch or self.in_ch
        h = GetActNorm(ch=self.in_ch, emb=self.temb, act=self.act, dtype=self.dtype, name="actnorm0")(x, temb)

        if self.up:
            h = upsample_2d(h, self.fir_kernel, factor=2)
            x = upsample_2d(x, self.fir_kernel, factor=2)
        elif self.down:
            h = downsample_2d(h, self.fir_kernel, factor=2)
            x = downsample_2d(x, self.fir_kernel, factor=2)

        h = DDPMConv(out_ch, 3, dtype=self.dtype, name="Conv_0")(h)
        h = GetActNorm(ch=out_ch, emb=self.temb, act=self.act, dtype=self.dtype, name="actnorm1")(h, temb)
        if self.dropout > 0:
            h = nn.Dropout(rate=self.dropout, deterministic=deterministic)(h)
        h = DDPMConv(out_ch, 3, init_scale=self.init_scale, dtype=self.dtype, name="Conv_1")(h)

        if self.in_ch != out_ch or self.up or self.down:
            x = DDPMConv(out_ch, 1, dtype=self.dtype, name="Conv_2")(x)

        if not self.skip_rescale:
            return x + h
        return (x + h) / np.sqrt(2.0)


class ResnetBlockDDPM(nn.Module):
    """DDPM-style resblock (layerspp.py:324-392); capability parity (unused by
    the default `biggan` resblock_type)."""

    in_ch: int
    out_ch: Optional[int] = None
    temb: bool = True
    dropout: float = 0.0
    conv_shortcut: bool = False
    skip_rescale: bool = True
    init_scale: float = 0.0
    act: Callable = nn.silu
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb=None, deterministic: bool = True):
        out_ch = self.out_ch or self.in_ch
        h = self.act(GroupNormRef(ch=self.in_ch, eps=1e-6, dtype=self.dtype, name="GroupNorm_0")(x))
        h = DDPMConv(out_ch, 3, dtype=self.dtype, name="Conv_0")(h)
        if self.temb and temb is not None:
            h = h + nn.Dense(
                out_ch, kernel_init=default_init(), bias_init=nn.initializers.zeros,
                dtype=self.dtype, name="Dense_0",
            )(self.act(temb))[:, None, None, :]
        h = self.act(GroupNormRef(ch=out_ch, eps=1e-6, dtype=self.dtype, name="GroupNorm_1")(h))
        if self.dropout > 0:
            h = nn.Dropout(rate=self.dropout, deterministic=deterministic)(h)
        h = DDPMConv(out_ch, 3, init_scale=self.init_scale, dtype=self.dtype, name="Conv_1")(h)
        if x.shape[-1] != out_ch:
            if self.conv_shortcut:
                x = DDPMConv(out_ch, 3, dtype=self.dtype, name="Conv_2")(x)
            else:
                x = NIN(out_ch, dtype=self.dtype, name="NIN_0")(x)
        if not self.skip_rescale:
            return x + h
        return (x + h) / np.sqrt(2.0)


class FIRUpsample(nn.Module):
    """Upsample module (layerspp.py:252-284); fused conv variant included."""

    in_ch: int
    out_ch: Optional[int] = None
    with_conv: bool = False
    fir_kernel: Tuple[int, ...] = (1, 3, 3, 1)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from tvc.ops.resample import upsample_conv_2d

        out_ch = self.out_ch or self.in_ch
        if not self.with_conv:
            return upsample_2d(x, self.fir_kernel, factor=2)
        w = self.param("weight", default_init(), (3, 3, x.shape[-1], out_ch))
        b = self.param("bias", nn.initializers.zeros, (out_ch,))
        y = upsample_conv_2d(x, w.astype(self.dtype), k=self.fir_kernel)
        return y + b.astype(self.dtype)


class FIRDownsample(nn.Module):
    """Downsample module (layerspp.py:287-321)."""

    in_ch: int
    out_ch: Optional[int] = None
    with_conv: bool = False
    fir_kernel: Tuple[int, ...] = (1, 3, 3, 1)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from tvc.ops.resample import conv_downsample_2d

        out_ch = self.out_ch or self.in_ch
        if not self.with_conv:
            return downsample_2d(x, self.fir_kernel, factor=2)
        w = self.param("weight", default_init(), (3, 3, x.shape[-1], out_ch))
        b = self.param("bias", nn.initializers.zeros, (out_ch,))
        y = conv_downsample_2d(x, w.astype(self.dtype), k=self.fir_kernel)
        return y + b.astype(self.dtype)
