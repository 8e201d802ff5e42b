"""NCSN++ conditional diffusion UNet in Flax (NHWC, TPU-native).

Re-design of the reference score network `models/better/ncsnpp_more.py:32-392`
(`arch: unetmore`, BigGAN resblocks, FIR resampling, positional time
embedding). The module graph is generated from the same constructor recipe so
that module index ``i`` here corresponds to ``all_modules[i]`` in the reference
checkpoint (names ``m{i}``), making PyTorch->Flax weight conversion mechanical.

Differences by design (TPU-first):
- NHWC activations; channels ride the 128-wide vector lanes / MXU columns.
- FIR up/down sampling lowered to dilated/strided XLA convs (tvc.ops.resample)
  instead of the reference's CUDA upfirdn2d kernel.
- One jitted forward; no per-call model reload (the reference reloads its
  checkpoint every generate_frame call, city_sender.py:337).
"""

from __future__ import annotations

import dataclasses
from typing import Any, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tvc.core.config import Config
from tvc.models.diffusion.layers import (
    AttnBlockpp,
    DDPMConv,
    GaussianFourierProjection,
    GetActNorm,
    ResnetBlockBigGAN,
    default_init,
    get_timestep_embedding,
)


@dataclasses.dataclass(frozen=True)
class NCSNppSpec:
    """Static architecture description (derived from Config)."""

    image_size: int = 128
    channels: int = 3
    num_frames: int = 5
    num_frames_cond: int = 2
    ngf: int = 192
    ch_mult: Tuple[int, ...] = (1, 1, 2, 3, 4)
    num_res_blocks: int = 2
    attn_resolutions: Tuple[int, ...] = (8, 16, 32)
    n_head_channels: int = 192
    dropout: float = 0.0
    time_conditional: bool = True
    cond_emb: bool = False  # binary cond-mask embedding (ncsnpp_more.py:97-99)
    skip_rescale: bool = True
    num_classes: int = 1000
    # 'positional' | 'fourier' (ncsnpp_more.py:66-84; fourier embeds
    # log-noise-levels through a frozen Gaussian projection)
    embedding_type: str = "positional"

    @property
    def n_frames(self) -> int:
        return self.num_frames + self.num_frames_cond

    @classmethod
    def from_config(cls, cfg: Config) -> "NCSNppSpec":
        return cls(
            image_size=cfg.data.image_size,
            channels=cfg.data.channels,
            num_frames=cfg.data.num_frames,
            num_frames_cond=cfg.data.num_frames_cond + cfg.data.num_frames_future,
            ngf=cfg.model.ngf,
            ch_mult=tuple(cfg.model.ch_mult),
            num_res_blocks=cfg.model.num_res_blocks,
            attn_resolutions=tuple(cfg.model.attn_resolutions),
            n_head_channels=cfg.model.n_head_channels,
            dropout=cfg.model.dropout,
            time_conditional=cfg.model.time_conditional,
            cond_emb=cfg.model.cond_emb,
            num_classes=cfg.model.num_classes,
            embedding_type=cfg.model.embedding_type,
        )


def _build_plan(spec: NCSNppSpec) -> List[dict]:
    """Emit the ordered module list, mirroring ncsnpp_more.py:70-249."""
    plan: List[dict] = []
    nf = spec.ngf
    num_resolutions = len(spec.ch_mult)
    all_res = [spec.image_size // (2 ** i) for i in range(num_resolutions)]

    if spec.embedding_type == "fourier":
        # all_modules[0] when present (ncsnpp_more.py:72-78); scale=16
        plan.append({"kind": "fourier", "size": nf, "scale": 16.0})
    if spec.time_conditional:
        plan.append({"kind": "dense", "out": nf * 4})
        plan.append({"kind": "dense", "out": nf * 4})
        if spec.cond_emb:
            plan.append({"kind": "embed", "num": 2, "dim": nf // 2})

    plan.append({"kind": "conv3", "out": nf})
    hs_c = [nf]
    in_ch = nf
    for i_level in range(num_resolutions):
        for _ in range(spec.num_res_blocks):
            out_ch = nf * spec.ch_mult[i_level]
            plan.append({"kind": "res", "in": in_ch, "out": out_ch})
            in_ch = out_ch
            if all_res[i_level] in spec.attn_resolutions:
                plan.append({"kind": "attn", "ch": in_ch})
            hs_c.append(in_ch)
        if i_level != num_resolutions - 1:
            plan.append({"kind": "res", "in": in_ch, "out": in_ch, "down": True})
            hs_c.append(in_ch)

    # middle
    plan.append({"kind": "res", "in": in_ch, "out": in_ch})
    plan.append({"kind": "attn", "ch": in_ch})
    plan.append({"kind": "res", "in": in_ch, "out": in_ch})

    # upsampling
    for i_level in reversed(range(num_resolutions)):
        for _ in range(spec.num_res_blocks + 1):
            out_ch = nf * spec.ch_mult[i_level]
            in_ch_old = hs_c.pop()
            plan.append({"kind": "res", "in": in_ch + in_ch_old, "out": out_ch})
            in_ch = out_ch
        if all_res[i_level] in spec.attn_resolutions:
            plan.append({"kind": "attn", "ch": in_ch})
        if i_level != 0:
            plan.append({"kind": "res", "in": in_ch, "out": in_ch, "up": True})

    assert not hs_c
    plan.append({"kind": "actnorm", "ch": in_ch})
    plan.append({"kind": "conv3", "out": spec.channels * spec.num_frames, "init_scale": 0.0})
    return plan


class NCSNpp(nn.Module):
    """The 2-D channel-stacked-frames NCSN++ UNet (ncsnpp_more.py:32-392)."""

    spec: NCSNppSpec
    dtype: Any = jnp.float32

    def setup(self):
        plan = _build_plan(self.spec)
        self._plan = plan
        mods = []
        for i, p in enumerate(plan):
            name = f"m{i}"
            if p["kind"] == "dense":
                mods.append(
                    nn.Dense(p["out"], kernel_init=default_init(), bias_init=nn.initializers.zeros,
                             dtype=self.dtype, name=name)
                )
            elif p["kind"] == "conv3":
                mods.append(
                    DDPMConv(p["out"], 3, init_scale=p.get("init_scale", 1.0), dtype=self.dtype, name=name)
                )
            elif p["kind"] == "res":
                mods.append(
                    ResnetBlockBigGAN(
                        in_ch=p["in"], out_ch=p["out"], temb=self.spec.time_conditional,
                        up=p.get("up", False), down=p.get("down", False),
                        dropout=self.spec.dropout, dtype=self.dtype, name=name,
                    )
                )
            elif p["kind"] == "fourier":
                mods.append(GaussianFourierProjection(
                    embedding_size=p["size"], scale=p["scale"], name=name))
            elif p["kind"] == "embed":
                mods.append(nn.Embed(p["num"], p["dim"], dtype=self.dtype, name=name))
            elif p["kind"] == "attn":
                mods.append(
                    AttnBlockpp(channels=p["ch"], skip_rescale=True, init_scale=0.0,
                                n_head_channels=self.spec.n_head_channels, dtype=self.dtype, name=name)
                )
            elif p["kind"] == "actnorm":
                mods.append(GetActNorm(ch=p["ch"], emb=False, dtype=self.dtype, name=name))
            else:  # pragma: no cover
                raise ValueError(p["kind"])
        self._mods = mods

    def __call__(self, x: jax.Array, time_cond: jax.Array, cond: Optional[jax.Array] = None,
                 cond_mask: Optional[jax.Array] = None) -> jax.Array:
        """x: (B, H, W, C*num_frames) noise; cond: (B, H, W, C*num_frames_cond).

        time_cond: (B,) integer diffusion step labels.
        Mirrors ncsnpp_more.py:251-392.
        """
        spec = self.spec
        mods = self._mods
        m_idx = 0
        num_resolutions = len(spec.ch_mult)

        if cond is not None:
            x = jnp.concatenate([x, cond], axis=-1)
        x = x.astype(self.dtype)

        if spec.embedding_type == "fourier":
            # continuous noise levels: temb = GFP(log sigma)
            # (ncsnpp_more.py:264-268)
            temb = mods[m_idx](jnp.log(time_cond.astype(jnp.float32))).astype(self.dtype)
            m_idx += 1
        else:
            temb = get_timestep_embedding(time_cond, spec.ngf).astype(self.dtype)
        if spec.time_conditional:
            temb = mods[m_idx](temb)
            m_idx += 1
            temb = mods[m_idx](nn.silu(temb))
            m_idx += 1
            if spec.cond_emb:
                # binary mask embedding concatenated to temb (ncsnpp_more.py:282-285)
                if cond_mask is None:
                    cond_mask = jnp.ones((x.shape[0],), jnp.int32)
                temb = jnp.concatenate([temb, mods[m_idx](cond_mask.astype(jnp.int32))], axis=1)
                m_idx += 1
        else:
            temb = None

        hs = [mods[m_idx](x)]
        m_idx += 1
        for i_level in range(num_resolutions):
            for _ in range(spec.num_res_blocks):
                h = mods[m_idx](hs[-1], temb)
                m_idx += 1
                if h.shape[2] in spec.attn_resolutions:  # spatial width (NHWC)
                    h = mods[m_idx](h)
                    m_idx += 1
                hs.append(h)
            if i_level != num_resolutions - 1:
                h = mods[m_idx](hs[-1], temb)
                m_idx += 1
                hs.append(h)

        h = hs[-1]
        h = mods[m_idx](h, temb)
        m_idx += 1
        h = mods[m_idx](h)
        m_idx += 1
        h = mods[m_idx](h, temb)
        m_idx += 1

        for i_level in reversed(range(num_resolutions)):
            for _ in range(spec.num_res_blocks + 1):
                prev = hs.pop()
                h = mods[m_idx](jnp.concatenate([h, prev], axis=-1), temb)
                m_idx += 1
            if h.shape[2] in spec.attn_resolutions:
                h = mods[m_idx](h)
                m_idx += 1
            if i_level != 0:
                h = mods[m_idx](h, temb)
                m_idx += 1

        assert not hs
        h = mods[m_idx](h)
        m_idx += 1
        h = mods[m_idx](h)
        m_idx += 1
        assert m_idx == len(mods)
        return h


def make_schedule(cfg: Config) -> dict:
    """Noise-schedule buffers (ncsnpp_more.py:735-749 + models/__init__.py:17-36).

    linear: betas = linspace(sigma_begin, sigma_end, T);
            alphas[i] = prod_{m>=i}(1 - betas[m]) (flip-cumprod-flip)
    cosine: alphas directly from the cosine profile.
    Returned as float64 numpy; samplers cast as needed.
    """
    T = cfg.model.num_classes
    dist = cfg.model.sigma_dist
    if dist == "linear":
        betas = np.linspace(cfg.model.sigma_begin, cfg.model.sigma_end, T, dtype=np.float64)
        alphas = np.cumprod(1.0 - betas[::-1])[::-1].copy()
        alphas_prev = np.concatenate([alphas[1:], [1.0]])
    elif dist == "cosine":
        t = np.linspace(T, 0, T + 1, dtype=np.float64) / T
        s = 0.008
        f = np.cos((t + s) / (1 + s) * np.pi / 2) ** 2
        alphas = f[:-1] / f[-1]
        alphas_prev = np.concatenate([alphas[1:], [1.0]])
        betas = 1.0 - alphas / alphas_prev
    elif dist == "geometric":
        betas = np.logspace(np.log10(cfg.model.sigma_begin), np.log10(cfg.model.sigma_end), T)
        alphas = np.cumprod(1.0 - betas[::-1])[::-1].copy()
        alphas_prev = np.concatenate([alphas[1:], [1.0]])
    else:
        raise NotImplementedError(dist)
    return {"betas": betas, "alphas": alphas, "alphas_prev": alphas_prev}


class UNetMoreDDPM(nn.Module):
    """Wrapper holding the UNet + noise schedule (ncsnpp_more.py:721-770).

    ``noise_in_cond`` (off in the shipped config) perturbs the conditioning
    frames with forward-process noise; it needs an rng passed via
    ``apply(..., rngs={'noise': key})``.
    """

    cfg: Config
    dtype: Any = jnp.float32

    def setup(self):
        arch = self.cfg.model.arch
        if self.cfg.model.spade:
            from tvc.models.diffusion.spade import SPADENCSNpp

            self.unet = SPADENCSNpp(cfg=self.cfg, dtype=self.dtype, name="unet")
        elif arch in ("unetmore3d", "unetmorepseudo3d"):
            from tvc.models.diffusion.ncsnpp3d import NCSNpp3D

            self.unet = NCSNpp3D(cfg=self.cfg, pseudo3d=(arch == "unetmorepseudo3d"),
                                 dtype=self.dtype, name="unet")
        else:
            self.unet = NCSNpp(spec=NCSNppSpec.from_config(self.cfg), dtype=self.dtype, name="unet")
        sched = make_schedule(self.cfg)
        self.alphas = jnp.asarray(sched["alphas"], dtype=jnp.float32)

    def __call__(self, x, y, cond=None, cond_mask=None):
        if self.cfg.model.noise_in_cond and cond is not None:
            used = self.alphas[y].reshape((cond.shape[0],) + (1,) * (cond.ndim - 1))
            z = jax.random.normal(self.make_rng("noise"), cond.shape, cond.dtype)
            cond = jnp.sqrt(used) * cond + jnp.sqrt(1.0 - used) * z
        return self.unet(x, y, cond, cond_mask=cond_mask)
