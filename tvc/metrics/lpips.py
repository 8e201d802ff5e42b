"""LPIPS perceptual metric in Flax (AlexNet backbone + learned linear heads).

Re-implements the capability of the pip `lpips` package used on the sender
path (city_sender.py:302,389) and the vendored net-lin stack used by the
anchor benchmark (models/networks_basic.py:25-179). Weights are converted from
PyTorch checkpoints at runtime (`load_lpips_weights`): the linear heads ship
with the reference at `weights/v0.1/alex.pth`; the AlexNet backbone comes from
a torchvision `alexnet` state dict supplied by the user (no network access is
assumed). Without weights the module runs with random parameters — fine for
pipeline plumbing/tests, NOT a calibrated perceptual metric (flagged by
`calibrated=False` on the handle).

Reference quirk preserved: the sender feeds [0,1] frames straight into LPIPS
without rescaling to [-1,1] (city_sender.py:389,567-568); `lpips_video` does
the same to stay comparable.
"""

from __future__ import annotations

import dataclasses
from typing import Any, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# ImageNet scaling constants (lpips ScalingLayer)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

_ALEX_TAPS = (64, 192, 384, 256, 256)


class AlexNetFeatures(nn.Module):
    """torchvision AlexNet `features` trunk, returning the 5 relu taps. NHWC."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> List[jax.Array]:
        taps = []
        x = nn.Conv(64, (11, 11), strides=(4, 4), padding=((2, 2), (2, 2)),
                    dtype=self.dtype, name="conv0")(x)
        x = nn.relu(x)
        taps.append(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = nn.Conv(192, (5, 5), padding=((2, 2), (2, 2)), dtype=self.dtype, name="conv1")(x)
        x = nn.relu(x)
        taps.append(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = nn.Conv(384, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name="conv2")(x)
        x = nn.relu(x)
        taps.append(x)
        x = nn.Conv(256, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name="conv3")(x)
        x = nn.relu(x)
        taps.append(x)
        x = nn.Conv(256, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name="conv4")(x)
        x = nn.relu(x)
        taps.append(x)
        return taps


def _make_backbone(net: str, dtype):
    if net == "alex":
        return AlexNetFeatures(dtype=dtype, name="net"), _ALEX_TAPS
    if net == "vgg":
        from tvc.metrics.backbones import VGG16Features, VGG_TAPS

        return VGG16Features(dtype=dtype, name="net"), VGG_TAPS
    if net == "squeeze":
        from tvc.metrics.backbones import SQUEEZE_TAPS, SqueezeNetFeatures

        return SqueezeNetFeatures(dtype=dtype, name="net"), SQUEEZE_TAPS
    raise ValueError(f"unknown LPIPS net: {net}")


class LPIPS(nn.Module):
    """net-lin LPIPS distance; inputs NHWC in [-1, 1]. net: alex|vgg|squeeze."""

    spatial: bool = False
    net_type: str = "alex"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x0: jax.Array, x1: jax.Array) -> jax.Array:
        shift = jnp.asarray(_SHIFT, self.dtype)
        scale = jnp.asarray(_SCALE, self.dtype)
        net, taps = _make_backbone(self.net_type, self.dtype)
        f0 = net((x0 - shift) / scale)
        f1 = net((x1 - shift) / scale)

        total = None
        for k, (a, b) in enumerate(zip(f0, f1)):
            # normalize_tensor semantics of the reference / pip lpips
            # (models/eval_models.py:35-37): eps OUTSIDE the sqrt,
            # x / (||x||_2 + 1e-10) — not sqrt(sum + eps)
            a = a / (jnp.sqrt(jnp.sum(a * a, axis=-1, keepdims=True)) + 1e-10)
            b = b / (jnp.sqrt(jnp.sum(b * b, axis=-1, keepdims=True)) + 1e-10)
            diff = (a - b) ** 2
            w = self.param(f"lin{k}", nn.initializers.constant(0.1), (1, 1, taps[k], 1))
            d = jax.lax.conv_general_dilated(
                diff, jnp.maximum(w.astype(self.dtype), 0.0), (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            if self.spatial:
                d = jax.image.resize(d, (d.shape[0],) + x0.shape[1:3] + (1,), "bilinear")
            else:
                d = jnp.mean(d, axis=(1, 2), keepdims=True)
            total = d if total is None else total + d
        return total[..., 0] if self.spatial else total[:, 0, 0, 0]


@dataclasses.dataclass
class LPIPSMetric:
    """Jitted LPIPS handle. `calibrated` is False when running random weights."""

    params: dict
    calibrated: bool
    spatial: bool = False
    net_type: str = "alex"

    def __post_init__(self):
        model = LPIPS(spatial=self.spatial, net_type=self.net_type)
        self.model = model  # raw module for in-program use (fused_gop)
        _fn = jax.jit(lambda p, a, b: model.apply({"params": p}, a, b))
        self._fn = lambda a, b: _fn(self.params, a, b)

    def __call__(self, a, b) -> jax.Array:
        """a, b: NHWC float arrays (see module docstring for range semantics)."""
        return self._fn(jnp.asarray(a, jnp.float32), jnp.asarray(b, jnp.float32))

    @classmethod
    def create(cls, alex_pth: Optional[str] = None, lin_pth: Optional[str] = None,
               spatial: bool = False, net_type: str = "alex") -> "LPIPSMetric":
        model = LPIPS(spatial=spatial, net_type=net_type)
        x = jnp.zeros((1, 64, 64, 3))
        params = model.init(jax.random.PRNGKey(0), x, x)["params"]
        calibrated = False
        if alex_pth is not None or lin_pth is not None:
            params, calibrated = load_lpips_weights(params, alex_pth, lin_pth,
                                                    net_type=net_type)
        return cls(params=dict(params), calibrated=calibrated, spatial=spatial,
                   net_type=net_type)


def load_lpips_weights(params: dict, alex_pth: Optional[str], lin_pth: Optional[str],
                       net_type: str = "alex"):
    """Convert torch state dicts into the Flax param tree.

    alex_pth: torchvision backbone state dict (alexnet / vgg16 / squeezenet1_1)
    lin_pth: lpips linear heads (keys `lin{k}.model.1.weight`, shipped with the
             reference at weights/v0.1/{alex,vgg,squeeze}.pth)
    """
    import torch

    params = jax.tree_util.tree_map(np.asarray, dict(params))
    loaded_any = False
    if alex_pth is not None:
        sd = torch.load(alex_pth, map_location="cpu")
        if net_type == "alex":
            conv_ids = [0, 3, 6, 8, 10]
            for i, cid in enumerate(conv_ids):
                params["net"][f"conv{i}"]["kernel"] = (
                    sd[f"features.{cid}.weight"].numpy().transpose(2, 3, 1, 0)
                )
                params["net"][f"conv{i}"]["bias"] = sd[f"features.{cid}.bias"].numpy()
        elif net_type == "vgg":
            from tvc.metrics.backbones import convert_vgg16

            params["net"] = convert_vgg16(params["net"], {k: v.numpy() for k, v in sd.items()})
        elif net_type == "squeeze":
            from tvc.metrics.backbones import convert_squeezenet

            params["net"] = convert_squeezenet(params["net"], {k: v.numpy() for k, v in sd.items()})
        loaded_any = True
    if lin_pth is not None:
        sd = torch.load(lin_pth, map_location="cpu")
        n_taps = sum(1 for k in params if k.startswith("lin"))
        for k in range(n_taps):
            key = f"lin{k}.model.1.weight"
            if key not in sd:  # older layouts
                key = f"lin{k}.weight"
            w = sd[key].numpy()  # (1, C, 1, 1)
            params[f"lin{k}"] = w.transpose(2, 3, 1, 0)
    calibrated = loaded_any and lin_pth is not None
    return params, calibrated


def lpips_video(metric: LPIPSMetric, video1: np.ndarray, video2: np.ndarray) -> List[float]:
    """Per-frame LPIPS on (T,H,W,C) [0,1] videos — fed raw, matching the
    sender's un-rescaled usage (city_sender.py:567-568)."""
    d = metric(jnp.asarray(video1), jnp.asarray(video2))
    return [float(v) for v in np.asarray(d)]
