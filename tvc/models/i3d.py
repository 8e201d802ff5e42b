"""InceptionI3d video feature network in Flax (NDHWC, TPU-native).

Port of the architecture defined at `models/fvd/pytorch_i3d.py` (the reference
runs a TorchScript binary of the same network for FVD, models/fvd/fvd.py:30-38;
the .py definition ships as the conversion path). TF-style SAME padding maps
directly onto `lax` SAME; BatchNorm runs in inference mode with stored stats.

Weight conversion (`load_i3d_weights`) consumes a pytorch_i3d-style state dict
(`...conv3d.weight`, `...bn.{weight,bias,running_mean,running_var}`).
"""

from __future__ import annotations

from typing import Any, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class Unit3D(nn.Module):
    """conv3d (no bias) + inference BatchNorm + relu (pytorch_i3d.py:37-107)."""

    out_ch: int
    kernel: Tuple[int, int, int] = (1, 1, 1)
    stride: Tuple[int, int, int] = (1, 1, 1)
    use_bn: bool = True
    relu: bool = True
    use_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.out_ch, self.kernel, strides=self.stride, padding="SAME",
                    use_bias=self.use_bias, dtype=self.dtype, name="conv3d")(x)
        if self.use_bn:
            scale = self.param("bn_scale", nn.initializers.ones, (self.out_ch,))
            bias = self.param("bn_bias", nn.initializers.zeros, (self.out_ch,))
            mean = self.param("bn_mean", nn.initializers.zeros, (self.out_ch,))
            var = self.param("bn_var", nn.initializers.ones, (self.out_ch,))
            x = (x - mean) * jax.lax.rsqrt(var + 1e-3) * scale + bias
        if self.relu:
            x = nn.relu(x)
        return x


def _max_pool_same(x, kernel, stride):
    return nn.max_pool(x, kernel, strides=stride, padding="SAME")


class InceptionModule(nn.Module):
    """4-branch inception block (pytorch_i3d.py:110-135)."""

    out: Tuple[int, int, int, int, int, int]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        o = self.out
        b0 = Unit3D(o[0], (1, 1, 1), dtype=self.dtype, name="b0")(x)
        b1 = Unit3D(o[1], (1, 1, 1), dtype=self.dtype, name="b1a")(x)
        b1 = Unit3D(o[2], (3, 3, 3), dtype=self.dtype, name="b1b")(b1)
        b2 = Unit3D(o[3], (1, 1, 1), dtype=self.dtype, name="b2a")(x)
        b2 = Unit3D(o[4], (3, 3, 3), dtype=self.dtype, name="b2b")(b2)
        b3 = _max_pool_same(x, (3, 3, 3), (1, 1, 1))
        b3 = Unit3D(o[5], (1, 1, 1), dtype=self.dtype, name="b3b")(b3)
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


class InceptionI3d(nn.Module):
    """I3D up to `Logits` (pytorch_i3d.py:140-320). Input: (B,T,H,W,C) in [-1,1]."""

    num_classes: int = 400
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = Unit3D(64, (7, 7, 7), (2, 2, 2), dtype=self.dtype, name="Conv3d_1a_7x7")(x)
        x = _max_pool_same(x, (1, 3, 3), (1, 2, 2))  # MaxPool3d_2a_3x3
        x = Unit3D(64, (1, 1, 1), dtype=self.dtype, name="Conv3d_2b_1x1")(x)
        x = Unit3D(192, (3, 3, 3), dtype=self.dtype, name="Conv3d_2c_3x3")(x)
        x = _max_pool_same(x, (1, 3, 3), (1, 2, 2))  # MaxPool3d_3a_3x3
        x = InceptionModule((64, 96, 128, 16, 32, 32), dtype=self.dtype, name="Mixed_3b")(x)
        x = InceptionModule((128, 128, 192, 32, 96, 64), dtype=self.dtype, name="Mixed_3c")(x)
        x = _max_pool_same(x, (3, 3, 3), (2, 2, 2))  # MaxPool3d_4a_3x3
        x = InceptionModule((192, 96, 208, 16, 48, 64), dtype=self.dtype, name="Mixed_4b")(x)
        x = InceptionModule((160, 112, 224, 24, 64, 64), dtype=self.dtype, name="Mixed_4c")(x)
        x = InceptionModule((128, 128, 256, 24, 64, 64), dtype=self.dtype, name="Mixed_4d")(x)
        x = InceptionModule((112, 144, 288, 32, 64, 64), dtype=self.dtype, name="Mixed_4e")(x)
        x = InceptionModule((256, 160, 320, 32, 128, 128), dtype=self.dtype, name="Mixed_4f")(x)
        x = _max_pool_same(x, (2, 2, 2), (2, 2, 2))  # MaxPool3d_5a_2x2
        x = InceptionModule((256, 160, 320, 32, 128, 128), dtype=self.dtype, name="Mixed_5b")(x)
        x = InceptionModule((384, 192, 384, 48, 128, 128), dtype=self.dtype, name="Mixed_5c")(x)
        # avg_pool (2,7,7) stride 1 VALID, then 1x1x1 logits conv with bias
        x = nn.avg_pool(x, (2, 7, 7), strides=(1, 1, 1), padding="VALID")
        x = Unit3D(self.num_classes, (1, 1, 1), use_bn=False, relu=False, use_bias=True,
                   dtype=self.dtype, name="logits")(x)
        # (B, T', 1, 1, classes) -> mean over remaining time -> (B, classes)
        return jnp.mean(x[:, :, 0, 0, :], axis=1)


_ENDPOINT_UNITS = {
    "Conv3d_1a_7x7": "Conv3d_1a_7x7",
    "Conv3d_2b_1x1": "Conv3d_2b_1x1",
    "Conv3d_2c_3x3": "Conv3d_2c_3x3",
}
_MIXED = ["Mixed_3b", "Mixed_3c", "Mixed_4b", "Mixed_4c", "Mixed_4d", "Mixed_4e",
          "Mixed_4f", "Mixed_5b", "Mixed_5c"]
_BRANCHES = ["b0", "b1a", "b1b", "b2a", "b2b", "b3b"]


def _convert_unit(params_unit: dict, sd: dict, prefix: str, has_bn: bool = True,
                  has_bias: bool = False) -> None:
    w = np.asarray(sd[f"{prefix}.conv3d.weight"])  # (O,I,T,H,W)
    params_unit["conv3d"]["kernel"] = w.transpose(2, 3, 4, 1, 0)
    if has_bias:
        params_unit["conv3d"]["bias"] = np.asarray(sd[f"{prefix}.conv3d.bias"])
    if has_bn:
        params_unit["bn_scale"] = np.asarray(sd[f"{prefix}.bn.weight"])
        params_unit["bn_bias"] = np.asarray(sd[f"{prefix}.bn.bias"])
        params_unit["bn_mean"] = np.asarray(sd[f"{prefix}.bn.running_mean"])
        params_unit["bn_var"] = np.asarray(sd[f"{prefix}.bn.running_var"])


def convert_tf_name(name: str) -> str:
    """TF I3D variable name -> torch-style dotted key (capability parity with
    models/fvd/convert_tf_pretrained.py:9-61, incl. the Mixed_5b branch-2
    typo special case)."""
    mapping = {
        "conv_3d": "conv3d",
        "batch_norm": "bn",
        "w:0": "weight",
        "b:0": "bias",
        "moving_mean:0": "running_mean",
        "moving_variance:0": "running_var",
        "beta:0": "bias",
    }
    segs = name.split("/")
    out: List[str] = []
    i = 0
    while i < len(segs):
        seg = segs[i]
        if "Mixed" in seg:
            out.append(seg)
        elif "Conv" in seg and "Mixed" not in name:
            out.append(seg)
        elif "Branch" in seg:
            branch_i = int(seg.split("_")[-1])
            i += 1
            seg = segs[i]
            if "Mixed_5b" in name and branch_i == 2:
                out.append(f"b{branch_i}a" if "1x1" in seg else f"b{branch_i}b")
            elif "a" in seg:
                out.append("b0" if branch_i == 0 else f"b{branch_i}a")
            elif "b" in seg:
                out.append(f"b{branch_i}b")
            else:
                raise ValueError(seg)
        elif seg == "Logits":
            out.append("logits")
            i += 1
        elif seg in mapping:
            out.append(mapping[seg])
        else:
            raise ValueError(f"no match for {seg} in {name}")
        i += 1
    return ".".join(out)


def tf_vars_to_state_dict(tf_vars: dict) -> dict:
    """{tf_name: np.ndarray} -> torch-style state dict (conv (O,I,T,H,W)).

    TF conv weights are (T,H,W,I,O); 1x1x1-spatial 5-D tensors squeeze to 1-D
    (convert_tf_pretrained.py:64-74). Consumes plain numpy — no tensorflow
    dependency needed (dump the hub module's variables to npz first)."""
    sd = {}
    for name, arr in tf_vars.items():
        arr = np.asarray(arr)
        key = convert_tf_name(name)
        if arr.ndim == 5:
            if all(s == 1 for s in arr.shape[:-1]):
                arr = arr.reshape(arr.shape[-1])
            else:
                arr = arr.transpose(4, 3, 0, 1, 2)
        sd[key] = arr
    return sd


def load_i3d_weights(params: dict, state_dict: dict) -> dict:
    """Fill a Flax InceptionI3d param tree from a pytorch_i3d state dict."""
    params = jax.tree_util.tree_map(np.asarray, dict(params))
    sd = {k: v for k, v in state_dict.items()}
    for ep in _ENDPOINT_UNITS:
        _convert_unit(params[ep], sd, f"end_points.{ep}" if f"end_points.{ep}.conv3d.weight" in sd else ep)
    for m in _MIXED:
        for br in _BRANCHES:
            prefix = f"end_points.{m}.{br}" if f"end_points.{m}.{br}.conv3d.weight" in sd else f"{m}.{br}"
            _convert_unit(params[m][br], sd, prefix)
    logits_prefix = "logits" if "logits.conv3d.weight" in sd else "logits"
    _convert_unit(params["logits"], sd, logits_prefix, has_bn=False, has_bias=True)
    return params
