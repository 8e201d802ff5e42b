"""PyTorch -> Flax checkpoint conversion.

Converts the reference's artifacts (SURVEY.md §2.9) into tvc param trees:

- diffusion checkpoint `checkpoint_<id>.pt`: a list whose [0] is a
  DataParallel state dict ("module."-prefixed) and [-1] the EMA shadow dict
  (city_sender.py:306-324); module indices follow `all_modules` ordering,
  mirrored 1:1 by tvc's `m{i}` naming (tvc/models/diffusion/ncsnpp.py).
- ELIC codec checkpoints `q.pth.tar` (Network.py:307-334): g_a/g_s/h_a/h_s,
  cc_transforms, context_prediction, ParamAggregation, entropy_bottleneck
  learnable params. compressai's registered CDF buffers are NOT converted —
  tvc rebuilds quantized CDFs from the learned parameters (FactorizedCoder.update).

Conventions:
  conv weight   (O,I,kh,kw)   -> kernel (kh,kw,I,O)
  deconv weight (I,O,kh,kw)   -> kernel (kh,kw,O,I)   [flax transpose_kernel]
  linear weight (O,I)         -> kernel (I,O)
  groupnorm     weight/bias   -> gn.scale / gn.bias
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np

from tvc.core.config import Config
from tvc.models.diffusion.ncsnpp import NCSNppSpec, _build_plan


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def _conv(sd, key) -> Dict[str, np.ndarray]:
    out = {"kernel": _np(sd[f"{key}.weight"]).transpose(2, 3, 1, 0)}
    if f"{key}.bias" in sd:
        out["bias"] = _np(sd[f"{key}.bias"])
    return out


def _deconv(sd, key) -> Dict[str, np.ndarray]:
    out = {"kernel": _np(sd[f"{key}.weight"]).transpose(2, 3, 1, 0)}
    if f"{key}.bias" in sd:
        out["bias"] = _np(sd[f"{key}.bias"])
    return out


def _dense(sd, key) -> Dict[str, np.ndarray]:
    return {"kernel": _np(sd[f"{key}.weight"]).T, "bias": _np(sd[f"{key}.bias"])}


def _gn(sd, key) -> Dict[str, Any]:
    return {"gn": {"scale": _np(sd[f"{key}.weight"]), "bias": _np(sd[f"{key}.bias"])}}


def _nin(sd, key) -> Dict[str, np.ndarray]:
    return {"W": _np(sd[f"{key}.W"]), "b": _np(sd[f"{key}.b"])}


# --------------------------------------------------------------------------
# NCSN++ UNet
# --------------------------------------------------------------------------


def convert_unet_state_dict(cfg: Config, sd: Dict[str, Any]) -> Dict[str, Any]:
    """Map an `all_modules`-style state dict onto {'params': {'unet': ...}}."""
    # normalize prefixes: DataParallel "module." and wrapper "unet."
    norm = {}
    for k, v in sd.items():
        k2 = k
        if k2.startswith("module."):
            k2 = k2[len("module."):]
        norm[k2] = v
    sd = norm
    prefix = "unet.all_modules" if any(k.startswith("unet.all_modules") for k in sd) else "all_modules"

    spec = NCSNppSpec.from_config(cfg)
    plan = _build_plan(spec)
    unet: Dict[str, Any] = {}

    for i, p in enumerate(plan):
        key = f"{prefix}.{i}"
        kind = p["kind"]
        if kind == "dense":
            unet[f"m{i}"] = _dense(sd, key)
        elif kind == "embed":
            unet[f"m{i}"] = {"embedding": _np(sd[f"{key}.weight"])}
        elif kind == "conv3":
            unet[f"m{i}"] = {"conv": _conv(sd, key)}
        elif kind == "attn":
            unet[f"m{i}"] = {
                "GroupNorm_0": _gn(sd, f"{key}.GroupNorm_0"),
                "NIN_0": _nin(sd, f"{key}.NIN_0"),
                "NIN_1": _nin(sd, f"{key}.NIN_1"),
                "NIN_2": _nin(sd, f"{key}.NIN_2"),
                "NIN_3": _nin(sd, f"{key}.NIN_3"),
            }
        elif kind == "res":
            m: Dict[str, Any] = {
                "actnorm0": {"Dense_0": _dense(sd, f"{key}.actnorm0.Dense_0")},
                "Conv_0": {"conv": _conv(sd, f"{key}.Conv_0")},
                "actnorm1": {"Dense_0": _dense(sd, f"{key}.actnorm1.Dense_0")},
                "Conv_1": {"conv": _conv(sd, f"{key}.Conv_1")},
            }
            if f"{key}.Conv_2.weight" in sd:
                m["Conv_2"] = {"conv": _conv(sd, f"{key}.Conv_2")}
            unet[f"m{i}"] = m
        elif kind == "actnorm":
            unet[f"m{i}"] = {"Norm_0": _gn(sd, f"{key}.Norm_0")}
        else:  # pragma: no cover
            raise ValueError(kind)

    return {"params": {"unet": unet}}


def load_diffusion_checkpoint(path: str, cfg: Config, use_ema: bool = True) -> Dict[str, Any]:
    """torch.load a reference checkpoint list; [0]=weights, [-1]=EMA shadow
    (city_sender.py:306-324)."""
    import torch

    states = torch.load(path, map_location="cpu")
    sd = states[-1] if (use_ema and cfg.model.ema) else states[0]
    return convert_unet_state_dict(cfg, sd)


# --------------------------------------------------------------------------
# SPADE NCSN++ (`model.spade: true`, ncsnpp_more.py:396-718)
# --------------------------------------------------------------------------


def _spade_actnorm(sd, key) -> Dict[str, Any]:
    """get_act_norm 'spade' mode (layerspp.py:486-549 + MySPADE :101-173):
    Dense_0 (when emb-conditioned) + Norm_0 = {mlp_shared.0, mlp_gamma,
    mlp_beta} convs; param_free_norm is affine-free (no params)."""
    m: Dict[str, Any] = {
        "Norm_0": {
            "mlp_shared": {"conv": _conv(sd, f"{key}.Norm_0.mlp_shared.0")},
            "mlp_gamma": {"conv": _conv(sd, f"{key}.Norm_0.mlp_gamma")},
            "mlp_beta": {"conv": _conv(sd, f"{key}.Norm_0.mlp_beta")},
        }
    }
    if f"{key}.Dense_0.weight" in sd:
        m["Dense_0"] = _dense(sd, f"{key}.Dense_0")
    return m


def convert_spade_state_dict(cfg: Config, sd: Dict[str, Any]) -> Dict[str, Any]:
    """Map a SPADE_NCSNpp `all_modules` state dict onto tvc's SPADENCSNpp.

    The SPADE variant appends modules in the same order as NCSNpp
    (ncsnpp_more.py:396-718 mirrors :70-249), so the NCSN++ plan drives the
    walk; only the res-block and final-norm leaves differ."""
    norm = {}
    for k, v in sd.items():
        if k.startswith("module."):
            k = k[len("module."):]
        norm[k] = v
    sd = norm
    prefix = "unet.all_modules" if any(k.startswith("unet.all_modules") for k in sd) else "all_modules"

    spec = NCSNppSpec.from_config(cfg)
    plan = _build_plan(spec)
    unet: Dict[str, Any] = {}
    for i, p in enumerate(plan):
        key = f"{prefix}.{i}"
        kind = p["kind"]
        if kind == "dense":
            unet[f"m{i}"] = _dense(sd, key)
        elif kind == "embed":
            unet[f"m{i}"] = {"embedding": _np(sd[f"{key}.weight"])}
        elif kind == "conv3":
            unet[f"m{i}"] = {"conv": _conv(sd, key)}
        elif kind == "attn":
            unet[f"m{i}"] = {
                "GroupNorm_0": _gn(sd, f"{key}.GroupNorm_0"),
                "NIN_0": _nin(sd, f"{key}.NIN_0"),
                "NIN_1": _nin(sd, f"{key}.NIN_1"),
                "NIN_2": _nin(sd, f"{key}.NIN_2"),
                "NIN_3": _nin(sd, f"{key}.NIN_3"),
            }
        elif kind == "res":
            m: Dict[str, Any] = {
                "actnorm0": _spade_actnorm(sd, f"{key}.actnorm0"),
                "Conv_0": {"conv": _conv(sd, f"{key}.Conv_0")},
                "actnorm1": _spade_actnorm(sd, f"{key}.actnorm1"),
                "Conv_1": {"conv": _conv(sd, f"{key}.Conv_1")},
            }
            if f"{key}.Conv_2.weight" in sd:
                m["Conv_2"] = {"conv": _conv(sd, f"{key}.Conv_2")}
            unet[f"m{i}"] = m
        elif kind == "actnorm":
            unet[f"m{i}"] = _spade_actnorm(sd, key)
        else:  # pragma: no cover
            raise ValueError(kind)
    return {"params": {"unet": unet}}


# --------------------------------------------------------------------------
# 3D / pseudo-3D NCSN++ (`arch: unetmore3d` / `unetmorepseudo3d`)
# --------------------------------------------------------------------------


def _build_plan_3d(cfg: Config) -> list:
    """Ordered `all_modules` list for the is3d archs (ncsnpp_more.py:130-250):
    like the 2D plan but widths scale with the frame count (nf = ngf*n_frames,
    numf = ngf*num_frames, :50-51), a 1x1 frame converter sits after the mid
    attention (:215-218) and before every skip-connection res block
    (:226-232), and the up path carries num_frames."""
    num_frames = cfg.data.num_frames
    n_frames = num_frames + cfg.data.num_frames_cond + cfg.data.num_frames_future
    nf = cfg.model.ngf * n_frames
    numf = cfg.model.ngf * num_frames
    ch_mult = cfg.model.ch_mult
    num_res = len(ch_mult)
    all_res = [cfg.data.image_size // (2 ** i) for i in range(num_res)]

    plan: list = []
    if cfg.model.time_conditional:
        plan.append({"kind": "dense", "in": nf, "out": nf * 4})
        plan.append({"kind": "dense", "in": nf * 4, "out": nf * 4})

    plan.append({"kind": "conv3", "in": cfg.data.channels * n_frames, "out": nf,
                 "frames": n_frames})
    hs_c = [nf]
    in_ch = nf
    for i_level in range(num_res):
        for _ in range(cfg.model.num_res_blocks):
            out_ch = nf * ch_mult[i_level]
            plan.append({"kind": "res", "in": in_ch, "out": out_ch, "frames": n_frames})
            in_ch = out_ch
            if all_res[i_level] in cfg.model.attn_resolutions:
                plan.append({"kind": "attn", "ch": in_ch, "frames": n_frames})
            hs_c.append(in_ch)
        if i_level != num_res - 1:
            plan.append({"kind": "res", "in": in_ch, "out": in_ch, "down": True,
                         "frames": n_frames})
            hs_c.append(in_ch)

    plan.append({"kind": "res", "in": in_ch, "out": in_ch, "frames": n_frames})
    plan.append({"kind": "attn", "ch": in_ch, "frames": n_frames})
    plan.append({"kind": "converter", "in": n_frames, "out": num_frames})
    in_ch = in_ch // n_frames * num_frames
    plan.append({"kind": "res", "in": in_ch, "out": in_ch, "frames": num_frames})

    for i_level in reversed(range(num_res)):
        for _ in range(cfg.model.num_res_blocks + 1):
            out_ch = numf * ch_mult[i_level]
            plan.append({"kind": "converter", "in": n_frames, "out": num_frames})
            in_ch_old = hs_c.pop() // n_frames * num_frames
            plan.append({"kind": "res", "in": in_ch + in_ch_old, "out": out_ch,
                         "frames": num_frames})
            in_ch = out_ch
        if all_res[i_level] in cfg.model.attn_resolutions:
            plan.append({"kind": "attn", "ch": in_ch, "frames": num_frames})
        if i_level != 0:
            plan.append({"kind": "res", "in": in_ch, "out": in_ch, "up": True,
                         "frames": num_frames})

    assert not hs_c
    plan.append({"kind": "actnorm", "ch": in_ch, "frames": num_frames})
    plan.append({"kind": "conv3", "in": in_ch,
                 "out": cfg.data.channels * num_frames, "frames": num_frames})
    return plan


def _conv3d(sd, key) -> Dict[str, Any]:
    """MyConv3d: .conv is a torch Conv3d, weight (Co,Ci,kd,kh,kw)
    (layers3d.py:225-242) -> flax NDHWC kernel (kd,kh,kw,Ci,Co)."""
    out = {"kernel": _np(sd[f"{key}.conv.weight"]).transpose(2, 3, 4, 1, 0)}
    if f"{key}.conv.bias" in sd:
        out["bias"] = _np(sd[f"{key}.conv.bias"])
    return {"conv": out}


def _pseudo3d(sd, key) -> Dict[str, Any]:
    """PseudoConv3d: space_conv (2D) + time_conv (1D, weight (Co,Co,kt) ->
    flax (kt,Ci,Co)) (layers3d.py:258-301)."""
    return {
        "spatial": _conv(sd, f"{key}.space_conv"),
        "temporal": {
            "kernel": _np(sd[f"{key}.time_conv.weight"]).transpose(2, 1, 0),
            "bias": _np(sd[f"{key}.time_conv.bias"]),
        },
    }


def _attn_leaves(sd, key) -> Dict[str, Any]:
    return {
        "GroupNorm_0": _gn(sd, f"{key}.GroupNorm_0"),
        "NIN_0": _nin(sd, f"{key}.NIN_0"),
        "NIN_1": _nin(sd, f"{key}.NIN_1"),
        "NIN_2": _nin(sd, f"{key}.NIN_2"),
        "NIN_3": _nin(sd, f"{key}.NIN_3"),
    }


def convert_3d_state_dict(cfg: Config, sd: Dict[str, Any],
                          pseudo3d: bool = False) -> Dict[str, Any]:
    """Map an is3d `all_modules` state dict (arch unetmore3d/unetmorepseudo3d)
    onto tvc's NCSNpp3D param tree. Leaf layouts: MyConv3d / PseudoConv3d
    (layers3d.py:225-301), factorized space+time attention (:191-223), frame
    converters = plain 2D conv1x1 over the frame axis (ncsnpp_more.py:217)."""
    norm = {}
    for k, v in sd.items():
        if k.startswith("module."):
            k = k[len("module."):]
        norm[k] = v
    sd = norm
    prefix = "unet.all_modules" if any(k.startswith("unet.all_modules") for k in sd) else "all_modules"
    conv_leaf = _pseudo3d if pseudo3d else _conv3d

    plan = _build_plan_3d(cfg)
    unet: Dict[str, Any] = {}
    for i, p in enumerate(plan):
        key = f"{prefix}.{i}"
        kind = p["kind"]
        if kind == "dense":
            unet[f"m{i}"] = _dense(sd, key)
        elif kind == "conv3":
            unet[f"m{i}"] = conv_leaf(sd, key)
        elif kind == "converter":
            # layerspp.conv1x1: weight (n_out, n_in, 1, 1) -> kernel (n_in, n_out)
            unet[f"m{i}"] = {
                "kernel": _np(sd[f"{key}.weight"])[:, :, 0, 0].T,
                "bias": _np(sd[f"{key}.bias"]),
            }
        elif kind == "attn":
            unet[f"m{i}"] = {
                "space_att": _attn_leaves(sd, f"{key}.space_att"),
                "time_att": _attn_leaves(sd, f"{key}.time_att"),
            }
        elif kind == "res":
            m: Dict[str, Any] = {
                "Conv_0": conv_leaf(sd, f"{key}.Conv_0"),
                "Conv_1": conv_leaf(sd, f"{key}.Conv_1"),
            }
            for an in ("actnorm0", "actnorm1"):
                if f"{key}.{an}.Dense_0.weight" in sd:
                    m[an] = {"Dense_0": _dense(sd, f"{key}.{an}.Dense_0")}
                else:  # affine GroupNorm when not time-conditional
                    m[an] = {"Norm_0": _gn(sd, f"{key}.{an}.Norm_0")}
            if f"{key}.Conv_2.conv.weight" in sd or f"{key}.Conv_2.space_conv.weight" in sd:
                m["Conv_2"] = conv_leaf(sd, f"{key}.Conv_2")
            unet[f"m{i}"] = m
        elif kind == "actnorm":
            unet[f"m{i}"] = {"Norm_0": _gn(sd, f"{key}.Norm_0")}
        else:  # pragma: no cover
            raise ValueError(kind)
    return {"params": {"unet": unet}}


# --------------------------------------------------------------------------
# Legacy UNet (`arch: unet`, models/unet.py:175-299)
# --------------------------------------------------------------------------


def _legacy_gn(sd, key) -> Dict[str, Any]:
    return {"gn": {"scale": _np(sd[f"{key}.weight"]), "bias": _np(sd[f"{key}.bias"])}}


def _legacy_nin(sd, key) -> Dict[str, np.ndarray]:
    # torch Nin stores weights (out, in) + bias (models/unet.py:53-57);
    # tvc uses nn.Dense -> kernel (in, out)
    return {"kernel": _np(sd[f"{key}.weights"]).T, "bias": _np(sd[f"{key}.bias"])}


def _legacy_res(sd, key) -> Dict[str, Any]:
    m: Dict[str, Any] = {
        "norm1": _legacy_gn(sd, f"{key}.normalize0"),
        "conv1": _conv(sd, f"{key}.conv0"),
        "norm2": _legacy_gn(sd, f"{key}.normalize1"),
        "conv2": _conv(sd, f"{key}.conv1"),
    }
    if f"{key}.dense.weight" in sd:
        m["temb_proj"] = _dense(sd, f"{key}.dense")
    if f"{key}.nin.weights" in sd:
        m["nin"] = _legacy_nin(sd, f"{key}.nin")
    return m


def _legacy_attn(sd, key) -> Dict[str, Any]:
    return {
        "norm": _legacy_gn(sd, f"{key}.normalize"),
        "q": _legacy_nin(sd, f"{key}.Q"),
        "k": _legacy_nin(sd, f"{key}.K"),
        "v": _legacy_nin(sd, f"{key}.V"),
        "proj": _legacy_nin(sd, f"{key}.OUT"),
    }


def convert_legacy_unet_state_dict(cfg: Config, sd: Dict[str, Any]) -> Dict[str, Any]:
    """Map a legacy `UNet` state dict (models/unet.py:175-299, wrapped by
    UNet_SMLD/UNet_DDPM as `unet.`) onto {'params': {'unet': ...}}.

    The torch net appends modules to flat downblocks/middleblocks/upblocks
    ModuleLists; the converter replays the construction loop to recover which
    index is which."""
    norm = {}
    for k, v in sd.items():
        if k.startswith("module."):
            k = k[len("module."):]
        norm[k] = v
    sd = norm
    pre = "unet." if any(k.startswith("unet.") for k in sd) else ""

    mults = {"deep": (1, 2, 2, 2), "deeper": (1, 2, 2, 4, 4),
             "deepest": (1, 2, 2, 2, 4, 4)}[cfg.model.depth]
    unet: Dict[str, Any] = {}

    # DOWN (models/unet.py:206-223): conv_in, then per level 2x(res [+attn at
    # i==1]) and a stride-2 conv between levels
    unet["conv_in"] = _conv(sd, f"{pre}downblocks.0")
    idx, k = 1, 0
    for i in range(len(mults)):
        for _ in range(2):
            unet[f"down_res{k}"] = _legacy_res(sd, f"{pre}downblocks.{idx}")
            idx += 1
            if i == 1:
                unet[f"down_attn{k}"] = _legacy_attn(sd, f"{pre}downblocks.{idx}")
                idx += 1
            k += 1
        if i != len(mults) - 1:
            unet[f"down_conv{i}"] = _conv(sd, f"{pre}downblocks.{idx}")
            idx += 1

    # MIDDLE (models/unet.py:226-229)
    unet["mid_res1"] = _legacy_res(sd, f"{pre}middleblocks.0")
    unet["mid_attn"] = _legacy_attn(sd, f"{pre}middleblocks.1")
    unet["mid_res2"] = _legacy_res(sd, f"{pre}middleblocks.2")

    # UP (models/unet.py:232-240): per reversed level 3x(res [+attn]) then
    # Upsample (.conv) between levels
    idx, k = 0, 0
    for i in reversed(range(len(mults))):
        for _ in range(3):
            unet[f"up_res{k}"] = _legacy_res(sd, f"{pre}upblocks.{idx}")
            idx += 1
            if i == 1:
                unet[f"up_attn{k}"] = _legacy_attn(sd, f"{pre}upblocks.{idx}")
                idx += 1
            k += 1
        if i != 0:
            unet[f"up_conv{i}"] = _conv(sd, f"{pre}upblocks.{idx}.conv")
            idx += 1

    unet["norm_out"] = _legacy_gn(sd, f"{pre}normalize")
    unet["conv_out"] = _conv(sd, f"{pre}out")
    if f"{pre}temb_dense.0.weight" in sd:
        unet["temb_dense1"] = _dense(sd, f"{pre}temb_dense.0")
        unet["temb_dense2"] = _dense(sd, f"{pre}temb_dense.2")
    return {"params": {"unet": unet}}


# --------------------------------------------------------------------------
# ELIC codec
# --------------------------------------------------------------------------

_RBB_CONVS = ("conv1", "conv2", "conv3")


def _residual_unit(sd, key) -> Dict[str, Any]:
    # torch ResidualUnit: .conv Sequential indices 0, 2, 4
    return {str(j): {"conv": _conv(sd, f"{key}.conv.{j}")} for j in (0, 2, 4)}


def _attention_block(sd, key) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    for k in range(3):
        out[f"conv_a_{k}"] = _residual_unit(sd, f"{key}.conv_a.{k}")
        out[f"conv_b_{k}"] = _residual_unit(sd, f"{key}.conv_b.{k}")
    out["conv_b_3"] = {"conv": _conv(sd, f"{key}.conv_b.3")}
    return out


def _rbb(sd, key) -> Dict[str, Any]:
    return {c: {"conv": _conv(sd, f"{key}.{c}")} for c in _RBB_CONVS}


def convert_elic_state_dict(sd: Dict[str, Any], groups=(16, 16, 32, 64, 192)) -> Dict[str, Any]:
    """Map a TestModel state dict onto tvc's ELICModel param tree."""
    sd = {k: v for k, v in sd.items()}
    params: Dict[str, Any] = {}

    # g_a / g_s layouts (Network.py:88-122): indices of each layer kind
    ga_kinds = ["conv", "rbb", "rbb", "rbb", "conv", "rbb", "rbb", "rbb", "attn",
                "conv", "rbb", "rbb", "rbb", "conv", "attn"]
    gs_kinds = ["attn", "deconv", "rbb", "rbb", "rbb", "deconv", "attn", "rbb",
                "rbb", "rbb", "deconv", "rbb", "rbb", "rbb", "deconv"]
    for name, kinds in (("g_a", ga_kinds), ("g_s", gs_kinds)):
        for i, kind in enumerate(kinds):
            key = f"{name}.{i}"
            if kind == "conv":
                params[f"{name}_{i}"] = {"conv": _conv(sd, key)}
            elif kind == "deconv":
                params[f"{name}_{i}"] = {"conv": _deconv(sd, key)}
            elif kind == "rbb":
                params[f"{name}_{i}"] = _rbb(sd, key)
            else:
                params[f"{name}_{i}"] = _attention_block(sd, key)

    for i in (0, 2, 4):
        params[f"h_a_{i}"] = {"conv": _conv(sd, f"h_a.{i}")}
    params["h_s_0"] = {"conv": _deconv(sd, "h_s.0")}
    params["h_s_2"] = {"conv": _deconv(sd, "h_s.2")}
    params["h_s_4"] = {"conv": _conv(sd, "h_s.4")}

    for i in range(len(groups) - 1):
        for j in (0, 2, 4):
            params[f"cc_{i}_{j}"] = {"conv": _conv(sd, f"cc_transforms.{i}.{j}")}
    for i in range(len(groups)):
        params[f"ctx_{i}"] = {
            "weight": _np(sd[f"context_prediction.{i}.weight"]).transpose(2, 3, 1, 0),
            "bias": _np(sd[f"context_prediction.{i}.bias"]),
        }
        for j in (0, 2, 4):
            params[f"agg_{i}_{j}"] = {"conv": _conv(sd, f"ParamAggregation.{i}.{j}")}

    eb: Dict[str, Any] = {"quantiles": _np(sd["entropy_bottleneck.quantiles"])}
    k = 0
    while f"entropy_bottleneck._matrices.{k}" in sd:
        eb[f"matrix_{k}"] = _np(sd[f"entropy_bottleneck._matrices.{k}"])
        eb[f"bias_{k}"] = _np(sd[f"entropy_bottleneck._biases.{k}"])
        if f"entropy_bottleneck._factors.{k}" in sd:
            eb[f"factor_{k}"] = _np(sd[f"entropy_bottleneck._factors.{k}"])
        k += 1
    params["entropy_bottleneck"] = eb

    return {"params": params}


def load_codec_checkpoint(path: str, groups=(16, 16, 32, 64, 192)) -> Dict[str, Any]:
    import torch

    sd = torch.load(path, map_location="cpu")
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return convert_elic_state_dict(sd, groups=groups)


# --------------------------------------------------------------------------
# NCSNv2 refinement blocks (tvc/models/diffusion/ncsnv2_blocks.py)
# --------------------------------------------------------------------------
#
# Dead code on every shipped reference config, carried for library parity
# (reference models/better/layers.py:122-338). Key layout:
#   CRPBlock     torch `convs.{i}.weight`        -> `convs_{i}/conv/kernel`
#   RCUBlock     torch `{i+1}_{j+1}_conv.weight` -> `conv_{i}_{j}/conv/kernel`
#   MSFBlock     torch `convs.{i}.{weight,bias}` -> `convs_{i}/{conv/kernel,bias}`
#   RefineBlock  `adapt_convs.{i}.*`->`adapt_{i}/*`, `output_convs.*`->`output/*`,
#                `msf.*`->`msf/*`, `crp.*`->`crp/*`


def _ncsn_conv(sd, key) -> Dict[str, Any]:
    out: Dict[str, Any] = {"conv": {"kernel": _np(sd[f"{key}.weight"]).transpose(2, 3, 1, 0)}}
    if f"{key}.bias" in sd:
        out["bias"] = _np(sd[f"{key}.bias"])
    return out


def convert_crp_state_dict(sd: Dict[str, Any], n_stages: int, prefix: str = "") -> Dict[str, Any]:
    return {f"convs_{i}": _ncsn_conv(sd, f"{prefix}convs.{i}") for i in range(n_stages)}


def convert_rcu_state_dict(sd: Dict[str, Any], n_blocks: int, n_stages: int,
                           prefix: str = "") -> Dict[str, Any]:
    return {
        f"conv_{i}_{j}": _ncsn_conv(sd, f"{prefix}{i + 1}_{j + 1}_conv")
        for i in range(n_blocks) for j in range(n_stages)
    }


def convert_msf_state_dict(sd: Dict[str, Any], n_inputs: int, prefix: str = "") -> Dict[str, Any]:
    return {f"convs_{i}": _ncsn_conv(sd, f"{prefix}convs.{i}") for i in range(n_inputs)}


def convert_refine_state_dict(sd: Dict[str, Any], n_inputs: int,
                              end: bool = False, prefix: str = "") -> Dict[str, Any]:
    params: Dict[str, Any] = {}
    for i in range(n_inputs):
        params[f"adapt_{i}"] = convert_rcu_state_dict(sd, 2, 2, f"{prefix}adapt_convs.{i}.")
    params["output"] = convert_rcu_state_dict(sd, 3 if end else 1, 2, f"{prefix}output_convs.")
    if n_inputs > 1:
        params["msf"] = convert_msf_state_dict(sd, n_inputs, f"{prefix}msf.")
    params["crp"] = convert_crp_state_dict(sd, 2, f"{prefix}crp.")
    return params
