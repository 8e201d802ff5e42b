"""Checkpoint-conversion tests.

Two layers of validation (no real reference checkpoints exist in this env):
1. per-layer convention parity: a torch layer and its flax counterpart with
   converted weights must produce identical outputs (the error-prone part:
   conv/deconv/linear/groupnorm weight layouts);
2. full-model key mapping: a synthetic torch-style state dict with the
   reference's key names/shapes converts into a tree accepted by
   model.apply with matching shapes everywhere.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from tvc.core.config import Config
from tvc.models.diffusion.ncsnpp import NCSNppSpec, UNetMoreDDPM, _build_plan
from tvc.utils.convert import (
    convert_elic_state_dict,
    convert_unet_state_dict,
)

RNG = np.random.RandomState(3)


def test_conv2d_layout_parity():
    tconv = torch.nn.Conv2d(3, 8, 5, stride=2, padding=2)
    x = RNG.randn(1, 3, 16, 16).astype(np.float32)
    with torch.no_grad():
        want = tconv(torch.from_numpy(x)).numpy()

    from tvc.models.codec.layers import Conv

    fconv = Conv(8, 5, 2)
    kernel = tconv.weight.detach().numpy().transpose(2, 3, 1, 0)
    params = {"params": {"conv": {"kernel": kernel, "bias": tconv.bias.detach().numpy()}}}
    got = fconv.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want, atol=1e-5)


def test_deconv_layout_parity():
    tdeconv = torch.nn.ConvTranspose2d(4, 6, 5, stride=2, output_padding=1, padding=2)
    x = RNG.randn(1, 4, 8, 8).astype(np.float32)
    with torch.no_grad():
        want = tdeconv(torch.from_numpy(x)).numpy()

    from tvc.models.codec.layers import Deconv

    fdeconv = Deconv(6, 5, 2)
    kernel = tdeconv.weight.detach().numpy().transpose(2, 3, 1, 0)  # (I,O,k,k)->(k,k,O,I)
    params = {"params": {"conv": {"kernel": kernel, "bias": tdeconv.bias.detach().numpy()}}}
    got = fdeconv.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    assert got.shape == (1, 16, 16, 6)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want, atol=1e-5)


def test_groupnorm_parity():
    ch = 12
    tgn = torch.nn.GroupNorm(num_groups=3, num_channels=ch, eps=1e-6)
    with torch.no_grad():
        tgn.weight.copy_(torch.rand(ch))
        tgn.bias.copy_(torch.rand(ch))
    x = RNG.randn(2, ch, 8, 8).astype(np.float32)
    with torch.no_grad():
        want = tgn(torch.from_numpy(x)).numpy()

    from tvc.models.diffusion.layers import GroupNormRef, num_groups_for

    assert num_groups_for(ch) == 3
    m = GroupNormRef(ch=ch, eps=1e-6)
    params = {"params": {"gn": {"scale": tgn.weight.detach().numpy(),
                                "bias": tgn.bias.detach().numpy()}}}
    got = m.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want, atol=1e-5)


def test_linear_parity():
    tl = torch.nn.Linear(10, 6)
    x = RNG.randn(4, 10).astype(np.float32)
    with torch.no_grad():
        want = tl(torch.from_numpy(x)).numpy()
    import flax.linen as fnn

    d = fnn.Dense(6)
    params = {"params": {"kernel": tl.weight.detach().numpy().T,
                         "bias": tl.bias.detach().numpy()}}
    got = d.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_timestep_embedding_parity():
    """get_timestep_embedding must match the reference formula layer-for-layer."""
    import math

    from tvc.models.diffusion.layers import get_timestep_embedding

    t = np.array([0.0, 1.0, 500.0, 999.0], np.float32)
    dim = 16
    half = dim // 2
    emb = math.log(10000) / (half - 1)
    freqs = np.exp(np.arange(half) * -emb)
    args = t[:, None] * freqs[None, :]
    want = np.concatenate([np.sin(args), np.cos(args)], axis=1)
    got = np.asarray(get_timestep_embedding(jnp.asarray(t), dim))
    np.testing.assert_allclose(got, want, atol=1e-4)  # f32 sin at arg ~999


def _tiny_cfg():
    cfg = Config()
    cfg.data.image_size = 16
    cfg.data.num_frames = 2
    cfg.data.num_frames_cond = 1
    cfg.model.ngf = 16
    cfg.model.ch_mult = (1, 2)
    cfg.model.num_res_blocks = 1
    cfg.model.attn_resolutions = (8,)
    cfg.model.n_head_channels = 8
    return cfg


def _synthetic_unet_sd(cfg):
    """Generate a torch-style all_modules state dict with reference key names."""
    spec = NCSNppSpec.from_config(cfg)
    plan = _build_plan(spec)
    sd = {}
    nf = spec.ngf

    def conv_keys(key, cin, cout, k):
        sd[f"{key}.weight"] = torch.randn(cout, cin, k, k) * 0.05
        sd[f"{key}.bias"] = torch.randn(cout) * 0.01

    in_ch_stack = []
    for i, p in enumerate(plan):
        key = f"module.unet.all_modules.{i}"
        if p["kind"] == "dense":
            cin = nf if i == 0 else nf * 4
            sd[f"{key}.weight"] = torch.randn(nf * 4, cin) * 0.05
            sd[f"{key}.bias"] = torch.zeros(nf * 4)
        elif p["kind"] == "conv3":
            cin = spec.channels * spec.n_frames if i <= 2 else plan[i - 1].get("ch", nf)
            cout = p["out"]
            if i == len(plan) - 1:
                cin = plan[i - 1]["ch"]
            conv_keys(key, cin, cout, 3)
        elif p["kind"] == "res":
            cin, cout = p["in"], p["out"]
            sd[f"{key}.actnorm0.Dense_0.weight"] = torch.randn(2 * cin, nf * 4) * 0.05
            sd[f"{key}.actnorm0.Dense_0.bias"] = torch.zeros(2 * cin)
            conv_keys(f"{key}.Conv_0", cin, cout, 3)
            sd[f"{key}.actnorm1.Dense_0.weight"] = torch.randn(2 * cout, nf * 4) * 0.05
            sd[f"{key}.actnorm1.Dense_0.bias"] = torch.zeros(2 * cout)
            conv_keys(f"{key}.Conv_1", cout, cout, 3)
            if cin != cout or p.get("up") or p.get("down"):
                conv_keys(f"{key}.Conv_2", cin, cout, 1)
        elif p["kind"] == "attn":
            ch = p["ch"]
            sd[f"{key}.GroupNorm_0.weight"] = torch.rand(ch)
            sd[f"{key}.GroupNorm_0.bias"] = torch.rand(ch)
            for n in range(4):
                sd[f"{key}.NIN_{n}.W"] = torch.randn(ch, ch) * 0.05
                sd[f"{key}.NIN_{n}.b"] = torch.zeros(ch)
        elif p["kind"] == "actnorm":
            ch = p["ch"]
            sd[f"{key}.Norm_0.weight"] = torch.rand(ch)
            sd[f"{key}.Norm_0.bias"] = torch.rand(ch)
    return sd


def test_unet_conversion_full_tree():
    cfg = _tiny_cfg()
    # annotate plan chs for the synthetic generator
    spec = NCSNppSpec.from_config(cfg)
    plan = _build_plan(spec)
    ch = None
    for p in plan:
        if p["kind"] in ("res",):
            ch = p["out"]
        if p["kind"] == "conv3":
            p["ch"] = ch if ch is not None else p["out"]
        if p["kind"] == "attn":
            ch = p["ch"]
    sd = _synthetic_unet_sd(cfg)
    variables = convert_unet_state_dict(cfg, sd)

    model = UNetMoreDDPM(cfg=cfg)
    x = jnp.zeros((1, 16, 16, 6))
    cond = jnp.zeros((1, 16, 16, 3))
    ref = model.init(jax.random.PRNGKey(0), x, jnp.zeros((1,), jnp.int32), cond)

    # every converted leaf must match the model's expected shape
    flat_ref = jax.tree_util.tree_leaves_with_path(ref["params"])
    flat_got = dict(jax.tree_util.tree_leaves_with_path(variables["params"]))
    assert len(flat_ref) == len(flat_got), (len(flat_ref), len(flat_got))
    for path, leaf in flat_ref:
        got = flat_got[path]
        assert got.shape == leaf.shape, (path, got.shape, leaf.shape)

    # and the converted tree must run
    out = model.apply(variables, x, jnp.zeros((1,), jnp.int32), cond)
    assert out.shape == (1, 16, 16, 6)
    assert np.all(np.isfinite(np.asarray(out)))


def _synthetic_elic_sd(N=16, M=24, groups=(4, 4, 4, 4, 8)):
    sd = {}

    def conv(key, cin, cout, k):
        sd[f"{key}.weight"] = torch.randn(cout, cin, k, k) * 0.05
        sd[f"{key}.bias"] = torch.randn(cout) * 0.01

    def deconv(key, cin, cout, k):
        sd[f"{key}.weight"] = torch.randn(cin, cout, k, k) * 0.05
        sd[f"{key}.bias"] = torch.randn(cout) * 0.01

    def rbb(key, ch):
        conv(f"{key}.conv1", ch, ch // 2, 1)
        conv(f"{key}.conv2", ch // 2, ch // 2, 3)
        conv(f"{key}.conv3", ch // 2, ch, 1)

    def runit(key, ch):
        conv(f"{key}.conv.0", ch, ch // 2, 1)
        conv(f"{key}.conv.2", ch // 2, ch // 2, 3)
        conv(f"{key}.conv.4", ch // 2, ch, 1)

    def attn(key, ch):
        for k in range(3):
            runit(f"{key}.conv_a.{k}", ch)
            runit(f"{key}.conv_b.{k}", ch)
        conv(f"{key}.conv_b.3", ch, ch, 1)

    ga = [("conv", 3, N, 5), ("rbb", N), ("rbb", N), ("rbb", N), ("conv", N, N, 5),
          ("rbb", N), ("rbb", N), ("rbb", N), ("attn", N), ("conv", N, N, 5),
          ("rbb", N), ("rbb", N), ("rbb", N), ("conv", N, M, 5), ("attn", M)]
    for i, item in enumerate(ga):
        key = f"g_a.{i}"
        if item[0] == "conv":
            conv(key, item[1], item[2], item[3])
        elif item[0] == "rbb":
            rbb(key, item[1])
        else:
            attn(key, item[1])
    gs = [("attn", M), ("deconv", M, N, 5), ("rbb", N), ("rbb", N), ("rbb", N),
          ("deconv", N, N, 5), ("attn", N), ("rbb", N), ("rbb", N), ("rbb", N),
          ("deconv", N, N, 5), ("rbb", N), ("rbb", N), ("rbb", N), ("deconv", N, 3, 5)]
    for i, item in enumerate(gs):
        key = f"g_s.{i}"
        if item[0] == "deconv":
            deconv(key, item[1], item[2], item[3])
        elif item[0] == "rbb":
            rbb(key, item[1])
        else:
            attn(key, item[1])

    conv("h_a.0", M, N, 3)
    conv("h_a.2", N, N, 5)
    conv("h_a.4", N, N, 5)
    deconv("h_s.0", N, N, 5)
    deconv("h_s.2", N, N * 3 // 2, 5)
    conv("h_s.4", N * 3 // 2, 2 * M, 3)

    g = (0,) + tuple(groups)
    for i in range(1, len(groups)):
        in_ch = g[min(1, i)] + g[i if i > 1 else 0]
        conv(f"cc_transforms.{i - 1}.0", in_ch, 224, 5)
        conv(f"cc_transforms.{i - 1}.2", 224, 128, 5)
        conv(f"cc_transforms.{i - 1}.4", 128, g[i + 1] * 2, 5)
    for i in range(len(groups)):
        conv(f"context_prediction.{i}", groups[i], 2 * groups[i], 5)
        # support = [ch_mean, ch_scale (i>0)] + [latent means, scales] = 2M (+2g)
        agg_in = 2 * M + (groups[i] * 2 if i > 0 else 0) + groups[i] * 2
        conv(f"ParamAggregation.{i}.0", agg_in, 640, 1)
        conv(f"ParamAggregation.{i}.2", 640, 512, 1)
        conv(f"ParamAggregation.{i}.4", 512, groups[i] * 2, 1)

    filters = (1, 3, 3, 3, 3, 1)
    for k in range(5):
        sd[f"entropy_bottleneck._matrices.{k}"] = torch.randn(N, filters[k + 1], filters[k]) * 0.1
        sd[f"entropy_bottleneck._biases.{k}"] = torch.randn(N, filters[k + 1], 1) * 0.1
        if k < 4:
            sd[f"entropy_bottleneck._factors.{k}"] = torch.zeros(N, filters[k + 1], 1)
    sd["entropy_bottleneck.quantiles"] = torch.tensor([[-10.0, 0.0, 10.0]]).repeat(N, 1)[:, None, :]
    return sd


def test_elic_conversion_key_mapping():
    from tvc.models.codec.elic import ELICModel

    groups = (4, 4, 4, 4, 8)
    sd = _synthetic_elic_sd(N=16, M=24, groups=groups)
    variables = convert_elic_state_dict(sd, groups=groups)

    model = ELICModel(N=16, M=24, groups=groups)
    x = jnp.zeros((1, 64, 64, 3))  # H,W must be multiples of 64 (patch padding)
    ref = model.init(jax.random.PRNGKey(0), x)
    flat_ref = jax.tree_util.tree_leaves_with_path(ref["params"])
    flat_got = dict(jax.tree_util.tree_leaves_with_path(variables["params"]))
    assert len(flat_ref) == len(flat_got)
    for path, leaf in flat_ref:
        assert path in flat_got, path
        assert flat_got[path].shape == leaf.shape, (path, flat_got[path].shape, leaf.shape)

    out = model.apply(variables, x)
    assert out["x_hat"].shape == x.shape


# --------------------------------------------------------------------------
# SPADE NCSN++ conversion
# --------------------------------------------------------------------------


def _synthetic_spade_sd(cfg):
    """Torch-style SPADE_NCSNpp all_modules state dict (ncsnpp_more.py:396-718)."""
    from tvc.utils.convert import _build_plan as bp  # same plan drives SPADE

    spec = NCSNppSpec.from_config(cfg)
    plan = _build_plan(spec)
    sd = {}
    nf = spec.ngf
    cond_ch = spec.channels * spec.num_frames_cond
    sdim = cfg.model.spade_dim

    def conv_keys(key, cin, cout, k):
        sd[f"{key}.weight"] = torch.randn(cout, cin, k, k) * 0.05
        sd[f"{key}.bias"] = torch.randn(cout) * 0.01

    def spade_actnorm(key, ch, emb=True):
        if emb:
            sd[f"{key}.Dense_0.weight"] = torch.randn(2 * ch, nf * 4) * 0.05
            sd[f"{key}.Dense_0.bias"] = torch.zeros(2 * ch)
        conv_keys(f"{key}.Norm_0.mlp_shared.0", cond_ch, sdim, 3)
        conv_keys(f"{key}.Norm_0.mlp_gamma", sdim, ch, 3)
        conv_keys(f"{key}.Norm_0.mlp_beta", sdim, ch, 3)

    last_ch = nf
    for i, p in enumerate(plan):
        key = f"module.unet.all_modules.{i}"
        if p["kind"] == "dense":
            cin = nf if i == 0 else nf * 4
            sd[f"{key}.weight"] = torch.randn(nf * 4, cin) * 0.05
            sd[f"{key}.bias"] = torch.zeros(nf * 4)
        elif p["kind"] == "conv3":
            # input conv takes only the target frames (cond enters via SPADE)
            cin = spec.channels * spec.num_frames if i <= 2 else last_ch
            conv_keys(key, cin, p["out"], 3)
        elif p["kind"] == "res":
            cin, cout = p["in"], p["out"]
            spade_actnorm(f"{key}.actnorm0", cin)
            conv_keys(f"{key}.Conv_0", cin, cout, 3)
            spade_actnorm(f"{key}.actnorm1", cout)
            conv_keys(f"{key}.Conv_1", cout, cout, 3)
            if cin != cout or p.get("up") or p.get("down"):
                conv_keys(f"{key}.Conv_2", cin, cout, 1)
            last_ch = cout
        elif p["kind"] == "attn":
            ch = p["ch"]
            sd[f"{key}.GroupNorm_0.weight"] = torch.rand(ch)
            sd[f"{key}.GroupNorm_0.bias"] = torch.rand(ch)
            for n in range(4):
                sd[f"{key}.NIN_{n}.W"] = torch.randn(ch, ch) * 0.05
                sd[f"{key}.NIN_{n}.b"] = torch.zeros(ch)
            last_ch = ch
        elif p["kind"] == "actnorm":
            spade_actnorm(key, p["ch"], emb=False)
    return sd


def test_spade_conversion_full_tree():
    from tvc.utils.convert import convert_spade_state_dict

    cfg = _tiny_cfg()
    cfg.model.spade = True
    cfg.model.spade_dim = 8
    sd = _synthetic_spade_sd(cfg)
    variables = convert_spade_state_dict(cfg, sd)

    model = UNetMoreDDPM(cfg=cfg)
    x = jnp.zeros((1, 16, 16, 6))
    cond = jnp.zeros((1, 16, 16, 3))
    ref = model.init(jax.random.PRNGKey(0), x, jnp.zeros((1,), jnp.int32), cond)
    flat_ref = jax.tree_util.tree_leaves_with_path(ref["params"])
    flat_got = dict(jax.tree_util.tree_leaves_with_path(variables["params"]))
    assert len(flat_ref) == len(flat_got), (len(flat_ref), len(flat_got))
    for path, leaf in flat_ref:
        assert path in flat_got, path
        assert flat_got[path].shape == leaf.shape, (path, flat_got[path].shape, leaf.shape)

    out = model.apply(variables, x, jnp.zeros((1,), jnp.int32), cond)
    assert out.shape == (1, 16, 16, 6)
    assert np.all(np.isfinite(np.asarray(out)))


# --------------------------------------------------------------------------
# Legacy UNet conversion
# --------------------------------------------------------------------------


def _synthetic_legacy_sd(cfg):
    """Torch-style legacy UNet state dict (models/unet.py:175-299), replaying
    the flat downblocks/middleblocks/upblocks construction."""
    sd = {}
    ch = cfg.model.ngf
    mults = {"deep": (1, 2, 2, 2), "deeper": (1, 2, 2, 4, 4),
             "deepest": (1, 2, 2, 2, 4, 4)}[cfg.model.depth]
    ch_mult = [ch * m for m in mults]
    n_ch = cfg.data.channels
    nf_in = n_ch * (cfg.data.num_frames + cfg.data.num_frames_cond + cfg.data.num_frames_future)

    def conv(key, cin, cout, k=3):
        sd[f"{key}.weight"] = torch.randn(cout, cin, k, k) * 0.05
        sd[f"{key}.bias"] = torch.randn(cout) * 0.01

    def gn(key, c):
        sd[f"{key}.weight"] = torch.rand(c)
        sd[f"{key}.bias"] = torch.rand(c)

    def nin(key, cin, cout):
        sd[f"{key}.weights"] = torch.randn(cout, cin) * 0.05
        sd[f"{key}.bias"] = torch.zeros(cout)

    def res(key, cin, cout):
        gn(f"{key}.normalize0", cin)
        conv(f"{key}.conv0", cin, cout)
        sd[f"{key}.dense.weight"] = torch.randn(cout, ch * 4) * 0.05
        sd[f"{key}.dense.bias"] = torch.zeros(cout)
        gn(f"{key}.normalize1", cout)
        conv(f"{key}.conv1", cout, cout)
        if cin != cout:
            nin(f"{key}.nin", cin, cout)

    def attn(key, c):
        gn(f"{key}.normalize", c)
        for q in ("Q", "K", "V", "OUT"):
            nin(f"{key}.{q}", c, c)

    pre = "module.unet."
    conv(f"{pre}downblocks.0", nf_in, ch)
    ch_size = [ch]
    idx, prev = 1, ch_mult[0]
    for i, ich in enumerate(ch_mult):
        for cin in (prev, ich):
            res(f"{pre}downblocks.{idx}", cin, ich)
            idx += 1
            if i == 1:
                attn(f"{pre}downblocks.{idx}", ich)
                idx += 1
            ch_size.append(ich)
        if i != len(ch_mult) - 1:
            conv(f"{pre}downblocks.{idx}", ich, ich)
            idx += 1
            ch_size.append(ich)
        prev = ich

    res(f"{pre}middleblocks.0", ch_mult[-1], ch_mult[-1])
    attn(f"{pre}middleblocks.1", ch_mult[-1])
    res(f"{pre}middleblocks.2", ch_mult[-1], ch_mult[-1])

    idx, prev = 0, ch_mult[-1]
    for i, ich in reversed(list(enumerate(ch_mult))):
        for _ in range(3):
            res(f"{pre}upblocks.{idx}", prev + ch_size.pop(), ich)
            idx += 1
            if i == 1:
                attn(f"{pre}upblocks.{idx}", ich)
                idx += 1
            prev = ich
        if i != 0:
            conv(f"{pre}upblocks.{idx}.conv", ich, ich)
            idx += 1

    gn(f"{pre}normalize", ch)
    out_ch = n_ch * cfg.data.num_frames
    conv(f"{pre}out", ch, out_ch)
    sd[f"{pre}temb_dense.0.weight"] = torch.randn(ch * 4, ch) * 0.05
    sd[f"{pre}temb_dense.0.bias"] = torch.zeros(ch * 4)
    sd[f"{pre}temb_dense.2.weight"] = torch.randn(ch * 4, ch * 4) * 0.05
    sd[f"{pre}temb_dense.2.bias"] = torch.zeros(ch * 4)
    return sd


def test_legacy_conversion_full_tree():
    from tvc.models.diffusion.unet_legacy import UNetDDPM
    from tvc.utils.convert import convert_legacy_unet_state_dict

    cfg = _tiny_cfg()
    cfg.model.depth = "deep"
    cfg.model.ngf = 8
    sd = _synthetic_legacy_sd(cfg)
    variables = convert_legacy_unet_state_dict(cfg, sd)

    model = UNetDDPM(cfg=cfg)
    x = jnp.zeros((1, 16, 16, 6))
    cond = jnp.zeros((1, 16, 16, 3))
    ref = model.init(jax.random.PRNGKey(0), x, jnp.zeros((1,), jnp.int32), cond)
    flat_ref = jax.tree_util.tree_leaves_with_path(ref["params"])
    flat_got = dict(jax.tree_util.tree_leaves_with_path(variables["params"]))
    assert len(flat_ref) == len(flat_got), (len(flat_ref), len(flat_got))
    for path, leaf in flat_ref:
        assert path in flat_got, path
        assert flat_got[path].shape == leaf.shape, (path, flat_got[path].shape, leaf.shape)

    out = model.apply(variables, x, jnp.zeros((1,), jnp.int32), cond)
    assert out.shape == (1, 16, 16, 6)
    assert np.all(np.isfinite(np.asarray(out)))


# --------------------------------------------------------------------------
# 3D / pseudo-3D NCSN++ conversion
# --------------------------------------------------------------------------


def _synthetic_3d_sd(cfg, pseudo3d):
    """Torch-style is3d all_modules state dict driven by the converter's own
    plan (_build_plan_3d mirrors ncsnpp_more.py:130-250); leaf layouts follow
    layers3d.py: MyConv3d `.conv` (Co,Ci,kd,kh,kw), PseudoConv3d
    `.space_conv`/`.time_conv`, AttnBlockpp3d `.space_att`/`.time_att`."""
    from tvc.utils.convert import _build_plan_3d

    plan = _build_plan_3d(cfg)
    nf = cfg.model.ngf * (cfg.data.num_frames + cfg.data.num_frames_cond
                          + cfg.data.num_frames_future)
    temb_dim = nf * 4
    sd = {}

    def conv3d(key, cin, cout, n, k):
        if pseudo3d:
            sd[f"{key}.space_conv.weight"] = torch.randn(cout // n, cin // n, k, k) * 0.05
            sd[f"{key}.space_conv.bias"] = torch.zeros(cout // n)
            sd[f"{key}.time_conv.weight"] = torch.randn(cout // n, cout // n, k) * 0.05
            sd[f"{key}.time_conv.bias"] = torch.zeros(cout // n)
        else:
            sd[f"{key}.conv.weight"] = torch.randn(cout // n, cin // n, k, k, k) * 0.05
            sd[f"{key}.conv.bias"] = torch.zeros(cout // n)

    def attn_half(key, c):
        sd[f"{key}.GroupNorm_0.weight"] = torch.rand(c)
        sd[f"{key}.GroupNorm_0.bias"] = torch.rand(c)
        for j in range(4):
            sd[f"{key}.NIN_{j}.W"] = torch.randn(c, c) * 0.05
            sd[f"{key}.NIN_{j}.b"] = torch.zeros(c)

    for i, p in enumerate(plan):
        key = f"module.all_modules.{i}"
        kind = p["kind"]
        if kind == "dense":
            sd[f"{key}.weight"] = torch.randn(p["out"], p["in"]) * 0.05
            sd[f"{key}.bias"] = torch.zeros(p["out"])
        elif kind == "conv3":
            conv3d(key, p["in"], p["out"], p["frames"], 3)
        elif kind == "converter":
            sd[f"{key}.weight"] = torch.randn(p["out"], p["in"], 1, 1) * 0.05
            sd[f"{key}.bias"] = torch.zeros(p["out"])
        elif kind == "attn":
            c = p["ch"] // p["frames"]
            attn_half(f"{key}.space_att", c)
            attn_half(f"{key}.time_att", c)
        elif kind == "res":
            n = p["frames"]
            cin, cout = p["in"], p["out"]
            for an, ch in (("actnorm0", cin), ("actnorm1", cout)):
                sd[f"{key}.{an}.Dense_0.weight"] = torch.randn(2 * (ch // n), temb_dim) * 0.05
                sd[f"{key}.{an}.Dense_0.bias"] = torch.zeros(2 * (ch // n))
            conv3d(f"{key}.Conv_0", cin, cout, n, 3)
            conv3d(f"{key}.Conv_1", cout, cout, n, 3)
            if cin != cout or p.get("up") or p.get("down"):
                conv3d(f"{key}.Conv_2", cin, cout, n, 1)
        elif kind == "actnorm":
            c = p["ch"] // p["frames"]
            sd[f"{key}.Norm_0.weight"] = torch.rand(c)
            sd[f"{key}.Norm_0.bias"] = torch.rand(c)
    return sd


@pytest.mark.parametrize("arch", ["unetmore3d", "unetmorepseudo3d"])
@pytest.mark.heavy
def test_3d_conversion_full_tree(arch):
    from tvc.models.diffusion.ncsnpp import UNetMoreDDPM
    from tvc.utils.convert import convert_3d_state_dict

    cfg = _tiny_cfg()
    cfg.model.arch = arch
    cfg.model.ngf = 4
    cfg.model.n_head_channels = 4
    sd = _synthetic_3d_sd(cfg, pseudo3d=(arch == "unetmorepseudo3d"))
    variables = convert_3d_state_dict(cfg, sd, pseudo3d=(arch == "unetmorepseudo3d"))

    model = UNetMoreDDPM(cfg=cfg)
    x = jnp.zeros((1, 16, 16, 6))
    cond = jnp.zeros((1, 16, 16, 3))
    ref = model.init(jax.random.PRNGKey(0), x, jnp.zeros((1,), jnp.int32), cond)
    flat_ref = jax.tree_util.tree_leaves_with_path(ref["params"])
    flat_got = dict(jax.tree_util.tree_leaves_with_path(variables["params"]))
    assert len(flat_ref) == len(flat_got), (len(flat_ref), len(flat_got))
    for path, leaf in flat_ref:
        assert path in flat_got, path
        assert flat_got[path].shape == leaf.shape, (path, flat_got[path].shape, leaf.shape)

    out = model.apply(variables, x, jnp.zeros((1,), jnp.int32), cond)
    assert out.shape == (1, 16, 16, 6)
    assert np.all(np.isfinite(np.asarray(out)))


def test_conv3d_layout_parity():
    """MyConv3d conversion: torch Conv3d and flax NDHWC conv must agree."""
    tconv = torch.nn.Conv3d(3, 5, 3, padding=1)
    x = RNG.randn(2, 3, 4, 8, 8).astype(np.float32)  # (B,C,N,H,W)
    with torch.no_grad():
        want = tconv(torch.from_numpy(x)).numpy()  # (B,Co,N,H,W)

    import flax.linen as nn_flax

    kernel = tconv.weight.detach().numpy().transpose(2, 3, 4, 1, 0)
    fconv = nn_flax.Conv(5, (3, 3, 3), padding="SAME")
    params = {"params": {"kernel": kernel, "bias": tconv.bias.detach().numpy()}}
    got = fconv.apply(params, jnp.asarray(x.transpose(0, 2, 3, 4, 1)))  # NDHWC
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 4, 1, 2, 3), want, atol=1e-5)


def test_time_conv1d_layout_parity():
    """PseudoConv3d time_conv: torch Conv1d vs flax 1D conv layouts."""
    tconv = torch.nn.Conv1d(6, 6, 3, padding=1)
    x = RNG.randn(4, 6, 5).astype(np.float32)  # (B', C, N)
    with torch.no_grad():
        want = tconv(torch.from_numpy(x)).numpy()

    import flax.linen as nn_flax

    kernel = tconv.weight.detach().numpy().transpose(2, 1, 0)  # (k, Ci, Co)
    fconv = nn_flax.Conv(6, (3,), padding="SAME")
    params = {"params": {"kernel": kernel, "bias": tconv.bias.detach().numpy()}}
    got = fconv.apply(params, jnp.asarray(x.transpose(0, 2, 1)))  # (B', N, C)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 2, 1), want, atol=1e-5)
