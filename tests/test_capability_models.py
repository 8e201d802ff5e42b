"""Smoke/shape tests for the capability-surface model family: SPADE NCSN++,
legacy UNet, norm zoo, 3D layers, registry, fused act, FID/PR, profiler."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tvc.core.config import Config

RNG = np.random.RandomState(5)


def tiny_cfg(**kw):
    cfg = Config()
    cfg.data.image_size = 16
    cfg.data.num_frames = 2
    cfg.data.num_frames_cond = 1
    cfg.model.ngf = 16
    cfg.model.ch_mult = (1, 2)
    cfg.model.num_res_blocks = 1
    cfg.model.attn_resolutions = (8,)
    cfg.model.n_head_channels = 8
    cfg.model.num_classes = 20
    for k, v in kw.items():
        setattr(cfg.model, k, v)
    return cfg


def test_spade_ncsnpp_forward():
    from tvc.models.diffusion.ncsnpp import UNetMoreDDPM

    cfg = tiny_cfg(spade=True, spade_dim=32)
    model = UNetMoreDDPM(cfg=cfg)
    x = jnp.zeros((2, 16, 16, 6))
    cond = jnp.zeros((2, 16, 16, 3))
    y = jnp.zeros((2,), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), x, y, cond)
    out = model.apply(params, x, y, cond)
    assert out.shape == (2, 16, 16, 6)


def test_legacy_unet_ddpm():
    from tvc.models.diffusion.unet_legacy import UNetDDPM

    cfg = tiny_cfg()
    cfg.model.depth = "deep"
    cfg.data.image_size = 8
    cfg.model.ngf = 8
    model = UNetDDPM(cfg=cfg)
    x = jnp.zeros((1, 8, 8, 6))
    cond = jnp.zeros((1, 8, 8, 3))
    y = jnp.zeros((1,), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), x, y, cond)
    out = model.apply(params, x, y, cond)
    assert out.shape == (1, 8, 8, 6)


def test_legacy_unet_smld():
    from tvc.models.diffusion.unet_legacy import UNetSMLD

    cfg = tiny_cfg(version="SMLD")
    cfg.model.depth = "deep"
    cfg.data.image_size = 8
    cfg.model.ngf = 8
    model = UNetSMLD(cfg=cfg)
    x = jnp.zeros((1, 8, 8, 6))
    y = jnp.zeros((1,), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), x, y, None)
    out = model.apply(params, x, y, None)
    assert out.shape == (1, 8, 8, 6)


def test_norm_zoo():
    from tvc.models.diffusion.normalization import (
        ConditionalInstanceNorm2dPlus,
        InstanceNorm2d,
        InstanceNorm2dPlus,
        VarianceNorm2d,
        get_normalization,
    )

    x = jnp.asarray(RNG.randn(2, 8, 8, 12).astype(np.float32))
    for mod in (InstanceNorm2d(12), InstanceNorm2dPlus(12), VarianceNorm2d(12)):
        p = mod.init(jax.random.PRNGKey(0), x)
        y = mod.apply(p, x)
        assert y.shape == x.shape and np.all(np.isfinite(np.asarray(y)))

    cm = ConditionalInstanceNorm2dPlus(12, num_classes=10)
    labels = jnp.asarray([1, 5])
    p = cm.init(jax.random.PRNGKey(0), x, labels)
    y = cm.apply(p, x, labels)
    assert y.shape == x.shape

    assert get_normalization("InstanceNorm++") is not None
    with pytest.raises(ValueError):
        get_normalization("nope")


def test_layers3d():
    from tvc.models.diffusion.layers3d import (
        AttnBlockpp3d,
        Conv3dDDPM,
        FrameConverter1x1,
        PseudoConv3d,
        stacked_to_volume,
        volume_to_stacked,
    )

    x = jnp.asarray(RNG.randn(1, 8, 8, 3 * 4).astype(np.float32))  # 4 frames x 3ch
    v = stacked_to_volume(x, 4)
    assert v.shape == (1, 4, 8, 8, 3)
    np.testing.assert_allclose(np.asarray(volume_to_stacked(v)), np.asarray(x))

    c3 = Conv3dDDPM(out_ch=5, n_frames=4)
    p = c3.init(jax.random.PRNGKey(0), x)
    assert c3.apply(p, x).shape == (1, 8, 8, 20)

    pc = PseudoConv3d(out_ch=5, n_frames=4)
    p = pc.init(jax.random.PRNGKey(0), x)
    assert pc.apply(p, x).shape == (1, 8, 8, 20)

    at = AttnBlockpp3d(channels=3, n_frames=4)
    p = at.init(jax.random.PRNGKey(0), x)
    assert at.apply(p, x).shape == x.shape

    fc = FrameConverter1x1(n_frames_in=4, n_frames_out=2)
    p = fc.init(jax.random.PRNGKey(0), x)
    assert fc.apply(p, x).shape == (1, 8, 8, 6)


@pytest.mark.parametrize("arch", ["unetmore3d", "unetmorepseudo3d"])
@pytest.mark.heavy
def test_ncsnpp3d_archs(arch):
    from tvc.models.diffusion.ncsnpp import UNetMoreDDPM

    cfg = tiny_cfg()
    cfg.data.image_size = 8
    cfg.model.ngf = 8
    cfg.model.n_head_channels = 4
    cfg.model.attn_resolutions = (4,)
    cfg.model.arch = arch
    model = UNetMoreDDPM(cfg=cfg)
    x = jnp.zeros((1, 8, 8, 6))
    cond = jnp.zeros((1, 8, 8, 3))
    y = jnp.zeros((1,), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), x, y, cond)
    out = model.apply(params, x, y, cond)
    assert out.shape == (1, 8, 8, 6)
    assert np.all(np.isfinite(np.asarray(out)))


def test_registry():
    from tvc.models.registry import create_model, get_model, get_score_fn, register_model

    cfg = tiny_cfg()
    m = create_model(cfg)
    assert m is not None
    cfg2 = tiny_cfg()
    cfg2.model.arch = "unet"
    cfg2.model.depth = "deep"
    assert create_model(cfg2) is not None

    @register_model(name="dummy_arch")
    class Dummy:
        def __init__(self, cfg, dtype=None):
            self.cfg = cfg

    assert get_model("dummy_arch") is Dummy
    with pytest.raises(ValueError):
        get_model("missing")

    # score conversion: eps -> -eps/sqrt(1-alpha)
    from tvc.models.diffusion.ncsnpp import UNetMoreDDPM

    model = UNetMoreDDPM(cfg=cfg)
    x = jnp.zeros((1, 16, 16, 6))
    cond = jnp.zeros((1, 16, 16, 3))
    y = jnp.zeros((1,), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), x, y, cond)
    score_fn = get_score_fn(model, params, cfg)
    s = score_fn(x, y, cond)
    assert s.shape == x.shape


def test_grayscale_channels_config():
    """SMMNIST-style grayscale (channels=1) flows through the UNet
    (benchmark/fvd_utils/bench_smm.py capability)."""
    from tvc.models.diffusion.ncsnpp import UNetMoreDDPM

    cfg = tiny_cfg()
    cfg.data.channels = 1
    model = UNetMoreDDPM(cfg=cfg)
    x = jnp.zeros((1, 16, 16, 2))     # 2 frames x 1ch
    cond = jnp.zeros((1, 16, 16, 1))
    y = jnp.zeros((1,), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), x, y, cond)
    out = model.apply(params, x, y, cond)
    assert out.shape == (1, 16, 16, 2)


def test_i3d_tf_name_conversion():
    from tvc.models.i3d import convert_tf_name, tf_vars_to_state_dict

    assert convert_tf_name("RGB/inception_i3d/Conv3d_1a_7x7/conv_3d/w:0".replace(
        "RGB/inception_i3d/", "")) == "Conv3d_1a_7x7.conv3d.weight"
    assert convert_tf_name("Mixed_3b/Branch_0/Conv3d_0a_1x1/batch_norm/beta:0") == \
        "Mixed_3b.b0.bn.bias"
    assert convert_tf_name("Mixed_3b/Branch_1/Conv3d_0b_3x3/conv_3d/w:0") == \
        "Mixed_3b.b1b.conv3d.weight"
    # Mixed_5b branch-2 typo special case (convert_tf_pretrained.py:35-41)
    assert convert_tf_name("Mixed_5b/Branch_2/Conv3d_0a_1x1/conv_3d/w:0") == \
        "Mixed_5b.b2a.conv3d.weight"

    sd = tf_vars_to_state_dict({
        "Conv3d_1a_7x7/conv_3d/w:0": np.zeros((7, 7, 7, 3, 64)),
        "Conv3d_1a_7x7/batch_norm/beta:0": np.zeros((1, 1, 1, 1, 64)),
    })
    assert sd["Conv3d_1a_7x7.conv3d.weight"].shape == (64, 3, 7, 7, 7)
    assert sd["Conv3d_1a_7x7.bn.bias"].shape == (64,)


@pytest.mark.slow
def test_inception_v3_features():
    from tvc.models.inception import FIDInceptionFeatures

    f = FIDInceptionFeatures(batch_size=2)
    assert not f.calibrated
    imgs = RNG.rand(2, 64, 64, 3).astype(np.float32)
    feats = f(imgs)
    assert feats.shape == (2, 2048)
    assert np.isfinite(feats).all()


def test_fused_leaky_relu():
    from tvc.ops.fused_act import fused_leaky_relu

    x = jnp.asarray(RNG.randn(2, 4, 4, 3).astype(np.float32))
    b = jnp.asarray([0.5, -0.5, 0.0], jnp.float32)
    y = np.asarray(fused_leaky_relu(x, b))
    want = np.asarray(x) + np.asarray(b)
    want = np.where(want >= 0, want, want * 0.2) * np.sqrt(2)
    np.testing.assert_allclose(y, want, atol=1e-6)


def test_fid_pr():
    from tvc.metrics.fid_pr import fid_from_features, get_fid_pr

    f1 = RNG.randn(500, 16)
    f2 = RNG.randn(500, 16)
    fid, p, r = get_fid_pr(f1, f2)
    assert fid < 1.0  # same distribution
    assert p > 0.7 and r > 0.7  # k=3 manifold estimate on 500 pts is noisy
    f3 = RNG.randn(500, 16) + 5.0
    fid2, p2, r2 = get_fid_pr(f1, f3)
    assert fid2 > 100 and p2 < 0.2 and r2 < 0.2


def test_video_metric_wrappers():
    from tvc.metrics.video import calculate_psnr, calculate_ssim

    v1 = RNG.rand(2, 4, 16, 16, 3).astype(np.float32)
    v2 = (v1 + RNG.randn(2, 4, 16, 16, 3).astype(np.float32) * 0.05).clip(0, 1)
    r = calculate_psnr(v1, v2, 2, True)
    assert "final" in r["psnr"] and "[:2]" in r["psnr"]
    assert len(r["psnr_per_frame_values"]) == 4
    r2 = calculate_ssim(v1, v2, 2, True)
    assert r2["ssim"]["final"] > 0.5


def test_profiler():
    from tvc.utils.profiler import PhaseTimer, count_params, flops

    t = PhaseTimer()
    with t.phase("a"):
        pass
    assert "a" in t.as_dict()
    assert count_params({"w": np.zeros((3, 4))}) == 12
    f = flops(lambda a, b: a @ b, jnp.zeros((64, 64)), jnp.zeros((64, 64)))
    assert f > 0 or np.isnan(f)  # some backends omit flops; nan acceptable
