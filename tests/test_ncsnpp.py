"""NCSN++ UNet architecture tests: shapes, module plan, published param count."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tvc.core.config import Config
from tvc.models.diffusion.ncsnpp import NCSNpp, NCSNppSpec, UNetMoreDDPM, _build_plan


def tiny_spec(**kw):
    d = dict(
        image_size=16,
        channels=3,
        num_frames=2,
        num_frames_cond=1,
        ngf=16,
        ch_mult=(1, 2),
        num_res_blocks=1,
        attn_resolutions=(8,),
        n_head_channels=8,
    )
    d.update(kw)
    return NCSNppSpec(**d)


def test_forward_shape_tiny():
    spec = tiny_spec()
    model = NCSNpp(spec=spec)
    x = jnp.zeros((2, 16, 16, 3 * 2))
    cond = jnp.zeros((2, 16, 16, 3 * 1))
    t = jnp.zeros((2,), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), x, t, cond)
    y = model.apply(params, x, t, cond)
    assert y.shape == (2, 16, 16, 3 * 2)


def test_module_plan_matches_reference_count():
    """Default config must produce the reference's 50-module list
    (2 dense + conv_in + 21 down + 3 mid + 21 up + actnorm + conv_out)."""
    cfg = Config()
    spec = NCSNppSpec.from_config(cfg)
    plan = _build_plan(spec)
    assert len(plan) == 50
    kinds = [p["kind"] for p in plan]
    assert kinds[:3] == ["dense", "dense", "conv3"]
    assert kinds[-2:] == ["actnorm", "conv3"]
    assert kinds.count("attn") == 6 + 3 + 1  # down(6) + up(3) + mid(1)


def param_count(tree):
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(tree))


def test_param_count_matches_published_262M():
    """The rebuilt UNet must have the published 262.1M parameters
    (ret/readme.md; SURVEY.md §6). Uses eval_shape — no memory allocated."""
    cfg = Config()
    model = NCSNpp(spec=NCSNppSpec.from_config(cfg))
    x = jax.ShapeDtypeStruct((1, 128, 128, 15), jnp.float32)
    cond = jax.ShapeDtypeStruct((1, 128, 128, 6), jnp.float32)
    t = jax.ShapeDtypeStruct((1,), jnp.int32)
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), x, t, cond)
    n = param_count(shapes)
    assert abs(n / 1e6 - 262.1) < 0.15, f"param count {n/1e6:.2f}M != 262.1M"


def test_unetmore_wrapper():
    cfg = Config()
    cfg.data.image_size = 16
    cfg.model.ngf = 16
    cfg.model.ch_mult = (1, 2)
    cfg.model.num_res_blocks = 1
    cfg.model.attn_resolutions = (8,)
    cfg.model.n_head_channels = 8
    cfg.data.num_frames = 2
    cfg.data.num_frames_cond = 1
    model = UNetMoreDDPM(cfg=cfg)
    x = jnp.zeros((1, 16, 16, 6))
    cond = jnp.zeros((1, 16, 16, 3))
    y_lab = jnp.zeros((1,), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), x, y_lab, cond)
    out = model.apply(params, x, y_lab, cond)
    assert out.shape == (1, 16, 16, 6)


def test_attention_applied_at_right_resolutions():
    """attn fires when spatial size is in attn_resolutions (forward checks
    h.shape[2], i.e. W in NHWC — the reference checks shape[-1] in NCHW)."""
    spec = tiny_spec(image_size=32, attn_resolutions=(16,))
    plan = _build_plan(spec)
    # resolutions: [32, 16]; attn only at level 1 down (1 block), mid (1), up (1)
    assert [p["kind"] for p in plan].count("attn") == 3


def test_gn_bf16_io_flag(monkeypatch):
    """TVC_GN_BF16_IO=1 keeps GroupNorm I/O in bf16 with f32 statistics
    (docs/PERF.md lever): same params tree, output close to the f32-I/O
    path within bf16 resolution; no effect on f32 models."""
    import jax
    import jax.numpy as jnp

    from tvc.models.diffusion.layers import GroupNormRef

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 32), jnp.float32)
    m32 = GroupNormRef(ch=32, dtype=jnp.bfloat16)
    monkeypatch.setenv("TVC_GN_BF16_IO", "0")  # conservative all-f32 path
    v = m32.init(jax.random.PRNGKey(1), x.astype(jnp.bfloat16))
    base = np.asarray(m32.apply(v, x.astype(jnp.bfloat16)), np.float32)

    monkeypatch.setenv("TVC_GN_BF16_IO", "1")  # the bf16-I/O default
    fast = np.asarray(m32.apply(v, x.astype(jnp.bfloat16)), np.float32)
    assert fast.dtype == base.dtype
    np.testing.assert_allclose(fast, base, atol=0.05)
    # param tree identical between the two paths (checkpoint compatible)
    v2 = m32.init(jax.random.PRNGKey(1), x.astype(jnp.bfloat16))
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(v2)

    # f32 model: flag is a no-op (bit-identical)
    monkeypatch.setenv("TVC_GN_BF16_IO", "0")
    mf = GroupNormRef(ch=32, dtype=jnp.float32)
    vf = mf.init(jax.random.PRNGKey(2), x)
    a = np.asarray(mf.apply(vf, x))
    monkeypatch.setenv("TVC_GN_BF16_IO", "1")
    b = np.asarray(mf.apply(vf, x))
    np.testing.assert_array_equal(a, b)
