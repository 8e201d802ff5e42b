"""NCSNv2 refinement-block + GaussianFourierProjection parity.

Closes the last §2.3 capability crumbs (VERDICT r3 item 8): the vestigial
NCSNv2 CRP/RCU/MSF/Refine family (reference models/better/layers.py:122-338)
and GaussianFourierProjection (models/better/layerspp.py:176-185) — both dead
code on every shipped reference config, carried for library-surface parity.

Non-conditional blocks are asserted numerically against the reference's own
torch modules via the documented converters; conditional variants (which need
a reference normalizer instance) are exercised structurally.
"""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "models")),
    reason="reference tree not mounted",
)
if REF not in sys.path:
    sys.path.append(REF)

from tvc.models.diffusion.ncsnv2_blocks import (  # noqa: E402
    CRPBlock,
    CondCRPBlock,
    CondRefineBlock,
    MSFBlock,
    RCUBlock,
    RefineBlock,
    interpolate_bilinear_align_corners,
)
from tvc.utils.convert import (  # noqa: E402
    convert_crp_state_dict,
    convert_msf_state_dict,
    convert_rcu_state_dict,
    convert_refine_state_dict,
)


@pytest.fixture(autouse=True)
def _fix_reference_ncsn_conv():
    """The reference's own ``ncsn_conv3x3`` crashes for bias=False
    (layers.py:103 does ``conv.bias.data *= init_scale`` on None), so the
    CRP/RCU blocks are not even constructible as shipped — confirming they
    are dead code. Patch the helper to its evident intent for parity."""
    import torch.nn as tnn

    import models.better.layers as ref_layers

    orig = ref_layers.ncsn_conv3x3

    def fixed(in_planes, out_planes, stride=1, bias=True, dilation=1,
              init_scale=1.0, padding=1):
        init_scale = 1e-10 if init_scale == 0 else init_scale
        conv = tnn.Conv2d(in_planes, out_planes, stride=stride, bias=bias,
                          dilation=dilation, padding=padding, kernel_size=3)
        conv.weight.data *= init_scale
        if conv.bias is not None:
            conv.bias.data *= init_scale
        return conv

    ref_layers.ncsn_conv3x3 = fixed
    yield
    ref_layers.ncsn_conv3x3 = orig


def _randomize(module, seed, scale=0.3):
    g = torch.Generator().manual_seed(seed)
    sd = {k: torch.randn(v.shape, generator=g) * scale if v.is_floating_point() else v
          for k, v in module.state_dict().items()}
    module.load_state_dict(sd)
    return module


def nhwc(x):
    return jnp.asarray(x.transpose(0, 2, 3, 1))


def nchw(x):
    return np.asarray(x).transpose(0, 3, 1, 2)


def test_interpolate_bilinear_align_corners_matches_torch():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, 5, 7).astype(np.float32)
    for shape in [(10, 14), (9, 13), (3, 4), (5, 7), (1, 1)]:
        want = torch.nn.functional.interpolate(
            torch.from_numpy(x), size=shape, mode="bilinear", align_corners=True
        ).numpy()
        got = nchw(interpolate_bilinear_align_corners(nhwc(x), shape))
        np.testing.assert_allclose(got, want, atol=1e-5, err_msg=str(shape))


@pytest.mark.parametrize("maxpool", [True, False])
def test_crp_block_parity(maxpool):
    from models.better.layers import CRPBlock as RefCRP

    ref = _randomize(RefCRP(8, n_stages=3, maxpool=maxpool).eval(), 1)
    rng = np.random.RandomState(1)
    x = rng.randn(2, 8, 9, 9).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    blk = CRPBlock(features=8, n_stages=3, maxpool=maxpool)
    params = {"params": convert_crp_state_dict(ref.state_dict(), 3)}
    got = nchw(blk.apply(params, nhwc(x)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_rcu_block_parity():
    from models.better.layers import RCUBlock as RefRCU

    ref = _randomize(RefRCU(8, n_blocks=2, n_stages=2).eval(), 2)
    rng = np.random.RandomState(2)
    x = rng.randn(2, 8, 6, 6).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    blk = RCUBlock(features=8, n_blocks=2, n_stages=2)
    params = {"params": convert_rcu_state_dict(ref.state_dict(), 2, 2)}
    got = nchw(blk.apply(params, nhwc(x)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_msf_block_parity():
    from models.better.layers import MSFBlock as RefMSF

    ref = _randomize(RefMSF([4, 8], 6).eval(), 3)
    rng = np.random.RandomState(3)
    xs = [rng.randn(2, 4, 8, 8).astype(np.float32),
          rng.randn(2, 8, 4, 4).astype(np.float32)]
    with torch.no_grad():
        want = ref([torch.from_numpy(v) for v in xs], (8, 8)).numpy()
    blk = MSFBlock(features=6, n_inputs=2)
    params = {"params": convert_msf_state_dict(ref.state_dict(), 2)}
    got = nchw(blk.apply(params, [nhwc(v) for v in xs], (8, 8)))
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.parametrize("n_inputs,end", [(1, False), (2, False), (2, True)])
def test_refine_block_parity(n_inputs, end):
    from models.better.layers import RefineBlock as RefRefine

    planes = [6, 8][:n_inputs]
    ref = _randomize(RefineBlock_ref(RefRefine, planes, 6, end), 4)
    rng = np.random.RandomState(4)
    xs = [rng.randn(2, planes[i], 8 // (i + 1), 8 // (i + 1)).astype(np.float32)
          for i in range(n_inputs)]
    with torch.no_grad():
        want = ref([torch.from_numpy(v) for v in xs], (8, 8)).numpy()
    blk = RefineBlock(features=6, in_planes=tuple(planes), start=(n_inputs == 1), end=end)
    params = {"params": convert_refine_state_dict(ref.state_dict(), n_inputs, end=end)}
    got = nchw(blk.apply(params, [nhwc(v) for v in xs], (8, 8)))
    scale = max(np.abs(want).max(), 1e-3)
    np.testing.assert_allclose(got, want, atol=1e-4 * scale)


def RefineBlock_ref(cls, planes, features, end):
    return _randomize(cls(planes, features, start=(len(planes) == 1), end=end).eval(), 4)


def test_cond_blocks_structural():
    """Conditional variants run end-to-end with the tvc normalizer factory."""
    from tvc.models.diffusion.normalization import ConditionalInstanceNorm2dPlus

    def normalizer(nf, name=None):
        return ConditionalInstanceNorm2dPlus(num_features=nf, num_classes=10, name=name)

    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(2, 8, 8, 6).astype(np.float32))
    y = jnp.asarray([1, 7])
    blk = CondCRPBlock(features=6, n_stages=2, normalizer=normalizer)
    params = blk.init(jax.random.PRNGKey(0), x, y)
    out = blk.apply(params, x, y)
    assert out.shape == x.shape and np.isfinite(np.asarray(out)).all()

    xs = [x, jnp.asarray(rng.randn(2, 4, 4, 8).astype(np.float32))]
    rblk = CondRefineBlock(features=6, in_planes=(6, 8), normalizer=normalizer)
    rparams = rblk.init(jax.random.PRNGKey(1), xs, y, (8, 8))
    out = rblk.apply(rparams, xs, y, (8, 8))
    assert out.shape == (2, 8, 8, 6) and np.isfinite(np.asarray(out)).all()


# --------------------------------------------------------------------------
# GaussianFourierProjection + the fourier embedding branch in NCSNpp
# --------------------------------------------------------------------------


def test_gaussian_fourier_projection_parity():
    from models.better.layerspp import GaussianFourierProjection as RefGFP

    from tvc.models.diffusion.layers import GaussianFourierProjection

    ref = RefGFP(embedding_size=16, scale=16.0)
    w = ref.W.detach().numpy().copy()
    t = np.abs(np.random.RandomState(6).randn(4).astype(np.float32)) + 0.1
    with torch.no_grad():
        want = ref(torch.from_numpy(np.log(t))).numpy()

    gfp = GaussianFourierProjection(embedding_size=16, scale=16.0)
    got = gfp.apply({"params": {"W": jnp.asarray(w)}}, jnp.log(jnp.asarray(t)))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_ncsnpp_fourier_embedding_branch():
    """embedding_type='fourier' builds GFP as module 0 and runs end-to-end
    (ncsnpp_more.py:72-78, 264-268)."""
    from tvc.core.config import Config
    from tvc.models.diffusion.ncsnpp import NCSNpp, NCSNppSpec

    cfg = Config()
    cfg.data.image_size = 16
    cfg.data.num_frames = 2
    cfg.data.num_frames_cond = 1
    cfg.model.ngf = 16
    cfg.model.ch_mult = (1, 2)
    cfg.model.num_res_blocks = 1
    cfg.model.attn_resolutions = (8,)
    cfg.model.n_head_channels = 8
    cfg.model.embedding_type = "fourier"

    net = NCSNpp(spec=NCSNppSpec.from_config(cfg))
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(2, 16, 16, 6).astype(np.float32))
    cond = jnp.asarray(rng.randn(2, 16, 16, 3).astype(np.float32))
    sigmas = jnp.asarray([0.5, 2.0], jnp.float32)  # continuous noise levels
    params = net.init(jax.random.PRNGKey(0), x, sigmas, cond)
    assert "W" in params["params"]["m0"], "GFP must be all_modules[0]"
    out = net.apply(params, x, sigmas, cond)
    assert out.shape == (2, 16, 16, 6) and np.isfinite(np.asarray(out)).all()
