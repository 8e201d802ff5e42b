"""ELIC codec tests: shapes, checkerboard algebra, bitstream round-trips,
bpp-estimate vs real coded size consistency. Uses a small-width codec so CPU
tests stay fast; channel-group logic is identical to the full model."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tvc.models.codec import checkerboard as cb
from tvc.models.codec.coding import ELICCoder, num_coded_bytes
from tvc.models.codec.elic import ELICModel

RNG = np.random.RandomState(7)


def small_model():
    return ELICModel(N=32, M=48, groups=(4, 4, 8, 8, 24))


@pytest.fixture(scope="module")
def model_and_vars():
    model = small_model()
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    return model, variables


def test_checkerboard_pack_unpack_roundtrip():
    y = jnp.asarray(RNG.randn(2, 8, 6, 5).astype(np.float32))
    pa = cb.pack_anchor(y)
    pn = cb.pack_nonanchor(y)
    assert pa.shape == (2, 8, 3, 5)
    ya = cb.unpack_anchor(pa)
    yn = cb.unpack_nonanchor(pn)
    np.testing.assert_allclose(np.asarray(ya + yn), np.asarray(y), atol=0)
    np.testing.assert_allclose(np.asarray(ya), np.asarray(cb.keep_anchor(y)), atol=0)
    np.testing.assert_allclose(np.asarray(yn), np.asarray(cb.keep_nonanchor(y)), atol=0)


def test_checkerboard_positions():
    h, w = 4, 4
    y = jnp.arange(h * w, dtype=jnp.float32).reshape(1, h, w, 1)
    pa = np.asarray(cb.pack_anchor(y))[0, :, :, 0]
    # even rows keep even cols; odd rows keep odd cols (Network.py:392-393)
    np.testing.assert_array_equal(pa[0], [0, 2])
    np.testing.assert_array_equal(pa[1], [5, 7])


def test_forward_shapes(model_and_vars):
    model, variables = model_and_vars
    x = jnp.asarray(RNG.rand(1, 64, 64, 3).astype(np.float32))
    out = model.apply(variables, x)
    assert out["x_hat"].shape == x.shape
    assert out["likelihoods"]["y"].shape == (1, 4, 4, 48)
    assert out["likelihoods"]["z"].shape == (1, 1, 1, 32)
    # noisequant training path
    out2 = model.apply(variables, x, True, jax.random.PRNGKey(1))
    assert out2["x_hat"].shape == x.shape


def test_inference_matches_forward_eval(model_and_vars):
    model, variables = model_and_vars
    x = jnp.asarray(RNG.rand(1, 64, 64, 3).astype(np.float32))
    a = model.apply(variables, x)
    b = model.apply(variables, x, method=ELICModel.inference)
    np.testing.assert_allclose(np.asarray(a["x_hat"]), np.asarray(b["x_hat"]), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(a["likelihoods"]["y"]), np.asarray(b["likelihoods"]["y"]), rtol=1e-4, atol=1e-6
    )


def test_compress_decompress_roundtrip(model_and_vars):
    """Real bitstream path must reproduce the STE inference reconstruction:
    decode(encode(x)) uses the same quantized latents."""
    model, variables = model_and_vars
    coder = ELICCoder(model, variables)
    x = RNG.rand(1, 64, 64, 3).astype(np.float32)
    enc = coder.compress(x)
    assert enc["shape"] == (1, 1)
    dec = coder.decompress(enc["strings"], enc["shape"])
    ref = model.apply(variables, jnp.asarray(x), method=ELICModel.inference)
    ref_x = np.clip(np.asarray(ref["x_hat"]), 0, 1)
    np.testing.assert_allclose(dec["x_hat"], ref_x, atol=2e-4)


def test_compress_bits_match_likelihood_estimate(model_and_vars):
    model, variables = model_and_vars
    coder = ELICCoder(model, variables)
    x = RNG.rand(1, 64, 64, 3).astype(np.float32)
    enc = coder.compress(x)
    real_bits = num_coded_bytes(enc["strings"]) * 8
    out = model.apply(variables, jnp.asarray(x), method=ELICModel.inference)
    est_bits = -float(
        jnp.sum(jnp.log2(out["likelihoods"]["y"])) + jnp.sum(jnp.log2(out["likelihoods"]["z"]))
    )
    # rANS overhead + scale-table quantization: real within ~15% + word slack
    assert real_bits < est_bits * 1.20 + 32 * 11 * 8, (real_bits, est_bits)
    assert real_bits > est_bits * 0.5


def test_compress_recon_equals_decompress(model_and_vars):
    """Transmissible path: compress(return_recon=True) must BIT-match
    decompress (compress and decompress share the host-CPU entropy-parameter
    programs — the rANS exactness contract)."""
    model, variables = model_and_vars
    coder = ELICCoder(model, variables)
    x = RNG.rand(1, 64, 64, 3).astype(np.float32)
    enc = coder.compress(x, return_recon=True)
    dec = coder.decompress(enc["strings"], enc["shape"])
    np.testing.assert_array_equal(enc["x_hat"], dec["x_hat"])


def test_fused_compress_matches_exact(model_and_vars):
    """The single-program simulation fast path (exact=False) must produce the
    same byte counts (rate-exactness) and a near-identical reconstruction;
    bit-identity is NOT promised across differently-compiled programs."""
    from tvc.models.codec.coding import num_coded_bytes

    model, variables = model_and_vars
    coder = ELICCoder(model, variables)
    x = RNG.rand(1, 64, 64, 3).astype(np.float32)
    enc = coder.compress(x, return_recon=True)
    encf = coder.compress(x, return_recon=True, exact=False)
    assert num_coded_bytes(enc["strings"]) == num_coded_bytes(encf["strings"])
    np.testing.assert_allclose(enc["x_hat"], encf["x_hat"], atol=1e-2)


@pytest.mark.slow
def test_fullsize_exact_byte_identity():
    """Full-size (N=192, M=320, 128x128) compress/decompress byte identity.

    Regression for the ulp-level params drift that small configs do not
    trigger: at full channel counts, differently-compiled programs flip
    quantization boundaries (observed max recon diff ~3e-3 with the fused
    encoder feeding the serial decoder), so the exact path must share
    entropy-parameter executables between both ends."""
    import jax.numpy as jnp

    from tvc.utils.fastinit import fast_init

    model = ELICModel()
    variables = fast_init(model, jnp.zeros((1, 128, 128, 3)), seed=0)
    coder = ELICCoder(model, variables)
    x = RNG.rand(1, 128, 128, 3).astype(np.float32)
    enc = coder.compress(x, return_recon=True)
    dec = coder.decompress(enc["strings"], enc["shape"])
    np.testing.assert_array_equal(enc["x_hat"], dec["x_hat"])


def test_decompress_is_deterministic(model_and_vars):
    model, variables = model_and_vars
    coder = ELICCoder(model, variables)
    x = RNG.rand(1, 64, 64, 3).astype(np.float32)
    enc = coder.compress(x)
    d1 = coder.decompress(enc["strings"], enc["shape"])
    d2 = coder.decompress(enc["strings"], enc["shape"])
    np.testing.assert_array_equal(d1["x_hat"], d2["x_hat"])


def test_nonsquare_frames(model_and_vars):
    """Asymmetric H x W through the full bitstream path (checkerboard packing
    and stream order must handle W != H)."""
    model, variables = model_and_vars
    coder = ELICCoder(model, variables)
    x = RNG.rand(1, 64, 128, 3).astype(np.float32)
    enc = coder.compress(x, return_recon=True)
    dec = coder.decompress(enc["strings"], enc["shape"])
    assert dec["x_hat"].shape == (1, 64, 128, 3)
    np.testing.assert_allclose(enc["x_hat"], dec["x_hat"], atol=1e-6)


def test_batch_compress(model_and_vars):
    model, variables = model_and_vars
    coder = ELICCoder(model, variables)
    x = RNG.rand(2, 64, 64, 3).astype(np.float32)
    enc = coder.compress(x)
    dec = coder.decompress(enc["strings"], enc["shape"])
    assert dec["x_hat"].shape == (2, 64, 64, 3)
    # per-element streams: 5 slices x [anchor, nonanchor] x batch 2
    assert len(enc["strings"][0]) == 5
    assert len(enc["strings"][0][0][0]) == 2


def test_subpixel_deconv_equals_conv_transpose():
    """Deconv's subpixel decomposition must equal the lhs-dilated
    ConvTranspose it replaces (torch ConvTranspose k5 s2 p2 op1 semantics),
    sharing the exact same (kh,kw,O,I) kernel parameter."""
    import flax.linen as nn
    from tvc.models.codec.layers import Deconv

    class Ref(nn.Module):
        out_ch: int

        @nn.compact
        def __call__(self, x):
            y = nn.ConvTranspose(self.out_ch, (5, 5), strides=(2, 2),
                                 padding="VALID", transpose_kernel=True,
                                 name="conv")(x)
            h, w = y.shape[1], y.shape[2]
            return y[:, 2 : h - 1, 2 : w - 1, :]

    for shape, out in [((2, 2, 2, 24), 16), ((1, 4, 6, 8), 5)]:
        x = jax.random.normal(jax.random.PRNGKey(1), shape)
        ref = Ref(out)
        v = ref.init(jax.random.PRNGKey(0), x)
        got = Deconv(out).apply(v, x)
        want = ref.apply(v, x)
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_factorized_quantize_contract(model_and_vars):
    """fb.quantize must equal decompress(compress(z)) bitwise (coding.py
    exact path shortcuts the z rANS with it)."""
    model, variables = model_and_vars
    coder = ELICCoder(model, variables)
    z = (RNG.randn(2, 4, 4, model.N) * 3).astype(np.float32)
    z_hat, sym = coder.fb.quantize(z)
    strings = coder.fb.compress(z)
    z_dec = coder.fb.decompress(strings, (4, 4))
    assert z_hat.tobytes() == z_dec.tobytes()
    strings2 = coder.fb.compress_symbols(sym)
    assert [bytes(s) for s in strings] == [bytes(s) for s in strings2]


def test_device_entropy_backend_roundtrip(model_and_vars):
    """entropy_backend='device': the shared entropy-parameter executables run
    on the default backend instead of pinned-host-CPU (the production choice
    on local TPU hosts where dispatch is ~0.2 ms and the 2-core VM CPU is
    the bottleneck). Compress/decompress must stay byte-exact — same
    executables on the same device."""
    model, variables = model_and_vars
    coder = ELICCoder(model, variables, entropy_backend="device")
    x = RNG.rand(2, 64, 64, 3).astype(np.float32)
    enc = coder.compress(x, return_recon=True)
    dec = coder.decompress(enc["strings"], enc["shape"])
    np.testing.assert_array_equal(enc["x_hat"], dec["x_hat"])


@pytest.mark.slow
def test_device_backend_cross_process(tmp_path):
    """entropy_backend='device' certified ACROSS processes (VERDICT r3 item 2):
    sender process writes a TVC1 container with device-backend entropy
    parameters; a separately-launched receiver process (fresh jit, fresh
    executables) decodes it; reconstructions must be byte-identical.

    In-suite this runs on the CPU backend via two real subprocesses through
    the CLI — exercising the full cross-process plumbing of the contract
    ("identically-compiled programs execute identically"). The same commands
    on the real chip are part of the verify recipe; axon-certified round 4
    (docs/PERF.md 'entropy_backend')."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    video = RNG.rand(2, 64, 64, 3).astype(np.float32)
    inp = tmp_path / "in.npy"
    np.save(inp, video)
    env = dict(os.environ)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")

    mods = ["--config-mod", "codec.N=32", "codec.M=48", "codec.groups=(4,4,8,8,24)",
            "codec.entropy_backend=device"]
    out = subprocess.run(
        [sys.executable, "-m", "tvc.cli", "codec", "--input-npy", str(inp),
         "--save-bitstream", str(tmp_path / "x.tvc1"),
         "--output-npy", str(tmp_path / "sender.npy"), *mods],
        cwd=repo, env=env, capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    out = subprocess.run(
        [sys.executable, "-m", "tvc.cli", "codec",
         "--from-bitstream", str(tmp_path / "x.tvc1"), "--input-npy", str(inp),
         "--output-npy", str(tmp_path / "recv.npy"), *mods],
        cwd=repo, env=env, capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]

    a = np.load(tmp_path / "sender.npy")
    b = np.load(tmp_path / "recv.npy")
    assert a.shape == b.shape
    assert a.tobytes() == b.tobytes(), \
        "device-backend cross-process reconstruction NOT byte-identical"
