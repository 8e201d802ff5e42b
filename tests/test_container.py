"""Bitstream container: serialize -> file -> deserialize -> decode parity."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tvc.models.codec import container
from tvc.models.codec.coding import ELICCoder
from tvc.models.codec.elic import ELICModel

RNG = np.random.RandomState(31)


def test_container_roundtrip(tmp_path):
    model = ELICModel(N=16, M=24, groups=(4, 4, 4, 4, 8))
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    coder = ELICCoder(model, variables)
    x = RNG.rand(2, 64, 64, 3).astype(np.float32)
    enc = coder.compress(x, return_recon=True)

    path = str(tmp_path / "frames.tvc")
    nbytes = container.save(path, enc)
    assert nbytes > 0

    loaded = container.load(path)
    assert loaded["shape"] == enc["shape"]
    # byte-identical stream structure
    assert loaded["strings"][1] == enc["strings"][1]
    for s1, s2 in zip(loaded["strings"][0], enc["strings"][0]):
        assert s1[0] == s2[0] and s1[1] == s2[1]

    # a fresh receiver decodes the container to the sender's reconstruction
    receiver = ELICCoder(model, variables)
    dec = receiver.decompress(loaded["strings"], loaded["shape"])
    np.testing.assert_allclose(dec["x_hat"], enc["x_hat"], atol=1e-6)


def test_container_rejects_garbage():
    with pytest.raises(AssertionError):
        container.deserialize(b"NOPE" + b"\x00" * 16)


def test_tvc2_profile_roundtrip_and_mismatch():
    """TVC2 coding profile: the recorded entropy backend round-trips, a
    mismatched receiver fails loudly, and TVC1 (no profile) skips the check."""
    import pytest

    from tvc.models.codec import container

    # 1 slice, batch 1
    enc = {"strings": [[[[b"anchor"], [b"non"]]], [b"zz"]], "shape": (2, 3)}

    blob2 = container.serialize(enc, entropy_backend="device")
    assert blob2[:4] == b"TVC2"
    dec = container.deserialize(blob2, expect_entropy_backend="device")
    assert dec["entropy_backend"] == "device"
    assert dec["shape"] == (2, 3)
    assert dec["strings"][0][0][0][0] == b"anchor"

    with pytest.raises(ValueError, match="entropy_backend"):
        container.deserialize(blob2, expect_entropy_backend="cpu")

    blob1 = container.serialize(enc)  # no profile -> TVC1, check skipped
    assert blob1[:4] == b"TVC1"
    dec1 = container.deserialize(blob1, expect_entropy_backend="device")
    assert dec1["entropy_backend"] is None
