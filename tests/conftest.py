"""Test configuration: force a virtual 8-device CPU mesh before JAX backends init.

TPU-style multi-chip code is tested without a pod by asking XLA for 8 host
devices — the standard JAX idiom for testing sharding logic (SURVEY.md §4).

The dev box pins JAX_PLATFORMS=axon (a tunneled TPU); plain env overrides are
re-applied by the axon site hook, so we go through jax.config instead.
Export TVC_TEST_PLATFORM=axon to run the test-suite on the real chip.
"""

import os

platform = os.environ.get("TVC_TEST_PLATFORM", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", platform)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def tiny_pipeline():
    """Shared tiny predictor/coder/LPIPS stack (compiled once per session)."""
    import jax as _jax
    import jax.numpy as jnp

    from tvc.core.config import Config
    from tvc.metrics.lpips import LPIPSMetric
    from tvc.models.codec.coding import ELICCoder
    from tvc.models.codec.elic import ELICModel
    from tvc.pipeline.predictor import FramePredictor

    cfg = Config()
    cfg.data.image_size = 64
    cfg.data.num_frames = 3
    cfg.data.num_frames_cond = 2
    cfg.model.ngf = 16
    cfg.model.ch_mult = (1, 2)
    cfg.model.num_res_blocks = 1
    cfg.model.attn_resolutions = (32,)
    cfg.model.n_head_channels = 8
    cfg.model.num_classes = 20
    cfg.sampling.subsample = 5
    cfg.codec.patch = 64

    predictor = FramePredictor.create(cfg)
    codec = ELICModel(N=16, M=24, groups=(4, 4, 4, 4, 8))
    variables = codec.init(_jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    coder = ELICCoder(codec, variables)
    lp = LPIPSMetric.create()
    return cfg, predictor, coder, lp


def pytest_collection_modifyitems(config, items):
    """Skip @pytest.mark.slow tests unless TVC_RUN_SLOW=1 (they cover the
    CPU-expensive I3D forward and full driver sweeps; ~5 extra minutes)."""
    if os.environ.get("TVC_RUN_SLOW") == "1":
        return
    skip = pytest.mark.skip(reason="slow; set TVC_RUN_SLOW=1 to run")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
