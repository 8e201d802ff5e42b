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


def pytest_collection_modifyitems(config, items):
    """Skip @pytest.mark.slow tests unless TVC_RUN_SLOW=1 (they cover the
    CPU-expensive I3D forward and full driver sweeps; ~5 extra minutes)."""
    if os.environ.get("TVC_RUN_SLOW") == "1":
        return
    skip = pytest.mark.skip(reason="slow; set TVC_RUN_SLOW=1 to run")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
