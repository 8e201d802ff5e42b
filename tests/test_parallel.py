"""Mesh/sharding tests on the 8-device virtual CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tvc.core.config import MeshConfig
from tvc.parallel.mesh import (
    data_sharding,
    make_mesh,
    param_partition_spec,
    partition_work,
    shard_params,
)


def test_make_mesh_shapes():
    mesh = make_mesh(MeshConfig(model_parallel=2))
    assert mesh.devices.size == 8
    assert mesh.shape["data"] == 4 and mesh.shape["model"] == 2
    mesh1 = make_mesh(MeshConfig(model_parallel=1))
    assert mesh1.shape["data"] == 8


def test_param_partition_spec_rules():
    spec = param_partition_spec((3, 3, 192, 384), "model", 2)
    assert spec[-1] == "model"
    # small params stay replicated
    assert param_partition_spec((384,), "model", 2) == jax.sharding.PartitionSpec()
    # indivisible dims stay replicated
    assert param_partition_spec((3, 3, 192, 191), "model", 2) == jax.sharding.PartitionSpec()


def test_data_sharding_roundtrip():
    mesh = make_mesh(MeshConfig(model_parallel=1))
    x = jnp.arange(16.0).reshape(8, 2)
    xs = jax.device_put(x, data_sharding(mesh, 2))
    np.testing.assert_allclose(np.asarray(jnp.sum(xs)), float(jnp.sum(x)))
    assert len(xs.sharding.device_set) == 8


def test_sharded_matmul_with_tp():
    mesh = make_mesh(MeshConfig(model_parallel=2))
    w = jnp.asarray(np.random.RandomState(0).randn(64, 512).astype(np.float32))
    x = jnp.asarray(np.random.RandomState(1).randn(8, 64).astype(np.float32))
    from jax.sharding import NamedSharding, PartitionSpec as P

    ws = jax.device_put(w, NamedSharding(mesh, P(None, "model")))
    xs = jax.device_put(x, data_sharding(mesh, 2))
    y = jax.jit(lambda a, b: a @ b)(xs, ws)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x @ w), atol=1e-4)


def test_partition_work():
    items = list(range(10))
    shards = [partition_work(items, 3, i) for i in range(3)]
    assert sorted(sum(shards, [])) == items
    assert abs(len(shards[0]) - len(shards[2])) <= 1


def test_collectives_on_cpu_mesh():
    from tvc.parallel.collectives import all_gather_frames, broadcast_from, ring_exchange

    mesh = make_mesh(MeshConfig(model_parallel=1))  # 8-way data axis
    x = jnp.arange(8 * 4, dtype=jnp.float32).reshape(8, 4)
    xs = jax.device_put(x, data_sharding(mesh, 2))

    g = all_gather_frames(xs, mesh)
    np.testing.assert_allclose(np.asarray(g), np.asarray(x))

    b = broadcast_from(xs, mesh, src=3)  # src's local block, replicated
    np.testing.assert_allclose(np.asarray(b), np.asarray(x[3:4]))

    r = ring_exchange(xs, mesh, shift=1)
    np.testing.assert_allclose(np.asarray(r), np.roll(np.asarray(x), 1, axis=0))


@pytest.mark.heavy
def test_dryrun_multichip_8():
    from tvc.parallel.train import dryrun_multichip

    dryrun_multichip(8)


@pytest.mark.slow
def test_dryrun_multichip_odd():
    from tvc.parallel.train import dryrun_multichip

    dryrun_multichip(1)
