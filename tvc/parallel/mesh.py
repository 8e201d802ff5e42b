"""Device-mesh topology and sharding specs.

The reference is single-GPU (CUDA_VISIBLE_DEVICES="0", city_sender.py:39) with
implicit DataParallel; the TPU build replaces that with an explicit 2-D
`jax.sharding.Mesh` — a `data` axis for videos/GOPs/rate-points and a `model`
axis for tensor-parallel weight sharding (SURVEY.md §2.8). Collectives are
inserted by XLA from sharding annotations (GSPMD), riding ICI within a host
and DCN across hosts.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tvc.core.config import Config, MeshConfig


def initialize_distributed(coordinator: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Multi-host bring-up (jax.distributed). No-op when single-process."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_mesh(cfg: Optional[MeshConfig] = None,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a (data, model) mesh over the available devices."""
    cfg = cfg or MeshConfig()
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    tp = max(1, cfg.model_parallel)
    if n % tp != 0:
        tp = 1
    dp = n // tp if cfg.data_parallel in (-1, 0) else cfg.data_parallel
    assert dp * tp == n, f"mesh {dp}x{tp} != {n} devices"
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, (cfg.data_axis, cfg.model_axis))


def data_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis; replicate the rest."""
    spec = P(mesh.axis_names[0], *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_partition_spec(path_leaf_shape, tp_axis: str, tp_size: int,
                         min_size: int = 2 ** 16) -> P:
    """Tensor-parallel rule: shard the output-channel (last) dim of large
    kernels when divisible by the model-axis size; replicate everything else.
    XLA/GSPMD inserts the matching all-gathers / reduce-scatters."""
    shape = path_leaf_shape
    if tp_size > 1 and len(shape) >= 2 and shape[-1] % tp_size == 0 and int(np.prod(shape)) >= min_size:
        return P(*([None] * (len(shape) - 1)), tp_axis)
    return P()


def shard_params(params, mesh: Mesh):
    """Apply the TP rule across a param pytree -> tree of NamedShardings."""
    tp_axis = mesh.axis_names[1]
    tp_size = mesh.shape[tp_axis]

    def spec_for(leaf):
        return NamedSharding(mesh, param_partition_spec(leaf.shape, tp_axis, tp_size))

    return jax.tree_util.tree_map(spec_for, params)


def partition_work(items: List, num_shards: int, shard_id: int) -> List:
    """Static round-robin partition of (video, quality, threshold) work items
    across hosts/processes — the data-axis of the sweep driver."""
    return [it for i, it in enumerate(items) if i % num_shards == shard_id]
