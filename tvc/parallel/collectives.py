"""Reference-frame exchange collectives over the device mesh.

BASELINE north star: "videos and GOPs sharded across a multi-host slice with
decoded reference frames exchanged via collectives". In tvc's layout each
chip owns whole GOP chains (coding and prediction stay chip-local — the serial
dependency never crosses ICI), and these collectives cover the cases where
work *is* split:

- `all_gather_frames`: every chip contributes its decoded conditioning frames
  and receives the full set — used when the prediction batch is resharded
  across the data axis after per-owner keyframe decoding.
- `broadcast_from`: one chip (e.g. the keyframe-decoder of a shared intra
  period) sends its frames to all others on the axis.
- `ring_exchange`: neighbor hand-off of boundary frames for pipelined GOP
  scheduling across the ring.

All are shard_map-wrapped XLA collectives (psum/all_gather/ppermute) — they
ride ICI within a host and DCN across hosts; no NCCL-style manual transport.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def all_gather_frames(frames: jax.Array, mesh: Mesh, axis: str = "data") -> jax.Array:
    """(B_local, ...) sharded on `axis` -> (B_global, ...) replicated."""
    from jax.experimental.shard_map import shard_map

    def body(x):
        return jax.lax.all_gather(x, axis, axis=0, tiled=True)

    return shard_map(
        body, mesh=mesh,
        in_specs=P(axis), out_specs=P(),
        check_rep=False,
    )(frames)


def broadcast_from(frames: jax.Array, mesh: Mesh, src: int = 0, axis: str = "data") -> jax.Array:
    """Broadcast the src shard's frames to every device on the axis.

    frames: (n_axis, ...) with leading dim sharded over `axis`; returns the
    src slice replicated everywhere."""
    from jax.experimental.shard_map import shard_map

    def body(x):
        # mask all shards but src, then sum-reduce across the axis
        idx = jax.lax.axis_index(axis)
        contrib = jnp.where(idx == src, x, jnp.zeros_like(x))
        return jax.lax.psum(contrib, axis)

    return shard_map(
        body, mesh=mesh,
        in_specs=P(axis), out_specs=P(),
        check_rep=False,
    )(frames)


def ring_exchange(frames: jax.Array, mesh: Mesh, axis: str = "data",
                  shift: int = 1) -> jax.Array:
    """Each shard receives its left neighbor's frames (ppermute ring)."""
    from jax.experimental.shard_map import shard_map

    n = mesh.shape[axis]
    perm = [(i, (i + shift) % n) for i in range(n)]

    def body(x):
        return jax.lax.ppermute(x, axis, perm)

    return shard_map(
        body, mesh=mesh,
        in_specs=P(axis), out_specs=P(axis),
        check_rep=False,
    )(frames)
