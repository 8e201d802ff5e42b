"""Host-side parameter materialization without tracing init programs.

`module.init` compiles the full forward as an XLA program — minutes for the
262M UNet on the axon remote-compile backend. For benchmarks and smoke runs
the parameter *values* don't matter, so these helpers build the tree from
`jax.eval_shape` (pure Python) and fill it on the host.
"""

from __future__ import annotations

import hashlib
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def zeros_like_tree(shapes: Any, fill: float = 0.01) -> Any:
    return jax.tree_util.tree_map(lambda s: jnp.full(s.shape, fill, s.dtype), shapes)


def random_like_tree(shapes: Any, scale: float = 0.02, seed: int = 0) -> Any:
    """Deterministic host-side gaussian fill, keyed by leaf path."""
    flat = jax.tree_util.tree_flatten_with_path(shapes)
    leaves, treedef = flat
    out = []
    for path, s in leaves:
        h = int.from_bytes(
            hashlib.sha256((str(path) + str(seed)).encode()).digest()[:4], "little"
        )
        rng = np.random.RandomState(h)
        out.append(jnp.asarray(rng.randn(*s.shape).astype(np.float32) * scale, s.dtype))
    return jax.tree_util.tree_unflatten(treedef, out)


def fast_init(module, *args, mode: str = "random", seed: int = 0, **kwargs) -> Any:
    """eval_shape the module init and materialize params host-side."""
    shapes = jax.eval_shape(module.init, jax.random.PRNGKey(seed), *args, **kwargs)
    if mode == "zeros":
        return zeros_like_tree(shapes)
    return random_like_tree(shapes, seed=seed)


def force_fetch(x: Any) -> float:
    """Force full device execution + host fetch (some remote backends return
    from block_until_ready before compute finishes; a host transfer cannot)."""
    leaves = jax.tree_util.tree_leaves(x)
    total = 0.0
    for leaf in leaves:
        total += float(np.asarray(leaf).ravel()[0])
    return total
