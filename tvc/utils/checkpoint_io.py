"""Native checkpoint save/load for tvc param trees and train state.

The reference is load-only (SURVEY.md §5 checkpoint/resume: torch.load of
externally-trained artifacts). tvc adds first-class save/restore so the
training capability (tvc/parallel/train.py) can snapshot and resume:
flattened path->array npz (no pickle, portable), plus EMA and step.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


def _flatten(tree: Any) -> Dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def save_tree(path: str, tree: Any) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, **_flatten(tree))


def load_tree_into(path: str, template: Any) -> Any:
    """Load arrays saved by save_tree into the structure of `template`."""
    data = np.load(path if path.endswith(".npz") else path + ".npz")
    leaves_with_path, treedef = jax.tree_util.tree_flatten_with_path(template)
    out = []
    for p, leaf in leaves_with_path:
        key = "/".join(str(getattr(q, "key", getattr(q, "idx", q))) for q in p)
        arr = data[key]
        assert arr.shape == tuple(leaf.shape), (key, arr.shape, leaf.shape)
        out.append(arr)
    return jax.tree_util.tree_unflatten(treedef, out)


def save_train_state(path: str, params: Any, ema: Any, step: int,
                     opt_state: Optional[Any] = None) -> None:
    save_tree(path + ".params", params)
    save_tree(path + ".ema", ema)
    np.save(path + ".step.npy", np.asarray(step))
    if opt_state is not None:
        save_tree(path + ".opt", opt_state)


def load_train_state(path: str, params_template: Any, ema_template: Any,
                     opt_template: Optional[Any] = None) -> Tuple[Any, Any, int, Optional[Any]]:
    params = load_tree_into(path + ".params", params_template)
    ema = load_tree_into(path + ".ema", ema_template)
    step = int(np.load(path + ".step.npy"))
    opt = load_tree_into(path + ".opt", opt_template) if opt_template is not None else None
    return params, ema, step, opt
