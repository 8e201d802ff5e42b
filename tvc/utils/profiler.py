"""Profiling utilities: parameter/FLOP counting and phase timers.

Replaces the reference's thop/ptflops profiling (`Network.py:19-20,646-664`)
with XLA's own cost analysis, and generalizes the ad-hoc per-phase `time`
dicts (Network.py:337-345, Inference.py:34-41) into a reusable timer. A thin
wrapper over `jax.profiler` trace collection is included for TPU traces.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Dict, Optional

import jax
import numpy as np


def count_params(tree: Any) -> int:
    return int(sum(np.prod(x.shape) for x in jax.tree_util.tree_leaves(tree)))


def cost_analysis(fn: Callable, *args, **kwargs) -> Dict[str, float]:
    """Lower+compile fn and return XLA's cost analysis (flops, bytes accessed)."""
    lowered = jax.jit(fn).lower(*args, **kwargs)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):  # older jax returns a per-computation list
        ca = ca[0]
    return {k: float(v) for k, v in ca.items() if np.isscalar(v)}


def flops(fn: Callable, *args, **kwargs) -> float:
    return cost_analysis(fn, *args, **kwargs).get("flops", float("nan"))


class PhaseTimer:
    """Accumulating wall-clock phase timer producing a reference-style
    {'y_enc': ..., 'z_enc': ...} dict."""

    def __init__(self):
        self.times: Dict[str, float] = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.time()
        try:
            yield
        finally:
            self.times[name] = self.times.get(name, 0.0) + time.time() - t0

    def as_dict(self) -> Dict[str, float]:
        return dict(self.times)


@contextlib.contextmanager
def device_trace(logdir: str):
    """jax.profiler trace context for TPU timeline capture."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
