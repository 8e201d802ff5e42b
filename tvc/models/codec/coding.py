"""Host-side bitstream driver for the ELIC codec.

Implements the real `compress`/`decompress` of the reference
(Network.py:336-441, 444-532): hyperprior z through the factorized coder, then
per-slice two-phase checkerboard coding through the Gaussian coder. All neural
stages run as cached jitted closures on the device; only quantized symbols and
(means, scales) tables cross to the host C++ rANS coder, packed to dense
H x (W/2) tensors exactly like the reference (Network.py:387-397).

Stream-order note: symbols are flattened in (C, H, W/2) channel-major order,
matching the reference's torch NCHW C-order flatten, so streams are layout-
compatible with the reference coder given equal parameters.
"""

from __future__ import annotations

import time
from functools import partial
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tvc.entropy.factorized import FactorizedCoder
from tvc.entropy.gaussian import GaussianCoder
from tvc.models.codec import checkerboard as cb
from tvc.models.codec.elic import ELICModel


def _to_cfirst(x: np.ndarray) -> np.ndarray:
    """(B,H,W,C) -> (B,C,H,W) for stream-order flattening."""
    return np.transpose(x, (0, 3, 1, 2))


def _to_clast(x: np.ndarray) -> np.ndarray:
    return np.transpose(x, (0, 2, 3, 1))


_STAGE_CACHE: Dict[Tuple, dict] = {}


def _stage_fns(m: ELICModel) -> dict:
    """Jitted stage programs, shared across ELICCoder instances with the same
    architecture (the reference loads 6 quality checkpoints of ONE model,
    city_sender.py:478-484 — weights are jit arguments, so all six coders hit
    the same compiled programs)."""
    key = (m.N, m.M, tuple(m.groups), str(m.dtype))
    if key in _STAGE_CACHE:
        return _STAGE_CACHE[key]

    def _enc(v, x):
        return m.apply(v, x, method=ELICModel.encode_transforms)

    def _hyp(v, z_hat):
        return m.apply(v, z_hat, method=ELICModel.hyper_params)

    def _syn(v, y_hat):
        return m.apply(v, y_hat, method=ELICModel.synthesize)

    phase1, phase2 = [], []
    for i in range(m.num_slices):
        def p1(v, y_hat_first, y_hat_prev, lm, ls, _i=i):
            sup = m.apply(v, _i, y_hat_first, y_hat_prev, lm, ls,
                          method=ELICModel.slice_support)
            mu_a, sc_a = m.apply(v, _i, sup, method=ELICModel.anchor_params)
            return sup, cb.pack_anchor(mu_a), cb.pack_anchor(sc_a)

        def p2(v, packed_anchor_q, sup, _i=i):
            y_anchor_dec = cb.unpack_anchor(packed_anchor_q)
            mu_n, sc_n = m.apply(v, _i, y_anchor_dec, sup,
                                 method=ELICModel.nonanchor_params)
            return y_anchor_dec, cb.pack_nonanchor(mu_n), cb.pack_nonanchor(sc_n)

        phase1.append(jax.jit(p1))
        phase2.append(jax.jit(p2))

    fns = {
        "enc": jax.jit(_enc),
        "hyp": jax.jit(_hyp),
        "syn": jax.jit(_syn),
        "phase1": phase1,
        "phase2": phase2,
        "pack_anchor": jax.jit(cb.pack_anchor),
        "pack_nonanchor": jax.jit(cb.pack_nonanchor),
        "unpack_nonanchor": jax.jit(cb.unpack_nonanchor),
    }
    _STAGE_CACHE[key] = fns
    return fns


class ELICCoder:
    """Binds an ELICModel + variables to host entropy coders."""

    def __init__(self, model: ELICModel, variables: dict):
        self.model = model
        self.variables = variables
        self.fb = FactorizedCoder(
            jax.tree_util.tree_map(np.asarray, variables["params"]["entropy_bottleneck"])
        )
        self.gc = GaussianCoder()
        fns = _stage_fns(model)
        self._encode_transforms = lambda x: fns["enc"](self.variables, x)
        self._hyper = lambda z: fns["hyp"](self.variables, z)
        self._synth = lambda y: fns["syn"](self.variables, y)
        self._phase1 = [
            (lambda *a, _f=f: _f(self.variables, *a)) for f in fns["phase1"]
        ]
        self._phase2 = [
            (lambda *a, _f=f: _f(self.variables, *a)) for f in fns["phase2"]
        ]
        self._pack_anchor = fns["pack_anchor"]
        self._pack_nonanchor = fns["pack_nonanchor"]
        self._unpack_nonanchor = fns["unpack_nonanchor"]

    # ---------------- compress ----------------

    def compress(self, x: np.ndarray, return_recon: bool = False) -> Dict[str, Any]:
        """x: (B,H,W,3) in [0,1]. Returns strings + z spatial shape + timings.

        return_recon=True also synthesizes x_hat from the compress-side decoded
        latents — identical to decompress() by construction (the encoder feeds
        its own decoded symbols forward, Network.py:401,427; equality is
        asserted in tests) at ~half the device round-trips. This is the sender
        fast path; the receiver still uses decompress()."""
        t0 = time.time()
        y, z = self._encode_transforms(jnp.asarray(x, jnp.float32))
        y.block_until_ready()
        t_enc = time.time() - t0

        z_np = np.asarray(z)
        t0 = time.time()
        z_strings = self.fb.compress(z_np)
        z_hat = self.fb.decompress(z_strings, z_np.shape[1:3])
        t_z = time.time() - t0

        t0 = time.time()
        lm, ls = self._hyper(jnp.asarray(z_hat))
        t_zdec = time.time() - t0

        splits = np.cumsum(self.model.groups)[:-1]
        y_slices = jnp.split(y, splits, axis=-1)

        t0 = time.time()
        y_strings: List[List[List[bytes]]] = []
        y_hat_slices: List[Any] = []
        y_hat_first = y_hat_prev = None
        for i in range(self.model.num_slices):
            sup, mu_a_p, sc_a_p = self._phase1[i](y_hat_first, y_hat_prev, lm, ls)
            ya_p = self._pack_anchor(y_slices[i])

            mu_a_np = _to_cfirst(np.asarray(mu_a_p))
            sc_a_np = _to_cfirst(np.asarray(sc_a_p))
            idx_a = self.gc.build_indexes(sc_a_np)
            anchor_strings = self.gc.compress(_to_cfirst(np.asarray(ya_p)), idx_a, mu_a_np)
            anchor_q = self.gc.decompress(anchor_strings, idx_a, mu_a_np)

            y_anchor_dec, mu_n_p, sc_n_p = self._phase2[i](
                jnp.asarray(_to_clast(anchor_q)), sup
            )
            yn_p = self._pack_nonanchor(y_slices[i])
            mu_n_np = _to_cfirst(np.asarray(mu_n_p))
            sc_n_np = _to_cfirst(np.asarray(sc_n_p))
            idx_n = self.gc.build_indexes(sc_n_np)
            non_anchor_strings = self.gc.compress(_to_cfirst(np.asarray(yn_p)), idx_n, mu_n_np)
            non_anchor_q = self.gc.decompress(non_anchor_strings, idx_n, mu_n_np)

            y_hat_slice = y_anchor_dec + self._unpack_nonanchor(
                jnp.asarray(_to_clast(non_anchor_q))
            )
            if i == 0:
                y_hat_first = y_hat_slice
            y_hat_prev = y_hat_slice
            y_hat_slices.append(y_hat_slice)
            y_strings.append([anchor_strings, non_anchor_strings])
        t_params = time.time() - t0

        out = {
            "strings": [y_strings, z_strings],
            "shape": tuple(z_np.shape[1:3]),
            "time": {"y_enc": t_enc, "z_enc": t_z, "z_dec": t_zdec, "params": t_params},
        }
        if return_recon:
            t0 = time.time()
            x_hat = self._synth(jnp.concatenate(y_hat_slices, axis=-1))
            out["x_hat"] = np.asarray(x_hat)
            out["time"]["y_dec"] = time.time() - t0
        return out

    # ---------------- decompress ----------------

    def decompress(self, strings, shape: Tuple[int, int]) -> Dict[str, Any]:
        """Mirror of compress driven only by the bitstreams (Network.py:444-532)."""
        y_strings, z_strings = strings
        z_hat = self.fb.decompress(z_strings, shape)
        lm, ls = self._hyper(jnp.asarray(z_hat))

        y_hat_slices = []
        y_hat_first = y_hat_prev = None
        for i in range(self.model.num_slices):
            sup, mu_a_p, sc_a_p = self._phase1[i](y_hat_first, y_hat_prev, lm, ls)
            mu_a_np = _to_cfirst(np.asarray(mu_a_p))
            sc_a_np = _to_cfirst(np.asarray(sc_a_p))
            idx_a = self.gc.build_indexes(sc_a_np)
            anchor_q = self.gc.decompress(y_strings[i][0], idx_a, mu_a_np)

            y_anchor_dec, mu_n_p, sc_n_p = self._phase2[i](
                jnp.asarray(_to_clast(anchor_q)), sup
            )
            mu_n_np = _to_cfirst(np.asarray(mu_n_p))
            sc_n_np = _to_cfirst(np.asarray(sc_n_p))
            idx_n = self.gc.build_indexes(sc_n_np)
            non_anchor_q = self.gc.decompress(y_strings[i][1], idx_n, mu_n_np)

            y_hat_slice = y_anchor_dec + self._unpack_nonanchor(
                jnp.asarray(_to_clast(non_anchor_q))
            )
            if i == 0:
                y_hat_first = y_hat_slice
            y_hat_prev = y_hat_slice
            y_hat_slices.append(y_hat_slice)

        y_hat = jnp.concatenate(y_hat_slices, axis=-1)
        t0 = time.time()
        x_hat = self._synth(y_hat)
        x_hat.block_until_ready()
        return {"x_hat": np.asarray(x_hat), "time": {"y_dec": time.time() - t0}}


def num_coded_bytes(strings) -> int:
    """Total byte count of a nested string structure (Inference.py:52-67)."""
    total = 0
    stack = [strings]
    while stack:
        s = stack.pop()
        if isinstance(s, (bytes, bytearray)):
            total += len(s)
        elif isinstance(s, (list, tuple)):
            stack.extend(s)
        else:
            raise TypeError(type(s))
    return total
