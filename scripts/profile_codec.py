"""Profile the exact-path codec host-side breakdown.

Usage: JAX_PLATFORMS=cpu python scripts/profile_codec.py [cpu|device]

The optional arg picks codec.entropy_backend (default cpu). Run with
backend=device ON THE REAL CHIP (no JAX_PLATFORMS prefix; axon overrides it
anyway) to measure the production device-backend pair cost for docs/PERF.md.
"""
import os
import sys

if (sys.argv[1:] or ["cpu"])[0] != "device":
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time
import numpy as np
import jax
import jax.numpy as jnp

from tvc.models.codec.coding import ELICCoder
from tvc.models.codec.elic import ELICModel
from tvc.pipeline.keyframe import code_frames
from tvc.utils.fastinit import fast_init


def main():
    backend = (sys.argv[1:] or ["cpu"])[0]
    print(f"entropy_backend={backend} platform={jax.devices()[0].platform}")
    model = ELICModel()
    variables = fast_init(model, jnp.zeros((1, 128, 128, 3)), seed=3)
    coder = ELICCoder(model, variables, entropy_backend=backend)
    frames = np.random.RandomState(0).rand(2, 128, 128, 3).astype(np.float32)

    # warm
    code_frames(coder, frames, exact=True)
    code_frames(coder, frames, exact=False)

    for exact in (True, False):
        times = []
        for _ in range(5):
            t0 = time.time()
            code_frames(coder, frames, exact=exact)
            times.append(time.time() - t0)
        print(f"exact={exact}: pair {np.median(times)*1e3:.1f} ms")

    # phase timing detail from compress()
    from tvc.pipeline.keyframe import pad_to_multiple
    x, _ = pad_to_multiple(frames, 64)
    out = coder.compress(x, return_recon=True, exact=True)
    print("compress timings (s):", {k: round(v, 4) for k, v in out["time"].items()})
    t0 = time.time()
    dec = coder.decompress(out["strings"], out["shape"])
    print(f"decompress total: {time.time()-t0:.4f}s  detail:",
          {k: round(v, 4) for k, v in dec["time"].items()})

    # micro: how long do the host-CPU stage programs alone take?
    fns = coder._fns
    z_np, y_packed = jax.device_get(fns["enc"](coder.variables, jnp.asarray(x)))
    z_strings = coder.fb.compress(z_np)
    t0 = time.time(); z_hat = coder.fb.decompress(z_strings, z_np.shape[1:3]); t_zd = time.time()-t0
    t0 = time.time(); lm, ls = jax.block_until_ready(fns["hyp"](coder._v_cpu, z_hat)); t_h = time.time()-t0
    print(f"z fb.decompress {t_zd*1e3:.1f} ms; hyp {t_h*1e3:.1f} ms")

    groups = model.groups
    y_hat_first = None
    prev_a = prev_n = None
    import collections
    agg = collections.defaultdict(float)
    for i in range(model.num_slices):
        t0 = time.time()
        sup, y_hat_first, pa = jax.block_until_ready(
            fns["phase1"][i](coder._v_cpu, prev_a, prev_n, y_hat_first, lm, ls))
        agg[f"p1[{i}]"] = time.time() - t0
        mu_a, sc_a = coder._split_params(np.asarray(pa), groups[i])
        offs = np.concatenate([[0], np.cumsum(groups)])
        ya = np.transpose(y_packed[..., offs[i]:offs[i+1]], (0, 3, 1, 2))
        t0 = time.time()
        idx = coder.gc.build_indexes(sc_a)
        agg[f"build_idx_a[{i}]"] = time.time() - t0
        t0 = time.time()
        s = coder.gc.compress(ya, idx, mu_a)
        agg[f"rans_a[{i}]"] = time.time() - t0
        anchor_q = np.transpose(np.round(ya - mu_a).astype(np.float32) + np.asarray(mu_a, np.float32), (0, 2, 3, 1))
        t0 = time.time()
        prev_a, pn = jax.block_until_ready(fns["phase2"][i](coder._v_cpu, anchor_q, sup))
        agg[f"p2[{i}]"] = time.time() - t0
        mu_n, sc_n = coder._split_params(np.asarray(pn), groups[i])
        yn = np.transpose(y_packed[..., sum(groups)+offs[i]:sum(groups)+offs[i+1]], (0, 3, 1, 2))
        t0 = time.time()
        idxn = coder.gc.build_indexes(sc_n)
        sn = coder.gc.compress(yn, idxn, mu_n)
        agg[f"rans_n[{i}]"] = time.time() - t0
        prev_n = np.transpose(np.round(yn - mu_n).astype(np.float32) + np.asarray(mu_n, np.float32), (0, 2, 3, 1))
    for k, v in agg.items():
        print(f"  {k}: {v*1e3:.1f} ms")
    print(f"  slice total: {sum(agg.values())*1e3:.1f} ms")


if __name__ == "__main__":
    main()
