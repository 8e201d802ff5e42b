"""Phase breakdown of the device-resident REAL GOP (the bench headline).

Run on the real chip: python scripts/profile_device_gop.py [steps]
Prints per-rep phase timings (cycle dispatch->score-fetch walls, keyframe
event walls, final assembly fetch) so the gap between the measured GOP wall
and the sampler-serial hard bound is attributable.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from tvc.core.config import Config
from tvc.metrics.lpips import LPIPSMetric
from tvc.models.codec.coding import ELICCoder
from tvc.models.codec.elic import ELICModel
from tvc.pipeline.keyframe import code_frames
from tvc.pipeline.predictor import FramePredictor
from tvc.pipeline.sender import DeviceGOPRunner
from tvc.utils.fastinit import fast_init


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    cfg = Config()
    cfg.sampling.subsample = steps
    print(f"platform={jax.devices()[0].platform} steps={steps}", flush=True)

    predictor = FramePredictor.create(cfg, jax.random.PRNGKey(0),
                                      dtype=jnp.bfloat16, fast_init=True,
                                      params_dtype=jnp.bfloat16)
    model = ELICModel()
    variables = fast_init(model, jnp.zeros((1, 128, 128, 3)), seed=3)
    coder = ELICCoder(model, variables)
    frames = np.random.RandomState(0).rand(2, 128, 128, 3).astype(np.float32)
    t0 = time.time()
    code_frames(coder, frames, exact=True)
    print(f"codec compiled in {time.time()-t0:.1f}s", flush=True)

    lp = LPIPSMetric.create()
    runner = DeviceGOPRunner(cfg, predictor, lpips=lp, num_frames_total=30)
    video = (np.random.RandomState(5).rand(30, 128, 128, 3) * 255).round().astype(np.uint8)
    forced = [5, 0, 5, 0, 5, 5, 5]

    t0 = time.time()
    runner.run(coder, video, jax.random.PRNGKey(41), 0.1, forced_accepts=forced)
    print(f"device GOP compiled+ran in {time.time()-t0:.1f}s", flush=True)


    for rep in range(3):
        timings = {}
        t0 = time.time()
        out = runner.run(coder, video, jax.random.PRNGKey(42 + rep), 0.1,
                         forced_accepts=forced, timings=timings)
        wall = time.time() - t0
        cyc = timings.get("cycle_fetch", [])
        kfs = timings.get("keyframes", [])
        print(f"rep{rep}: wall={wall:.3f}s  "
              f"cycles={len(cyc)}x sum={sum(cyc):.3f}s ({[round(v,3) for v in cyc]})  "
              f"keyframes={len(kfs)}x sum={sum(kfs):.3f}s ({[round(v,3) for v in kfs]})  "
              f"assemble={timings.get('assemble', 0):.3f}s  "
              f"other={wall - sum(cyc) - sum(kfs) - timings.get('assemble', 0):.3f}s",
              flush=True)


if __name__ == "__main__":
    main()
