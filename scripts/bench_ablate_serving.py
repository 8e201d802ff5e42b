"""Ablate the round-5 serving-path flags on the real TPU at the B=8
lockstep-batched serving shape (docs/PERF.md "future work" levers):

  TVC_FUSED_FIR=1    one-pass 2-D polyphase FIR (no (2H,W) intermediate)
  TVC_GN_BF16_IO=1   GroupNorm bf16 I/O with f32 statistics

Measures ONLY the batched UNet sampling cycle (the codec legs are
flag-independent). Each variant builds its own predictor + jit program in
the same process (the env flags are read at trace time).

Usage: python scripts/bench_ablate_serving.py [--steps 30] [--batch 8]
       [--variants base,fir,gn,both]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VARIANTS = {
    "base": dict(fir="0", gn="0"),
    "fir": dict(fir="1", gn="0"),
    "gn": dict(fir="0", gn="1"),
    "both": dict(fir="1", gn="1"),
}


def measure(steps: int, batch: int, fir: str, gn: str, reps: int = 3):
    os.environ["TVC_FUSED_FIR"] = fir
    os.environ["TVC_GN_BF16_IO"] = gn
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tvc.core.config import Config
    from tvc.pipeline.predictor import FramePredictor

    cfg = Config()
    cfg.sampling.subsample = steps
    pred = FramePredictor.create(
        cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16, fast_init=True,
        params_dtype=jnp.bfloat16,
    )
    cond = jnp.zeros((batch, 128, 128, 6), jnp.bfloat16)
    t0 = time.time()
    np.asarray(pred.generate(jax.random.PRNGKey(1), cond))
    compile_s = time.time() - t0
    # tiny-slice completion (not the full B-batch output fetch): the serving
    # path never fetches predictions synchronously, and the 100-step
    # extrapolation below would multiply a full fetch ~3x into the bound.
    # One discarded warm call first (the slice ops compile on first use).
    out = pred.generate(jax.random.PRNGKey(2), cond)
    np.asarray(out[0, 0, :1, :1, 0])
    t0 = time.time()
    for i in range(reps):
        out = pred.generate(jax.random.PRNGKey(3 + i), cond)
        np.asarray(out[0, 0, :1, :1, 0])
    t_cycle = (time.time() - t0) / reps
    # dispatch probe so the 100-step extrapolation doesn't multiply the RTT
    noop = jax.jit(lambda x: x + 1.0)
    operand = jnp.zeros((8, 128))
    np.asarray(noop(operand))
    t0 = time.time()
    for _ in range(5):
        np.asarray(noop(operand))
    t_disp = (time.time() - t0) / 5
    t_step = (t_cycle - t_disp) / (steps + 1)
    t_cycle100 = t_disp + t_step * 101
    # codec-free serving bound: 5 sweeps per 30-frame chain, B chains
    fps = 30.0 * batch / (5 * t_cycle100)
    return dict(compile_s=round(compile_s, 1),
                t_cycle=round(t_cycle, 4),
                t_step_ms=round(t_step * 1e3, 3),
                t_cycle100=round(t_cycle100, 3),
                fps_serving_nocodec=round(fps, 2))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--variants", type=str, default="base,fir,gn,both")
    args = ap.parse_args()
    for v in args.variants.split(","):
        kw = VARIANTS[v.strip()]
        res = measure(args.steps, args.batch, **kw)
        print(f"[{v}] FUSED_FIR={kw['fir']} GN_BF16_IO={kw['gn']}: {res}",
              flush=True)


if __name__ == "__main__":
    main()
