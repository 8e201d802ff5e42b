"""Ablate sampler-step optimizations on the real TPU.

Measures ONLY the UNet sampling cycle (no codec) for several variants in one
process. Each variant builds its own predictor + jit program. ~5 min compile
per variant on axon.

Usage: python scripts/bench_ablate.py [--steps 30] [--variants A,B,C,D]
  A: polyphase FIR + bf16 params   (current default)
  B: generic upfirdn + bf16 params
  C: generic upfirdn + f32 params  (round-1 configuration)
  D: polyphase FIR + f32 params
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(steps: int, polyphase: bool, params_bf16: bool, reps: int = 3):
    os.environ["TVC_POLYPHASE"] = "1" if polyphase else "0"
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tvc.core.config import Config
    from tvc.pipeline.predictor import FramePredictor

    cfg = Config()
    cfg.sampling.subsample = steps
    pred = FramePredictor.create(
        cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16, fast_init=True,
        params_dtype=jnp.bfloat16 if params_bf16 else None,
    )
    cond = jnp.zeros((1, 128, 128, 6), jnp.bfloat16)
    t0 = time.time()
    np.asarray(pred.generate(jax.random.PRNGKey(1), cond))
    compile_s = time.time() - t0
    # tiny-slice completion, one discarded warm call (round-5 methodology:
    # a full-output fetch is a ~25% additive term with its own variance —
    # see docs/PERF.md "Methodology lesson")
    out = pred.generate(jax.random.PRNGKey(2), cond)
    np.asarray(out[0, 0, :1, :1, 0])
    t0 = time.time()
    for i in range(reps):
        out = pred.generate(jax.random.PRNGKey(3 + i), cond)
        np.asarray(out[0, 0, :1, :1, 0])
    t_cycle = (time.time() - t0) / reps
    # dispatch overhead probe
    noop = jax.jit(lambda x: x + 1.0)
    operand = jnp.zeros((8, 128))
    np.asarray(noop(operand))
    t0 = time.time()
    for _ in range(5):
        np.asarray(noop(operand))
    t_disp = (time.time() - t0) / 5
    t_step = (t_cycle - t_disp) / (steps + 1)
    return dict(compile_s=round(compile_s, 1), t_cycle=round(t_cycle, 4),
                t_disp=round(t_disp * 1e3, 1), t_step_ms=round(t_step * 1e3, 3))


VARIANTS = {
    "A": dict(polyphase=True, params_bf16=True),
    "B": dict(polyphase=False, params_bf16=True),
    "C": dict(polyphase=False, params_bf16=False),
    "D": dict(polyphase=True, params_bf16=False),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--variants", type=str, default="A,B,C")
    args = ap.parse_args()
    for v in args.variants.split(","):
        kw = VARIANTS[v.strip()]
        res = measure(args.steps, **kw)
        print(f"[{v}] polyphase={kw['polyphase']} bf16_params={kw['params_bf16']}: "
              f"{res}", flush=True)


if __name__ == "__main__":
    main()
