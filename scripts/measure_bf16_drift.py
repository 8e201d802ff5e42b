"""Measure bf16-vs-f32 sampler numerics at FULL flagship width on the chip.

Companion to tests/test_bf16_drift.py (which runs the flagship-shaped tiny
net on CPU). Reports:
  1. per-step eps-hat error (one UNet forward, identical weights/inputs) —
     the quantity that bounds per-step numerical damage;
  2. short-trajectory endpoint divergence (random weights; see docs/BF16.md
     for why this is checkpoint-dependent and NOT a drift sign-off).

With the real checkpoint available, pass --ckpt to turn (2) into the actual
drift measurement queued in PARITY.md.

Usage: python scripts/measure_bf16_drift.py [--steps 10] [--ckpt path.pt]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--ckpt", type=str, default=None)
    args = ap.parse_args()

    from tvc.core.config import Config
    from tvc.models.diffusion.ncsnpp import UNetMoreDDPM
    from tvc.pipeline.predictor import FramePredictor
    from tvc.utils.convert import load_diffusion_checkpoint

    cfg = Config()
    cfg.sampling.subsample = args.steps

    size, c = cfg.data.image_size, cfg.data.channels
    if args.ckpt:
        variables = load_diffusion_checkpoint(args.ckpt, cfg)
    else:
        print("[bf16] random weights (no --ckpt): trajectory numbers are "
              "NOT a drift sign-off, see docs/BF16.md")
        p = FramePredictor.create(cfg, jax.random.PRNGKey(5), fast_init=True)
        rng = np.random.RandomState(3)
        variables = jax.tree_util.tree_map(
            lambda a: jnp.asarray(rng.randn(*a.shape) * 0.05, a.dtype)
            if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating) else a,
            p.variables)

    # 1. per-step eps error at full width
    m32 = UNetMoreDDPM(cfg=cfg, dtype=jnp.float32)
    m16 = UNetMoreDDPM(cfg=cfg, dtype=jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, size, size, c * cfg.data.num_frames))
    cond = jax.random.normal(jax.random.PRNGKey(2),
                             (1, size, size, c * cfg.data.num_frames_cond))
    t = jnp.asarray([700], jnp.int32)
    e32 = np.asarray(jax.jit(m32.apply)(variables, x, t, cond), np.float64)
    e16 = np.asarray(jax.jit(m16.apply)(
        variables, x.astype(jnp.bfloat16), t, cond.astype(jnp.bfloat16)), np.float64)
    scale = max(np.abs(e32).max(), 1e-12)
    print(f"[bf16] flagship per-step eps error: "
          f"max_rel={np.abs(e32-e16).max()/scale:.4f} "
          f"mean_rel={np.abs(e32-e16).mean()/max(np.abs(e32).mean(),1e-12):.4f} "
          f"(out scale {scale:.4g})")

    # 2. trajectory endpoints
    p32 = FramePredictor(cfg, variables, dtype=jnp.float32)
    p16 = FramePredictor(cfg, variables, dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    cnd = jax.random.uniform(jax.random.PRNGKey(1),
                             (1, size, size, c * cfg.data.num_frames_cond))
    f32 = np.asarray(p32.generate(key, cnd), np.float64)
    bf16 = np.asarray(p16.generate(key, cnd.astype(jnp.bfloat16)), np.float64)
    dev = np.abs(f32 - bf16)
    mse = float(np.mean((f32 - bf16) ** 2))
    print(f"[bf16] {args.steps}-step endpoint: max={dev.max():.4f} "
          f"mean={dev.mean():.5f} psnr_f32_vs_bf16="
          f"{10*np.log10(1.0/max(mse,1e-12)):.2f} dB")


if __name__ == "__main__":
    main()
