"""Micro-benchmark UNet components on the real TPU.

Times each hot component of the 262M NCSN++ step in a lax.scan of ITERS
applications (serial data dependency via a scalar carry, so XLA cannot
parallelize or DCE the chain) — one dispatch per measurement, so remote-tunnel
dispatch overhead does not pollute per-op numbers.

Usage: python scripts/microbench_unet.py [--iters 50] [--only conv,attn,...]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def time_chain(name, make_op, x_shape, dtype, iters, params=None, reps=3):
    """op: y = f(params, x); chained via scalar feedback into x.

    SLOPE timing: the chain is compiled at two lengths (iters and iters//4)
    and the per-op time is (t_long - t_short) / (n_long - n_short). This
    cancels the constant per-call cost — on the axon tunneled backend the
    dispatch+fetch RTT is ~30 ms, which would otherwise put a ~1 ms/op
    floor under every measurement at iters=30 (round-2 numbers had this)."""
    x0 = jnp.asarray(np.random.RandomState(0).rand(*x_shape), dtype)
    op = make_op()

    def step(s, _):
        x = x0 * (1 + s * 1e-9).astype(dtype)
        y = op(params, x) if params is not None else op(x)
        return jnp.mean(y.astype(jnp.float32)), None

    def make_chain(n):
        @jax.jit
        def chain(s0):
            s, _ = jax.lax.scan(step, s0, None, length=n)
            return s
        return chain

    n_long, n_short = iters, max(iters // 4, 1)
    c_long, c_short = make_chain(n_long), make_chain(n_short)
    np.asarray(c_long(jnp.float32(0.0)))  # compile
    np.asarray(c_short(jnp.float32(0.0)))
    tl, ts = [], []
    for r in range(reps):
        t0 = time.time()
        np.asarray(c_long(jnp.float32(r)))
        tl.append(time.time() - t0)
        t0 = time.time()
        np.asarray(c_short(jnp.float32(r)))
        ts.append(time.time() - t0)
    t = (min(tl) - min(ts)) / (n_long - n_short)
    print(f"{name:42s} {t * 1e6:9.1f} us/op", flush=True)
    return t


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--only", type=str, default="")
    ap.add_argument("--dtype", choices=["bf16", "f32"], default="bf16")
    ap.add_argument("--batch", type=int, default=1, help="batch size for every op (serving-path B=8 analysis)")
    args = ap.parse_args()
    only = set(args.only.split(",")) if args.only else None
    dt = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    it = args.iters
    B = args.batch

    import flax.linen as nn

    from tvc.models.diffusion.layers import (
        AttnBlockpp, DDPMConv, GroupNormRef, ResnetBlockBigGAN)
    from tvc.ops.resample import downsample_2d, upsample_2d

    def sel(k):
        return only is None or k in only

    def flax_op(mod, x_shape):
        m = mod
        v = m.init(jax.random.PRNGKey(0), jnp.zeros(x_shape, dt))
        v = jax.tree_util.tree_map(lambda a: a.astype(dt) if a.dtype == jnp.float32 else a, v)
        return (lambda p, x: m.apply(p, x)), v

    if sel("conv"):
        for (cin, cout, res) in [(192, 192, 128), (384, 192, 128), (192, 192, 64),
                                 (384, 384, 32), (768, 768, 8)]:
            op, v = flax_op(DDPMConv(out_ch=cout, kernel_size=3, dtype=dt),
                            (B, res, res, cin))
            flops = B * res * res * 9 * cin * cout * 2
            t = time_chain(f"conv3x3 {cin}->{cout} @{res}^2", lambda: op,
                           (B, res, res, cin), dt, it, params=v)
            print(f"    -> {flops / t / 1e12:.1f} TFLOP/s effective")

    if sel("gn"):
        for (ch, res) in [(192, 128), (192, 64), (384, 32)]:
            op, v = flax_op(GroupNormRef(ch=ch, dtype=dt), (B, res, res, ch))
            time_chain(f"groupnorm {ch} @{res}^2 (f32 stats)", lambda: op,
                       (B, res, res, ch), dt, it, params=v)

    if sel("res"):
        class _Res(nn.Module):
            @nn.compact
            def __call__(self, x):
                temb = jnp.zeros((x.shape[0], 768), dt)
                return ResnetBlockBigGAN(in_ch=x.shape[-1], out_ch=192, dtype=dt,
                                         name="r")(x, temb)
        op, v = flax_op(_Res(), (B, 128, 128, 192))
        time_chain("resblock 192->192 @128^2 (with temb)", lambda: op,
                   (B, 128, 128, 192), dt, it, params=v)

    if sel("attn"):
        for backend in ("einsum", "pallas"):
            for (ch, res) in [(384, 32), (576, 16), (768, 8)]:
                op, v = flax_op(
                    AttnBlockpp(channels=ch, n_head_channels=192,
                                attn_backend=backend, dtype=dt),
                    (1, res, res, ch))
                time_chain(f"attn[{backend}] {ch}ch @{res}^2", lambda: op,
                           (B, res, res, ch), dt, it, params=v)

    if sel("fir"):
        time_chain("fir down @128^2 x192", lambda: (lambda x: downsample_2d(x, (1, 3, 3, 1))),
                   (B, 128, 128, 192), dt, it)
        time_chain("fir up @64^2 x192", lambda: (lambda x: upsample_2d(x, (1, 3, 3, 1))),
                   (B, 64, 64, 192), dt, it)

    if sel("unet"):
        from tvc.core.config import Config
        from tvc.models.diffusion.ncsnpp import UNetMoreDDPM

        cfg = Config()
        model = UNetMoreDDPM(cfg=cfg, dtype=dt)
        x = jnp.zeros((B, 128, 128, 15), dt)
        cond = jnp.zeros((B, 128, 128, 6), dt)
        labels = jnp.zeros((B,), jnp.int32)
        shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), x, labels, cond)
        v = jax.tree_util.tree_map(lambda s: jnp.full(s.shape, 0.01, dt)
                                   if s.dtype == jnp.float32 else jnp.zeros(s.shape, s.dtype), shapes)

        def step(s, _):
            xx = x * (1 + s * 1e-9).astype(dt)
            y = model.apply(v, xx, labels, cond)
            return jnp.mean(y.astype(jnp.float32)), None

        @jax.jit
        def chain(s0):
            s, _ = jax.lax.scan(step, s0, None, length=min(it, 20))
            return s

        t0 = time.time()
        np.asarray(chain(jnp.float32(0.0)))
        print(f"unet compile: {time.time() - t0:.1f}s", flush=True)
        times = []
        for r in range(3):
            t0 = time.time()
            np.asarray(chain(jnp.float32(r)))
            times.append(time.time() - t0)
        t = min(times) / min(it, 20)
        print(f"{'unet fwd (scan-amortized)':42s} {t * 1e3:9.3f} ms/step", flush=True)


if __name__ == "__main__":
    main()
