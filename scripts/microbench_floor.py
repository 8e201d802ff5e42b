"""Isolate the per-scan-iteration overhead on the axon TPU backend.

Times several chained ops with a DIRECT tensor carry (no scalar reduction) and
a trivial op, to separate real op cost from per-iteration fixed overhead.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def time_scan(name, op, x0, iters=50, reps=3):
    def step(x, _):
        return op(x), None

    @jax.jit
    def chain(x):
        y, _ = jax.lax.scan(step, x, None, length=iters)
        return y

    np.asarray(chain(x0))
    times = []
    for _ in range(reps):
        t0 = time.time()
        np.asarray(chain(x0))
        times.append(time.time() - t0)
    t = min(times) / iters
    print(f"{name:46s} {t * 1e6:9.1f} us/op", flush=True)
    return t


def main():
    dt = jnp.bfloat16
    rs = np.random.RandomState(0)

    # floor: trivial elementwise on a tiny tensor
    x_tiny = jnp.asarray(rs.rand(8, 128), dt)
    time_scan("tiny x+1 (floor probe)", lambda x: x + 1, x_tiny, iters=200)

    # elementwise on a 128^2 x 192 tensor (pure HBM bandwidth)
    x_big = jnp.asarray(rs.rand(1, 128, 128, 192), dt)
    time_scan("x*1.0001+0.5 @128^2x192 (bw probe)", lambda x: x * 1.0001 + 0.5, x_big)

    # conv with tensor carry (shape-preserving)
    w = jnp.asarray(rs.rand(3, 3, 192, 192) * 0.01, dt)
    def conv(x):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32).astype(dt) * 0.1
    t = time_scan("conv3x3 192->192 @128^2 (tensor carry)", conv, x_big)
    print(f"    -> {128*128*9*192*192*2 / t / 1e12:.1f} TFLOP/s effective")

    # two convs per step: does the per-step cost double or add the floor?
    def conv2(x):
        return conv(conv(x))
    t2 = time_scan("2x conv3x3 192->192 @128^2", conv2, x_big)
    print(f"    -> marginal 2nd conv: {(t2 - t) * 1e6:.1f} us")

    # conv at 64^2 (quarter the FLOPs)
    x_mid = jnp.asarray(rs.rand(1, 64, 64, 192), dt)
    t64 = time_scan("conv3x3 192->192 @64^2 (tensor carry)", conv, x_mid)
    print(f"    -> {64*64*9*192*192*2 / t64 / 1e12:.1f} TFLOP/s effective")

    # groupnorm f32-cast with tensor carry
    from tvc.models.diffusion.layers import GroupNormRef
    gn = GroupNormRef(ch=192, dtype=dt)
    vgn = gn.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 192), dt))
    time_scan("groupnorm 192 @128^2 (tensor carry)",
              lambda x: gn.apply(vgn, x), x_big)

    # batched variants: B=8 conv
    x_b8 = jnp.asarray(rs.rand(8, 128, 128, 192), dt)
    tb = time_scan("conv3x3 192->192 @128^2 B=8", conv, x_b8)
    print(f"    -> {8*128*128*9*192*192*2 / tb / 1e12:.1f} TFLOP/s effective")


if __name__ == "__main__":
    main()
