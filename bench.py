#!/usr/bin/env python
"""tvc benchmark driver: prints ONE JSON line for the scoring harness.

Metric (round 4+): frames/s/chip of the device-resident REAL worst-case
30-frame GOP at 128x128 — the measured end-to-end wall of the transmissible
path (7 serially-dependent 100-step sampler sweeps of the 262M UNet + 3
exact rANS keyframe pairs; trajectory [5,0,5,0,5,5,5], receiver-decodable
streams). This is what a real encode actually costs; the old 5-cycle+3-pair
arithmetic model is still reported as `fps_gop_model` in the info line.
Baseline: the reference's published ~0.125 frames/s worst case on a
V100-class GPU (BASELINE.md; its "<=5 generation cycles" worst case counts
no rejected sweeps, so this headline does strictly MORE work per GOP).
Falls back to the model metric when the device-GOP section is skipped
(--no-fused-gop / --no-codec).
"""

import argparse
import json
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="10 sampling steps, extrapolated to the 100-step budget")
    ap.add_argument("--steps", type=int, default=None, help="override sampling steps")
    ap.add_argument("--no-codec", action="store_true")
    ap.add_argument("--dtype", choices=["bf16", "f32"], default="bf16")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--throughput-batch", type=int, default=8,
                    help="also measure the lockstep-batched serving path at "
                         "this GOP-chain batch (0 = skip)")
    ap.add_argument("--no-fused-gop", action="store_true",
                    help="skip the whole-GOP-on-device program measurement")
    ap.add_argument("--precision-schedule", type=str, default="",
                    help="sampling.precision_schedule for the measured "
                         "sampler, e.g. f32:10 (mixed-precision hedge; "
                         "docs/BF16.md). Off by default: adds a second "
                         "UNet instance to the program (longer compile)")
    ap.add_argument("--profile-dir", type=str, default=None,
                    help="capture a jax.profiler trace of the steady-state "
                         "timing section into this directory")
    args = ap.parse_args()

    import os

    import jax
    import jax.numpy as jnp

    # Optional persistent XLA compile cache (TVC_JAX_CACHE=/path). Disabled by
    # default: the axon remote-compile backend stalls when the persistent
    # cache is enabled (observed: >20 min vs ~70 s for the same program).
    cache_dir = os.environ.get("TVC_JAX_CACHE", "")
    if cache_dir:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from tvc.bench.throughput import bench_pipeline

    subsample = args.steps if args.steps is not None else (10 if args.quick else 100)
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32

    t0 = time.time()
    import contextlib

    prof = (jax.profiler.trace(args.profile_dir) if args.profile_dir
            else contextlib.nullcontext())
    with prof:
        res = bench_pipeline(
            subsample=subsample,
            dtype=dtype,
            include_codec=not args.no_codec,
            batch=args.batch,
            throughput_batch=args.throughput_batch,
            fused_gop=not args.no_fused_gop,
            precision_schedule=args.precision_schedule,
        )
    wall = time.time() - t0

    baseline_fps = 0.125
    info = {
        "platform": jax.devices()[0].platform,
        "device": str(jax.devices()[0]),
        "sample_steps_measured": res.n_sample_steps,
        "t_unet_step_s": round(res.t_unet_step, 4),
        "t_cycle100_s": round(res.t_cycle, 3),
        "t_keyframe_pair_s": round(res.t_keyframe_pair, 3),
        "t_keyframe_pair_fused_s": round(res.t_keyframe_pair_fused, 3),
        "codec_path": "exact (transmissible bitstream, host rANS)",
        "precision_schedule": args.precision_schedule or "uniform",
        "compile_s": round(res.compile_time, 1),
        "bench_wall_s": round(wall, 1),
    }
    if res.t_fused_gop:
        info.update({
            "t_fused_gop_s": round(res.t_fused_gop, 3),
            "fused_gop_cycles": res.fused_gop_cycles,
            "fps_fused_gop": round(res.fps_fused_gop, 3),
        })
    if res.t_device_gop:
        info.update({
            "t_device_gop_s": round(res.t_device_gop, 3),
            "t_device_gop_band_s": [round(res.t_device_gop_min, 3),
                                    round(res.t_device_gop_max, 3)],
            "fps_device_gop_real": round(res.fps_device_gop, 3),
            "fps_device_gop_bound": round(res.fps_device_gop_bound, 3),
            "device_gop_overhead_ms": round(res.device_gop_overhead_ms, 1),
            "fps_device_gop_acceptall": round(res.fps_device_gop_acceptall, 3),
        })
    if res.throughput_batch:
        info.update({
            "throughput_batch": res.throughput_batch,
            "t_cycle100_batched_s": round(res.t_cycle_batched, 3),
            "t_keyframes_batched_s": round(res.t_keyframes_batched, 3),
            "fps_throughput_batched": round(res.fps_throughput, 3),
        })
    info["fps_gop_model"] = round(res.fps_gop, 4)  # old 5-cycle+3-pair model
    print(json.dumps(info), file=sys.stderr)
    if res.fps_device_gop:
        metric = ("frames/s/chip (device-resident REAL worst-case 30-frame "
                  "GOP, exact transmissible streams, 128x128)")
        value = res.fps_device_gop
    else:
        metric = "frames/s/chip (worst-case 30-frame GOP encode+decode, 128x128)"
        value = res.fps_gop
    print(json.dumps({
        "metric": metric,
        "value": round(value, 4),
        "unit": "frames/s/chip",
        "vs_baseline": round(value / baseline_fps, 2),
    }))


if __name__ == "__main__":
    main()
