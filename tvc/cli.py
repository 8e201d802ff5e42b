"""tvc command-line interface.

Replaces the reference's argparse+YAML entry point (city_sender.py:47-223)
with subcommands:

  python -m tvc.cli sweep   — rate sweep over a dataset npy (the city_sender
                              main flow)
  python -m tvc.cli codec   — encode/decode frames through the ELIC bitstream
  python -m tvc.cli anchors — ffmpeg H.264/H.265 anchor sweep
  python -m tvc.cli bench   — throughput benchmark (same as ./bench.py)

Config: --config YAML + --config-mod "section.key=value" dotted overrides
(safe literal parsing, tvc/core/config.py). Checkpoints: torch artifacts are
converted on load (tvc/utils/convert.py); omit them to run random-weight
smoke mode (clearly flagged).
"""

from __future__ import annotations

import argparse
import os
import sys
from typing import Dict, List, Optional


def _add_config_args(ap: argparse.ArgumentParser) -> None:
    ap.add_argument("--config", type=str, default=None, help="YAML config path")
    ap.add_argument("--config-mod", nargs="*", default=[],
                    help="dotted overrides: section.key=value")
    ap.add_argument("--seed", type=int, default=1234)


def _load_cfg(args):
    from tvc.core.config import load_config

    cfg = load_config(args.config, args.config_mod)
    cfg.seed = args.seed
    return cfg


def cmd_sweep(argv: List[str]) -> int:
    ap = argparse.ArgumentParser(prog="tvc sweep")
    _add_config_args(ap)
    ap.add_argument("--data-npy", required=True, help="(B,T,C,H,W) dataset npy")
    ap.add_argument("--output-path", required=True)
    ap.add_argument("--start-idx", type=int, default=0)
    ap.add_argument("--end-idx", type=int, default=0)
    ap.add_argument("--ckpt", type=str, default=None, help="diffusion checkpoint .pt")
    ap.add_argument("--codec-ckpts", nargs="*", default=None,
                    help="ELIC checkpoints q0..q5 (.pth.tar)")
    ap.add_argument("--qualities", nargs="*", type=int, default=[4, 5])
    ap.add_argument("--thresholds", nargs="*", type=float, default=None,
                    help="decision-threshold walk (default: 0.30..0.03 step -0.01)")
    ap.add_argument("--decision", choices=["lpips", "psnr"], default="lpips",
                    help="frame-accept rule: LPIPS <= rho (the reference's "
                         "decide_5to5_lpips default) or PSNR >= rho in dB "
                         "(decide_5to5, city_sender.py:353-374); supply "
                         "matching --thresholds for psnr (e.g. 30 28 26)")
    ap.add_argument("--no-fvd", action="store_true")
    ap.add_argument("--i3d-ckpt", type=str, default=None)
    ap.add_argument("--lpips-alex", type=str, default=None, help="torchvision alexnet .pth")
    ap.add_argument("--lpips-lin", type=str, default=None, help="lpips linear heads .pth")
    ap.add_argument("--bench-264", type=str, default=None)
    ap.add_argument("--bench-265", type=str, default=None)
    ap.add_argument("--sim-codec", action="store_true",
                    help="opt into the fused device-simulation codec for "
                         "keyframes (rate-exact, self-consistent, faster per "
                         "keyframe event, but streams are only decodable by "
                         "the encoder's own compiled programs). Default is "
                         "the exact transmissible path: host-CPU entropy-"
                         "parameter programs shared with the receiver, so "
                         "sweep outputs match what a real receiver decodes "
                         "bit-exactly")
    ap.add_argument("--exact-streams", action="store_true",
                    help=argparse.SUPPRESS)  # pre-round-3 spelling of the (now default) exact path
    ap.add_argument("--batched", type=int, default=0,
                    help="run all (video,q,rho) jobs as lockstep-batched GOP "
                         "chains with this batch size (0 = sequential)")
    ap.add_argument("--device-gop", action="store_true",
                    help="device-resident GOP loop (DeviceGOPRunner): "
                         "predictions stay on device (same sampler executable "
                         "a receiver runs — byte-exact transmissible), one "
                         "scalar fetch per predict cycle, exact keyframe "
                         "streams. Works sequentially or with --queue-dir "
                         "workers; not with --batched")
    ap.add_argument("--fused-gop", action="store_true",
                    help="whole-GOP-on-device: each GOP (sampling, LPIPS "
                         "decisions, fallback keyframes) runs as ONE XLA "
                         "program; bits are the likelihood estimate "
                         "(entropy-estimation bpp), not rANS byte counts. "
                         "Sequential mode only; incompatible with "
                         "--exact-streams/--batched/--queue-dir")
    ap.add_argument("--num-processes", type=int, default=1,
                    help="multi-host: total processes sharing the job list")
    ap.add_argument("--process-id", type=int, default=0)
    ap.add_argument("--queue-dir", type=str, default=None,
                    help="multi-host dynamic scheduling: pull (video,quality) "
                         "work units from a shared-filesystem work queue at "
                         "this path instead of static --num-processes/"
                         "--process-id partitioning; dead hosts' units are "
                         "re-claimed after --queue-stale-after seconds")
    ap.add_argument("--queue-stale-after", type=float, default=900.0)
    ap.add_argument("--allow-uncalibrated", action="store_true",
                    help="run even when LPIPS/FVD weights are missing. "
                         "Without real weights the accept/reject decisions "
                         "use random features and the resulting RD curves "
                         "are meaningless — hence opt-in; the override is "
                         "stamped as provenance.calibrated=false in the "
                         "run's config.yml")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    if args.fused_gop and (args.batched or args.queue_dir):
        print("[tvc] --fused-gop is sequential-mode only and uses the device "
              "codec; drop --batched/--queue-dir")
        return 2
    if args.device_gop and args.batched:
        print("[tvc] --device-gop runs GOP chains one at a time (sequential "
              "or --queue-dir workers); drop --batched")
        return 2

    cfg = _load_cfg(args)
    if args.sim_codec:
        cfg.codec.exact_streams = False
        print("[tvc] codec path: fused device simulation (--sim-codec); "
              "streams are NOT receiver-decodable — default is the exact "
              "transmissible path")
    elif args.exact_streams:
        cfg.codec.exact_streams = True  # already the default

    from tvc.metrics.fvd import FVDMetric
    from tvc.metrics.lpips import LPIPSMetric
    from tvc.models.codec.coding import ELICCoder
    from tvc.models.codec.elic import make_elic
    from tvc.pipeline.driver import load_dataset, run_sweep
    from tvc.pipeline.predictor import FramePredictor
    from tvc.utils.convert import load_codec_checkpoint, load_diffusion_checkpoint

    data = load_dataset(args.data_npy)

    lp = LPIPSMetric.create(args.lpips_alex, args.lpips_lin)
    fvd = None
    if not args.no_fvd:
        sd = None
        if args.i3d_ckpt:
            import torch

            sd = torch.load(args.i3d_ckpt, map_location="cpu")
        fvd = FVDMetric(sd)

    # Uncalibrated metrics are a hard failure by default: random AlexNet/I3D
    # features make accept/reject decisions (and FVD numbers) meaningless
    # while producing plausible-looking curves. The reference always loads
    # real weights (city_sender.py:302).
    calibrated = lp.calibrated and (fvd is None or fvd.calibrated)
    if not calibrated:
        missing = ([] if lp.calibrated else ["LPIPS (--lpips-alex/--lpips-lin)"]) + \
                  ([] if (fvd is None or fvd.calibrated) else ["FVD I3D (--i3d-ckpt)"])
        if not args.allow_uncalibrated:
            print("[tvc] ERROR: missing metric weights: " + ", ".join(missing)
                  + "; accept decisions/metrics would use random features. "
                    "Pass --allow-uncalibrated to run anyway (stamped into "
                    "provenance).", file=sys.stderr)
            return 2
        print("[tvc] WARNING: running UNCALIBRATED (" + ", ".join(missing)
              + "); RD outputs are not meaningful")
    provenance = {"calibrated": calibrated,
                  "lpips_calibrated": lp.calibrated,
                  "fvd_calibrated": (fvd is None or fvd.calibrated)}


    # codec coders per quality
    model = make_elic(cfg.codec)
    coders: Dict[int, ELICCoder] = {}
    for q in args.qualities:
        if args.codec_ckpts:
            variables = load_codec_checkpoint(args.codec_ckpts[q])
        else:
            print(f"[tvc] WARNING: random codec weights for q={q} (no --codec-ckpts)")
            variables = model.init(jax.random.PRNGKey(q), jnp.zeros((1, 64, 64, 3)))
        coders[q] = ELICCoder(model, variables,
                              entropy_backend=cfg.codec.entropy_backend)

    if args.ckpt:
        variables = load_diffusion_checkpoint(args.ckpt, cfg)
        predictor = FramePredictor(cfg, variables)
    else:
        print("[tvc] WARNING: random diffusion weights (no --ckpt)")
        predictor = FramePredictor.create(cfg)

    if args.queue_dir:
        from tvc.pipeline.driver import run_sweep_queued

        n = run_sweep_queued(
            cfg, data, coders, predictor, args.output_path, args.queue_dir,
            start_idx=args.start_idx, end_idx=args.end_idx,
            qualities=args.qualities, thresholds=args.thresholds,
            with_fvd=not args.no_fvd, lpips_metric=lp, fvd_metric=fvd,
            bench_264=args.bench_264, bench_265=args.bench_265,
            stale_after=args.queue_stale_after, provenance=provenance,
            device_gop=args.device_gop, use_psnr=args.decision == "psnr",
        )
        print(f"[queue] this process completed {n} work units")
    elif args.batched > 0:
        from tvc.pipeline.driver import run_sweep_batched

        run_sweep_batched(
            cfg, data, coders, predictor, args.output_path,
            start_idx=args.start_idx, end_idx=args.end_idx,
            qualities=args.qualities, thresholds=args.thresholds,
            batch_size=args.batched,
            with_fvd=not args.no_fvd, lpips_metric=lp, fvd_metric=fvd,
            num_processes=args.num_processes, process_id=args.process_id,
            provenance=provenance, use_psnr=args.decision == "psnr",
        )
    else:
        run_sweep(
            cfg, data, coders, predictor, args.output_path,
            start_idx=args.start_idx, end_idx=args.end_idx,
            qualities=args.qualities, thresholds=args.thresholds,
            with_fvd=not args.no_fvd,
            lpips_metric=lp, fvd_metric=fvd,
            bench_264=args.bench_264, bench_265=args.bench_265,
            fused_gop=args.fused_gop, device_gop=args.device_gop,
            provenance=provenance, use_psnr=args.decision == "psnr",
        )
    return 0


def cmd_codec(argv: List[str]) -> int:
    ap = argparse.ArgumentParser(prog="tvc codec")
    _add_config_args(ap)
    ap.add_argument("--input-npy", required=True, help="(T,H,W,3) or (T,C,H,W) [0,1] frames")
    ap.add_argument("--ckpt", type=str, default=None, help="ELIC checkpoint .pth.tar")
    ap.add_argument("--output-npy", type=str, default=None)
    ap.add_argument("--entropy-estimation", action="store_true",
                    help="likelihood-based bpp, no bitstreams (reference "
                         "city_sender --entropy-estimation)")
    ap.add_argument("--save-bitstream", type=str, default=None,
                    help="write the coded frames to a TVC1 container file")
    ap.add_argument("--from-bitstream", type=str, default=None,
                    help="receiver mode: decode a TVC1 container instead of "
                         "encoding --input-npy (which is then only used for "
                         "PSNR reporting)")
    args = ap.parse_args(argv)

    import numpy as np
    import jax
    import jax.numpy as jnp

    cfg = _load_cfg(args)
    from tvc.metrics.pixel import psnr
    from tvc.models.codec.coding import ELICCoder
    from tvc.models.codec.elic import make_elic
    from tvc.pipeline.keyframe import code_frames
    from tvc.utils.convert import load_codec_checkpoint

    x = np.load(args.input_npy).astype(np.float32)
    if x.ndim == 4 and x.shape[1] in (1, 3) and x.shape[-1] not in (1, 3):
        x = x.transpose(0, 2, 3, 1)
    model = make_elic(cfg.codec)
    if args.ckpt:
        variables = load_codec_checkpoint(args.ckpt)
    else:
        print("[tvc] WARNING: random codec weights")
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    if args.entropy_estimation:
        from tvc.models.codec.elic import ELICModel
        from tvc.pipeline.keyframe import pad_to_multiple

        xp, (pb, pr) = pad_to_multiple(x, cfg.codec.patch)
        out = model.apply(variables, jnp.asarray(xp), method=ELICModel.inference)
        bits = -float(jnp.sum(jnp.log2(out["likelihoods"]["y"]))
                      + jnp.sum(jnp.log2(out["likelihoods"]["z"])))
        x_hat = np.clip(np.asarray(out["x_hat"]), 0, 1)
        x_hat = x_hat[:, : xp.shape[1] - pb, : xp.shape[2] - pr, :]
        bpp = bits / (x.shape[0] * x.shape[1] * x.shape[2])
        print(f"[entropy-estimation] frames={x.shape[0]} bpp={bpp:.4f} "
              f"psnr={np.mean([psnr(x[i], x_hat[i]) for i in range(len(x))]):.2f}dB")
        if args.output_npy:
            np.save(args.output_npy, x_hat)
        return 0
    coder = ELICCoder(model, variables,
                      entropy_backend=cfg.codec.entropy_backend)
    if args.from_bitstream:
        # receiver: decode the container only
        from tvc.models.codec import container

        enc = container.load(args.from_bitstream,
                             expect_entropy_backend=cfg.codec.entropy_backend)
        dec = coder.decompress(enc["strings"], enc["shape"])
        x_hat = dec["x_hat"][:, : x.shape[1], : x.shape[2], :]
        bpp = float("nan")
        print(f"[receiver] decoded {x_hat.shape[0]} frames from {args.from_bitstream} "
              f"psnr={np.mean([psnr(x[i], x_hat[i]) for i in range(len(x))]):.2f}dB")
        if args.output_npy:
            np.save(args.output_npy, x_hat)
        return 0
    if args.save_bitstream:
        from tvc.models.codec import container
        from tvc.pipeline.keyframe import pad_to_multiple

        xp, _ = pad_to_multiple(x, cfg.codec.patch)
        enc = coder.compress(xp)
        # always record the coding profile (TVC2) so a mismatched receiver
        # fails loudly in BOTH directions instead of decoding garbage
        nbytes = container.save(args.save_bitstream, enc,
                                entropy_backend=cfg.codec.entropy_backend)
        print(f"[sender] wrote {nbytes} bytes "
              f"({nbytes * 8 / (x.shape[0] * x.shape[1] * x.shape[2]):.4f} bpp) "
              f"-> {args.save_bitstream}")
    x_hat, bits = code_frames(coder, x, cfg.codec.patch)
    bpp = sum(bits) / (x.shape[0] * x.shape[1] * x.shape[2])
    print(f"frames={x.shape[0]} bpp={bpp:.4f} "
          f"psnr={np.mean([psnr(x[i], x_hat[i]) for i in range(len(x))]):.2f}dB")
    if args.output_npy:
        np.save(args.output_npy, x_hat)
    return 0


def cmd_anchors(argv: List[str]) -> int:
    ap = argparse.ArgumentParser(prog="tvc anchors")
    ap.add_argument("--data-npy", required=True)
    ap.add_argument("--output", required=True,
                    help="output .npy path (generic mode) or directory "
                         "(--preset mode)")
    ap.add_argument("--workdir", default="/tmp/tvc_anchors")
    ap.add_argument("--preset", choices=["city", "uvg", "smm"], default=None,
                    help="per-dataset sweep reproducing the reference's "
                         "bench_{city,uvg,smm}.py semantics (codecs, pix_fmt, "
                         "frame counts, output naming); writes "
                         "bench_<preset>_26{4,5}.npy + per-video txt + an "
                         "averaged-curve plot into --output")
    ap.add_argument("--codec", choices=["libx264", "libx265"], default="libx264")
    ap.add_argument("--qp-min", type=int, default=0)
    ap.add_argument("--qp-max", type=int, default=51)
    ap.add_argument("--start-idx", type=int, default=0)
    ap.add_argument("--end-idx", type=int, default=0)
    args = ap.parse_args(argv)

    from tvc.bench.anchors import build_anchor_array, have_ffmpeg
    from tvc.pipeline.driver import load_dataset

    if not have_ffmpeg():
        print("ffmpeg not available; anchor harness requires it", file=sys.stderr)
        return 2
    import numpy as np

    if args.preset:
        from tvc.bench.presets import PRESETS, plot_average_curves, run_preset

        preset = PRESETS[args.preset]
        data = load_dataset(args.data_npy)
        if args.end_idx > 0:
            data = data[args.start_idx: args.end_idx + 1]
        arrays = run_preset(preset, data, args.workdir, args.output,
                            qp_range=range(args.qp_min, args.qp_max + 1))
        plot_average_curves(
            os.path.join(args.output, f"bench_{preset.name}_avg.png"),
            anchors_264=arrays.get("libx264"),
            anchors_265=arrays.get("libx265"),
            title=f"{preset.name} anchors",
        )
        print(f"preset {preset.name}: wrote {sorted(os.listdir(args.output))[:6]}... "
              f"-> {args.output}")
        return 0

    data = load_dataset(args.data_npy)[args.start_idx : args.end_idx + 1]
    arr = build_anchor_array(data, args.workdir, args.codec,
                             range(args.qp_min, args.qp_max + 1))
    np.save(args.output, arr)
    print(f"saved {arr.shape} -> {args.output}")
    return 0


def cmd_train(argv: List[str]) -> int:
    ap = argparse.ArgumentParser(prog="tvc train")
    _add_config_args(ap)
    ap.add_argument("--data-npy", required=True, help="(B,T,C,H,W) dataset npy")
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--snapshot-freq", type=int, default=500)
    ap.add_argument("--resume-from", type=str, default=None,
                    help="snapshot path prefix from a previous run "
                         "(e.g. out/ckpt_500) to restore params/EMA/"
                         "optimizer/step and continue until --steps")
    args = ap.parse_args(argv)

    cfg = _load_cfg(args)
    from tvc.pipeline.driver import load_dataset
    from tvc.pipeline.train_loop import train

    data = load_dataset(args.data_npy)
    metrics = train(cfg, data, num_steps=args.steps, batch_size=args.batch_size,
                    snapshot_freq=args.snapshot_freq, out_dir=args.out_dir,
                    resume_from=args.resume_from)
    print(metrics)
    return 0


def cmd_validate(argv: List[str]) -> int:
    """Single-command real-artifact validation harness (VERDICT r3 item 1).

    Converts every supplied reference artifact and verifies it against the
    strongest oracle available (the reference's own torch modules under
    --reference, golden known-answer values, byte-identity round trips);
    prints a per-artifact pass/fail/skip report and exits nonzero on any
    failure. Run it the moment real artifacts land:

      tvc validate --ckpt checkpoint_900000.pt \
          --codec-ckpts 0.pth.tar ... 5.pth.tar \
          --i3d i3d_pretrained_400.pt \
          --lpips-alex alexnet.pth --lpips-lin weights/v0.1/alex.pth \
          --data city_bonn.npy --report validate.json
    """
    ap = argparse.ArgumentParser(prog="tvc validate", description=cmd_validate.__doc__)
    ap.add_argument("--ckpt", type=str, default=None,
                    help="diffusion checkpoint_900000.pt (list layout: [0]=sd, [-1]=EMA)")
    ap.add_argument("--codec-ckpts", nargs="*", default=None,
                    help="ELIC checkpoints q0..q5 (.pth.tar)")
    ap.add_argument("--i3d", type=str, default=None, help="I3D weights (.pt state dict)")
    ap.add_argument("--lpips-alex", type=str, default=None,
                    help="torchvision alexnet state dict")
    ap.add_argument("--lpips-lin", type=str, default=None,
                    help="LPIPS linear heads (reference weights/v0.1/alex.pth)")
    ap.add_argument("--lpips-lin-vgg", type=str, default=None,
                    help="LPIPS vgg linear heads (weights/v0.1/vgg.pth)")
    ap.add_argument("--lpips-lin-squeeze", type=str, default=None,
                    help="LPIPS squeeze linear heads (weights/v0.1/squeeze.pth)")
    ap.add_argument("--data", type=str, default=None, help="city_bonn.npy")
    ap.add_argument("--reference", type=str, default="/root/reference",
                    help="reference repo for torch-module parity oracles")
    ap.add_argument("--no-bf16", action="store_true", help="skip the bf16 drift check")
    ap.add_argument("--no-rd", action="store_true", help="skip the real GOP RD point")
    ap.add_argument("--report", type=str, default=None, help="JSON report path")
    args = ap.parse_args(argv)

    from tvc.utils.validate import report, run_validation

    results = run_validation(
        ckpt=args.ckpt, codec_ckpts=args.codec_ckpts, i3d=args.i3d,
        lpips_alex=args.lpips_alex, lpips_lin=args.lpips_lin,
        data_npy=args.data, reference=args.reference,
        with_bf16=not args.no_bf16, with_rd=not args.no_rd,
        lpips_lin_vgg=args.lpips_lin_vgg,
        lpips_lin_squeeze=args.lpips_lin_squeeze)
    return report(results, args.report)


def cmd_bench(argv: List[str]) -> int:
    sys.argv = ["bench.py"] + argv
    import bench  # repo-root bench driver

    bench.main()
    return 0


def cmd_gop(argv: List[str]) -> int:
    """End-to-end transmissible GOP protocol at the CLI level.

    send:    encode one video's GOP; write a .tvcg payload file carrying
             exactly what crosses the channel — (seed, per-update accept
             counts, TVC1 container per keyframe coding event). The sender's
             reconstruction is written separately via --output-npy for
             verification against the receiver's.
    receive: rebuild the decoded sequence from the payload alone
             (tvc/pipeline/receiver.py); byte-identical to the sender's
             reconstruction by the deterministic-regeneration property.
    """
    ap = argparse.ArgumentParser(prog="tvc gop")
    _add_config_args(ap)
    ap.add_argument("mode", choices=["send", "receive"])
    ap.add_argument("--video-npy", required=True,
                    help="(T,H,W,3) or (T,C,H,W) [0,1] frames of ONE video")
    ap.add_argument("--payload", required=True, help=".tvcg payload file")
    ap.add_argument("--threshold", type=float, default=0.1)
    ap.add_argument("--decision", choices=["lpips", "psnr"], default="lpips",
                    help="accept rule: LPIPS <= threshold or PSNR >= "
                         "threshold (dB)")
    ap.add_argument("--num-frames", type=int, default=30)
    ap.add_argument("--ckpt", type=str, default=None, help="diffusion checkpoint .pt")
    ap.add_argument("--codec-ckpt", type=str, default=None, help="ELIC .pth.tar")
    ap.add_argument("--lpips-alex", type=str, default=None)
    ap.add_argument("--lpips-lin", type=str, default=None)
    ap.add_argument("--output-npy", type=str, default=None,
                    help="write the (sender's or receiver's) reconstruction")
    ap.add_argument("--device-gop", action="store_true",
                    help="send mode: encode through the device-resident "
                         "production latency path (DeviceGOPRunner) — same "
                         "transmissible payload and byte-identical receiver "
                         "reconstruction (prediction runs the same jitted "
                         "sampler executable the receiver runs), one scalar "
                         "fetch per predict cycle")
    ap.add_argument("--allow-uncalibrated", action="store_true",
                    help="send mode: allow accept decisions with random LPIPS "
                         "features (no --lpips-alex/--lpips-lin); stamped "
                         "calibrated=0 into the payload")
    args = ap.parse_args(argv)

    import numpy as np
    import jax
    import jax.numpy as jnp

    cfg = _load_cfg(args)
    from tvc.models.codec.coding import ELICCoder
    from tvc.models.codec.elic import make_elic
    from tvc.pipeline.predictor import FramePredictor
    from tvc.utils.convert import load_codec_checkpoint, load_diffusion_checkpoint

    video = np.load(args.video_npy).astype(np.float32)
    if video.ndim == 4 and video.shape[1] in (1, 3) and video.shape[-1] not in (1, 3):
        video = video.transpose(0, 2, 3, 1)
    T = min(args.num_frames, video.shape[0])

    model = make_elic(cfg.codec)
    if args.codec_ckpt:
        cvars = load_codec_checkpoint(args.codec_ckpt)
    else:
        print("[tvc] WARNING: random codec weights")
        cvars = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    coder = ELICCoder(model, cvars, entropy_backend=cfg.codec.entropy_backend)
    if args.ckpt:
        predictor = FramePredictor(cfg, load_diffusion_checkpoint(args.ckpt, cfg))
    else:
        print("[tvc] WARNING: random diffusion weights")
        predictor = FramePredictor.create(cfg)

    if args.mode == "send":
        from tvc.metrics.lpips import LPIPSMetric
        from tvc.pipeline.sender import DeviceGOPRunner, Sender, run_gop

        lp = LPIPSMetric.create(args.lpips_alex, args.lpips_lin)
        if not lp.calibrated and not args.allow_uncalibrated:
            print("[tvc] ERROR: LPIPS weights missing; accept decisions would "
                  "use random features. Pass --lpips-alex/--lpips-lin or "
                  "--allow-uncalibrated.", file=sys.stderr)
            return 2
        key = jax.random.PRNGKey(cfg.seed)
        use_psnr = args.decision == "psnr"
        if args.device_gop:
            runner = DeviceGOPRunner(cfg, predictor, lpips=lp,
                                     use_psnr=use_psnr, num_frames_total=T)
            gop = runner.run(coder, video, key, args.threshold,
                             patch=cfg.codec.patch, keep_streams=True)
        else:
            sender = Sender(threshold=args.threshold, cfg=cfg,
                            predictor=predictor, lpips=lp, use_psnr=use_psnr)
            gop = run_gop(sender, coder, video, key, T, cfg.codec.patch,
                          keep_streams=True)
        # Sampler-numerics env flags are part of the deterministic-
        # regeneration contract (they change the compiled sampler program,
        # exactly like codec.entropy_backend changes the codec programs —
        # which container.serialize already stamps). Stamp them so a
        # mismatched receiver fails loudly instead of silently regenerating
        # different frames.
        from tvc.models.diffusion.layers import _gn_bf16_io
        from tvc.ops.resample import _fused_fir_enabled, _polyphase_enabled

        payload = {
            "seed": np.int64(cfg.seed),
            "num_frames_total": np.int64(T),
            "accepts": np.asarray(gop.accepts, np.int64),
            "n_containers": np.int64(len(gop.containers)),
            "calibrated": np.int64(int(lp.calibrated)),
            "env_fused_fir": np.int64(int(_fused_fir_enabled())),
            "env_polyphase": np.int64(int(_polyphase_enabled())),
            "env_gn_bf16_io": np.int64(int(_gn_bf16_io())),
        }
        for i, c in enumerate(gop.containers):
            payload[f"container_{i}"] = np.frombuffer(c, np.uint8)
        np.savez(args.payload, **payload)
        print(f"[gop send] T={T} bits={gop.bits} bpp={gop.bpp:.4f} "
              f"d={[int(v) for v in gop.d[0]]} -> {args.payload}")
        if args.output_npy:
            np.save(args.output_npy, gop.x_ge[0])
    else:
        from tvc.pipeline.receiver import run_gop_receiver

        z = np.load(args.payload if args.payload.endswith(".npz")
                    else args.payload + ".npz")
        # refuse to regenerate with mismatched sampler-numerics env flags:
        # the regenerated frames would silently differ from the sender's
        # (payloads from before the stamping carry no env_* keys — accept
        # them as the defaults of their era were the current defaults)
        from tvc.models.diffusion.layers import _gn_bf16_io
        from tvc.ops.resample import _fused_fir_enabled, _polyphase_enabled

        for name, current in (("env_fused_fir", _fused_fir_enabled()),
                              ("env_polyphase", _polyphase_enabled()),
                              ("env_gn_bf16_io", _gn_bf16_io())):
            if name in z.files and int(z[name]) != int(current):
                print(f"[tvc] ERROR: payload was produced with {name}="
                      f"{int(z[name])} but this process runs {int(current)}; "
                      "regenerated frames would NOT match the sender's. Set "
                      "the matching TVC_* env var.", file=sys.stderr)
                return 2
        containers = [z[f"container_{i}"].tobytes()
                      for i in range(int(z["n_containers"]))]
        x = run_gop_receiver(
            cfg, [int(a) for a in z["accepts"]], containers, coder, predictor,
            jax.random.PRNGKey(int(z["seed"])),
            num_frames_total=int(z["num_frames_total"]))
        print(f"[gop receive] reconstructed {x.shape[0]} frames from "
              f"{args.payload}")
        if args.output_npy:
            np.save(args.output_npy, x)
    return 0


def main(argv: Optional[List[str]] = None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    cmds = {"sweep": cmd_sweep, "codec": cmd_codec, "anchors": cmd_anchors,
            "train": cmd_train, "bench": cmd_bench, "gop": cmd_gop,
            "validate": cmd_validate}
    if not argv or argv[0] in ("-h", "--help") or argv[0] not in cmds:
        print(f"usage: python -m tvc.cli {{{','.join(cmds)}}} ...")
        return 0 if argv and argv[0] in ("-h", "--help") else 1
    return cmds[argv[0]](argv[1:])


if __name__ == "__main__":
    raise SystemExit(main())
