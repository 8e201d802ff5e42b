"""Whole-GOP-on-device sender: the entire 30-frame state machine is ONE XLA
program.

The reference runs its GOP loop on the host (city_sender.py:495-607): every
predict cycle dispatches a 100-step sampler, fetches 5 frames, scores LPIPS,
and conditionally codes keyframes — paying a host round-trip per stage. tvc's
host loop (tvc/pipeline/sender.py) already fuses each cycle into one program;
this module goes the rest of the way, TPU-native: sampling, the LPIPS
accept-prefix decision (city_sender.py:376-406), frame-buffer updates, and
fallback keyframe coding (:537-548) all compile into one `lax.while_loop`
program. One device call encodes a whole GOP; only the final frames /
decisions / bit estimate cross back to the host.

Semantics: this is the IN-PROCESS sweep path (the reference's own semantics —
city_sender simulates sender+receiver in one process). Keyframes go through
the fused device codec (`ELICModel.inference`): reconstructions equal the
`compress_forward` fast path by construction, and the bit count is the
likelihood estimate (entropy-estimation bpp, Network.py:534-640) rather than
rANS byte counts — typically within ~1% (rANS stream overhead). For
transmissible TVC1 containers use the host loop with exact streams
(tvc/pipeline/sender.py run_gop keep_streams=True).

Key-split order mirrors run_gop exactly (key,sub = split; knoise,ksamp =
split(sub)), so given the same PRNGKey the fused program walks the same
trajectory as the host loop.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tvc.core.config import Config
from tvc.metrics.lpips import LPIPSMetric
from tvc.metrics.pixel import psnr_jax
from tvc.pipeline.predictor import FramePredictor
from tvc.pipeline.transforms import data_transform, inverse_data_transform


@dataclasses.dataclass
class FusedGOPSender:
    """Binds models + params and compiles the whole-GOP program.

    use_psnr: decide with PSNR >= rho instead of LPIPS <= rho
    (decide_5to5 vs decide_5to5_lpips, city_sender.py:353-406).
    """

    cfg: Config
    predictor: FramePredictor
    coder: Any                      # ELICCoder (uses .model / .variables)
    lpips: Optional[LPIPSMetric] = None
    num_frames_total: int = 30
    use_psnr: bool = False

    def __post_init__(self):
        cfg = self.cfg
        nc = cfg.data.num_frames_cond
        n_pred = cfg.data.num_frames
        T = self.num_frames_total
        size = cfg.data.image_size
        c = cfg.data.channels
        assert size % cfg.codec.patch == 0, (
            "fused GOP path requires H=W to be a multiple of codec.patch; "
            "use the host loop (run_gop) for odd sizes")
        assert cfg.data.num_frames_future == 0, (
            "fused GOP path supports the standard past-conditioning config")
        pad = max(n_pred, nc)
        max_updates = T  # worst case: 1 accepted frame per update
        sample_fn = self.predictor.sample_fn
        elic = self.coder.model
        lpips_model = self.lpips.model if self.lpips is not None else None
        use_psnr = self.use_psnr
        dtype = self.predictor.dtype

        def code_pair(ev, frames):
            """Device keyframe coding: fused recon + PER-FRAME likelihood bits.

            Per-frame bits let callers mask out frames past the GOP end: the
            host loop's tail fallback slices `video_gt[l:l+nc]`, which numpy
            clamps to the real frames, so the fused path must not count bits
            for padded positions >= T."""
            out = elic.apply(ev, frames, method=elic.inference)
            lk = out["likelihoods"]
            bits = -(jnp.sum(jnp.log2(lk["y"].astype(jnp.float32)), axis=(1, 2, 3))
                     + jnp.sum(jnp.log2(lk["z"].astype(jnp.float32)), axis=(1, 2, 3)))
            # clamp like the real decode path (Network.py:529); inference()
            # itself returns g_s output unclamped
            return jnp.clip(out["x_hat"].astype(jnp.float32), 0.0, 1.0), bits

        def gop(uv, ev, lp, video, key, threshold, forced):
            """video: (T+pad, H, W, C) f32 [0,1] (padded past T);
            forced: (max_updates,) int32, -1 = decide by metric."""

            x_ge = jnp.zeros((T + pad, size, size, c), jnp.float32)
            d = jnp.zeros((T + pad,), jnp.int32)
            accepts = jnp.full((max_updates,), -1, jnp.int32)

            dec0, bits0 = code_pair(ev, video[:nc])
            bits0 = jnp.sum(bits0)  # initial pair is always fully inside the GOP
            x_ge = jax.lax.dynamic_update_slice(x_ge, dec0, (0, 0, 0, 0))
            d = jax.lax.dynamic_update_slice(d, jnp.ones((nc,), jnp.int32), (0,))

            def cond_fn(st):
                return st[0] < T

            def body_fn(st):
                count, upd, x_ge, d, bits, accepts, key = st
                key, sub = jax.random.split(key)

                # --- predict n_pred frames from the last nc decoded frames ---
                cond = jax.lax.dynamic_slice(
                    x_ge, (count - nc, 0, 0, 0), (nc, size, size, c))
                # (nc,H,W,C) -> (1,H,W,nc*C) frame-major channel stacking
                cond = jnp.transpose(cond, (1, 2, 0, 3)).reshape(1, size, size, nc * c)
                cond = data_transform(cfg, cond.astype(dtype))
                knoise, ksamp = jax.random.split(sub)
                x_init = jax.random.normal(
                    knoise, (1, size, size, c * n_pred), dtype)
                out = sample_fn(uv, ksamp, x_init, cond)[-1]
                out = inverse_data_transform(cfg, out.astype(jnp.float32))
                preds = out.reshape(size, size, n_pred, c).transpose(2, 0, 1, 3)

                # --- accept-prefix decision (city_sender.py:376-406) ---
                gt = jax.lax.dynamic_slice(
                    video, (count, 0, 0, 0), (n_pred, size, size, c))
                if use_psnr:
                    scores = psnr_jax(preds, gt, axis=(1, 2, 3))
                    ok = scores >= threshold
                else:
                    scores = lpips_model.apply({"params": lp}, preds, gt)
                    ok = scores <= threshold
                valid = (count + jnp.arange(n_pred)) < T
                ok = ok & valid
                n_acc = jnp.sum(jnp.cumprod(ok.astype(jnp.int32)))
                n_acc = jnp.where(forced[upd] >= 0,
                                  jnp.minimum(forced[upd], jnp.sum(valid)),
                                  n_acc)

                # write the accepted prefix into the decoded buffer
                window = jax.lax.dynamic_slice(
                    x_ge, (count, 0, 0, 0), (n_pred, size, size, c))
                keep = (jnp.arange(n_pred) < n_acc)[:, None, None, None]
                x_ge = jax.lax.dynamic_update_slice(
                    x_ge, jnp.where(keep, preds, window), (count, 0, 0, 0))

                # --- fallback: transmit the next nc frames (:537-548) ---
                def fallback(ops):
                    x_ge, d, bits = ops
                    gt2 = jax.lax.dynamic_slice(
                        video, (count, 0, 0, 0), (nc, size, size, c))
                    dec, b2 = code_pair(ev, gt2)
                    # frames past the GOP end are padding — count no bits for
                    # them (host loop slices video_gt[l:l+nc], clamped to T)
                    valid2 = ((count + jnp.arange(nc)) < T).astype(jnp.float32)
                    x_ge = jax.lax.dynamic_update_slice(x_ge, dec, (count, 0, 0, 0))
                    d = jax.lax.dynamic_update_slice(
                        d, jnp.ones((nc,), jnp.int32), (count,))
                    return x_ge, d, bits + jnp.sum(b2 * valid2)

                def accepted(ops):
                    return ops

                do_fb = n_acc == 0
                x_ge, d, bits = jax.lax.cond(do_fb, fallback, accepted,
                                             (x_ge, d, bits))
                accepts = accepts.at[upd].set(n_acc)
                count = count + jnp.where(do_fb, nc, n_acc)
                return count, upd + 1, x_ge, d, bits, accepts, key

            st = (jnp.int32(nc), jnp.int32(0), x_ge, d, bits0, accepts, key)
            count, upd, x_ge, d, bits, accepts, _ = jax.lax.while_loop(
                cond_fn, body_fn, st)
            return {
                "x_ge": x_ge[:T],
                "d": d[:T],
                "bits": bits,
                "n_updates": upd,
                "accepts": accepts,
            }

        self._gop_raw = gop
        self._gop = jax.jit(gop)
        self._gop_batched = jax.jit(jax.vmap(gop, in_axes=(None, None, None, 0, 0, 0, 0)))
        # run_sharded caches. Entries hold STRONG references to their source
        # objects and are matched by identity (`is`), never by id() ints: an
        # id() key without a live reference can alias a new object allocated
        # at a dead one's address and silently reuse stale replicated
        # weights or a shape-locked executable (VERDICT r4 / ADVICE r4).
        self._mesh_entries: list = []    # [mesh, sharded_jit]
        self._param_entries: list = []   # [mesh, pv, cv, lv, replicated_tuple]
        self._compiled_entries: list = []  # [param_entry, B, executable]
        # stable sentinel for "no LPIPS": a fresh {} per call would make
        # every identity lookup miss and re-replicate + recompile each call
        self._empty_lp: dict = {}
        self._pad = pad
        self._max_updates = max_updates

    def _prep_video(self, video_gt: np.ndarray) -> jnp.ndarray:
        T = self.num_frames_total
        v = jnp.asarray(video_gt[:T], jnp.float32)
        # replicate (not zero) padding past T: a tail fallback codes the pad
        # region jointly with real frames, and replicated content keeps the
        # coded batch natural; its bits are masked out regardless (code_pair)
        pad = jnp.broadcast_to(v[-1:], (self._pad,) + v.shape[1:])
        return jnp.concatenate([v, pad], axis=0)

    def run(self, video_gt: np.ndarray, key: jax.Array, threshold: float,
            forced_accepts: Optional[np.ndarray] = None,
            coder_variables: Optional[dict] = None) -> Dict[str, Any]:
        """Encode one GOP fully on device. video_gt: (>=T, H, W, C) in [0,1].

        forced_accepts: optional (n,) int array overriding the metric decision
        at each update (-1 entries fall back to the metric) — used for
        deterministic worst-case benchmarking. coder_variables: per-call codec
        weights (the reference's 6 quality checkpoints share one compiled
        program — weights are a runtime argument). Returns device arrays; the
        caller chooses what to fetch."""
        forced = np.full((self._max_updates,), -1, np.int32)
        if forced_accepts is not None:
            forced[: len(forced_accepts)] = np.asarray(forced_accepts, np.int32)
        return self._gop(
            self.predictor.variables,
            coder_variables if coder_variables is not None else self.coder.variables,
            self.lpips.params if self.lpips is not None else {},
            self._prep_video(video_gt), key, jnp.float32(threshold),
            jnp.asarray(forced))

    def run_batched(self, videos: np.ndarray, keys: jax.Array,
                    thresholds: np.ndarray,
                    forced_accepts: Optional[np.ndarray] = None) -> Dict[str, Any]:
        """Lockstep-batched whole-GOP encode: (B,>=T,H,W,C) videos, (B,2) keys,
        (B,) thresholds. vmap of the while_loop runs all chains in lockstep on
        device (finished chains mask their writes) — the device-resident
        analogue of tvc/pipeline/batched.py."""
        B = videos.shape[0]
        forced = np.full((B, self._max_updates), -1, np.int32)
        if forced_accepts is not None:
            fa = np.asarray(forced_accepts, np.int32)
            forced[:, : fa.shape[1]] = fa
        v = jnp.stack([self._prep_video(videos[i]) for i in range(B)])
        return self._gop_batched(
            self.predictor.variables, self.coder.variables,
            self.lpips.params if self.lpips is not None else {},
            v, keys, jnp.asarray(thresholds, jnp.float32), jnp.asarray(forced))

    def _replicated_params(self, mesh, pv, cv, lv, repl):
        """Identity-keyed replicated-params cache (strong refs, see
        __post_init__). Returns (entry index, replicated (pv, cv, lv),
        entry)."""
        pe = next((e for e in self._param_entries
                   if e[0] is mesh and e[1] is pv and e[2] is cv
                   and e[3] is lv), None)
        if pe is None:
            def _rep(a):
                a = np.asarray(a)
                return jax.make_array_from_callback(
                    a.shape, repl, lambda idx, _a=a: _a[idx])

            pe = [mesh, pv, cv, lv,
                  jax.tree_util.tree_map(_rep, (pv, cv, lv))]
            self._param_entries.append(pe)
        # index by identity (list.index would __eq__-compare array leaves)
        pidx = next(i for i, e in enumerate(self._param_entries) if e is pe)
        return pidx, pe[4], pe

    def run_sharded(self, mesh, videos: np.ndarray, keys: jax.Array,
                    thresholds: np.ndarray) -> Dict[str, Any]:
        """Mesh-sharded whole-GOP encode: the chain batch is sharded over the
        mesh's `data` axis (params replicated), so N chips each run whole GOPs
        on device in lockstep — the multi-chip serving path.

        Single-process: `videos`/`keys`/`thresholds` are the GLOBAL batch
        (B divisible by the data-axis size). Multi-process (`jax.distributed`
        initialized, mesh spanning all processes' devices): each process
        passes its LOCAL shard of the batch — the host-local chunks are
        assembled into global arrays along the data axis
        (multihost_utils.host_local_array_to_global_array), and the returned
        arrays are global; use `jax.experimental.multihost_utils.
        process_allgather` (or read addressable shards) to fetch."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        entry = next((e for e in self._mesh_entries if e[0] is mesh), None)
        if entry is None:
            data = NamedSharding(mesh, P("data"))
            repl = NamedSharding(mesh, P())
            entry = [mesh, jax.jit(
                jax.vmap(self._gop_raw, in_axes=(None, None, None, 0, 0, 0, 0)),
                in_shardings=(repl, repl, repl, data, data, data, data),
                out_shardings=data,
            )]
            self._mesh_entries.append(entry)
        sharded_fn = entry[1]
        B = videos.shape[0]
        dp = mesh.shape["data"]
        forced = jnp.full((B, self._max_updates), -1, jnp.int32)
        v = jnp.stack([self._prep_video(videos[i]) for i in range(B)])
        thr = jnp.asarray(thresholds, jnp.float32)
        pv = self.predictor.variables
        cv = self.coder.variables
        lv = self.lpips.params if self.lpips is not None else self._empty_lp
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            assert (B * jax.process_count()) % dp == 0, (
                f"global batch {B * jax.process_count()} not divisible by "
                f"data axis {dp}")
            v, keys, thr, forced = multihost_utils.host_local_array_to_global_array(
                (np.asarray(v), np.asarray(keys), np.asarray(thr),
                 np.asarray(forced)), mesh, P("data"))
            # Params must ALREADY be global replicated arrays: handing
            # process-local values to a multi-process replicated in_sharding
            # makes jit insert a broadcast collective into the program, which
            # forces lockstep execution and dies on compile skew (Gloo init
            # timeout). make_array_from_callback builds the replicated global
            # array communication-free — every process supplies its own
            # (identical, by the deterministic-weights contract) copy.
            repl = jax.sharding.NamedSharding(mesh, P())
            # Cache entries match the mesh + all three param trees BY
            # IDENTITY while holding strong references to them (swapping
            # variables — run() supports per-call coder weights — or
            # changing B must not reuse a stale replicated copy or a
            # shape-locked executable; the strong refs make id recycling
            # impossible).
            pidx, (pv, cv, lv), pe = self._replicated_params(
                mesh, pv, cv, lv, repl)
            # The vmapped while_loop's termination test reduces over the
            # SHARDED chain axis, so the compiled program carries a
            # cross-process collective every iteration — execution must be
            # entered in lockstep. Compile ahead-of-time, then rendezvous at
            # the coordination-service barrier (KV store, long timeout; a
            # Gloo-based sync here would itself die on compile skew), then
            # run: the first in-program collective sees both processes
            # present and the Gloo context initializes cleanly.
            # executables are shape-locked: key on the FULL global video
            # shape (covers B and the (T+pad, H, W, C) geometry), not just B
            vshape = tuple(v.shape)
            ce = next((c for c in self._compiled_entries
                       if c[0] is pe and c[1] == vshape), None)
            if ce is None:
                lowered = sharded_fn.lower(pv, cv, lv, v, keys, thr, forced)
                ce = [pe, vshape, lowered.compile()]
                self._compiled_entries.append(ce)
                try:
                    from jax._src import distributed

                    client = distributed.global_state.client
                    if client is not None:
                        # barrier names derive from (param-entry index,
                        # video shape): deterministic across processes
                        # following the same call sequence (a counter would
                        # desync on any hit/miss divergence and hang both
                        # ends)
                        shp = "x".join(str(s) for s in vshape)
                        client.wait_at_barrier(
                            f"tvc_run_sharded_compiled_p{pidx}_s{shp}",
                            600_000)
                except ImportError:  # pragma: no cover - private-API fallback
                    pass
            return ce[2](pv, cv, lv, v, keys, thr, forced)
        else:
            assert B % dp == 0, f"batch {B} not divisible by data axis {dp}"
        return sharded_fn(pv, cv, lv, v, keys, thr, forced)
