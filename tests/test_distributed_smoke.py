"""Two-process `jax.distributed` bring-up smoke test (VERDICT r2 item 8).

Spawns two real localhost processes through the launcher's bring-up path
(`tvc.parallel.mesh.initialize_distributed`, exactly what
`tvc/parallel/launcher.py` calls), verifies cross-process coordination
(process_allgather), then drains a shared 2-unit WorkQueue and asserts the
documented single-winner merge arbitration across real process boundaries.
"""

import json
import os
import socket
import subprocess
import sys
import textwrap

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = textwrap.dedent("""
    import json, os, socket, sys, time
    import jax
    jax.config.update("jax_platforms", "cpu")

    pid = int(sys.argv[1])
    coord = sys.argv[2]
    qdir = sys.argv[3]

    # the launcher's bring-up path (tvc/parallel/launcher.py:30)
    from tvc.parallel.mesh import initialize_distributed
    initialize_distributed(coordinator=coord, num_processes=2, process_id=pid)
    assert jax.process_count() == 2, jax.process_count()

    # cross-process coordination actually works: allgather the process ids
    import numpy as np
    from jax.experimental import multihost_utils
    got = np.asarray(multihost_utils.process_allgather(np.asarray([pid])))
    assert sorted(got.ravel().tolist()) == [0, 1], got

    # shared-queue drain + single-winner merge across REAL processes
    from tvc.parallel.queue import WorkQueue
    units = [{"id": "u0"}, {"id": "u1"}]
    wq = WorkQueue.create_or_open(qdir, units, stale_after=300.0)
    owner = f"proc{pid}"
    n = wq.drain(owner, lambda job: {"owner": owner, "unit": job["id"]})
    merged = False
    if wq.all_done() and wq.mark_done("__merged__", {"owner": owner}):
        merged = True
    print(json.dumps({"pid": pid, "drained": n, "merged": merged}))
""")


SERVE_WORKER = textwrap.dedent("""
    import json, sys, time
    import numpy as np
    import jax
    jax.config.update("jax_platforms", "cpu")

    pid = int(sys.argv[1]); coord = sys.argv[2]
    t00 = time.time()

    def log(msg):
        print(f"[w{pid} +{time.time()-t00:6.1f}s] {msg}", file=sys.stderr, flush=True)
    from tvc.parallel.mesh import initialize_distributed
    initialize_distributed(coordinator=coord, num_processes=2, process_id=pid)
    assert jax.process_count() == 2 and jax.local_device_count() == 1

    import jax.numpy as jnp
    from jax.sharding import Mesh, PartitionSpec as P
    from jax.experimental import multihost_utils
    from tvc.core.config import Config
    from tvc.metrics.lpips import LPIPSMetric
    from tvc.models.codec.coding import ELICCoder
    from tvc.models.codec.elic import ELICModel
    from tvc.pipeline.fused_gop import FusedGOPSender
    from tvc.pipeline.predictor import FramePredictor

    T = 8
    cfg = Config()
    cfg.data.image_size = 64; cfg.data.num_frames = 3; cfg.data.num_frames_cond = 2
    cfg.model.ngf = 16; cfg.model.ch_mult = (1, 2); cfg.model.num_res_blocks = 1
    cfg.model.attn_resolutions = (32,); cfg.model.n_head_channels = 8
    cfg.model.num_classes = 20; cfg.sampling.subsample = 5; cfg.codec.patch = 64

    # deterministic weights: same seeds on both processes (and in the parent)
    predictor = FramePredictor.create(cfg, jax.random.PRNGKey(0))
    model = ELICModel(N=32, M=48, groups=(8, 8, 32))
    cvars = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 3)))
    coder = ELICCoder(model, cvars)
    lp = LPIPSMetric.create()
    sender = FusedGOPSender(cfg=cfg, predictor=predictor, coder=coder,
                            lpips=lp, num_frames_total=T)

    # the global 2-chain serving batch; each process owns chain `pid`
    videos = np.random.RandomState(3).rand(2, T, 64, 64, 3).astype(np.float32)
    keys = np.asarray(jnp.stack([jax.random.PRNGKey(100), jax.random.PRNGKey(101)]))
    thresholds = np.asarray([np.inf, -np.inf], np.float32)

    log("models built; entering run_sharded (trace+compile)")
    mesh = Mesh(np.asarray(jax.devices()), ("data",))
    with mesh:
        out = sender.run_sharded(mesh, videos[pid:pid + 1], keys[pid:pid + 1],
                                 thresholds[pid:pid + 1])
    log("run_sharded dispatched; fetching local shards")
    # fetch this process's local chunk of each global output: read the
    # addressable shard directly (communication-free — a cross-process
    # reshard here would ride a Gloo collective and can time out under
    # compile skew)
    local = {k: np.asarray(v.addressable_shards[0].data)
             for k, v in out.items()}
    print(json.dumps({
        "pid": pid,
        "d": local["d"][0].tolist(),
        "bits": float(local["bits"][0]),
        "x_mean": float(local["x_ge"][0].mean()),
        "x_sum_abs": float(np.abs(local["x_ge"][0]).sum()),
    }), flush=True)
    log("done; final rendezvous before exit")
    # exit together: a worker that exits while its peer still runs trips the
    # coordination-service Shutdown barrier timeout
    from jax._src import distributed
    distributed.global_state.client.wait_at_barrier("tvc_serve_done", 600_000)
""")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_distributed_bringup_and_queue_merge(tmp_path):
    worker_py = tmp_path / "worker.py"
    worker_py.write_text(WORKER)
    qdir = str(tmp_path / "queue")
    coord = f"127.0.0.1:{_free_port()}"

    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)  # no virtual-device fan-out in the workers

    procs = [
        subprocess.Popen(
            [sys.executable, str(worker_py), str(i), coord, qdir],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, cwd=REPO,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=240)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        outs.append(json.loads(out.strip().splitlines()[-1]))

    # both units completed exactly once, across the two processes
    assert sum(o["drained"] for o in outs) == 2
    # exactly ONE process won the merge arbitration
    assert sum(o["merged"] for o in outs) == 1, outs

    from tvc.parallel.queue import WorkQueue

    wq = WorkQueue(qdir)
    assert set(wq.results()) == {"u0", "u1"}  # results() lists real jobs only
    assert os.path.exists(os.path.join(qdir, "done", "__merged__.json"))


@pytest.mark.slow
def test_two_process_sharded_serving_path(tmp_path):
    """The SERVING path across two real jax.distributed processes (VERDICT r3
    item 9): FusedGOPSender.run_sharded over a mesh spanning both processes'
    devices, each process feeding its local chain shard; results must match
    the single-process batched run chain-for-chain."""
    import numpy as np

    worker_py = tmp_path / "serve_worker.py"
    worker_py.write_text(SERVE_WORKER)
    coord = f"127.0.0.1:{_free_port()}"

    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)  # 1 CPU device per worker process

    procs = [
        subprocess.Popen(
            [sys.executable, str(worker_py), str(i), coord],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, cwd=REPO,
            text=True,
        )
        for i in range(2)
    ]
    outs = {}
    raw = [p.communicate(timeout=900) for p in procs]
    for p, (out, err) in zip(procs, raw):
        assert p.returncode == 0, "serve worker failed:\n" + "\n---\n".join(
            o[-2000:] + "\n" + e[-2000:] for o, e in raw)
        rec = json.loads(out.strip().splitlines()[-1])
        outs[rec["pid"]] = rec

    # ---- single-process reference with identical weights/keys ----
    import jax
    import jax.numpy as jnp

    from tvc.core.config import Config
    from tvc.metrics.lpips import LPIPSMetric
    from tvc.models.codec.coding import ELICCoder
    from tvc.models.codec.elic import ELICModel
    from tvc.pipeline.fused_gop import FusedGOPSender
    from tvc.pipeline.predictor import FramePredictor

    T = 8
    cfg = Config()
    cfg.data.image_size = 64
    cfg.data.num_frames = 3
    cfg.data.num_frames_cond = 2
    cfg.model.ngf = 16
    cfg.model.ch_mult = (1, 2)
    cfg.model.num_res_blocks = 1
    cfg.model.attn_resolutions = (32,)
    cfg.model.n_head_channels = 8
    cfg.model.num_classes = 20
    cfg.sampling.subsample = 5
    cfg.codec.patch = 64
    predictor = FramePredictor.create(cfg, jax.random.PRNGKey(0))
    model = ELICModel(N=32, M=48, groups=(8, 8, 32))
    cvars = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 3)))
    coder = ELICCoder(model, cvars)
    sender = FusedGOPSender(cfg=cfg, predictor=predictor, coder=coder,
                            lpips=LPIPSMetric.create(), num_frames_total=T)
    videos = np.random.RandomState(3).rand(2, T, 64, 64, 3).astype(np.float32)
    keys = jnp.stack([jax.random.PRNGKey(100), jax.random.PRNGKey(101)])
    thresholds = np.asarray([np.inf, -np.inf], np.float32)
    ref = sender.run_batched(videos, keys, thresholds)
    ref_d = np.asarray(ref["d"])
    ref_bits = np.asarray(ref["bits"])
    ref_x = np.asarray(ref["x_ge"])

    # chain semantics: inf threshold accepts everything after the keyframes,
    # -inf transmits every frame
    assert ref_d[0].tolist() == [1, 1] + [0] * (T - 2)
    assert ref_d[1].tolist() == [1] * T

    # Tolerances: the sharded and the single-process batched runs are
    # DIFFERENTLY-COMPILED programs, and ulp-level latent differences flip
    # quantization boundaries in the fused path's device-simulation codec
    # (the round-3 lesson; harmless here — no bitstream to desync). A
    # flipped symbol shifts the entropy ESTIMATE by its likelihood
    # (observed ~1% on random weights) and the keyframe RECONSTRUCTION by
    # that latent's contribution (observed ~0.3% on chain 1, which codes
    # every frame). The structural claims — identical DECISION vectors and
    # in-band stats — hold exactly / tightly; bit-identity across processes
    # is the exact path's contract (shared executables), certified
    # separately in test_codec.py::test_device_backend_cross_process.
    for pid in (0, 1):
        rec = outs[pid]
        assert rec["d"] == ref_d[pid].tolist(), f"chain {pid} decision vector"
        np.testing.assert_allclose(rec["bits"], ref_bits[pid], rtol=0.03)
        np.testing.assert_allclose(rec["x_mean"], ref_x[pid].mean(), atol=5e-3)
        np.testing.assert_allclose(
            rec["x_sum_abs"], np.abs(ref_x[pid]).sum(),
            rtol=1e-2)
