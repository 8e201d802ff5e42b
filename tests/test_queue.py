"""Dynamic work-queue tests (tvc/parallel/queue.py).

Covers the multi-host scheduling contract of SURVEY.md §7.3 item 6: atomic
claims under concurrency, idempotent completion, stale-claim recovery (the
failure-detection story — SURVEY.md §5 notes the reference ships none), and
the queued sweep driver's single-winner merge.
"""

import json
import os
import threading
import time

import numpy as np
import pytest

from tvc.parallel.queue import WorkQueue


def _jobs(n):
    return [{"id": f"u{i}", "payload": i} for i in range(n)]


def test_claim_done_roundtrip(tmp_path):
    q = WorkQueue.create_or_open(str(tmp_path), _jobs(3))
    seen = []
    while (job := q.claim("w0")) is not None:
        seen.append(job["payload"])
        q.mark_done(job["id"], {"out": job["payload"] * 10})
    assert sorted(seen) == [0, 1, 2]
    assert q.all_done()
    res = q.results()
    assert res["u2"] == {"out": 20}


def test_create_or_open_races_to_one_joblist(tmp_path):
    q1 = WorkQueue.create_or_open(str(tmp_path), _jobs(2))
    # second open with a DIFFERENT list must keep the first (authoritative)
    q2 = WorkQueue.create_or_open(str(tmp_path), _jobs(5))
    assert len(q2.jobs()) == 2
    assert q1.jobs() == q2.jobs()
    with pytest.raises(FileNotFoundError):
        WorkQueue.create_or_open(str(tmp_path / "missing"))


def test_duplicate_ids_rejected(tmp_path):
    with pytest.raises(ValueError):
        WorkQueue.create_or_open(str(tmp_path), [{"id": "a"}, {"id": "a"}])


def test_concurrent_claims_are_disjoint(tmp_path):
    n = 40
    q = WorkQueue.create_or_open(str(tmp_path), _jobs(n))
    claimed = {w: [] for w in range(4)}

    def worker(w):
        wq = WorkQueue(str(tmp_path))
        while (job := wq.claim(f"w{w}")) is not None:
            claimed[w].append(job["id"])
            wq.mark_done(job["id"], w)

    threads = [threading.Thread(target=worker, args=(w,)) for w in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    all_ids = [i for ids in claimed.values() for i in ids]
    assert len(all_ids) == n, "every unit ran exactly once"
    assert len(set(all_ids)) == n, "no unit ran twice"
    assert q.all_done()


def test_stale_claim_recovery(tmp_path):
    q = WorkQueue.create_or_open(str(tmp_path), _jobs(1), stale_after=0.2)
    job = q.claim("dead-host")
    assert job is not None
    # live claim: nobody can steal it yet
    assert q.claim("thief") is None
    time.sleep(0.25)
    # claim is stale now; exactly one thief may take it
    stolen = q.claim("thief")
    assert stolen is not None and stolen["id"] == job["id"]
    # the dead host's late completion loses to the thief's
    q.mark_done(job["id"], "thief-result")
    assert q.mark_done(job["id"], "late-dead-host-result") is False
    assert q.results()[job["id"]] == "thief-result"


def test_heartbeat_prevents_steal(tmp_path):
    q = WorkQueue.create_or_open(str(tmp_path), _jobs(1), stale_after=0.4)
    job = q.claim("slow-but-alive")
    for _ in range(3):
        time.sleep(0.2)
        q.heartbeat(job["id"])
    assert q.claim("thief") is None, "heartbeat must keep the claim fresh"
    q.mark_done(job["id"], 1)


def test_drain_counts_and_pending(tmp_path):
    q = WorkQueue.create_or_open(str(tmp_path), _jobs(5))
    n = q.drain("solo", lambda job: job["payload"])
    assert n == 5
    assert q.pending() == []
    assert q.drain("solo", lambda job: 0) == 0  # empty queue


def test_queued_sweep_driver_merge(tmp_path, tiny_pipeline):
    """Two sequential 'processes' drain a real (tiny) sweep queue; exactly one
    merge happens and per-video RD outputs land in output_path."""
    from tvc.pipeline.driver import run_sweep_queued

    cfg, predictor, coder, lp = tiny_pipeline
    rng = np.random.RandomState(0)
    data = rng.rand(2, 6, cfg.data.image_size, cfg.data.image_size, 3).astype(np.float32)
    out = str(tmp_path / "out")
    qdir = str(tmp_path / "queue")
    kw = dict(
        start_idx=0, end_idx=1, qualities=[4], thresholds=[0.9],
        with_fvd=False, output_path=out, queue_dir=qdir, lpips_metric=lp,
    )
    n0 = run_sweep_queued(cfg, data, {4: coder}, predictor, **kw)
    n1 = run_sweep_queued(cfg, data, {4: coder}, predictor, **kw)
    assert n0 + n1 == 2, "both units completed across the two workers"
    q = WorkQueue(qdir)
    assert q.all_done()
    # single-winner merge produced the per-video outputs
    for vid in (0, 1):
        pts = json.load(open(os.path.join(out, f"output_{vid}", "points.json")))
        assert len(pts) == 1 and pts[0]["quality"] == 4
    # a third worker neither re-runs units nor re-merges
    assert run_sweep_queued(cfg, data, {4: coder}, predictor, **kw) == 0


def test_mark_done_no_hardlink_fallback_single_winner(tmp_path, monkeypatch):
    """Filesystems without os.link: the O_EXCL .lock is taken FIRST and the
    winner renames immediately after, so the bytes that persist are the
    True-returner's (ADVICE r4)."""
    q = WorkQueue.create_or_open(str(tmp_path), _jobs(1))

    def no_link(src, dst):
        raise OSError("no hardlinks here")

    monkeypatch.setattr(os, "link", no_link)
    assert q.mark_done("u0", {"who": "winner"}) is True
    # duplicate completion loses AND must not overwrite the winner's bytes
    assert q.mark_done("u0", {"who": "late"}) is False
    assert q.results()["u0"] == {"who": "winner"}
    assert os.path.exists(os.path.join(str(tmp_path), "done", "u0.json.lock")) or \
        any(f.endswith(".lock") for root, _, fs in os.walk(str(tmp_path)) for f in fs)


def test_mark_done_no_hardlink_crash_recovery(tmp_path, monkeypatch):
    """A winner that died between lock and rename must not wedge the unit:
    the next completer publishes its (complete) result but still returns
    False (the single-True contract)."""
    q = WorkQueue.create_or_open(str(tmp_path), _jobs(1))

    def no_link(src, dst):
        raise OSError("no hardlinks here")

    monkeypatch.setattr(os, "link", no_link)
    # simulate the orphaned lock: find the done path via a normal completion
    # on a scratch queue
    path = q._done_path("u0")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    fd = os.open(path + ".lock", os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    os.close(fd)
    assert not os.path.exists(path)
    assert q.mark_done("u0", {"who": "recoverer"}) is False
    assert q.results()["u0"] == {"who": "recoverer"}
    assert q.all_done()


def test_queued_sweep_device_gop(tmp_path, tiny_pipeline):
    """Queue workers can run the device-resident latency path
    (device_gop=True, VERDICT r4 item 7): the drained sweep must produce the
    SAME RD points as the host-loop queue run — DeviceGOPRunner walks
    run_gop's trajectory bit-exactly."""
    from tvc.pipeline.driver import run_sweep_queued

    cfg, predictor, coder, lp = tiny_pipeline
    rng = np.random.RandomState(2)
    data = rng.rand(1, 6, cfg.data.image_size, cfg.data.image_size, 3).astype(np.float32)
    kw = dict(
        start_idx=0, end_idx=0, qualities=[4], thresholds=[0.9, 0.5],
        with_fvd=False, lpips_metric=lp,
    )
    n = run_sweep_queued(cfg, data, {4: coder}, predictor,
                         output_path=str(tmp_path / "out_dev"),
                         queue_dir=str(tmp_path / "q_dev"),
                         device_gop=True, **kw)
    assert n == 1
    run_sweep_queued(cfg, data, {4: coder}, predictor,
                     output_path=str(tmp_path / "out_host"),
                     queue_dir=str(tmp_path / "q_host"), **kw)
    pts_dev = json.load(open(tmp_path / "out_dev" / "output_0" / "points.json"))
    pts_host = json.load(open(tmp_path / "out_host" / "output_0" / "points.json"))
    assert pts_dev == pts_host
