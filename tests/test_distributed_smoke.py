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
