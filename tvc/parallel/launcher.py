"""Multi-host sweep launcher.

Usage (one invocation per host/process, SPMD-style):

    TVC_COORDINATOR=host0:1234 TVC_NUM_PROCESSES=4 TVC_PROCESS_ID=$i \
        python -m tvc.parallel.launcher sweep --data-npy ... --batched 8 ...

Brings up `jax.distributed` from the TVC_* env vars, forwards the remaining
argv to the tvc CLI with the per-process sharding flags appended. Each process
owns whole GOP chains (the serial dependency stays chip-local); the
(video x quality x threshold) job list is statically partitioned
(tvc/parallel/mesh.partition_work), and results land in per-process output
dirs to be merged by the caller.
"""

from __future__ import annotations

import os
import sys


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    num = int(os.environ.get("TVC_NUM_PROCESSES", "1"))
    pid = int(os.environ.get("TVC_PROCESS_ID", "0"))
    coord = os.environ.get("TVC_COORDINATOR")

    from tvc.parallel.mesh import initialize_distributed

    initialize_distributed(coordinator=coord, num_processes=num, process_id=pid)

    if argv and argv[0] == "sweep":
        argv = argv + ["--num-processes", str(num), "--process-id", str(pid)]

    from tvc.cli import main as cli_main

    return cli_main(argv)


if __name__ == "__main__":
    raise SystemExit(main())
