"""Filesystem-backed dynamic work queue for multi-host sweeps.

SURVEY.md §7.3 item 6: per-(video, quality, threshold) sweep work is wildly
variable — the threshold walk early-stops at bpp >= 1.0 (city_sender.py:561)
and the fallback-keyframe count differs per chain — so *static* partitioning
(tvc.parallel.mesh.partition_work) strands chips behind the slowest shard.
The reference has no distributed scheduling at all (SURVEY.md §2.8); tvc's
multi-host sweeps can instead PULL work units from a queue on a shared
filesystem (the NFS/FUSE mounts TPU pod slices already share):

- enqueue  : one atomic `jobs.json` rename, first creator wins;
- claim    : O_CREAT|O_EXCL create of `claims/<id>` — atomicity is the
             filesystem's, no coordinator process required;
- complete : write tmp + rename to `done/<id>.json`;
- recover  : a claim whose heartbeat mtime is older than `stale_after`
             seconds with no done-file is considered owned by a dead host and
             can be stolen (rename-to-graveyard, single winner) — this is the
             framework's failure-detection/elastic-recovery mechanism
             (SURVEY.md §5: the reference ships none).

Workers renew their claim mtime via `heartbeat()` between GOP cycles; a
worker that loses its claim to a thief simply has its late `mark_done`
ignored as a duplicate (results are idempotent per unit id).

Filesystem requirements: the queue directory must live on a local POSIX
filesystem or NFSv4+ (where O_CREAT|O_EXCL and link(2) are atomic). NFSv3
does not guarantee O_EXCL atomicity — do not point `queue_dir` at an NFSv3
mount. Staleness compares the claim's server mtime against the stealing
host's clock, so hosts sharing a queue should be NTP-synced; `stale_after`
includes a generous margin (default 900 s) precisely so ordinary clock skew
(seconds) cannot trigger premature steals.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from typing import Any, Callable, Dict, List, Optional

__all__ = ["WorkQueue"]


def _atomic_write_json(path: str, obj: Any) -> None:
    tmp = f"{path}.tmp.{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        json.dump(obj, f)
    os.replace(tmp, path)  # atomic on POSIX


class WorkQueue:
    """A directory-backed multi-process work queue of JSON-able work units.

    Every unit is a dict with a unique string under ``id_key``. All methods
    are safe to call concurrently from any number of processes/hosts sharing
    the directory.
    """

    def __init__(self, root: str, stale_after: float = 900.0, id_key: str = "id"):
        self.root = root
        self.stale_after = float(stale_after)
        self.id_key = id_key
        self._jobs_path = os.path.join(root, "jobs.json")
        self._claims = os.path.join(root, "claims")
        self._done = os.path.join(root, "done")
        self._gravel = os.path.join(root, "stale")

    # ---------------- setup ----------------

    @classmethod
    def create_or_open(cls, root: str, jobs: Optional[List[Dict[str, Any]]] = None,
                       stale_after: float = 900.0, id_key: str = "id") -> "WorkQueue":
        """Open the queue at ``root``, enqueueing ``jobs`` if it is new.

        Several processes may race this with identical job lists; exactly one
        `jobs.json` survives (atomic rename), so claims always refer to a
        single authoritative list."""
        q = cls(root, stale_after=stale_after, id_key=id_key)
        for d in (root, q._claims, q._done, q._gravel):
            os.makedirs(d, exist_ok=True)
        if not os.path.exists(q._jobs_path):
            if jobs is None:
                raise FileNotFoundError(f"no jobs.json at {root} and none supplied")
            ids = [j[id_key] for j in jobs]
            if len(set(ids)) != len(ids):
                raise ValueError("duplicate work-unit ids")
            _atomic_write_json(q._jobs_path, jobs)
        return q

    def jobs(self) -> List[Dict[str, Any]]:
        with open(self._jobs_path) as f:
            return json.load(f)

    # ---------------- claim / heartbeat / steal ----------------

    def _claim_path(self, jid: str) -> str:
        return os.path.join(self._claims, jid)

    def _done_path(self, jid: str) -> str:
        return os.path.join(self._done, f"{jid}.json")

    def _try_create_claim(self, jid: str, owner: str) -> bool:
        try:
            fd = os.open(self._claim_path(jid), os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            return False
        with os.fdopen(fd, "w") as f:
            json.dump({"owner": owner, "t": time.time()}, f)
        return True

    def _try_steal(self, jid: str, owner: str) -> bool:
        """Steal a stale claim: exactly one thief wins the graveyard rename."""
        path = self._claim_path(jid)
        try:
            age = time.time() - os.path.getmtime(path)
        except OSError:
            return self._try_create_claim(jid, owner)  # claim vanished
        if age < self.stale_after:
            return False
        grave = os.path.join(self._gravel, f"{jid}.{uuid.uuid4().hex}")
        try:
            os.rename(path, grave)  # only one concurrent thief succeeds
        except OSError:
            return False
        return self._try_create_claim(jid, owner)

    def claim(self, owner: str) -> Optional[Dict[str, Any]]:
        """Claim the next available unit, or None when all are claimed/done.

        Passes twice: fresh units first, then stale claims from dead owners."""
        jobs = self.jobs()
        for j in jobs:
            jid = j[self.id_key]
            if os.path.exists(self._done_path(jid)):
                continue
            if self._try_create_claim(jid, owner):
                return j
        for j in jobs:
            jid = j[self.id_key]
            if os.path.exists(self._done_path(jid)):
                continue
            if self._try_steal(jid, owner):
                return j
        return None

    def heartbeat(self, jid: str) -> None:
        """Renew a held claim so it is not considered dead (call between GOP
        cycles; cost = one utime syscall)."""
        try:
            os.utime(self._claim_path(jid), None)
        except OSError:
            pass  # claim was stolen; the late mark_done will be a no-op dup

    # ---------------- completion ----------------

    def mark_done(self, jid: str, result: Any) -> bool:
        """Record a unit's result. Duplicate completions (a stolen unit
        finished by both owners) keep the first result; returns False for the
        loser.

        The publish is atomic AND exclusive: the result is fully written to a
        tmp file, then `os.link`ed to the done path — link fails with EEXIST
        if any other writer got there first, so exactly one caller ever
        returns True (run_sweep_queued relies on this to pick the single
        merge winner; a bare exists()-then-rename would be check-then-write)."""
        path = self._done_path(jid)
        if os.path.exists(path):
            return False
        tmp = f"{path}.tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(result, f)
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, path)  # atomic no-overwrite publish; one winner
            return True
        except FileExistsError:
            return False
        except OSError:
            # Filesystems without hardlinks (rare; some FUSE mounts):
            # lock-FIRST, then rename — the O_EXCL .lock sidecar arbitrates
            # the single True return, and the winner renames its complete
            # fsynced tmp immediately after taking it, so the bytes that
            # persist are the True-returner's. A loser normally discards its
            # tmp; the one exception is crash recovery — if the lock exists
            # but `done` never appeared (winner died between lock and
            # rename), the loser publishes its own complete result so the
            # unit can never wedge (both results are valid completions of
            # the same unit; the loser still returns False). The .lock
            # sidecar is never removed: it IS the persistent single-winner
            # record, reclaimed only with the queue directory itself.
            lock = f"{path}.lock"
            try:
                fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                os.close(fd)
                won = True
            except FileExistsError:
                won = False
            if won:
                os.rename(tmp, path)  # atomic; tmp is complete+fsynced
            elif not os.path.exists(path):
                # Crash recovery only: the lock holder renames IMMEDIATELY
                # after taking the lock, so give it a grace window before
                # concluding it died — a loser racing the winner's rename
                # would otherwise overwrite the True-returner's bytes
                # (check-then-rename TOCTOU). After the window, publish our
                # own complete result so an orphaned lock can never wedge
                # the unit (we still return False).
                for _ in range(20):
                    time.sleep(0.05)
                    if os.path.exists(path):
                        break
                else:
                    os.rename(tmp, path)
            return won
        finally:
            try:
                os.unlink(tmp)
            except OSError:
                pass

    def pending(self) -> List[str]:
        return [j[self.id_key] for j in self.jobs()
                if not os.path.exists(self._done_path(j[self.id_key]))]

    def all_done(self) -> bool:
        return not self.pending()

    def results(self) -> Dict[str, Any]:
        out: Dict[str, Any] = {}
        for j in self.jobs():
            jid = j[self.id_key]
            path = self._done_path(jid)
            if os.path.exists(path):
                with open(path) as f:
                    out[jid] = json.load(f)
        return out

    # ---------------- worker loop ----------------

    def drain(self, owner: str, fn: Callable[[Dict[str, Any]], Any]) -> int:
        """Claim-and-run until the queue is empty; returns #units completed
        by this worker. Exceptions release nothing — the claim goes stale and
        another host recovers the unit after `stale_after`."""
        n = 0
        while True:
            job = self.claim(owner)
            if job is None:
                return n
            result = fn(job)
            self.mark_done(job[self.id_key], result)
            n += 1
