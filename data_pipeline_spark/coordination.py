"""Single-instance coordination (T12).

Re-expresses zookeeper.py:97-139 (ZKLock): at most one copy of a batch
runs per (name, namespace), acquired with a timeout and released on exit.
The reference leans on ZooKeeper ephemeral nodes; this engine has no ZK in
scope, so the lock is a LEASE on shared storage: an atomically-created
lock file carrying (owner, expiry).  A crashed holder's lock self-expires
— the property the reference gets from ephemeral-node session loss — so a
wedged batch can never fence out its replacement forever.

On a real deployment the same protocol runs against any store with
conditional-create semantics (HDFS create-exclusive, object-store
if-none-match); only `_try_create` changes.
"""

from __future__ import annotations

import contextlib
import fcntl
import json
import os
import time
import uuid


class LockTimeout(TimeoutError):
    """Another live instance holds the lock."""


class LeaseLock:
    """`with LeaseLock(name, namespace, root): ...` — one holder at a time.

    - acquire: atomic create-exclusive of the lock file; a file whose
      lease expired (holder died without releasing) is broken and retried.
    - renew(): extends the lease; long batches call it between stages.
    - release: delete only if still owned (a holder whose lease expired
      and was taken over must not delete the new holder's lock).
    """

    def __init__(
        self,
        name: str,
        namespace: str,
        root: str,
        lease_seconds: int = 60,
        timeout: int = 10,
        owner: str | None = None,
    ):
        self.path = os.path.join(root, f"{name}-{namespace}.lock")
        self.lease_seconds = lease_seconds
        self.timeout = timeout
        # unique per INSTANCE, not just per process: two locks in one
        # process (e.g. two publisher threads with serialize_publishes)
        # sharing a pid-only owner would pass each other's ownership
        # checks after a stale break and release() the wrong live lock
        self.owner = owner or f"pid-{os.getpid()}-{uuid.uuid4().hex[:8]}"
        self.acquired = False
        os.makedirs(root, exist_ok=True)

    # -- protocol -----------------------------------------------------------

    @contextlib.contextmanager
    def _guard(self):
        """Serialize read-verify-mutate sequences on the lock file.

        Plain O_EXCL create is atomic on its own, but breaking a stale
        lease (read → observe expired → remove) and rewriting on renew/
        release are multi-step: without mutual exclusion two contenders can
        both observe the same stale lease, and the slower remove() deletes
        the faster contender's FRESH lock — two live holders.  The guard is
        an flock-ed sidecar held across every such sequence (the atomicity
        ZK provides server-side).  It is advisory between LeaseLock
        instances only, which is the contract: all contenders run this
        protocol.
        """
        fd = os.open(self.path + ".guard", os.O_CREAT | os.O_RDWR)
        try:
            fcntl.flock(fd, fcntl.LOCK_EX)
            yield
        finally:
            os.close(fd)  # closing drops the flock

    def _try_create(self) -> bool:
        try:
            fd = os.open(self.path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            return False
        with os.fdopen(fd, "w") as f:
            json.dump(
                {"owner": self.owner, "expires_at": time.time() + self.lease_seconds},
                f,
            )
        return True

    def _read(self) -> dict | None:
        try:
            with open(self.path) as f:
                return json.load(f)
        except (FileNotFoundError, json.JSONDecodeError):
            return None  # being created/deleted concurrently

    def acquire(self) -> None:
        deadline = time.time() + self.timeout
        while True:
            if self._try_create():
                self.acquired = True
                return
            with self._guard():
                cur = self._read()
                if cur is not None and cur["expires_at"] < time.time():
                    # stale lease: holder died without releasing — break it
                    # (ephemeral-node-expiry analogue).  Remove + re-create
                    # under the guard so no other contender can break the
                    # lock we are about to create.
                    try:
                        os.remove(self.path)
                    except FileNotFoundError:
                        pass
                    if self._try_create():
                        self.acquired = True
                        return
                    continue
            if time.time() >= deadline:
                holder = cur["owner"] if cur else "unknown"
                raise LockTimeout(
                    f"lock {self.path} held by {holder!r}; another instance "
                    "is already running against this source"
                )
            time.sleep(0.05)

    def renew(self) -> None:
        if not self.acquired:
            raise RuntimeError("cannot renew a lock that is not held")
        with self._guard():
            cur = self._read()
            if cur is None or cur.get("owner") != self.owner:
                # lease expired and was taken over while we ran: we are no
                # longer the holder and must NOT clobber the usurper's lock
                self.acquired = False
                holder = cur.get("owner") if cur else "unknown"
                raise LockTimeout(
                    f"lease on {self.path} was taken over by {holder!r}; "
                    "this instance lost the lock"
                )
            tmp = f"{self.path}.{self.owner}.tmp"
            with open(tmp, "w") as f:
                json.dump(
                    {
                        "owner": self.owner,
                        "expires_at": time.time() + self.lease_seconds,
                    },
                    f,
                )
            os.replace(tmp, self.path)

    def release(self) -> None:
        if not self.acquired:
            return
        with self._guard():
            cur = self._read()
            if cur is not None and cur.get("owner") == self.owner:
                try:
                    os.remove(self.path)
                except FileNotFoundError:
                    pass
        self.acquired = False

    # -- context manager (ZKLock usage shape) -------------------------------

    def __enter__(self) -> "LeaseLock":
        self.acquire()
        return self

    def __exit__(self, exc_type, exc, tb) -> None:
        self.release()
