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

import json
import os
import time


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
        self.owner = owner or f"pid-{os.getpid()}"
        self.acquired = False
        os.makedirs(root, exist_ok=True)

    # -- protocol -----------------------------------------------------------

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
            cur = self._read()
            if cur is not None and cur["expires_at"] < time.time():
                # stale lease: holder died without releasing — break it
                # (ephemeral-node-expiry analogue) and race to re-create
                try:
                    os.remove(self.path)
                except FileNotFoundError:
                    pass
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
        with open(self.path, "w") as f:
            json.dump(
                {"owner": self.owner, "expires_at": time.time() + self.lease_seconds},
                f,
            )

    def release(self) -> None:
        if not self.acquired:
            return
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
