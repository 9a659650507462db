"""Single-instance coordination (T12).

Re-expresses zookeeper.py:97-139 (ZKLock): at most one copy of a batch
runs per (name, namespace), acquired with a timeout and released on exit.
The reference leans on ZooKeeper ephemeral nodes; this engine has no ZK in
scope, so the lock is a LEASE on shared storage: an atomically-created
lock record carrying (owner, expiry).  A crashed holder's lock self-expires
— the property the reference gets from ephemeral-node session loss — so a
wedged batch can never fence out its replacement forever.

Two storage backends implement the same protocol (`LeaseLock(...,
backend=...)`, default from ``SPARK_GRAFT_LOCK_BACKEND``, else "flock"):

- **flock** (`FlockLeaseLock`) — one lock file + an flock-ed guard sidecar
  serializing the multi-step break/renew/release sequences.  Requires a
  filesystem with POSIX flock semantics: a single host, or a cluster FS
  (NFSv4, Lustre, GPFS) that provides them.
- **epoch** (`EpochLeaseLock`) — NO flock, no byte-range locks, no
  overwriting rename.  The lock is a monotone chain of epoch files in a
  directory; every state transition (acquire, renew, release, stale
  break) is the atomic creation of the NEXT epoch file, arbitrated purely
  by create-if-absent.  This is the HDFS / object-store shape: the only
  primitives used are atomic create-if-absent (HDFS ``create(overwrite=
  false)``, S3 ``If-None-Match: *`` conditional PUT, GCS
  ``ifGenerationMatch=0``, ABFS create-no-overwrite) plus directory
  listing.  Locally the create-if-absent publish is emulated with
  ``os.link`` (atomic, fails if the destination exists — the POSIX
  rename-no-overwrite); `_publish_epoch` is the one seam a real
  object-store deployment swaps for its conditional PUT.  The epoch
  number doubles as a monotonically-increasing fencing token.
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


def _default_backend() -> str:
    return os.environ.get("SPARK_GRAFT_LOCK_BACKEND", "flock")


class LeaseLock:
    """`with LeaseLock(name, namespace, root): ...` — one holder at a time.

    - acquire: atomic create of the lock record; a record whose lease
      expired (holder died without releasing) is broken and retried.
    - renew(): extends the lease; long batches call it between stages.
    - release: a holder whose lease expired and was taken over must never
      clobber the new holder's lock (renew raises LockTimeout, release is
      a no-op).

    Instantiating ``LeaseLock`` directly dispatches on ``backend`` (or the
    ``SPARK_GRAFT_LOCK_BACKEND`` env var): "flock" → `FlockLeaseLock`,
    "epoch" → `EpochLeaseLock`.  Both subclasses honor the identical
    protocol and test surface (`_read`, `acquired`, context manager).
    """

    def __new__(cls, *args, backend: str | None = None, **kwargs):
        if cls is LeaseLock:
            chosen = backend or _default_backend()
            try:
                cls = _BACKENDS[chosen]
            except KeyError:
                raise ValueError(
                    f"unknown lock backend {chosen!r}; known: {sorted(_BACKENDS)}"
                ) from None
        return object.__new__(cls)

    def __init__(
        self,
        name: str,
        namespace: str,
        root: str,
        lease_seconds: float = 60,
        timeout: float = 10,
        owner: str | None = None,
        backend: str | None = None,  # consumed by __new__ dispatch
    ):
        self.name = name
        self.namespace = namespace
        self.root = root
        self.lease_seconds = lease_seconds
        self.timeout = timeout
        # unique per INSTANCE, not just per process: two locks in one
        # process (e.g. two publisher threads with serialize_publishes)
        # sharing a pid-only owner would pass each other's ownership
        # checks after a stale break and release() the wrong live lock
        self.owner = owner or f"pid-{os.getpid()}-{uuid.uuid4().hex[:8]}"
        self.acquired = False
        os.makedirs(root, exist_ok=True)

    # -- protocol (implemented per backend) ----------------------------------

    def acquire(self) -> None:
        raise NotImplementedError

    def renew(self) -> None:
        raise NotImplementedError

    def release(self) -> None:
        raise NotImplementedError

    def _read(self) -> dict | None:
        """Current live lease record ({owner, expires_at}) or None."""
        raise NotImplementedError

    # -- context manager (ZKLock usage shape) -------------------------------

    def __enter__(self) -> "LeaseLock":
        self.acquire()
        return self

    def __exit__(self, exc_type, exc, tb) -> None:
        self.release()


class FlockLeaseLock(LeaseLock):
    """Lock-file lease with an flock guard (POSIX-flock filesystems)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.path = os.path.join(self.root, f"{self.name}-{self.namespace}.lock")

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


class EpochLeaseLock(LeaseLock):
    """Flock-free lease: a monotone epoch chain arbitrated by create-if-absent.

    State = the highest-numbered ``e-<n>.json`` file in the lock directory
    (a lease record, or a ``released`` tombstone).  Every transition
    CREATES epoch n+1; it never rewrites or deletes the live record:

    - acquire: if the top epoch is absent/released/expired, publish
      ``e-<n+1>`` with our lease.  Exactly one contender's create-if-absent
      wins — the 8-way stale-break race needs no guard because the create
      IS the arbitration.
    - renew: publish ``e-<n+1>`` re-asserting ownership.  Losing that
      create means a contender observed our lease expired and usurped —
      we raise LockTimeout rather than steal it back.
    - release: publish a ``released`` tombstone at n+1 (only if still the
      owner — a usurped holder publishes nothing).

    After every successful create the publisher re-lists and verifies its
    epoch is still the maximum; this closes the one reuse race GC opens
    (a slow contender re-creating a GC'd low epoch can never see itself
    as top, because GC only ever runs after a higher epoch exists).
    Debris epochs (≤ top - _GC_KEEP) are garbage-collected best-effort by
    later publishers.

    The epoch number is a fencing token: it increases monotonically across
    holders, so downstream writers can reject operations stamped with a
    stale token — the ZooKeeper-recipe property flock cannot give.
    """

    _GC_KEEP = 8  # epochs kept behind top before best-effort deletion

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.dir = os.path.join(self.root, f"{self.name}-{self.namespace}.lockd")
        self.epoch = 0  # last epoch this instance published
        os.makedirs(self.dir, exist_ok=True)

    # -- storage primitives (the object-store seam) --------------------------

    def _list_epochs(self) -> list[int]:
        try:
            names = os.listdir(self.dir)
        except FileNotFoundError:
            return []
        out = []
        for n in names:
            if n.startswith("e-") and n.endswith(".json"):
                try:
                    out.append(int(n[2:-5]))
                except ValueError:
                    continue
        return out

    def _epoch_path(self, n: int) -> str:
        return os.path.join(self.dir, f"e-{n:014d}.json")

    def _publish_epoch(self, n: int, record: dict) -> bool:
        """Atomically create epoch n with `record`; False if it exists.

        Local emulation of conditional PUT: write a complete private tmp
        file, then hard-link it to the epoch name — link is atomic and
        fails with FileExistsError when the destination exists, so readers
        only ever observe complete records and exactly one contender wins
        each epoch.  A real object-store backend replaces this method with
        its conditional create (S3 If-None-Match / GCS generation-0 / HDFS
        create-exclusive); nothing else in the class touches the medium.
        """
        tmp = os.path.join(self.dir, f".tmp-{self.owner}-{uuid.uuid4().hex[:8]}")
        with open(tmp, "w") as f:
            json.dump(record, f)
        try:
            os.link(tmp, self._epoch_path(n))
            return True
        except FileExistsError:
            return False
        finally:
            os.unlink(tmp)

    def _read_epoch(self, n: int) -> dict | None:
        try:
            with open(self._epoch_path(n)) as f:
                return json.load(f)
        except (FileNotFoundError, json.JSONDecodeError):
            return None  # GC'd between list and read — caller re-lists

    # -- protocol -------------------------------------------------------------

    def _top(self) -> tuple[int, dict | None]:
        """(top epoch number, its record) — (0, None) for a fresh lock."""
        while True:
            epochs = self._list_epochs()
            if not epochs:
                return 0, None
            top = max(epochs)
            rec = self._read_epoch(top)
            if rec is not None:
                return top, rec
            # the top file vanished between list and read: top can only
            # ever be GC'd after a HIGHER epoch exists — re-list finds it

    def _read(self) -> dict | None:
        _, rec = self._top()
        if rec is None or rec.get("released"):
            return None
        return rec

    def _publish_verified(self, n: int, record: dict) -> bool:
        """Create epoch n AND verify it is still the maximum.

        The verify closes the GC reuse race: a contender that stalled long
        enough for its target epoch file to be created, GC'd, and re-tried
        would otherwise win a create for a number BELOW the live top.
        """
        if not self._publish_epoch(n, record):
            return False
        top = max(self._list_epochs())
        if top != n:
            return False  # our file is stale debris below a newer epoch
        self.epoch = n
        self._gc(n)
        return True

    def _gc(self, top: int) -> None:
        for n in self._list_epochs():
            if n <= top - self._GC_KEEP:
                try:
                    os.unlink(self._epoch_path(n))
                except FileNotFoundError:
                    pass  # another publisher's GC got it first

    def acquire(self) -> None:
        deadline = time.time() + self.timeout
        while True:
            n, rec = self._top()
            free = (
                rec is None
                or rec.get("released")
                or rec["expires_at"] < time.time()
            )
            if free:
                if self._publish_verified(
                    n + 1,
                    {
                        "owner": self.owner,
                        "expires_at": time.time() + self.lease_seconds,
                    },
                ):
                    self.acquired = True
                    return
                continue  # lost the create race — re-read the new top
            if time.time() >= deadline:
                raise LockTimeout(
                    f"lock {self.dir} held by {rec['owner']!r}; another "
                    "instance is already running against this source"
                )
            time.sleep(0.05)

    def renew(self) -> None:
        if not self.acquired:
            raise RuntimeError("cannot renew a lock that is not held")
        n, rec = self._top()
        usurped = (
            rec is None or rec.get("released") or rec.get("owner") != self.owner
        )
        if not usurped:
            usurped = not self._publish_verified(
                n + 1,
                {"owner": self.owner, "expires_at": time.time() + self.lease_seconds},
            )
        if usurped:
            # our lease expired and a contender took over mid-run: we are
            # no longer the holder and must NOT publish over the usurper
            self.acquired = False
            holder = rec.get("owner") if rec else "unknown"
            raise LockTimeout(
                f"lease in {self.dir} was taken over by {holder!r}; "
                "this instance lost the lock"
            )

    def release(self) -> None:
        if not self.acquired:
            return
        n, rec = self._top()
        if rec is not None and rec.get("owner") == self.owner and not rec.get("released"):
            # losing this create means a contender just usurped the
            # (expired) lease — the lock is theirs, nothing to release
            self._publish_verified(n + 1, {"released": True, "owner": self.owner})
        self.acquired = False


_BACKENDS: dict[str, type[LeaseLock]] = {
    "flock": FlockLeaseLock,
    "epoch": EpochLeaseLock,
}


@contextlib.contextmanager
def process_mutex(
    base: str,
    name: str = "build",
    backend: str | None = None,
    lease_seconds: float = 600.0,
):
    """Blocking cross-process critical section rooted at ``base``.

    Used by sidecar-cache builds (one process builds, others wait, all
    re-check existence after acquiring).  Backend-dispatched like
    LeaseLock: the flock path holds a kernel lock for exactly the build's
    lifetime (crash → auto-release); the epoch path takes a lease and
    RENEWS it from a daemon thread every lease/3 while the build runs —
    a fixed unrenewed lease would silently stop excluding once a build
    outlives it, letting a second builder race the first (the exact
    overwrite race the mutex exists for), while expiry still breaks a
    CRASHED builder within lease_seconds — the semantics a real
    object-store lease service provides.  If a renewal ever fails (the
    lease was usurped despite renewal — e.g. extreme clock skew), the
    thread stops renewing and the build runs to completion: artifacts
    publish via staged atomic renames and every waiter re-checks
    ``done()`` after acquiring, so the worst case is duplicate work,
    never a torn artifact.
    """
    chosen = backend or _default_backend()
    os.makedirs(base, exist_ok=True)
    if chosen == "flock":
        fd = os.open(os.path.join(base, ".lock"), os.O_CREAT | os.O_RDWR)
        try:
            fcntl.flock(fd, fcntl.LOCK_EX)
            yield
        finally:
            os.close(fd)  # closing drops the flock
        return
    import threading

    lock = LeaseLock(
        "mutex",
        name,
        base,
        lease_seconds=lease_seconds,
        timeout=86400,  # waiters block ~like the flock branch does
        backend=chosen,
    )
    lock.acquire()
    stop = threading.Event()

    def _renew_loop() -> None:
        while not stop.wait(lease_seconds / 3):
            try:
                lock.renew()
            except Exception:
                return  # usurped: stop renewing (see docstring)

    renewer = threading.Thread(
        target=_renew_loop, name=f"mutex-renew-{name}", daemon=True
    )
    renewer.start()
    try:
        yield
    finally:
        stop.set()
        renewer.join(timeout=10)
        try:
            lock.release()
        except Exception:
            pass  # usurped while building: nothing left to release
