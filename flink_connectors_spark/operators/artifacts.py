"""Shared persisted-artifact lifecycle — the ensure-once helper behind
every build-once / probe-many index family (IVF-PQ, OPQ, residual
IVFADC, the shared k-means quantizer, and their incremental-ingest /
compaction demos).

One function owns the contract that previously lived in seven
near-identical ``_*_artifact_path`` helpers, so an eighth family can't
forget a step (r10 verdict Next #6). The contract, evolved over
r9–r11 ADVICE:

- **Completeness is an explicit ``_done`` marker written LAST** —
  never a relation directory's existence (Spark creates output dirs
  before the job commits, so a crashed half-build would otherwise
  pass as complete).
- **rmtree-before-rebuild**: anything without the marker is torn down
  wholesale before the build runs — no half-old/half-new artifacts.
- **Per-path process lock** (r10 ADVICE): two sessions or threads in
  one process observing the missing marker at the same time would
  otherwise run interleaved rmtree+overwrite builds while the other
  probes the half-built artifact. Builds serialize; the second waiter
  sees the marker and returns immediately.
- **Cache invalidation on rebuild** (r10 ADVICE): the process-level
  manifest and OPQ-rotation caches are popped before the build, so a
  rebuild at the same path can never serve a stale manifest or rotate
  query batches with yesterday's Householder vector against today's
  codebooks.
- **Scoping**: by default artifacts live in the system tempdir, keyed
  by PID and scale-factor tag (concurrent processes / two SFs in one
  process can't clobber each other's live index) and are removed at
  interpreter exit. Opt-in **stable mode** (see below) drops the PID
  and the cleanup for cluster-durable cross-process reuse.

Stable-path mode (r10 verdict Next #3): production wants indexes that
outlive the building process — build nightly, probe from every later
session. Set the session conf ``spark.flink_connectors_spark.artifactRoot``
or the environment variable ``FCS_ARTIFACT_ROOT`` to a durable
directory and every artifact helper resolves to
``{root}/fcs_{kind}_{sf_tag}``: a second process finds the ``_done``
marker and serves probes with zero build work, while the manifest
sidecar still validates params on every probe/append — reusing an
artifact built with different index params errors instead of silently
returning wrong neighbors. All relations are plain parquet + one
marker file, so a shared filesystem (NFS/EFS-style) is the local-mode
analogue of the object-store layout a real cluster would use.
"""

from __future__ import annotations

import logging
import os
import shutil
import tempfile
import threading
import time
import uuid
from collections.abc import Callable
from contextlib import contextmanager

from pyspark.sql import SparkSession

ARTIFACT_ROOT_CONF = "spark.flink_connectors_spark.artifactRoot"
ARTIFACT_ROOT_ENV = "FCS_ARTIFACT_ROOT"

_LOG = logging.getLogger("flink_connectors_spark.artifacts")

# Per-path build locks. The guard serializes lock creation; the
# per-path lock serializes the check-then-build critical section.
_PATH_LOCKS: dict[str, threading.Lock] = {}
_LOCKS_GUARD = threading.Lock()

# Stable-mode cross-process claim tuning (module-level so tests can
# shrink the windows). A claim older than STALE_CLAIM_SECONDS is
# presumed to belong to a crashed builder and is taken over; builds
# here run in seconds-to-a-minute, so half an hour is far outside any
# live build while still bounding how long a crashed nightly can
# block every later session.
STALE_CLAIM_SECONDS = 1800.0
_CLAIM_POLL_SECONDS = 0.2

# A waiter blocked on a peer's claim logs a warning after this many
# seconds (r12 ADVICE: the poll was silent — a crashed nightly builder
# stalled every consumer thread with zero signal until the stale
# takeover fired half an hour later).
CLAIM_WAIT_WARN_SECONDS = 10.0

# Optional hard ceiling on how long a waiter blocks before raising a
# descriptive TimeoutError instead of waiting for the stale takeover.
# Unset (None / empty env) preserves the wait-until-takeover behavior.
CLAIM_MAX_WAIT_ENV = "FCS_CLAIM_MAX_WAIT"


def _claim_max_wait() -> float | None:
    raw = os.environ.get(CLAIM_MAX_WAIT_ENV, "").strip()
    if not raw:
        return None
    try:
        return float(raw)
    except ValueError:
        _LOG.warning(
            "ignoring unparseable %s=%r (want seconds as a float)",
            CLAIM_MAX_WAIT_ENV, raw,
        )
        return None


def floor_x100(value: float, name: str) -> int:
    """The manifest stores score/jaccard floors at 1/100 granularity;
    the readers' float-exact guard (r11 ADVICE) is only sound when
    the stored integer EQUALS the build floor. A floor like 0.375
    would round UP to 38 — the reader would then reject the
    artifact's own build threshold — so unrepresentable floors error
    at BUILD time instead of misfiring at read time."""
    x = value * 100.0
    r = round(x)
    if abs(x - r) > 1e-9:
        raise ValueError(
            f"{name}={value!r} is not representable at the manifest's "
            "1/100 floor granularity — use a multiple of 0.01 (the "
            "stored floor must equal the build floor exactly)"
        )
    return int(r)


def artifact_root(spark: SparkSession) -> str | None:
    """The opt-in stable artifact root, or None for tempdir+PID mode.

    Session conf wins over the environment variable so tests (and
    per-session overrides) can redirect without mutating the process
    environment."""
    root = None
    try:
        root = spark.conf.get(ARTIFACT_ROOT_CONF, None)
    except Exception:
        root = None
    return root or os.environ.get(ARTIFACT_ROOT_ENV) or None


def artifact_path(spark: SparkSession, kind: str, sf_dir: str) -> str:
    """Resolve the artifact directory for (kind, scale factor).

    Tempdir mode keys on PID so concurrent processes never share a
    live index; stable mode deliberately drops the PID — durability
    across processes is the point — and keeps the sf tag (two SFs
    must never serve each other's index)."""
    tag = os.path.basename(os.path.normpath(sf_dir)).replace(".", "_")
    root = artifact_root(spark)
    if root:
        return os.path.join(root, f"fcs_{kind}_{tag}")
    return os.path.join(
        tempfile.gettempdir(), f"fcs_{kind}_{os.getpid()}_{tag}"
    )


def _lock_for(path: str) -> threading.Lock:
    with _LOCKS_GUARD:
        return _PATH_LOCKS.setdefault(path, threading.Lock())


def invalidate_artifact_caches(path: str) -> None:
    """Pop the process-level caches keyed by artifact path (manifest
    params, OPQ rotation) so a rebuild at the same path can never be
    probed with stale index-header state (r10 ADVICE: the rotation
    cache was primed on first read but never invalidated — a rebuild
    would silently rotate queries with the old Householder vector
    against the new codebooks)."""
    from ..session import _SCHEMA_CACHE, _SIZE_CACHE
    from .similarity import (
        _CODEBOOK_CACHE,
        _MANIFEST_CACHE,
        _ROTATION_CACHE,
    )

    _MANIFEST_CACHE.pop(path, None)
    _ROTATION_CACHE.pop(path, None)
    _CODEBOOK_CACHE.pop(path, None)
    # r15 (r14 ADVICE): the session-level parquet schema/size caches
    # are keyed on relation paths INSIDE the artifact dir — a rebuild
    # with schema-changing params (e.g. ivfpq ``subspaces`` changes
    # the codes columns) must not be read through ``spark.read.schema
    # (stale)``, which would silently null the new columns. Pop the
    # path and every sub-path.
    prefix = path.rstrip(os.sep) + os.sep
    for cache in (_SCHEMA_CACHE, _SIZE_CACHE):
        for key in [k for k in cache if k == path or k.startswith(prefix)]:
            cache.pop(key, None)


# Claims held by THIS process, keyed to the holding thread — makes
# the writer claim REENTRANT within one thread, so a build closure
# that calls the maintenance verbs (the compacted-index family builds
# via append+compact) cannot deadlock against the claim
# ensure_artifact already holds and heartbeats on its behalf. Across
# threads the filesystem claim still excludes (a second thread polls).
_HELD_CLAIMS: dict[str, int] = {}


def _holds_claim(path: str) -> bool:
    with _LOCKS_GUARD:
        return _HELD_CLAIMS.get(path) == threading.get_ident()


def _mark_claim_held(path: str) -> None:
    with _LOCKS_GUARD:
        _HELD_CLAIMS[path] = threading.get_ident()


def _unmark_claim_held(path: str) -> None:
    with _LOCKS_GUARD:
        _HELD_CLAIMS.pop(path, None)


def _read_owner_token(claim_dir: str) -> str | None:
    """The owner token a claimant wrote inside its claim dir, or None
    (unreadable / pre-token claim from an older build)."""
    try:
        with open(os.path.join(claim_dir, "owner")) as fh:
            return fh.read().strip() or None
    except OSError:
        return None


def _acquire_build_claim(path: str, *, until_marker: bool = True) -> bool:
    """Stable-mode cross-process claim (r11 verdict What's-wrong #3:
    the per-path lock is process-local, so two COLD processes sharing
    a durable artifact root could interleave rmtree+overwrite
    builds). ``os.mkdir`` of the sibling ``{path}.building`` dir is
    the atomic test-and-set (atomic on local FS and NFS alike — the
    classic portable claim). Returns True when THIS process owns the
    claim and must build; returns False when another process built
    the artifact to completion while we waited (marker present — no
    build needed). A claim older than ``STALE_CLAIM_SECONDS`` is
    presumed crashed and taken over.

    Each claimant writes an ``owner`` token (uuid+pid) inside its
    claim dir (r12 ADVICE): the takeover path re-reads the token
    after the aside rename and restores on MISMATCH, so a fresh claim
    that slid under a stale stat can never be mistaken for the
    crashed one and deleted. Waiters log a warning once the wait
    exceeds ``CLAIM_WAIT_WARN_SECONDS`` and honor an optional
    ``FCS_CLAIM_MAX_WAIT`` ceiling (raise instead of silently
    blocking until the 30-minute takeover)."""
    claim = path + ".building"
    marker = os.path.join(path, "_done")
    parent = os.path.dirname(path)
    wait_started = time.monotonic()
    warned = False
    max_wait = _claim_max_wait()
    while True:
        if until_marker and os.path.exists(marker):
            return False
        if parent:
            os.makedirs(parent, exist_ok=True)
        try:
            os.mkdir(claim)
        except FileExistsError:
            pass
        else:
            # Stamp ownership BEFORE returning: the token is what a
            # taker-over checks to distinguish this (fresh) claim from
            # the crashed one it stat'd.
            token = f"{uuid.uuid4().hex}:{os.getpid()}"
            try:
                with open(os.path.join(claim, "owner"), "w") as fh:
                    fh.write(token)
            except OSError:
                pass  # tokenless claim degrades to pre-r13 behavior
            _sweep_stale_claim_litter(path)
            return True
        # --- waiter path: a peer holds the claim ---
        waited = time.monotonic() - wait_started
        if not warned and waited > CLAIM_WAIT_WARN_SECONDS:
            warned = True
            try:
                age = time.time() - os.path.getmtime(claim)
            except OSError:
                age = float("nan")
            _LOG.warning(
                "waiting %.0fs on artifact build claim %s (claim age "
                "%.0fs; a crashed builder is taken over after %.0fs; "
                "set %s to bound this wait)",
                waited, claim, age, STALE_CLAIM_SECONDS,
                CLAIM_MAX_WAIT_ENV,
            )
        if max_wait is not None and waited > max_wait:
            raise TimeoutError(
                f"gave up waiting on artifact build claim {claim!r} "
                f"after {waited:.0f}s ({CLAIM_MAX_WAIT_ENV}={max_wait}); "
                "a peer process is building (or crashed holding the "
                "claim — stale takeover fires after "
                f"{STALE_CLAIM_SECONDS:.0f}s)"
            )
        try:
            age = time.time() - os.path.getmtime(claim)
        except OSError:
            continue  # claim released between exists and stat
        if age > STALE_CLAIM_SECONDS:
            # Crashed builder: read the (presumed-dead) claim's owner
            # token FIRST, then take the claim ASIDE with an atomic
            # rename — exactly one waiter wins the rename, so no
            # waiter can ever DELETE a fresh claim another taker-over
            # just created. The mkdir race then picks the single next
            # builder as usual.
            stale_token = _read_owner_token(claim)
            aside = f"{claim}.stale.{os.getpid()}.{time.monotonic_ns()}"
            try:
                os.rename(claim, aside)
            except OSError:
                continue  # another waiter took it aside first
            # Re-verify IDENTITY and staleness on the renamed dir: a
            # token mismatch or a fresh mtime means the dir we renamed
            # was created AFTER our stat (a competing taker-over's new
            # claim) — restore it instead of deleting it, then fall
            # back to waiting. The restore can only fail if a third
            # waiter mkdir'd within the rename→restore microseconds;
            # in that case the aside dir is LEFT IN PLACE (an orphan
            # named uniquely, never deleted — deleting would destroy
            # the live owner's claim copy, r12 ADVICE).
            aside_token = _read_owner_token(aside)
            try:
                aside_age = time.time() - os.path.getmtime(aside)
            except OSError:
                aside_age = STALE_CLAIM_SECONDS + 1.0
            if aside_token != stale_token or aside_age <= STALE_CLAIM_SECONDS:
                try:
                    os.rename(aside, claim)
                except OSError:
                    _LOG.warning(
                        "could not restore claim %s taken aside to %s "
                        "(a new claimant raced in); leaving the aside "
                        "dir for inspection", claim, aside,
                    )
                time.sleep(_CLAIM_POLL_SECONDS)
                continue
            _LOG.warning(
                "taking over stale artifact build claim %s "
                "(age %.0fs > %.0fs; presumed-crashed builder %s)",
                claim, age, STALE_CLAIM_SECONDS, stale_token or "<untokened>",
            )
            shutil.rmtree(aside, ignore_errors=True)
            continue
        time.sleep(_CLAIM_POLL_SECONDS)


def _release_build_claim(path: str) -> None:
    shutil.rmtree(path + ".building", ignore_errors=True)


def _sweep_stale_claim_litter(path: str) -> None:
    """GC takeover residue (r13 ADVICE, low): ``{path}.building.
    stale.*`` aside dirs deliberately left by a failed takeover
    restore accumulate forever on stable artifact roots. Swept here
    — by the claimant that just WON the claim — only once older than
    ``STALE_CLAIM_SECONDS``: inside the microsecond restore-failure
    window the aside is the displaced live claim's copy and must
    survive; past the stale horizon no writer references it
    (heartbeats touch the claim dir itself, never an aside)."""
    parent = os.path.dirname(path) or "."
    prefix = os.path.basename(path) + ".building.stale."
    try:
        names = os.listdir(parent)
    except OSError:
        return
    now = time.time()
    for name in names:
        if not name.startswith(prefix):
            continue
        full = os.path.join(parent, name)
        try:
            age = now - os.path.getmtime(full)
        except OSError:
            continue
        if age > STALE_CLAIM_SECONDS:
            _LOG.info("sweeping orphan claim aside %s (age %.0fs)",
                      full, age)
            shutil.rmtree(full, ignore_errors=True)


@contextmanager
def _claim_heartbeat(claim: str):
    """Refresh the claim's mtime while the protected write runs, so a
    LEGITIMATE build/append/compact longer than STALE_CLAIM_SECONDS
    is never mistaken for a crash and taken over mid-write. EVERY
    OSError — including FileNotFoundError — retries next tick until
    ``stop`` is set (r12 ADVICE: exiting on FileNotFoundError left a
    long build permanently heartbeat-less after a transient
    aside-rename window during a mistaken takeover, re-exposing the
    takeover-under-live-writer bug the heartbeat exists to prevent;
    likewise for ESTALE/EIO blips on the NFS-style roots stable mode
    targets). A missing claim at stop time is simply the normal
    release path — the beater never needs to self-terminate."""
    stop = threading.Event()

    def _beat() -> None:
        while not stop.wait(STALE_CLAIM_SECONDS / 3.0):
            try:
                os.utime(claim)
            except OSError:
                continue

    beater = threading.Thread(target=_beat, daemon=True)
    beater.start()
    try:
        yield
    finally:
        stop.set()
        beater.join(timeout=1.0)


@contextmanager
def _writer_claim(path: str):
    """Cross-process WRITER mutual exclusion on an artifact path —
    the same atomic claim dir (heartbeated, stale-takeover) the
    stable-mode build uses, reusable by the maintenance verbs that
    mutate a shared artifact in place (signature-index append and
    compaction). Unlike the build acquire, an existing ``_done``
    marker does NOT satisfy the wait: maintenance mutates a COMPLETE
    artifact, so it must hold the claim itself. REENTRANT within one
    thread (see ``_HELD_CLAIMS``): a maintenance verb invoked from a
    build closure rides the claim ensure_artifact already holds."""
    if _holds_claim(path):
        yield
        return
    _acquire_build_claim(path, until_marker=False)
    _mark_claim_held(path)
    try:
        with _claim_heartbeat(path + ".building"):
            yield
    finally:
        _unmark_claim_held(path)
        _release_build_claim(path)


# ---------------------------------------------------------------------------
# Partitioned-relation index lifecycle — the transactional append /
# crash-safe compaction protocol the r12 signature index proved out
# (`operators/dedup.py`), factored here (r13) so the tokenized-corpus
# artifact and future families share ONE audited implementation
# instead of re-deriving the crash-window analysis per family:
#
# - every relation directory is hive-partitioned on ``part``:
#   ``part=base`` from the initial build plus one ``part=<batch_id>``
#   per appended ingest batch;
# - a batch is COMMITTED iff ``{path}/_batches/<batch_id>`` exists —
#   the marker is written LAST, so readers (which partition-prune to
#   the committed set) never see a crashed half-append;
# - compaction folds the committed view back into one ``part=base``
#   per relation with a two-rename swap (``*_compacting`` staging,
#   ``*_precompact`` fallback) so every crash window serves the
#   identical logical relation;
# - append and compact both run under the artifact's writer claim
#   (:func:`_writer_claim` — heartbeated, stale-takeover, reentrant
#   within the building thread).
#
# The default swap relies on POSIX rename atomicity (local FS /
# NFS); the marker protocol itself (write-last, read-filtered) is
# object-store safe — and the swap is the pluggable commit-backend
# seam documented directly below (`_rename_swap_in` /
# `_pointer_swap_in`).


# Commit-backend seam (r12 verdict Next #4): the compaction SWAP is
# the one step whose crash analysis depended on POSIX directory-rename
# atomicity. It is now pluggable:
#
# - ``rename`` (default): the proven two-rename swap (stage the old
#   relation aside as ``*_precompact``, rename the staged rewrite in,
#   drop the fallback last). Correct on local FS / NFS.
# - ``pointer``: rename-free — each compaction writes a fresh
#   GENERATION directory (``{rel}__g<N>/part=base``) and then commits
#   by atomically replacing a one-line pointer FILE
#   (``{rel}.current``) naming the live generation. Readers resolve
#   the pointer first. The only atomic primitive used on a directory
#   of data is "write small file, replace" — exactly the atomic-PUT
#   an object store provides — so the crash analysis holds on
#   S3-class storage: before the pointer lands readers serve the old
#   generation (batch partitions + markers intact); after it lands
#   they serve the new base (batch markers pointing at partitions
#   absent from the new generation prune to zero rows — the rows are
#   already IN the new base); orphan generations from a crash before
#   the pointer are garbage-collected by the next compact.
#
# Select with the env var ``FCS_COMMIT_BACKEND`` (read at each
# compaction, so a deployment can flip backends between runs — the
# rename backend retires a stale pointer it finds). The
# append path needs no seam: it only ever ADDS a partition directory
# + a marker file written last (already object-store-safe). The
# claim DIRECTORY (os.mkdir test-and-set) remains the documented
# local/NFS primitive; an object-store deployment replaces it with a
# conditional PUT (if-none-match) — the one remaining seam, isolated
# in _acquire_build_claim.
COMMIT_BACKEND_ENV = "FCS_COMMIT_BACKEND"


def _commit_backend() -> str:
    backend = os.environ.get(COMMIT_BACKEND_ENV, "").strip() or "rename"
    if backend not in ("rename", "pointer"):
        raise ValueError(
            f"{COMMIT_BACKEND_ENV}={backend!r}: want 'rename' or "
            "'pointer'"
        )
    return backend


def _pointer_file(path: str, rel: str) -> str:
    return os.path.join(path, f"{rel}.current")


def _read_pointer(path: str, rel: str) -> str | None:
    try:
        with open(_pointer_file(path, rel)) as fh:
            name = fh.read().strip()
    except OSError:
        return None
    return name or None


def _atomic_pointer_write(path: str, rel: str, gen_name: str) -> None:
    """Commit a new live generation by replacing the pointer file —
    write-temp-then-replace, the local analogue of an object store's
    atomic PUT (never an in-place partial write)."""
    ptr = _pointer_file(path, rel)
    tmp = f"{ptr}.tmp.{os.getpid()}.{time.monotonic_ns()}"
    with open(tmp, "w") as fh:
        fh.write(gen_name)
    os.replace(tmp, ptr)


def resolve_rel_dir(path: str, rel: str) -> str:
    """The LIVE directory of a relation: the pointer target when a
    ``{rel}.current`` pointer exists (pointer-backend generations),
    else the plain relation dir, else the ``*_precompact`` fallback
    inside the rename backend's crash window."""
    ptr_gen = _read_pointer(path, rel)
    if ptr_gen:
        cand = os.path.join(path, ptr_gen)
        if os.path.isdir(cand):
            return cand
    rel_dir = os.path.join(path, rel)
    if not os.path.isdir(rel_dir):
        pre = rel_dir + "_precompact"
        if os.path.isdir(pre):
            return pre
    return rel_dir


def append_part_dir(path: str, rel: str, batch_id: str) -> str:
    """Where an append writes its ``part=<batch_id>`` partition: the
    relation's LIVE directory (pointer-resolved under the pointer
    backend, the plain dir otherwise) — so appends keep working
    unchanged after a pointer-backend compaction swapped the live
    generation."""
    return os.path.join(resolve_rel_dir(path, rel), f"part={batch_id}")


def validate_batch_id(batch_id: str) -> None:
    """Reject batch ids that are not filesystem-safe tokens or that
    collide with reserved partition names: '.' / '..' pass the
    charset but resolve the marker path to the index dir itself —
    the append would silently no-op as "already committed"."""
    import re

    if (
        not re.fullmatch(r"[A-Za-z0-9_.\-]+", batch_id)
        or batch_id in ("base", ".", "..")
    ):
        raise ValueError(
            f"invalid batch_id {batch_id!r}: must be a filesystem-"
            "safe token and not 'base', '.', or '..'"
        )


def committed_parts(path: str) -> list[str]:
    """The committed partition set of a partitioned artifact: the
    base build plus every appended batch whose commit marker exists.
    A crashed append's partition directories are present on disk but
    invisible to every reader until its marker lands (written LAST
    by the append verb)."""
    parts = ["base"]
    bdir = os.path.join(path, "_batches")
    if os.path.isdir(bdir):
        parts += sorted(os.listdir(bdir))
    return parts


def _done_ledger_entry(path: str, batch_id: str) -> str:
    return os.path.join(path, "_batches_done", batch_id)


def batch_already_consumed(path: str, batch_id: str) -> bool:
    """True when ``batch_id`` was committed at ANY point in the
    artifact's history — live marker (rows still in their own
    partition) OR the compaction ledger (rows folded into
    ``part=base``). The ledger exists because batch_id is sold as
    the idempotency key a retry reuses (r13 ADVICE, medium):
    compaction clears the live markers, so without a persistent
    record a delayed/retried append of an already-compacted batch
    would pass the marker check as fresh and silently RE-COMMIT
    every row of the batch (doubled counts in every count relation).
    Ledger entries are empty marker files, one per batch id ever
    compacted — a nightly cadence accrues ~365 zero-byte files/year,
    negligible next to the data partitions they guard."""
    return os.path.exists(
        os.path.join(path, "_batches", batch_id)
    ) or os.path.exists(_done_ledger_entry(path, batch_id))


def read_committed_relation(spark, path: str, rel: str):
    """Read one partitioned relation restricted to COMMITTED batches:
    the ``part`` filter is partition PRUNING (uncommitted / crashed
    append directories never enter the scan), then the partition
    column drops so consumers see the logical relation. The column
    guard keeps pre-partition-layout artifacts readable (they are
    all-committed by construction). If a crash landed between
    compaction's two renames (no live relation dir), fall back to
    the preserved ``*_precompact`` relation — its partitions and
    markers are still intact, so even that window serves the correct
    logical relation."""
    from pyspark.sql import functions as F

    df = spark.read.parquet(resolve_rel_dir(path, rel))
    if "part" in df.columns:
        df = df.filter(
            F.col("part").isin(committed_parts(path))
        ).drop("part")
    return df


def heal_interrupted_compact(
    path: str, relations: tuple[str, ...]
) -> None:
    """Roll back a compact that crashed between its two renames: the
    live relation dir is missing and ``*_precompact`` (the intact
    pre-compaction state — all partitions AND their markers) is
    present. Restoring it returns the artifact to a fully consistent
    committed state; the interrupted compact's ``*_compacting``
    output is discarded (a retry rebuilds it). MUST run under the
    writer claim. Without this, an APPEND landing in the crash
    window would recreate the live dir with only its own batch,
    silently shadowing the fallback — every previously committed row
    lost (r12 self-review).

    Pointer-backend artifacts have no mid-swap state to heal (the
    pointer flip is atomic); their only crash residue is an orphan
    generation directory never pointed at, which the next compact
    garbage-collects — a relation whose pointer resolves is left
    alone here."""
    for rel in relations:
        if _read_pointer(path, rel):
            shutil.rmtree(
                f"{path}/{rel}_compacting", ignore_errors=True
            )
            continue
        live = f"{path}/{rel}"
        pre = f"{live}_precompact"
        if not os.path.isdir(live) and os.path.isdir(pre):
            os.rename(pre, live)
        shutil.rmtree(f"{path}/{rel}_compacting", ignore_errors=True)


def compact_relations(
    spark,
    path: str,
    relations: tuple[str, ...],
    finalize: dict[str, Callable] | None = None,
) -> None:
    """Fold every committed append batch into a fresh ``part=base``
    per relation and clear the consumed batch markers — the generic
    maintenance verb behind ``minhash_index_compact`` and
    ``corpus_grams_compact``. ``finalize[rel]`` (optional) transforms
    the committed view before it is written — the tokenized-corpus
    count relations pass their merge aggregation here, so compaction
    is also where per-batch partial counts fold into one exact row
    per key. A reader sees the identical logical relation before,
    during, and after.

    Crash safety, window by window (each rename is atomic on a
    POSIX/NFS filesystem; an object store would use its own
    atomic-commit primitive):

    - before any rename: originals + markers intact; the orphaned
      ``*_compacting`` dir is removed by the retry.
    - between a relation's two renames (no live dir): readers fall
      back to the preserved ``*_precompact`` dir, whose partitions
      and markers are untouched. A compact RETRY in this window
      rebuilds ``*_compacting`` from the fallback and renames it
      straight in (the rename-out is skipped when no live dir
      exists); the fallback is only removed AFTER the new base is
      live, so no window ever holds zero readable copies.
    - between two relations' swaps: one relation already serves all
      rows from the new base, the other still unions base +
      committed batches — the logical contents are identical.
    - during marker clearing: a marker pointing at a batch dir the
      new base absorbed prunes to zero files — harmless.

    Writer-writer concurrency: compaction takes the same atomic
    ``{path}.building`` claim the artifact builds and appends use —
    a concurrently-committing append can therefore never land
    between the committed-parts snapshot and the marker clearing
    (which would silently destroy the batch). READERS do not lock: a
    probe racing the rename pair may need one retry on a shared
    filesystem.

    One linear pass per relation (partition-pruned committed read,
    no shuffle beyond the write and any finalize aggregation), O(1)
    metadata swaps."""
    backend = _commit_backend()
    with _writer_claim(path):
        # roll back a predecessor's mid-swap crash FIRST: compaction
        # must start from a consistent live layout
        heal_interrupted_compact(path, relations)
        if committed_parts(path) == ["base"]:
            return  # nothing appended since the last base — no-op
        for rel in relations:
            df = read_committed_relation(spark, path, rel)
            if finalize and rel in finalize:
                df = finalize[rel](df)
            if backend == "pointer":
                _pointer_swap_in(spark, path, rel, df)
            else:
                _rename_swap_in(path, rel, df)
        bdir = os.path.join(path, "_batches")
        names = sorted(os.listdir(bdir)) if os.path.isdir(bdir) else []
        if names:
            # Idempotency ledger BEFORE the live markers clear (r13
            # ADVICE): each consumed batch id is recorded in
            # ``_batches_done/`` so a delayed retry of an already-
            # compacted batch still reads as committed (see
            # :func:`batch_already_consumed`). Crash between the two
            # loops: a batch is ledgered AND still live-marked — the
            # marker prunes to zero partitions (its rows are in the
            # new base) and the next compact finishes the clearing.
            ddir = os.path.join(path, "_batches_done")
            os.makedirs(ddir, exist_ok=True)
            for name in names:
                open(os.path.join(ddir, name), "w").close()
            for name in names:
                os.unlink(os.path.join(bdir, name))


def _rename_swap_in(path: str, rel: str, df) -> None:
    """The default POSIX two-rename swap (see the crash-window
    analysis in :func:`compact_relations`'s docstring)."""
    live = f"{path}/{rel}"
    tmp = f"{path}/{rel}_compacting"
    shutil.rmtree(tmp, ignore_errors=True)
    df.write.mode("overwrite").parquet(f"{tmp}/part=base")
    pre = f"{live}_precompact"
    if os.path.isdir(live):
        # stage the old relation aside, THEN swap in the new base;
        # only drop the fallback once the new base is live (an
        # rmtree-before-rename would delete the fallback first, so a
        # retry after a crash between the renames would strand the
        # relation entirely)
        shutil.rmtree(pre, ignore_errors=True)
        os.rename(live, pre)
    os.rename(tmp, live)
    shutil.rmtree(pre, ignore_errors=True)
    # backend-flip hygiene (r13 self-review): a relation previously
    # compacted under the POINTER backend still carries a pointer
    # file and its generation dir — left in place they would SHADOW
    # the freshly renamed plain dir (readers prefer the pointer).
    # Retire both once the plain dir is live.
    gen = _read_pointer(path, rel)
    try:
        os.unlink(_pointer_file(path, rel))
    except OSError:
        pass
    if gen and gen != rel:
        shutil.rmtree(os.path.join(path, gen), ignore_errors=True)


def _pointer_swap_in(spark, path: str, rel: str, df) -> None:
    """The rename-free swap (FCS_COMMIT_BACKEND=pointer): write a
    fresh generation directory, commit it with one atomic pointer-
    file replace, then garbage-collect every stale generation and
    the legacy plain relation dir. No step renames a directory of
    data — the object-store-compatible protocol (atomic small-object
    PUT). Crash windows: before the pointer lands, readers resolve
    the previous generation (or the legacy dir) with its batch
    partitions + markers intact; after it lands, the new base IS the
    committed view (stale batch markers prune to zero partitions —
    their rows are already in the new base) and the GC below is pure
    cleanup. Generation numbers are monotonic per relation, so a
    crashed orphan can never be confused for the live generation."""
    current = _read_pointer(path, rel)
    cur_n = 0
    if current and "__g" in current:
        try:
            cur_n = int(current.rsplit("__g", 1)[1])
        except ValueError:
            cur_n = 0
    gen = f"{rel}__g{cur_n + 1}"
    gen_dir = os.path.join(path, gen)
    shutil.rmtree(gen_dir, ignore_errors=True)  # crashed orphan
    df.write.mode("overwrite").parquet(f"{gen_dir}/part=base")
    _atomic_pointer_write(path, rel, gen)
    # GC: every generation except the live one, plus the legacy
    # plain dir the first pointer commit supersedes
    for d in os.listdir(path):
        if d.startswith(f"{rel}__g") and d != gen:
            shutil.rmtree(os.path.join(path, d), ignore_errors=True)
    shutil.rmtree(os.path.join(path, rel), ignore_errors=True)
    # backend-flip hygiene (r13 ADVICE, low): a rename→pointer flip
    # can strand the rename backend's ``*_precompact`` fallback; once
    # the pointer commits, readers resolve the generation and the
    # fallback is unreachable litter — GC it with the rest.
    shutil.rmtree(
        os.path.join(path, f"{rel}_precompact"), ignore_errors=True
    )


@contextmanager
def transactional_append(path: str, batch_id: str, relations: tuple[str, ...]):
    """The append-side transaction shared by every partitioned
    artifact family: validates the batch id, takes the writer claim,
    heals a predecessor's mid-swap compact crash, and yields True
    when the batch still needs writing (False = the commit marker
    already exists — an idempotent retry must skip its writes). The
    caller writes each relation's ``part={batch_id}`` directory in
    OVERWRITE mode inside the ``with`` body; the commit marker is
    written LAST, on clean exit only. Idempotency survives
    compaction: a batch whose live marker was cleared by
    ``compact_relations`` is still recorded in the ``_batches_done``
    ledger, so a delayed retry can never re-commit its rows (r13
    ADVICE)."""
    validate_batch_id(batch_id)
    with _writer_claim(path):
        heal_interrupted_compact(path, relations)
        marker = os.path.join(path, "_batches", batch_id)
        if batch_already_consumed(path, batch_id):
            yield False  # already committed — idempotent retry
            return
        yield True
        os.makedirs(os.path.dirname(marker), exist_ok=True)
        open(marker, "w").close()


def ensure_artifact(
    spark: SparkSession,
    kind: str,
    sf_dir: str,
    build: Callable[[str], None],
) -> str:
    """Ensure the ``kind`` artifact exists for this scope and return
    its path. ``build(path)`` runs under the per-path lock only when
    the ``_done`` marker is absent; a crashed half-build (marker
    missing, relations present) is torn down and rebuilt. In stable
    mode a marker left by ANOTHER process is trusted — that is the
    feature — param drift is caught by the manifest validation every
    probe/append performs, and concurrent builds across PROCESSES
    serialize on an atomic ``{path}.building`` claim directory with a
    stale-claim takeover (see :func:`_acquire_build_claim`)."""
    path = artifact_path(spark, kind, sf_dir)
    with _lock_for(path):
        marker = os.path.join(path, "_done")
        if os.path.exists(marker):
            return path
        if artifact_root(spark) is None:
            # tempdir+PID mode: the path is process-private, so the
            # thread lock is the whole story; artifacts die with the
            # process
            from ..plans.sink_semantics import _register_tmp_cleanup

            shutil.rmtree(path, ignore_errors=True)
            invalidate_artifact_caches(path)
            _register_tmp_cleanup(path)
            build(path)
            open(marker, "w").close()
            return path
        # stable mode: multiple processes share this path by design
        if not _acquire_build_claim(path):
            # another process completed the build while we waited;
            # drop any cached header state from a pre-rebuild read
            invalidate_artifact_caches(path)
            return path
        _mark_claim_held(path)
        try:
            with _claim_heartbeat(path + ".building"):
                if not os.path.exists(marker):
                    shutil.rmtree(path, ignore_errors=True)
                    invalidate_artifact_caches(path)
                    build(path)
                    open(marker, "w").close()
                else:
                    # another process finished between our last marker
                    # check and the mkdir that won us the claim — same
                    # pre-rebuild-cache hazard as the waiter branch
                    invalidate_artifact_caches(path)
        finally:
            _unmark_claim_held(path)
            _release_build_claim(path)
    return path
