"""Snapshot layer for the docs table: append / time-travel / incremental
reads — the parquet-fallback analog of Iceberg's snapshot model.

The production table is Iceberg (north rule: "interleaved text + media
spans … scaled to Iceberg snapshots"), whose runtime jar is absent from
this sandbox.  This module reproduces the SNAPSHOT SEMANTICS the
pipeline relies on over plain parquet, with the same one-line-swap
discipline as :mod:`docs`:

- ``append_snapshot(df, root)``  → Iceberg ``df.writeTo(t).append()``
  (each call = one new snapshot whose manifest lists the files added)
- ``read_snapshot(spark, root, sid)`` → ``VERSION AS OF`` time travel
- ``incremental_read(spark, root, after, until)`` → Iceberg incremental
  scan (``start-snapshot-id`` / ``end-snapshot-id``) — the feed an
  incremental extraction job consumes to process only NEW documents
- ``expire_snapshots(spark, root, keep_n)`` → Iceberg
  ``expireSnapshots().retainLast(n)`` + orphan-file removal: old
  time-travel points disappear, their data files are retained for the
  surviving snapshots, and unreferenced attempt dirs are reclaimed
- schema evolution: each manifest records the schema of the files it
  added; reads union snapshots with ``unionByName(allowMissingColumns)``
  so an append with an added column coexists with older snapshots

Layout under ``root``::

    data/snap-<id>-<attempt>/*.parquet        immutable data files
    manifests/snap-<id>-<attempt>.json        {"snapshot_id", "parent_id",
                                               "paths", "schema"}

ALL filesystem access — data AND manifests — goes through the Hadoop
FileSystem API resolved from the path, so on a cluster whose default FS
is HDFS/S3 the metadata lands next to the data, never on one driver
machine's local disk (the write/cleanup-filesystem split rule; see also
``dedup._scratch_root``).

Commit protocol (Iceberg's, minus the catalog CAS a single writer does
not need): data files are written under an ATTEMPT-UNIQUE directory
first, then the manifest is published under an ATTEMPT-UNIQUE name —
no rename ever targets an existing path, so the protocol does not
depend on rename-fails-if-destination-exists (HDFS honors that;
POSIX/``file://`` silently overwrites).  Two concurrent appends of the
same snapshot id both publish; the winner is the lexicographically
smallest attempt (deterministic on every filesystem), the loser detects
the loss post-publish, deletes its own manifest, and raises — its data
dir becomes an unreferenced orphan that ``expire_snapshots`` reclaims.
A killed append leaves the same kind of orphan: harmless, invisible to
readers, re-append-able.  Scale shape: manifests are tiny metadata
files (one per snapshot, read on the driver); data reads are ordinary
multi-path parquet scans, so column pruning / predicate pushdown /
split planning are untouched."""

from __future__ import annotations

import json
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from .docs import DOCS_SCHEMA


# ------------------------------------------------------- Hadoop FS helpers
def _fs_path(spark: SparkSession, path: str):
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(spark._jsc.hadoopConfiguration()), p, jvm


def _read_file(spark: SparkSession, path: str) -> bytes:
    fs, p, jvm = _fs_path(spark, path)
    stream = fs.open(p)
    try:
        return bytes(jvm.org.apache.commons.io.IOUtils.toByteArray(stream))
    finally:
        stream.close()


def _write_file(spark: SparkSession, path: str, data: bytes) -> None:
    """Write ``path`` create-then-rename so readers never observe a
    partial file.  ``path`` must be attempt-unique (never pre-existing):
    the commit protocol's uniqueness rule is what makes this safe on
    filesystems whose rename silently overwrites (POSIX ``file://``)."""
    fs, p, jvm = _fs_path(spark, path)
    tmp = jvm.org.apache.hadoop.fs.Path(f"{path}.tmp-{uuid.uuid4().hex}")
    out = fs.create(tmp, False)
    try:
        out.write(bytearray(data))
    finally:
        out.close()
    if not fs.rename(tmp, p):
        fs.delete(tmp, False)
        raise RuntimeError(f"rename to {path} failed")


def _manifest_names(spark: SparkSession, root: str) -> list[str]:
    """All manifest file names, including race losers not yet cleaned."""
    fs, p, _ = _fs_path(spark, f"{root}/manifests")
    if not fs.exists(p):
        return []
    names = []
    for st in fs.listStatus(p):
        name = st.getPath().getName()
        if name.startswith("snap-") and name.endswith(".json"):
            names.append(name)
    return names


def _split_name(name: str) -> tuple[int, str]:
    """``snap-<sid>-<attempt>.json`` → (sid, attempt).  Accepts the
    legacy attempt-less form ``snap-<sid>.json`` as attempt ``""``
    (sorts first, so a legacy manifest always wins its sid)."""
    body = name[5:-5]
    sid, _, attempt = body.partition("-")
    return int(sid), attempt


def _winning_manifests(spark: SparkSession, root: str) -> list[tuple[int, str]]:
    """One (sid, file name) per snapshot id, sid-ascending.  When a
    commit race left several manifests for one sid, the winner is the
    smallest attempt string — deterministic on every filesystem, no
    reliance on rename semantics."""
    best: dict[int, tuple[str, str]] = {}
    for name in _manifest_names(spark, root):
        sid, attempt = _split_name(name)
        if sid not in best or attempt < best[sid][0]:
            best[sid] = (attempt, name)
    return [(sid, best[sid][1]) for sid in sorted(best)]


# --------------------------------------------------------------- manifests
def _snapshots(spark: SparkSession, root: str) -> list[dict]:
    return [
        json.loads(_read_file(spark, f"{root}/manifests/{name}").decode())
        for _, name in _winning_manifests(spark, root)
    ]


def current_snapshot_id(spark: SparkSession, root: str) -> int | None:
    wins = _winning_manifests(spark, root)
    return wins[-1][0] if wins else None


def append_snapshot(df: DataFrame, root: str) -> int:
    """Append ``df`` as a new snapshot; returns the new snapshot id.
    Iceberg equivalent: ``df.writeTo(table).append()``."""
    spark = df.sparkSession
    parent = current_snapshot_id(spark, root)
    sid = (parent or 0) + 1
    attempt = uuid.uuid4().hex[:8]
    # attempt-unique data dir: a killed previous attempt can never
    # collide, and unreferenced attempts are invisible to readers
    data_dir = f"{root}/data/snap-{sid}-{attempt}"
    df.write.mode("errorifexists").parquet(data_dir)
    manifest = {
        "snapshot_id": sid,
        "parent_id": parent,
        "paths": [data_dir],
        "schema": df.schema.jsonValue(),
    }
    name = f"snap-{sid}-{attempt}.json"
    _write_file(spark, f"{root}/manifests/{name}", json.dumps(manifest).encode())
    # post-publish race check: if another committer claimed this sid
    # with a smaller attempt, we lost — withdraw our manifest (the data
    # dir becomes an expire-reclaimable orphan) and surface the conflict
    winner = dict(_winning_manifests(spark, root)).get(sid)
    if winner != name:
        fs, p, _ = _fs_path(spark, f"{root}/manifests/{name}")
        fs.delete(p, False)
        raise RuntimeError(
            f"snapshot {sid} was committed concurrently; retry the append"
        )
    return sid


def _schema_of(snap: dict) -> StructType:
    if "schema" in snap:
        return StructType.fromJson(snap["schema"])
    return DOCS_SCHEMA  # legacy manifest predating schema recording


def _read_snaps(spark: SparkSession, snaps: list[dict]) -> DataFrame:
    """Union the data of ``snaps``, honoring each manifest's recorded
    schema.  Snapshots are grouped by schema (one parquet scan per
    distinct schema — normally 1, 2 during an evolution window) and
    joined with ``unionByName(allowMissingColumns=True)``: columns added
    by a later append read as NULL for older snapshots, Iceberg's
    add-column semantics.  Column pruning and predicate pushdown apply
    per scan as usual."""
    if not snaps:
        return spark.createDataFrame([], schema=DOCS_SCHEMA)
    by_schema: dict[str, tuple[StructType, list[str]]] = {}
    for snap in snaps:
        schema = _schema_of(snap)
        key = schema.json()
        by_schema.setdefault(key, (schema, []))[1].extend(snap["paths"])
    out = None
    for schema, paths in by_schema.values():
        part = spark.read.schema(schema).parquet(*paths)
        out = part if out is None else out.unionByName(
            part, allowMissingColumns=True
        )
    return out


def read_snapshot(
    spark: SparkSession, root: str, snapshot_id: int | None = None
) -> DataFrame:
    """Table contents AS OF ``snapshot_id`` (default: latest).  Iceberg
    equivalent: ``VERSION AS OF``.  An unknown snapshot id raises (the
    Iceberg behavior) rather than silently reading the latest state —
    including ids removed by :func:`expire_snapshots`."""
    snaps = _snapshots(spark, root)
    if snapshot_id is not None:
        known = {s["snapshot_id"] for s in snaps}
        if snapshot_id not in known:
            raise ValueError(
                f"unknown snapshot id {snapshot_id} (known: {sorted(known)})"
            )
        snaps = [s for s in snaps if s["snapshot_id"] <= snapshot_id]
    return _read_snaps(spark, snaps)


def incremental_read(
    spark: SparkSession, root: str, after: int | None, until: int | None = None
) -> DataFrame:
    """Rows appended AFTER snapshot ``after`` up to ``until`` (default:
    latest) — the incremental-processing feed.  Iceberg equivalent: an
    incremental scan with ``start-snapshot-id``/``end-snapshot-id``.
    Pairs with the checkpointed extract job: process the diff, record
    ``until`` as the new high-water mark."""
    snaps = [
        s
        for s in _snapshots(spark, root)
        if (after is None or s["snapshot_id"] > after)
        and (until is None or s["snapshot_id"] <= until)
    ]
    return _read_snaps(spark, snaps)


def expire_snapshots(
    spark: SparkSession, root: str, keep_n: int, orphan_grace_s: int = 86400
) -> dict:
    """Expire all but the newest ``keep_n`` snapshots and reclaim
    unreferenced data dirs.  Iceberg equivalent:
    ``expireSnapshots().retainLast(keep_n)`` followed by
    ``remove_orphan_files``.

    Semantics (Iceberg's): expired snapshot IDS stop being time-travel
    targets, but data files still visible from surviving snapshots are
    RETAINED — the expired manifests' paths are folded into the oldest
    surviving manifest, so ``read_snapshot(latest)`` is byte-identical
    before and after.  Only then are data dirs referenced by NO
    surviving manifest AND older than ``orphan_grace_s`` deleted
    (orphan attempt dirs from killed or race-losing appends; the grace
    age keeps a concurrent append's just-written-but-not-yet-published
    data dir safe — Iceberg's remove_orphan_files uses the same
    age-threshold guard).

    Crash-safe ordering: (1) publish the folded manifest under a new
    attempt name that deterministically wins its sid, (2) delete
    superseded + expired manifests, (3) delete unreferenced data dirs.
    A crash between any two steps leaves every read correct; re-running
    expire completes the cleanup.  Concurrent readers that already
    planned a scan hold the file list they resolved — deletion only
    touches dirs no surviving manifest references, so a reader of any
    SURVIVING snapshot is never broken.

    Returns ``{"expired": [...], "removed_dirs": [...]}``."""
    if keep_n < 1:
        raise ValueError("keep_n must be >= 1")
    wins = _winning_manifests(spark, root)
    if len(wins) > keep_n:
        expired, survivors = wins[:-keep_n], wins[-keep_n:]
        expired_ids = [sid for sid, _ in expired]
        # fold expired paths into the oldest surviving manifest
        base_sid, base_name = survivors[0]
        folded_paths: list[str] = []
        for _sid, name in expired:
            snap = json.loads(
                _read_file(spark, f"{root}/manifests/{name}").decode()
            )
            folded_paths.extend(snap["paths"])
        base = json.loads(
            _read_file(spark, f"{root}/manifests/{base_name}").decode()
        )
        base["paths"] = folded_paths + base["paths"]
        base["parent_id"] = None
        # "0-<hex>" sorts before any plain-hex attempt ('-' < '0'..'f'),
        # so the folded manifest deterministically wins its sid; among
        # repeated folds the smallest wins and stale ones get deleted
        new_name = f"snap-{base_sid}-0-{uuid.uuid4().hex[:8]}.json"
        _write_file(
            spark, f"{root}/manifests/{new_name}", json.dumps(base).encode()
        )
        # delete expired + superseded manifests (every manifest for an
        # expired sid, and every manifest for base_sid except the winner)
        keep_names = {
            name for sid, name in _winning_manifests(spark, root)
            if sid >= base_sid
        }
        for name in _manifest_names(spark, root):
            if name not in keep_names:
                fs, p, _ = _fs_path(spark, f"{root}/manifests/{name}")
                fs.delete(p, False)
    else:
        expired_ids = []
    # reclaim data dirs referenced by no surviving manifest — but only
    # past the grace age: an IN-FLIGHT append writes its data dir
    # BEFORE publishing its manifest, so a fresh unreferenced dir may
    # be a commit about to happen, not an orphan (Iceberg's
    # remove_orphan_files guards the same race with an age threshold)
    import time as _time

    referenced = {
        path.rstrip("/").rsplit("/", 1)[-1]
        for snap in _snapshots(spark, root)
        for path in snap["paths"]
    }
    cutoff_ms = (_time.time() - orphan_grace_s) * 1000.0
    removed = []
    fs, data_p, jvm = _fs_path(spark, f"{root}/data")
    if fs.exists(data_p):
        for st in fs.listStatus(data_p):
            name = st.getPath().getName()
            if (
                name.startswith("snap-")
                and name not in referenced
                and st.getModificationTime() <= cutoff_ms
            ):
                fs.delete(st.getPath(), True)
                removed.append(name)
    return {"expired": expired_ids, "removed_dirs": sorted(removed)}
