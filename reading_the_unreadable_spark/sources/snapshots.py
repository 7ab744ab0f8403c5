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

Layout under ``root``::

    data/snap-<id>-<attempt>/*.parquet   immutable data files
    manifests/snap-<id>.json             {"snapshot_id", "parent_id", "paths"}

ALL filesystem access — data AND manifests — goes through the Hadoop
FileSystem API resolved from the path, so on a cluster whose default FS
is HDFS/S3 the metadata lands next to the data, never on one driver
machine's local disk (the write/cleanup-filesystem split rule; see also
``dedup._scratch_root``).

Commit protocol (Iceberg's, minus the catalog CAS a single writer does
not need): data files are written under an ATTEMPT-UNIQUE directory
first, then the manifest is published with an atomic create-then-rename.
A killed append leaves an orphan attempt directory that no manifest
references — harmless and re-append-able; it can never wedge the table,
collide with a later attempt, or become visible to readers.  Scale
shape: manifests are tiny metadata files (one per snapshot, read on the
driver); data reads are ordinary multi-path parquet scans, so column
pruning / predicate pushdown / split planning are untouched."""

from __future__ import annotations

import json
import uuid

from pyspark.sql import DataFrame, SparkSession

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


def _write_file_atomic(spark: SparkSession, path: str, data: bytes) -> bool:
    """Create-then-rename publish; returns False if ``path`` already
    exists (concurrent committer lost the race)."""
    fs, p, jvm = _fs_path(spark, path)
    tmp = jvm.org.apache.hadoop.fs.Path(f"{path}.tmp-{uuid.uuid4().hex}")
    out = fs.create(tmp, False)
    try:
        out.write(bytearray(data))
    finally:
        out.close()
    if not fs.rename(tmp, p):
        fs.delete(tmp, False)
        return False
    return True


def _list_manifests(spark: SparkSession, root: str) -> list[str]:
    fs, p, _ = _fs_path(spark, f"{root}/manifests")
    if not fs.exists(p):
        return []
    names = []
    for st in fs.listStatus(p):
        name = st.getPath().getName()
        if name.startswith("snap-") and name.endswith(".json"):
            names.append(name)
    return sorted(names, key=lambda n: int(n[5:-5]))


# --------------------------------------------------------------- manifests
def _snapshots(spark: SparkSession, root: str) -> list[dict]:
    return [
        json.loads(_read_file(spark, f"{root}/manifests/{name}").decode())
        for name in _list_manifests(spark, root)
    ]


def current_snapshot_id(spark: SparkSession, root: str) -> int | None:
    names = _list_manifests(spark, root)
    return int(names[-1][5:-5]) if names else None


def append_snapshot(df: DataFrame, root: str) -> int:
    """Append ``df`` as a new snapshot; returns the new snapshot id.
    Iceberg equivalent: ``df.writeTo(table).append()``."""
    spark = df.sparkSession
    parent = current_snapshot_id(spark, root)
    sid = (parent or 0) + 1
    # attempt-unique data dir: a killed previous attempt can never
    # collide, and unreferenced attempts are invisible to readers
    data_dir = f"{root}/data/snap-{sid}-{uuid.uuid4().hex[:8]}"
    df.write.mode("errorifexists").parquet(data_dir)
    manifest = {"snapshot_id": sid, "parent_id": parent, "paths": [data_dir]}
    published = _write_file_atomic(
        spark, f"{root}/manifests/snap-{sid}.json", json.dumps(manifest).encode()
    )
    if not published:
        raise RuntimeError(
            f"snapshot {sid} was committed concurrently; retry the append"
        )
    return sid


def _paths_between(
    spark: SparkSession, root: str, after: int | None, until: int | None
) -> list[str]:
    paths: list[str] = []
    for snap in _snapshots(spark, root):
        sid = snap["snapshot_id"]
        if after is not None and sid <= after:
            continue
        if until is not None and sid > until:
            continue
        paths.extend(snap["paths"])
    return paths


def read_snapshot(
    spark: SparkSession, root: str, snapshot_id: int | None = None
) -> DataFrame:
    """Table contents AS OF ``snapshot_id`` (default: latest).  Iceberg
    equivalent: ``VERSION AS OF``.  An unknown snapshot id raises (the
    Iceberg behavior) rather than silently reading the latest state."""
    if snapshot_id is not None:
        known = {s["snapshot_id"] for s in _snapshots(spark, root)}
        if snapshot_id not in known:
            raise ValueError(
                f"unknown snapshot id {snapshot_id} (known: {sorted(known)})"
            )
    paths = _paths_between(spark, root, after=None, until=snapshot_id)
    if not paths:
        return spark.createDataFrame([], schema=DOCS_SCHEMA)
    return spark.read.schema(DOCS_SCHEMA).parquet(*paths)


def incremental_read(
    spark: SparkSession, root: str, after: int | None, until: int | None = None
) -> DataFrame:
    """Rows appended AFTER snapshot ``after`` up to ``until`` (default:
    latest) — the incremental-processing feed.  Iceberg equivalent: an
    incremental scan with ``start-snapshot-id``/``end-snapshot-id``.
    Pairs with the checkpointed extract job: process the diff, record
    ``until`` as the new high-water mark."""
    paths = _paths_between(spark, root, after=after, until=until)
    if not paths:
        return spark.createDataFrame([], schema=DOCS_SCHEMA)
    return spark.read.schema(DOCS_SCHEMA).parquet(*paths)
