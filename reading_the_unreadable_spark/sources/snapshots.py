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

    data/snap-<id>/*.parquet   immutable data files of snapshot <id>
    manifests/<id>.json        {"snapshot_id", "parent_id", "paths"}

Scale shape: manifests are tiny driver-side metadata (one small JSON
per snapshot, never touching executors); data reads are ordinary
multi-path parquet scans, so column pruning / predicate pushdown /
split planning are untouched.  Appends are atomic at the manifest
grain: the manifest is written AFTER its data files, so a killed append
leaves orphan data files but never a readable half-snapshot (Iceberg's
own commit protocol, minus the catalog CAS which a single writer does
not need)."""

from __future__ import annotations

import json
import os
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from .docs import DOCS_SCHEMA


def _manifest_dir(root: str) -> Path:
    return Path(root) / "manifests"


def _snapshots(root: str) -> list[dict]:
    d = _manifest_dir(root)
    if not d.exists():
        return []
    out = []
    for p in sorted(d.glob("*.json"), key=lambda p: int(p.stem)):
        out.append(json.loads(p.read_text()))
    return out


def current_snapshot_id(root: str) -> int | None:
    snaps = _snapshots(root)
    return snaps[-1]["snapshot_id"] if snaps else None


def append_snapshot(df: DataFrame, root: str) -> int:
    """Append ``df`` as a new snapshot; returns the new snapshot id.
    Iceberg equivalent: ``df.writeTo(table).append()``."""
    parent = current_snapshot_id(root)
    sid = (parent or 0) + 1
    data_dir = f"{root}/data/snap-{sid}"
    df.write.mode("errorifexists").parquet(data_dir)
    manifest = {
        "snapshot_id": sid,
        "parent_id": parent,
        "paths": [data_dir],
    }
    mdir = _manifest_dir(root)
    mdir.mkdir(parents=True, exist_ok=True)
    tmp = mdir / f".{sid}.json.tmp"
    tmp.write_text(json.dumps(manifest))
    os.replace(tmp, mdir / f"{sid}.json")  # atomic publish
    return sid


def _paths_between(
    root: str, after: int | None, until: int | None
) -> list[str]:
    paths: list[str] = []
    for snap in _snapshots(root):
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
        known = {s["snapshot_id"] for s in _snapshots(root)}
        if snapshot_id not in known:
            raise ValueError(
                f"unknown snapshot id {snapshot_id} (known: {sorted(known)})"
            )
    paths = _paths_between(root, after=None, until=snapshot_id)
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
    paths = _paths_between(root, after=after, until=until)
    if not paths:
        return spark.createDataFrame([], schema=DOCS_SCHEMA)
    return spark.read.schema(DOCS_SCHEMA).parquet(*paths)
