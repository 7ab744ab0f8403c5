"""Checkpoint / resume / lineage for the extraction pipeline.

The unit of resume is a **bucket**: ``pmod(hash(doc_id), n_buckets)`` —
stable under re-runs and independent of file layout.  A job:

1. reads the checkpoint table and LEFT ANTI-joins the docs table on
   bucket (reference behavior being generalized: the skip-if-logged
   resume of ``send_to_lm_functions.py:991-1001, 1179-1190`` — here as a
   relational anti-join instead of file-existence probes);
2. extracts only the remaining buckets;
3. appends output parquet partitioned by bucket (a killed job's partial
   bucket directory is overwritten on retry via dynamic partition
   overwrite, so outputs stay exactly-once per bucket);
4. appends one lineage row per completed bucket to the checkpoint table:
   (stage, bucket, doc_count, span_count, wall_ms, docs_per_sec, job_id,
   ts).

``max_buckets`` caps how many buckets a run processes — the fault-
injection hook the kill/resume test uses.
"""

from __future__ import annotations

import time
import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.articles import nest_spans
from .pipeline import extract

CHECKPOINT_SCHEMA = (
    "stage string, bucket int, doc_count long, span_count long, "
    "wall_ms long, docs_per_sec double, job_id string, ts string"
)


def with_bucket(docs: DataFrame, n_buckets: int) -> DataFrame:
    return docs.withColumn(
        "bucket", F.pmod(F.hash("doc_id"), F.lit(n_buckets)).cast("int")
    )


def _hadoop_exists(spark: SparkSession, path: str) -> bool:
    """Existence check on the SAME filesystem Spark reads/writes — a
    driver-local ``Path.exists()`` is wrong on any cluster whose
    default FS is not the driver's disk (it would report a real HDFS
    table as absent, and compaction would then replace the table with
    an empty frame)."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(p))


def read_checkpoints(
    spark: SparkSession, ckpt_path: str, dedup: bool = True
) -> DataFrame:
    """Checkpoint table reader.  ``dedup=True`` (default) applies
    latest-wins per (stage, bucket): two racing retries that both append a
    lineage row for the same bucket (append-mode parquet cannot express
    MERGE INTO — on Iceberg this is a MERGE) collapse to one row, so
    resume logic and metric sums stay exactly-once per bucket."""
    if _hadoop_exists(spark, ckpt_path):
        df = spark.read.schema(CHECKPOINT_SCHEMA).parquet(ckpt_path)
    else:
        df = spark.createDataFrame([], CHECKPOINT_SCHEMA)
    if not dedup:
        return df
    w = Window.partitionBy("stage", "bucket").orderBy(
        F.desc("ts"), F.desc("job_id")
    )
    return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


def _list_part_files(spark: SparkSession, path: str) -> list:
    """Parquet part files under ``path`` via the Hadoop FS API (same
    write/cleanup-filesystem discipline as the snapshot layer)."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(p):
        return []
    return [
        st.getPath()
        for st in fs.listStatus(p)
        if st.getPath().getName().startswith("part-")
    ]


def compact_checkpoints(
    spark: SparkSession, ckpt_path: str, max_files: int = 8
) -> int:
    """Bound the checkpoint table's file count across thousands of
    resumes — the compaction half of the MERGE-INTO semantics the
    append-only parquet table stands in for (on Iceberg the append
    below is a ``MERGE INTO`` and table maintenance is
    ``rewrite_data_files``).

    Crash-safe without a directory swap: (1) append ONE new part file
    holding the deduped (latest-wins) table, (2) delete the old part
    files.  A crash between the steps leaves duplicates that the
    latest-wins reader collapses — re-running compaction finishes the
    cleanup.  Readers are never broken: the directory always contains
    at least one complete copy of every surviving row.

    Returns the number of files removed (0 = under threshold)."""
    old_files = _list_part_files(spark, ckpt_path)
    if len(old_files) <= max_files:
        return 0
    compacted = read_checkpoints(spark, ckpt_path, dedup=True)
    # tiny metadata table (≤ stages × n_buckets rows): one file
    compacted.coalesce(1).write.mode("append").parquet(ckpt_path)
    fs = old_files[0].getFileSystem(spark._jsc.hadoopConfiguration())
    for f in old_files:
        fs.delete(f, False)
    return len(old_files)


def run_extract_with_checkpoints(
    spark: SparkSession,
    docs: DataFrame,
    out_dir: str,
    n_buckets: int = 32,
    num_partitions: int | None = None,
    max_buckets: int | None = None,
    stage: str = "extract",
) -> dict:
    """One resumable job invocation.  Returns a summary dict."""
    ckpt_path = f"{out_dir}/checkpoints"
    out_path = f"{out_dir}/extracted_nested"
    job_id = uuid.uuid4().hex[:12]

    bucketed = with_bucket(docs, n_buckets)
    done = read_checkpoints(spark, ckpt_path).filter(F.col("stage") == stage)
    todo_docs = bucketed.join(done.select("bucket"), "bucket", "left_anti")

    # the bucket set THIS run processes — lineage rows are derived from it
    # below, never from a read-back of the whole output directory (a
    # previously killed attempt may have committed buckets this run does
    # not touch; checkpointing those would permanently skip reprocessing
    # them with partial counts).  Driver-side but bounded by n_buckets.
    todo_buckets = sorted(
        r["bucket"] for r in todo_docs.select("bucket").distinct().collect()
    )
    if max_buckets is not None:
        # fault-injection hook: pretend the job dies after N buckets
        todo_buckets = todo_buckets[:max_buckets]
        todo_docs = todo_docs.filter(F.col("bucket").isin(todo_buckets))

    t0 = time.monotonic()
    flat = extract(todo_docs.drop("bucket"), num_partitions=num_partitions)
    nested = with_bucket(nest_spans(flat), n_buckets)
    # dynamic partition overwrite: retried buckets replace any partial
    # output from a killed attempt instead of duplicating it
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    nested.write.mode("overwrite").partitionBy("bucket").parquet(out_path)
    wall_ms = int((time.monotonic() - t0) * 1000)

    written = spark.read.parquet(out_path).filter(
        F.col("bucket").isin(todo_buckets) if todo_buckets else F.lit(False)
    )
    metrics = (
        written.groupBy("bucket")
        .agg(
            F.count("*").alias("doc_count"),
            F.sum(F.size("spans")).alias("span_count"),
        )
        .withColumn("stage", F.lit(stage))
        .withColumn("wall_ms", F.lit(wall_ms))
        .withColumn(
            "docs_per_sec",
            F.round(F.col("doc_count") / F.lit(max(wall_ms, 1) / 1000.0), 3),
        )
        .withColumn("job_id", F.lit(job_id))
        .withColumn("ts", F.lit(time.strftime("%Y-%m-%dT%H:%M:%S")))
        .select(
            "stage",
            "bucket",
            "doc_count",
            "span_count",
            "wall_ms",
            "docs_per_sec",
            "job_id",
            "ts",
        )
    )
    n_new = metrics.count()
    metrics.write.mode("append").parquet(ckpt_path)
    compact_checkpoints(spark, ckpt_path)
    return {
        "job_id": job_id,
        "buckets_processed": n_new,
        "wall_ms": wall_ms,
        "output": out_path,
        "checkpoints": ckpt_path,
    }
