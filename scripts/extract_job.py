"""spark-submit entry point for the extraction pipeline.

Usage:
  spark-submit --master local[N] --py-files pkg.zip scripts/extract_job.py \
      --input <docs parquet/table> --output <dir> [--synth N] [--partitions P] \
      [--resume] [--checkpoint-dir <dir>]

With ``--synth N`` the job first materializes a deterministic synthetic
docs table of N documents at <output>/docs (no external data), then
extracts.  Writes extracted spans to <output>/extracted and (nested) to
<output>/extracted_nested; prints a one-line JSON summary to stdout.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import SparkSession  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", default=None)
    ap.add_argument("--output", required=True)
    ap.add_argument("--synth", type=int, default=0)
    ap.add_argument("--partitions", type=int, default=None)
    ap.add_argument(
        "--checkpointed",
        action="store_true",
        help="run via the resumable bucket-checkpoint plan (re-invoking "
        "after a kill resumes without reprocessing completed buckets)",
    )
    ap.add_argument("--buckets", type=int, default=32)
    ap.add_argument(
        "--max-buckets",
        type=int,
        default=None,
        help="fault injection: stop after N buckets (kill/resume testing)",
    )
    ap.add_argument(
        "--no-fill-columns",
        dest="fill_columns",
        action="store_false",
        help="disable the in-chain column gap fill (the REFERENCE default "
        "is ON, postprocess_bbox fill_columns=True); span output is "
        "identical either way, box geometry consumers see the "
        "synthesized gap boxes when on",
    )
    ap.add_argument(
        "--sink",
        choices=["parquet", "noop"],
        default="parquet",
        help="noop isolates distributed compute from single-disk IO "
        "(benchmarking; a real cluster's storage bandwidth scales with nodes)",
    )
    ap.add_argument(
        "--warmup",
        action="store_true",
        help="run one full untimed pass first (JIT/codegen/Python-worker "
        "warmup) so the timed pass measures steady state — the regime a "
        "long-running production job lives in",
    )
    ap.add_argument(
        "--iterations",
        type=int,
        default=1,
        help="timed passes; wall_sec reports the fastest (noise-robust "
        "capability measurement on shared hardware)",
    )
    ap.add_argument(
        "--tail-table",
        default=None,
        help="snapshot-table root: with --synth N, first append N "
        "synthetic docs as a NEW snapshot, then run one exactly-once "
        "tail step (plans/snapshot_tail.py) over everything appended "
        "since the last completed call — the Iceberg incremental-"
        "consumption loop as a spark-submit surface",
    )
    args = ap.parse_args()

    spark = (
        SparkSession.builder.appName("extract_job")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    from reading_the_unreadable_spark import synth
    from reading_the_unreadable_spark.plans.pipeline import extract_nested
    from reading_the_unreadable_spark.sources.docs import (
        docs_from_rows,
        read_docs,
        write_docs,
    )

    if args.tail_table:
        from reading_the_unreadable_spark.plans.snapshot_tail import (
            read_tail_output,
            tail_once,
        )
        from reading_the_unreadable_spark.sources.snapshots import (
            append_snapshot,
            current_snapshot_id,
        )

        if args.synth:
            tag = f"tail{(current_snapshot_id(spark, args.tail_table) or 0) + 1}"
            append_snapshot(
                docs_from_rows(spark, synth.make_corpus(args.synth, seed_tag=tag)),
                args.tail_table,
            )
        summary = tail_once(
            spark,
            args.tail_table,
            args.output,
            n_buckets=args.buckets,
            num_partitions=args.partitions,
            max_buckets=args.max_buckets,
        )
        total = read_tail_output(spark, args.output).count() if summary[
            "until"
        ] else 0
        print(json.dumps({"job": "snapshot_tail", **summary, "total_docs": total}))
        spark.stop()
        return

    if args.synth:
        docs = docs_from_rows(spark, synth.make_corpus(args.synth, seed_tag="job"))
        write_docs(docs, f"{args.output}/docs")
    docs_path = args.input or f"{args.output}/docs"
    docs = read_docs(spark, docs_path)

    if args.checkpointed:
        from reading_the_unreadable_spark.plans.checkpoint import (
            run_extract_with_checkpoints,
        )

        summary = run_extract_with_checkpoints(
            spark,
            docs,
            args.output,
            n_buckets=args.buckets,
            num_partitions=args.partitions,
            max_buckets=args.max_buckets,
        )
        print(json.dumps({"job": "extract_checkpointed", **summary}))
        spark.stop()
        return

    if args.warmup:
        extract_nested(
            docs, num_partitions=args.partitions, fill_columns=args.fill_columns
        ).write.format("noop").mode("overwrite").save()

    out = extract_nested(
        docs, num_partitions=args.partitions, fill_columns=args.fill_columns
    )  # plan once
    walls = []
    for _ in range(max(args.iterations, 1)):
        t0 = time.monotonic()
        if args.sink == "noop":
            out.write.format("noop").mode("overwrite").save()
        else:
            out.write.mode("overwrite").parquet(f"{args.output}/extracted_nested")
        walls.append(time.monotonic() - t0)
    wall = min(walls)
    if args.sink == "noop":
        n_docs = docs.count()
    else:
        n_docs = spark.read.parquet(f"{args.output}/extracted_nested").count()
    print(
        json.dumps(
            {
                "job": "extract",
                "docs": n_docs,
                "wall_sec": round(wall, 2),
                "all_walls": [round(w, 2) for w in walls],
                "docs_per_sec": round(n_docs / wall, 2) if wall else None,
                "output": f"{args.output}/extracted_nested",
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
