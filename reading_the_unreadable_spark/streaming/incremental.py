"""Incremental extraction via Structured Streaming.

The reference has no streaming operators (SURVEY.md §2.9) — its
"long-running" mode is batch jobs + polling + file-existence resume.  The
Spark-native generalization is a file-source stream over the docs table
directory: new parquet files are discovered incrementally, each
micro-batch runs the *identical* batch extraction plan via foreachBatch,
and the streaming checkpoint gives exactly-once file processing — the
idiomatic replacement for the reference's download/poll loop
(``function_modules/pipeline.py:456-466``).

``trigger(availableNow=True)`` drains everything pending and stops, so
the same code serves both continuous and catch-up/cron operation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.articles import nest_spans
from ..plans.pipeline import extract
from ..sources.docs import DOCS_SCHEMA


def incremental_extract(
    spark: SparkSession,
    docs_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    num_partitions: int | None = None,
    available_now: bool = True,
):
    """Start (and with available_now=True, drain) the incremental job.

    Returns the StreamingQuery; caller awaits/stops it.
    """
    stream = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .parquet(docs_dir)
    )

    def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        nested = nest_spans(extract(batch_df, num_partitions=num_partitions))
        nested.write.mode("append").parquet(out_dir)

    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
