"""Streaming aggregation + stateful dedup over the docs stream.

Structured Streaming pieces a long-running ingest of a 10^12-document
corpus needs beyond incremental extraction (streaming/incremental.py):

- :func:`windowed_span_counts` — event-time windowed throughput metrics
  with a watermark, so late-arriving files update the right window and
  state is bounded (the streaming analog of the checkpoint table's
  per-bucket lineage counts).
- :func:`dedup_stream` — exactly-once doc_id dedup across micro-batches
  via ``dropDuplicatesWithinWatermark``: re-delivered documents (retried
  uploads, at-least-once sources) are dropped as long as they arrive
  within the watermark horizon, with state bounded by that horizon —
  the streaming analog of exact dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_span_counts(
    docs_stream: DataFrame,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
    ts_col: str = "ingest_ts",
) -> DataFrame:
    """Event-time windowed doc/span counts with a watermark bound.

    Input: a streaming docs frame carrying an event-time column (file
    sources get one via ``F.current_timestamp()`` at ingest or a column
    in the data).  Output mode append emits a window once the watermark
    passes its end."""
    return (
        docs_stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("win"))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.size("spans")).alias("n_spans"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "n_docs",
            "n_spans",
        )
    )


def dedup_stream(
    docs_stream: DataFrame,
    watermark: str = "30 minutes",
    ts_col: str = "ingest_ts",
) -> DataFrame:
    """Drop re-delivered doc_ids across micro-batches with bounded state:
    duplicates arriving within ``watermark`` of the first copy are
    dropped; state for older keys is evicted."""
    return docs_stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["doc_id"]
    )
