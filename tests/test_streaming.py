"""Incremental extraction: new files are picked up exactly once across
restarts of the streaming query (foreachBatch + availableNow)."""

from __future__ import annotations

import shutil

from reading_the_unreadable_spark import synth
from reading_the_unreadable_spark.sources.docs import docs_from_rows
from reading_the_unreadable_spark.streaming.incremental import incremental_extract

BASE = "/tmp/test_stream"


def _write_batch(spark, rows, path):
    docs_from_rows(spark, rows).coalesce(1).write.mode("append").parquet(path)


def test_incremental_exactly_once(spark):
    shutil.rmtree(BASE, ignore_errors=True)
    docs_dir, out_dir, ckpt = f"{BASE}/docs", f"{BASE}/out", f"{BASE}/ckpt"
    corpus = synth.make_corpus(30, seed_tag="stream")

    _write_batch(spark, corpus[:10], docs_dir)
    q = incremental_extract(spark, docs_dir, out_dir, ckpt, num_partitions=8)
    q.awaitTermination()
    first = spark.read.parquet(out_dir)
    assert first.count() == 10

    # new files arrive; restart drains ONLY them
    _write_batch(spark, corpus[10:30], docs_dir)
    q = incremental_extract(spark, docs_dir, out_dir, ckpt, num_partitions=8)
    q.awaitTermination()
    out = spark.read.parquet(out_dir)
    assert out.count() == 30
    assert out.groupBy("doc_id").count().filter("count > 1").count() == 0

    # third restart with nothing new: no duplicates
    q = incremental_extract(spark, docs_dir, out_dir, ckpt, num_partitions=8)
    q.awaitTermination()
    assert spark.read.parquet(out_dir).count() == 30
