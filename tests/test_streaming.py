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


def test_windowed_counts_and_stateful_dedup(spark):
    """Watermarked windowed agg + dropDuplicatesWithinWatermark over a
    rate-limited file stream, driven with availableNow + memory sink."""
    import pyspark.sql.functions as F

    from reading_the_unreadable_spark.sources.docs import DOCS_SCHEMA
    from reading_the_unreadable_spark.streaming.windowed import (
        dedup_stream,
        windowed_span_counts,
    )

    base = f"{BASE}_windowed"
    shutil.rmtree(base, ignore_errors=True)
    docs_dir = f"{base}/docs"
    corpus = synth.make_corpus(12, seed_tag="win")
    # duplicate 4 docs across "deliveries" (at-least-once source)
    _write_batch(spark, corpus, docs_dir)
    _write_batch(spark, corpus[:4], docs_dir)

    stream = (
        spark.readStream.schema(DOCS_SCHEMA)
        .parquet(docs_dir)
        .withColumn("ingest_ts", F.timestamp_seconds(F.lit(1_700_000_000)))
    )

    counts = windowed_span_counts(stream, window="10 minutes")
    q = (
        counts.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .option("checkpointLocation", f"{base}/ckpt1")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("SELECT * FROM win_counts").collect()
    assert len(rows) == 1  # one synthetic event-time window
    assert rows[0]["n_docs"] == 16  # pre-dedup: 12 + 4 re-deliveries

    deduped = dedup_stream(stream)
    q2 = (
        deduped.select("doc_id").writeStream.format("memory")
        .queryName("dedup_docs")
        .outputMode("append")
        .option("checkpointLocation", f"{base}/ckpt2")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination()
    got = spark.sql("SELECT doc_id FROM dedup_docs").collect()
    assert len(got) == 12  # re-deliveries dropped, state bounded by watermark
    assert len({r["doc_id"] for r in got}) == 12


def test_stateful_running_totals_survive_restart(spark):
    """applyInPandasWithState: per-periodical totals accumulate across
    micro-batches and across query RESTARTS (state in the checkpoint)."""
    import pyspark.sql.functions as F

    from reading_the_unreadable_spark.sources.docs import DOCS_SCHEMA
    from reading_the_unreadable_spark.streaming.stateful import running_totals

    base = f"{BASE}_stateful"
    shutil.rmtree(base, ignore_errors=True)
    docs_dir, ckpt, out_dir = f"{base}/docs", f"{base}/ckpt", f"{base}/totals"
    corpus = synth.make_corpus(24, seed_tag="state")
    expected = {}
    for row in corpus:
        per = row["doc_id"].split("-")[0]
        d, s = expected.get(per, (0, 0))
        expected[per] = (d + 1, s + len(row["spans"]))

    def drain():
        stream = spark.readStream.schema(DOCS_SCHEMA).parquet(docs_dir)

        def sink(batch_df, epoch_id):
            # memory sink cannot recover from a checkpoint; foreachBatch can
            batch_df.withColumn("epoch", F.lit(epoch_id)).write.mode(
                "append"
            ).parquet(out_dir)

        q = (
            running_totals(stream)
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        # update mode re-emits a key whenever it changes; latest epoch wins
        out = {}
        for r in spark.read.parquet(out_dir).orderBy("epoch").collect():
            out[r["periodical"]] = (r["total_docs"], r["total_spans"])
        return out

    _write_batch(spark, corpus[:10], docs_dir)
    first = drain()
    assert sum(d for d, _ in first.values()) == 10

    # restart with more data: totals CONTINUE from checkpointed state
    _write_batch(spark, corpus[10:], docs_dir)
    combined = dict(first)
    combined.update(drain())
    assert combined == expected


def test_incremental_curation_matches_batch(spark):
    """The streaming curation chain (plans/curation.incremental_curation)
    is the batch `curate` plan run per micro-batch: across two drains it
    processes each page file exactly once and its accumulated output
    equals the batch chain filtered to final_kept==1 over the full input."""
    import pyspark.sql.functions as F

    from reading_the_unreadable_spark.plans.curation import (
        PAGES_SCHEMA,
        curate,
        incremental_curation,
    )

    base = f"{BASE}_curation"
    shutil.rmtree(base, ignore_errors=True)
    pages_dir, out_dir, ckpt = f"{base}/pages", f"{base}/out", f"{base}/ckpt"

    def make_pages(lo, hi):
        rows = []
        for i in range(lo, hi):
            host = "bad.net" if i % 7 == 0 else f"site{i % 3}.example"
            body = " ".join(f"word{j} stop the and of to" for j in range(40))
            html = (
                "<html><head><title>t</title></head><body>"
                f"<div id='main'><p>{body} reach me at a{i}@ex.com.</p></div>"
                "<footer><a href='/t'>terms</a></footer></body></html>"
            )
            rows.append((i, f"https://{host}/p/{i}", html))
        return spark.createDataFrame(rows, PAGES_SCHEMA)

    make_pages(0, 20).coalesce(1).write.mode("append").parquet(pages_dir)
    q = incremental_curation(
        spark, pages_dir, out_dir, ckpt, blocked_domains=("bad.net",)
    )
    q.awaitTermination()
    first = spark.read.parquet(out_dir)
    n_first = first.count()
    assert n_first > 0
    assert first.filter(F.col("final_kept") != 1).count() == 0

    # second drain sees ONLY the new file; third drain adds nothing
    make_pages(20, 45).coalesce(1).write.mode("append").parquet(pages_dir)
    for _ in range(2):
        q = incremental_curation(
            spark, pages_dir, out_dir, ckpt, blocked_domains=("bad.net",)
        )
        q.awaitTermination()
    out = spark.read.parquet(out_dir)
    assert out.groupBy("doc_id").count().filter("count > 1").count() == 0

    batch = curate(
        spark.read.parquet(pages_dir), blocked_domains=("bad.net",)
    ).filter(F.col("final_kept") == 1)
    cols = ["doc_id", "url_kept", "gopher_kept", "final_kept", "text", "n_email"]
    assert sorted(out.select(cols).collect()) == sorted(
        batch.select(cols).collect()
    )
