"""Kill/resume semantics: a job killed after K buckets resumes without
reprocessing, outputs stay exactly-once per document, lineage rows carry
per-bucket metrics."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from reading_the_unreadable_spark import synth
from reading_the_unreadable_spark.plans.checkpoint import (
    read_checkpoints,
    run_extract_with_checkpoints,
)
from reading_the_unreadable_spark.sources.docs import docs_from_rows

N_DOCS = 60
N_BUCKETS = 8
OUT = "/tmp/test_ckpt_out"


@pytest.fixture()
def docs(spark):
    shutil.rmtree(OUT, ignore_errors=True)
    return docs_from_rows(spark, synth.make_corpus(N_DOCS, seed_tag="ckpt"))


def test_kill_resume(spark, docs):
    # run 1: "dies" after 3 buckets
    r1 = run_extract_with_checkpoints(
        spark, docs, OUT, n_buckets=N_BUCKETS, num_partitions=8, max_buckets=3
    )
    assert r1["buckets_processed"] == 3
    ck1 = read_checkpoints(spark, f"{OUT}/checkpoints")
    assert ck1.count() == 3
    out1 = spark.read.parquet(f"{OUT}/extracted_nested")
    docs_done_1 = out1.count()
    assert 0 < docs_done_1 < N_DOCS

    # run 2: resumes, processes ONLY the remaining buckets
    r2 = run_extract_with_checkpoints(
        spark, docs, OUT, n_buckets=N_BUCKETS, num_partitions=8
    )
    assert r2["buckets_processed"] == N_BUCKETS - 3
    ck2 = read_checkpoints(spark, f"{OUT}/checkpoints")
    assert ck2.count() == N_BUCKETS
    # no bucket processed twice
    assert ck2.groupBy("bucket").count().filter("count > 1").count() == 0
    # job ids differ between the two runs
    assert ck2.select("job_id").distinct().count() == 2

    out2 = spark.read.parquet(f"{OUT}/extracted_nested")
    assert out2.count() == N_DOCS
    # exactly-once per doc
    assert out2.groupBy("doc_id").count().filter("count > 1").count() == 0

    # run 3: nothing left — a pure no-op
    r3 = run_extract_with_checkpoints(
        spark, docs, OUT, n_buckets=N_BUCKETS, num_partitions=8
    )
    assert r3["buckets_processed"] == 0
    assert read_checkpoints(spark, f"{OUT}/checkpoints").count() == N_BUCKETS


def test_lineage_metrics(spark, docs):
    run_extract_with_checkpoints(spark, docs, OUT, n_buckets=N_BUCKETS, num_partitions=8)
    ck = read_checkpoints(spark, f"{OUT}/checkpoints")
    row = ck.orderBy("bucket").first()
    assert row["doc_count"] > 0
    assert row["span_count"] > 0
    assert row["wall_ms"] > 0
    assert row["docs_per_sec"] > 0
    assert row["stage"] == "extract"
    total_docs = ck.agg(F.sum("doc_count")).first()[0]
    assert total_docs == N_DOCS
