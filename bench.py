"""Benchmark harness.

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON
line: {"metric", "value", "unit", "queries", "sf", ...}.

Also measures the extraction pipeline on a deterministic synthetic docs
corpus (generated distributed, written once to a cached parquet path) —
documents/sec is the BASELINE.md north metric.  Every timed query is
materialized with the noop sink so nothing is optimized away.

Scaling-efficiency evidence (two parallelism levels) lives in
scripts/scaling_bench.py → BENCH/BASELINE.md; this file is the per-round
single-level benchmark the driver invokes.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BENCH_DOCS = int(os.environ.get("BENCH_DOCS", "4000"))
DOCS_CACHE = os.environ.get("BENCH_DOCS_PATH", f"/tmp/bench_docs_{BENCH_DOCS}")

HEADLINE = [
    "pricing_summary",
    "top_customers",
    "region_revenue",
    "order_priority",
    "supplier_top3",
    "user_sessions",
    "latest_order",
    "monthly_revenue",
    "exact_dedup",
    "minhash_lsh",
    "ngram_jaccard",
    "simhash",
    "simhash_pairs",
    "rollup_revenue",
    "token_stats",
    "quality_score",
    "lang_id",
    "readability",
    "cer_eval",
    "one_hot_labels",
    "cosine_topk",
    "ann_lsh",
    "label_centroids",
    "extract_spans",
    "extract_articles",
]


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    import __spark_entry__ as entrymod
    from reading_the_unreadable_spark.datagen import make_corpus_df
    from reading_the_unreadable_spark.plans.pipeline import extract_nested
    from reading_the_unreadable_spark.session import get_spark
    from reading_the_unreadable_spark.sources.docs import read_docs

    spark = get_spark("bench", cpus=CPUS, shuffle_partitions=max(CPUS * 2, 16))
    queries = entrymod.queries()

    # ---- extraction corpus (generate once, reuse across bench runs)
    if not Path(DOCS_CACHE, "_SUCCESS").exists():
        make_corpus_df(spark, BENCH_DOCS, partitions=CPUS * 2).write.mode(
            "overwrite"
        ).parquet(DOCS_CACHE)
    docs = read_docs(spark, DOCS_CACHE)

    # ---- warmup (JIT/codegen/Arrow paths)
    _noop(extract_nested(read_docs(spark, DOCS_CACHE).limit(64), num_partitions=CPUS))
    _noop(queries["pricing_summary"](spark, SF_DIR))

    timings: dict[str, float] = {}

    t0 = time.monotonic()
    _noop(extract_nested(docs, num_partitions=CPUS * 2))
    t_extract = time.monotonic() - t0
    timings["extract_pipeline"] = round(t_extract, 3)

    for name in HEADLINE:
        t0 = time.monotonic()
        _noop(queries[name](spark, SF_DIR))
        timings[name] = round(time.monotonic() - t0, 3)

    total = round(sum(timings.values()), 3)
    docs_per_sec = round(BENCH_DOCS / t_extract, 2)
    print(
        json.dumps(
            {
                "metric": "headline_suite_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": SF_DIR.rstrip("/").rsplit("sf", 1)[-1],
                "extract_docs": BENCH_DOCS,
                "extract_docs_per_sec": docs_per_sec,
                "cpus": CPUS,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
