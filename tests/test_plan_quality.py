"""Physical-plan audits: the properties that make the engine viable at
100 TB — bounded shuffle count, parquet filter/column pushdown, broadcast
joins for dimensions — asserted on the actual executed plans so
regressions fail loudly."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from reading_the_unreadable_spark import synth
from reading_the_unreadable_spark.plans.pipeline import extract
from reading_the_unreadable_spark.sources.docs import docs_from_rows

SF = "/root/testdata/sf0.01"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_extract_shuffle_count(spark):
    docs = docs_from_rows(spark, synth.make_corpus(20))
    plan = _plan(extract(docs, num_partitions=8))
    n_exchanges = len(re.findall(r"Exchange (hash|round)", plan))
    # 1 input rebalance + 1 doc_id hash for windows + 1 post-UDF re-hash
    assert n_exchanges <= 3, f"extract plan has {n_exchanges} exchanges:\n{plan[:2000]}"


def test_parquet_filter_pushdown(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    df = li.filter(F.col("l_shipdate") <= "2001-09-01").select("l_quantity")
    plan = _plan(df)
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # column pruning reached the scan
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m and set(m.group(1).split(",")) <= {
        "l_quantity:double",
        "l_shipdate:timestamp_ntz",
    }, plan[:1500]


def test_dimension_joins_broadcast(spark):
    df = entrymod.q_region_revenue(spark, SF)
    plan = _plan(df)
    assert plan.count("BroadcastHashJoin") >= 2, plan[:2000]


def test_semi_anti_join_strategies(spark):
    semi = _plan(entrymod.q_active_suppliers(spark, SF))
    anti = _plan(entrymod.q_customers_without_orders(spark, SF))
    assert "LeftSemi" in semi
    assert "LeftAnti" in anti


def test_no_cartesian_products(spark):
    """Dedup/similarity must never fall back to a cross join (the single
    intentional 1-row broadcast in cosine_topk is allowed)."""
    for name in ("minhash_lsh", "ngram_jaccard", "ann_lsh"):
        plan = _plan(entrymod.queries()[name](spark, SF))
        assert "CartesianProduct" not in plan, name


def test_window_topk_no_global_window_on_full_data(spark):
    """cosine_topk must use TakeOrdered (distributed top-k), not a
    single-partition window over the full table."""
    plan = _plan(entrymod.q_cosine_topk(spark, SF))
    assert "TakeOrderedAndProject" in plan


@pytest.mark.parametrize("name", ["pricing_summary", "region_revenue"])
def test_partial_aggregation(spark, name):
    """Map-side combine: HashAggregate appears in partial+final pairs."""
    plan = _plan(entrymod.queries()[name](spark, SF))
    assert plan.count("HashAggregate") >= 2
