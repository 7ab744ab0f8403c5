"""Local replica of the driver's correctness gate: every queries() entry
with an oracle_sql() is run on Spark AND DuckDB at sf0.01; row count,
column names, and (order-insensitively) every value must match."""

from __future__ import annotations

import math
import os
from pathlib import Path

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entrymod

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.01")
TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        p = Path(SF_DIR) / f"{t}.parquet"
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    if df.empty:
        return df.reset_index(drop=True)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: None if v is None or (isinstance(v, float) and math.isnan(v)) else v)
    key = df.astype(str).agg("|".join, axis=1)
    return df.iloc[key.argsort(kind="stable")].reset_index(drop=True)


def _compare(name: str, sdf: pd.DataFrame, odf: pd.DataFrame) -> list[str]:
    errs = []
    if len(sdf) != len(odf):
        errs.append(f"rows: spark={len(sdf)} oracle={len(odf)}")
    if sorted(sdf.columns) != sorted(odf.columns):
        errs.append(f"cols: spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")
    if errs:
        return errs
    s, o = _canon(sdf), _canon(odf)
    for c in s.columns:
        sv, ov = s[c], o[c]
        # DRIVER-STRICT dtype gate (round-5 verdict #2): the driver
        # stringifies values, so an integer column on one side vs a
        # float column on the other ("123" vs "123.0") fails its hash
        # even when every value is numerically equal — exactly how the
        # range_join row shipped red (DuckDB sum() promotes BIGINT to
        # HUGEINT which lands in pandas as float64).  Flag the dtype
        # divergence itself instead of coercing it away.
        if pd.api.types.is_float_dtype(sv) != pd.api.types.is_float_dtype(
            ov
        ) and (
            pd.api.types.is_numeric_dtype(sv)
            and pd.api.types.is_numeric_dtype(ov)
        ):
            errs.append(
                f"col {c}: int-vs-float dtype divergence "
                f"(spark={sv.dtype} oracle={ov.dtype}) — the driver's "
                "stringify-hash would fail on this"
            )
            continue
        if pd.api.types.is_float_dtype(sv) or pd.api.types.is_float_dtype(ov):
            a = pd.to_numeric(sv, errors="coerce")
            b = pd.to_numeric(ov, errors="coerce")
            bad = ~((a.isna() & b.isna()) | (a == b))
            if bad.any():
                i = bad.idxmax()
                errs.append(
                    f"col {c}: {int(bad.sum())} diffs, first row {i}: "
                    f"spark={a[i]!r} oracle={b[i]!r}"
                )
        else:
            sa, oa = sv.astype(str), ov.astype(str)
            bad = sa != oa
            if bad.any():
                i = bad.idxmax()
                errs.append(
                    f"col {c}: {int(bad.sum())} diffs, first row {i}: "
                    f"spark={sv[i]!r} oracle={ov[i]!r}"
                )
    return errs


ORACLES = entrymod.oracle_sql()
QUERIES = entrymod.queries()


def test_every_oracle_has_query():
    assert set(ORACLES) <= set(QUERIES)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, ddb, name):
    sdf = QUERIES[name](spark, SF_DIR).toPandas()
    odf = ddb.sql(ORACLES[name]).df()
    errs = _compare(name, sdf, odf)
    assert not errs, f"{name}: " + "; ".join(errs)


def test_no_rows_only_queries():
    """Round 5 closed the last two no_oracle rows (media_pipeline,
    centroid_dendrogram): every queries() entry now has a value oracle,
    so the weaker rows-only check has no members left to run."""
    assert set(QUERIES) == set(ORACLES)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert "doc_id" in df.columns
