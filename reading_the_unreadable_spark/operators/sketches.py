"""Cardinality sketches with cross-engine-exact register math.

HyperLogLog (Flajolet et al. 2007) re-expressed so every register value
is a pure function of md5 hex strings: bucket = 16-bit hash prefix mod
m, rho = leading-zero BITS of the next 64 hash bits + 1 — counted with
string operations (leading-'0' run length × 4 + a nibble table), so
Spark and DuckDB compute IDENTICAL registers, and the estimator's
2^-rho sum is a sum of exact dyadics (order-independent in IEEE
double).  The only true floats are the final α·m²/Σ division and the
linear-counting ln, both 4-dp rounded.

Why this matters at 100 TB: exact distinct counts need a shuffle of
every distinct value; the sketch shuffles AT MOST m rows per group
(map-side partial max collapses the Zipf head), and sketches merge by
register max — the standard way to count distinct tokens / URLs /
fingerprints across a corpus without moving them.

Spark's built-in ``approx_count_distinct`` is the production choice;
this operator exists because its registers are ENGINE-PORTABLE — the
DuckDB oracle replays them bit-for-bit, which no built-in sketch
offers."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_ALPHA = {16: 0.673, 32: 0.697, 64: 0.709}


def _alpha(m: int) -> float:
    return _ALPHA.get(m, 0.7213 / (1 + 1.079 / m))


def _rho(tail_hex: Column, bits: int) -> Column:
    """Leading-zero bits of a hex string + 1, via string ops only:
    (leading-'0' nibbles)·4 + a 15-way nibble table."""
    zeros_nibbles = F.length(F.regexp_extract(tail_hex, "^(0*)", 1))
    first_nz = F.substring(F.regexp_replace(tail_hex, "^0*", ""), 1, 1)
    extra = (
        F.when(first_nz == "1", 3)
        .when(first_nz.isin("2", "3"), 2)
        .when(first_nz.isin("4", "5", "6", "7"), 1)
        .otherwise(0)
    )
    return (
        F.when(first_nz == "", F.lit(bits + 1))  # all-zero tail
        .otherwise(zeros_nibbles * 4 + extra + 1)
        .cast("int")
    )


def hll_registers(
    df: DataFrame, value_col: str, group_cols: list[str], p: int = 6
) -> DataFrame:
    """Per-group HLL registers: (group..., bucket, r) with
    r = max rho over the group's values in that bucket.  One shuffle on
    (group, bucket); partial aggregation collapses duplicates map-side,
    so the network carries ≤ m rows per group regardless of input
    size."""
    if not 4 <= p <= 12:
        raise ValueError(f"p={p} outside the supported 4..12 range")
    m = 1 << p
    h = F.md5(F.col(value_col).cast("string"))
    bucket = (
        F.conv(F.substring(h, 1, 4), 16, 10).cast("long") % m
    ).cast("int")
    return (
        df.select(*group_cols, bucket.alias("bucket"),
                  _rho(F.substring(h, 5, 16), 64).alias("rho"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("r"))
    )


def approx_distinct(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    p: int = 6,
    with_exact: bool = False,
) -> DataFrame:
    """Per-group HLL cardinality estimate (4-dp rounded), with the
    standard small-range linear-counting correction (E ≤ 2.5m with
    empty registers → m·ln(m/V)).  ``with_exact=True`` adds the true
    distinct count for accuracy evidencing — that branch costs the
    value shuffle the sketch exists to avoid; leave it off in
    production."""
    m = 1 << p
    alpha = _alpha(m)
    regs = hll_registers(df, value_col, group_cols, p)
    agg = regs.groupBy(*group_cols).agg(
        F.sum(F.pow(F.lit(2.0), -F.col("r"))).alias("s_present"),
        F.count("*").alias("n_present"),
    )
    # absent registers contribute 2^0 = 1 each; V = count of empties
    s = F.col("s_present") + (F.lit(m) - F.col("n_present"))
    v = F.lit(m) - F.col("n_present")
    raw = F.lit(alpha * m * m) / s
    est = F.round(
        F.when(
            (raw <= 2.5 * m) & (v > 0), F.lit(float(m)) * F.log(F.lit(m) / v)
        ).otherwise(raw),
        4,
    )
    out = agg.select(
        *group_cols,
        F.col("n_present").alias("n_registers_hit"),
        est.alias("hll_estimate"),
    )
    if with_exact:
        exact = df.groupBy(*group_cols).agg(
            F.count_distinct(F.col(value_col)).alias("n_exact")
        )
        out = out.join(exact, group_cols).select(
            *group_cols,
            "n_exact",
            "n_registers_hit",
            "hll_estimate",
            F.round(
                F.abs(F.col("hll_estimate") - F.col("n_exact"))
                / F.greatest(F.col("n_exact"), F.lit(1)),
                4,
            ).alias("rel_err"),
        )
    return out
