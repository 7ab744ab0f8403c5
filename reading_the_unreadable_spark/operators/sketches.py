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


def cms_counts(
    df: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Count-min sketch table (Cormode & Muthukrishnan 2005): ``depth``
    md5-seeded hash rows × ``width`` columns of exact integer counts —
    (d, col, c).  One shuffle of at most depth·width rows (map-side
    partial sums collapse the Zipf head); integer arithmetic end to
    end, so a DuckDB replica is EXACT, not approximately equal.

    The table IS the sketch: merge = cell-wise sum, point query = min
    over the value's depth cells (:func:`cms_estimate`)."""
    if depth < 1 or width < 2:
        raise ValueError(f"bad CMS geometry depth={depth} width={width}")
    rows = F.explode(
        F.transform(
            F.sequence(F.lit(0), F.lit(depth - 1)),
            lambda d: F.struct(
                d.alias("d"),
                (
                    F.conv(
                        F.substring(
                            F.md5(
                                F.concat(
                                    d.cast("string"),
                                    F.lit("|"),
                                    F.col(value_col).cast("string"),
                                )
                            ),
                            1,
                            8,
                        ),
                        16,
                        10,
                    ).cast("long")
                    % width
                ).cast("int").alias("col"),
            ),
        )
    )
    return (
        df.select(rows.alias("cell"))
        .select("cell.d", "cell.col")
        .groupBy("d", "col")
        .agg(F.count("*").alias("c"))
    )


def cms_estimate(
    cms: DataFrame, probes: DataFrame, value_col: str,
    depth: int = 4, width: int = 256,
) -> DataFrame:
    """Point queries against a CMS table: each probe value hashes to
    one cell per row; the estimate is the min — an upper bound on the
    true count (classic CMS guarantee).  Probes are a small frame; the
    join broadcasts them against the ≤ depth·width-row sketch."""
    probe_cells = probes.select(
        F.col(value_col),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(depth - 1)),
                lambda d: F.struct(
                    d.alias("d"),
                    (
                        F.conv(
                            F.substring(
                                F.md5(
                                    F.concat(
                                        d.cast("string"),
                                        F.lit("|"),
                                        F.col(value_col).cast("string"),
                                    )
                                ),
                                1,
                                8,
                            ),
                            16,
                            10,
                        ).cast("long")
                        % width
                    ).cast("int").alias("col"),
                ),
            )
        ).alias("cell"),
    ).select(value_col, "cell.d", "cell.col")
    return (
        probe_cells.join(cms, ["d", "col"], "left")
        .groupBy(value_col)
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("cms_count"))
    )


def bloom_bits(
    df: DataFrame, value_col: str, k: int = 5, m_bits: int = 4096
) -> DataFrame:
    """Bloom filter bit set as a table of distinct set-bit positions —
    (bit).  ``k`` md5-seeded hashes per value; one distinct-shuffle of
    at most ``m_bits`` rows.  Integer positions only → exact DuckDB
    parity.  Membership = all k positions present
    (:func:`bloom_contains`): no false negatives, false positives at
    the standard (1 - e^{-kn/m})^k rate."""
    if k < 1 or m_bits < 8:
        raise ValueError(f"bad bloom geometry k={k} m_bits={m_bits}")
    bits = F.explode(
        F.transform(
            F.sequence(F.lit(0), F.lit(k - 1)),
            lambda i: (
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                i.cast("string"),
                                F.lit("#"),
                                F.col(value_col).cast("string"),
                            )
                        ),
                        1,
                        8,
                    ),
                    16,
                    10,
                ).cast("long")
                % m_bits
            ).cast("int"),
        )
    )
    return df.select(bits.alias("bit")).distinct()


def bloom_contains(
    bits: DataFrame, probes: DataFrame, value_col: str,
    k: int = 5, m_bits: int = 4096,
) -> DataFrame:
    """Membership verdict per probe: present ⟺ all k bit positions are
    set.  The bit table is ≤ m_bits rows — broadcast it; probes never
    shuffle."""
    probe_bits = probes.select(
        F.col(value_col),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(k - 1)),
                lambda i: (
                    F.conv(
                        F.substring(
                            F.md5(
                                F.concat(
                                    i.cast("string"),
                                    F.lit("#"),
                                    F.col(value_col).cast("string"),
                                )
                            ),
                            1,
                            8,
                        ),
                        16,
                        10,
                    ).cast("long")
                    % m_bits
                ).cast("int"),
            )
        ).alias("bit"),
    )
    from pyspark.sql.functions import broadcast

    hit = broadcast(bits.withColumn("present", F.lit(1)))
    return (
        probe_bits.join(hit, "bit", "left")
        .groupBy(value_col)
        .agg(
            (F.count("*") == F.sum(F.coalesce(F.col("present"), F.lit(0))))
            .alias("maybe_present")
        )
    )
