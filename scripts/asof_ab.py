"""In-process two-level scaling A/B for the as-of join
(operators/temporal.py asof_join), same discipline as the
curation/dedup_substrings/chrF measurements in BENCH/BASELINE.md: one
enlarged input pair (sf0.1 events x MULT, orders x MULT, key domain
widened to 15 x MULT users so the single keyed shuffle has real
parallelism), each level a fresh SparkSession, warmup pass, best-of-K
timed full materializations through a noop sink (count() would let
Catalyst prune the carried payload and skip the window work being
measured).  Run with nothing else on the box.

Usage: python scripts/asof_ab.py [--mult 16] [--trials 3] [--levels 2 8]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF = "/root/testdata/sf0.1"


def build_inputs(mult: int) -> str:
    out = f"/tmp/ab_asof_sf/m{mult}"
    from pyspark.sql import SparkSession, functions as F

    if not Path(out, "events.parquet", "_SUCCESS").exists():
        spark = (
            SparkSession.builder.master("local[8]")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
        ev = spark.read.parquet(f"{SF}/events.parquet")
        od = spark.read.parquet(f"{SF}/orders.parquet")
        n_ev, n_od = ev.count(), od.count()
        ev_parts = [
            ev.select(
                (F.col("event_id") + F.lit(i * n_ev)).alias("event_id"),
                (F.col("user_id") + F.lit(i * 15)).alias("user_id"),
                "value",
            )
            for i in range(mult)
        ]
        od_parts = [
            od.select(
                (F.col("o_orderkey") + F.lit(i * n_od)).alias("o_orderkey"),
                (F.col("o_custkey") % 15 + F.lit(i * 15)).alias("user_id"),
                "o_orderdate",
                "o_totalprice",
            )
            for i in range(mult)
        ]
        ev_big, od_big = ev_parts[0], od_parts[0]
        for p in ev_parts[1:]:
            ev_big = ev_big.unionByName(p)
        for p in od_parts[1:]:
            od_big = od_big.unionByName(p)
        ev_big = ev_big.withColumn(
            "ts2",
            F.expr(
                "timestamp'1995-01-01' + make_interval(0,0,0,0,0,0,"
                " (event_id * 2654435761) % 207360000)"
            ),
        )
        ev_big.repartition(32).write.mode("overwrite").parquet(
            f"{out}/events.parquet"
        )
        od_big.repartition(32).write.mode("overwrite").parquet(
            f"{out}/orders.parquet"
        )
        spark.stop()
    return out


def run_level(cpus: int, data: str, trials: int) -> list[float]:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", "64")
        # byte-based coalescing collapses this byte-small/CPU-heavy
        # exchange below the core count (measured 8->16 scaling 0.56
        # vs 0.77) -- same lesson as the eval-core pin
        .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    from reading_the_unreadable_spark.operators.temporal import asof_join

    ev = spark.read.parquet(f"{data}/events.parquet")
    od = spark.read.parquet(f"{data}/orders.parquet")
    walls = []
    n = None
    for i in range(trials + 1):  # first pass = warmup
        t0 = time.time()
        j = asof_join(
            ev,
            od,
            on="user_id",
            left_ts="ts2",
            right_ts="o_orderdate",
            value_cols=("o_orderkey", "o_totalprice"),
            tiebreak="o_orderkey",
            num_partitions=64,
        )
        j.write.format("noop").mode("overwrite").save()
        w = time.time() - t0
        if i > 0:
            walls.append(round(w, 2))
        if n is None:
            n = (ev.count(), od.count())
    spark.stop()
    print(f"local[{cpus}]: inputs={n} walls={walls}", file=sys.stderr)
    return walls


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=16)
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--levels", type=int, nargs=2, default=[2, 8])
    args = ap.parse_args()
    data = build_inputs(args.mult)
    lo, hi = args.levels
    res = {}
    for cpus in (lo, hi):
        res[cpus] = run_level(cpus, data, args.trials)
    best = {c: min(w) for c, w in res.items()}
    eff = (best[lo] / best[hi]) / (hi / lo)
    out = {
        "op": "asof_join",
        "events": args.mult * 100000,
        "orders": args.mult * 150000,
        "trials": res,
        "best_wall_sec": best,
        "scaling_efficiency": round(eff, 3),
        "levels": [lo, hi],
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
