"""In-process two-level scaling A/B for the end-to-end curation
pipeline (url gate → main-text → Gopher → PII scrub), the same
discipline as the dedup_substrings / chrF measurements recorded in
BENCH/BASELINE.md: one enlarged corpus (sf0.1 documents x MULT with
shifted doc_ids, materialized once), each level gets a fresh
SparkSession, a warmup pass, then best-of-K timed full
materializations.  Run with nothing else on the box.

Usage: python scripts/pipeline_ab.py [--mult 16] [--trials 3]
       [--levels 2 8]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def build_corpus(mult: int) -> str:
    out = f"/tmp/ab_curation_sf/documents_{mult}"
    from pyspark.sql import SparkSession, functions as F

    if not Path(out, "documents.parquet", "_SUCCESS").exists():
        spark = (
            SparkSession.builder.master("local[8]")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
        base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
        n = base.count()
        parts = [
            base.select(
                (F.col("doc_id") + F.lit(i * n)).alias("doc_id"),
                "text", "lang", "source", "n_chars",
            )
            for i in range(mult)
        ]
        big = parts[0]
        for p in parts[1:]:
            big = big.unionByName(p)
        big.repartition(32).write.mode("overwrite").parquet(
            f"{out}/documents.parquet"
        )
        spark.stop()
    return out


def run_level(cpus: int, sf_dir: str, trials: int) -> list[float]:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(max(cpus * 4, 8)))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    import __spark_entry__ as entry

    walls = []
    for i in range(trials + 1):  # first pass = warmup
        t0 = time.time()
        n = entry.q_curation_pipeline(spark, sf_dir).count()
        w = time.time() - t0
        if i > 0:
            walls.append(round(w, 2))
    spark.stop()
    print(f"local[{cpus}]: rows={n} walls={walls}", file=sys.stderr)
    return walls


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=16)
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--levels", type=int, nargs=2, default=[2, 8])
    args = ap.parse_args()
    sf_dir = build_corpus(args.mult)
    lo, hi = args.levels
    res = {}
    for cpus in (lo, hi):
        res[cpus] = run_level(cpus, sf_dir, args.trials)
    best = {c: min(w) for c, w in res.items()}
    eff = (best[lo] / best[hi]) / (hi / lo)
    out = {
        "op": "curation_pipeline",
        "docs": args.mult * 5000,
        "trials": res,
        "best_wall_sec": best,
        "scaling_efficiency": round(eff, 3),
        "levels": [lo, hi],
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
