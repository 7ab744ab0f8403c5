"""Extra per-query benchmark harness (guide §1.4 noop isolation).

NOT the frozen driver bench — this is the working tool for the
optimization rounds: time any subset of declared queries at any data
dir, optionally dumping ``.explain("formatted")`` to a file.

Usage:
  python bench_extra.py q1 q2 ...            # time queries (noop sink)
  BENCH_EXPLAIN=plans/r06 python bench_extra.py q1   # also dump plans
  SPARK_GRAFT_SF_DIR=/root/scaled/sf1.0 python bench_extra.py q1
  BENCH_RUNS=2 python bench_extra.py q1      # best-of-k

Prints one JSON line {"queries": {...}, "sf_dir": ...}.
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
RUNS = int(os.environ.get("BENCH_RUNS", "1"))
EXPLAIN_DIR = os.environ.get("BENCH_EXPLAIN")


def main() -> None:
    import __spark_entry__ as entrymod
    from reading_the_unreadable_spark.session import get_spark

    spark = get_spark("bench_extra", cpus=CPUS, shuffle_partitions=max(CPUS * 2, 16))
    queries = entrymod.queries()
    names = sys.argv[1:]
    if not names:
        names = sorted(queries)
    timings = {}
    for name in names:
        spark.sparkContext.setJobDescription(name)
        if EXPLAIN_DIR:
            os.makedirs(EXPLAIN_DIR, exist_ok=True)
            df = queries[name](spark, SF_DIR)
            with open(f"{EXPLAIN_DIR}/{name}.txt", "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        best = None
        for _ in range(RUNS):
            t0 = time.monotonic()
            queries[name](spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
        print(f"  {name}: {timings[name]}", file=sys.stderr)
    print(json.dumps({"queries": timings, "sf_dir": SF_DIR, "cpus": CPUS}))
    spark.stop()


if __name__ == "__main__":
    main()
