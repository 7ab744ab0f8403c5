"""SparkSession factory tuned for the extraction engine.

Local-mode defaults mirror what we would set on a real multi-executor
cluster: explicit shuffle partitions, AQE with skew-join handling, Arrow
for all pandas/Arrow UDF exchanges, UTC session timezone so results are
comparable against DuckDB oracles.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "reading_the_unreadable_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``cpus`` maps to ``local[N]``; on a real cluster this builder is
    bypassed by spark-submit conf, every setting here is also valid there.
    """
    cpus = cpus or DEFAULT_CPUS
    shuffle_partitions = shuffle_partitions or max(cpus * 2, 8)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
        # long query suites accumulate broadcast/shuffle state that the
        # ContextCleaner only releases after a JVM GC; with a 24g heap
        # full GCs are rare, so the default 30min periodic GC lets
        # late-suite queries run against a littered executor (measured:
        # in-suite timings drifting 1.5-2x above isolated runs).  2min
        # keeps cleanup timely at negligible cost.
        .config(
            "spark.cleaner.periodicGC.interval",
            os.environ.get("SPARK_GRAFT_PERIODIC_GC", "2min"),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", "128m")
        # managed (bucketed) tables land outside the repo tree
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/rtu_spark_warehouse"),
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    # WindowExec warns "No Partition Defined" on ANY unpartitioned window,
    # including the two intentional ones in this engine: rank assignment
    # over the ≤k rows LEFT AFTER a GlobalLimit (top_customers,
    # cosine_topk) — single-partition by construction and size-bounded.
    # (A lit(1) partition key does not silence it: constant folding strips
    # the literal from the window spec.)  A plan test asserts every
    # unpartitioned window sits above a limit
    # (tests/test_plan_quality.py::test_unpartitioned_windows_only_post_limit),
    # so the warning is cosmetic here; quiet it at the logger.
    try:
        jvm = spark.sparkContext._jvm  # noqa: SLF001
        jvm.org.apache.logging.log4j.core.config.Configurator.setLevel(
            "org.apache.spark.sql.execution.window.WindowExec",
            jvm.org.apache.logging.log4j.Level.ERROR,
        )
    except Exception:
        pass  # non-log4j2 deployments just keep the warning
    return spark
