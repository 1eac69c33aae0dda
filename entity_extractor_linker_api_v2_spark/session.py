"""SparkSession factory tuned for the KG-construction pipeline.

Defaults are chosen for the local[32] sandbox but are exactly the knobs that
matter on a 1000-executor cluster: AQE (runtime re-plan + skew-join split),
Arrow batching for the pandas-UDF stages, broadcast threshold sized so the KB
alias/redirect dimensions always broadcast, and shuffle partitions matched to
parallelism (on a real cluster leave shuffle partitions to AQE coalescing).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "eel-v2-spark", master: str | None = None,
              shuffle_partitions: int | None = None,
              extra_conf: dict[str, str] | None = None) -> SparkSession:
    """`extra_conf` entries are applied LAST, so callers can override any
    default (e.g. scripts/skew_check.py re-enables the UI for the task-time
    quantile REST probes)."""
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or cpus
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Arrow batch rows: at ~7 kB/page, 50k rows = ~350 MB in flight PER
        # TASK — with 32 concurrent tasks that is >10 GB of transient heap.
        # 8k rows (~56 MB/task) keeps GC quiet at full parallelism.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch",
                os.environ.get("SPARK_ARROW_BATCH", "8192"))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
