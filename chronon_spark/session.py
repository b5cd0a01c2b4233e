"""SparkSession factory with scale-oriented defaults.

UTC session timezone (oracle comparability), AQE with skew-join splitting on
(north rule: skew handled by hot-key salting + AQE), Arrow enabled for the
pandas-UDF kernels, shuffle partitions sized to cores for local mode.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "chronon_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    master = master or os.environ.get("SPARK_MASTER", "local[*]")
    cores = os.cpu_count() or 8
    if master.startswith("local["):
        inner = master[6:-1]
        if inner.isdigit():
            cores = int(inner)
    sp = shuffle_partitions or int(os.environ.get("SPARK_SHUFFLE_PARTITIONS", cores * 4))
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(max(sp, cores * 4)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # AQE's byte-targeted coalescing collapses Python-kernel stages to
        # ~1 task/core (the work is CPU-bound, not byte-bound) — the stage
        # then waits on its slowest task. Keep >=4 waves for load balance.
        .config("spark.sql.adaptive.coalescePartitions.minPartitionNum", str(cores * 4))
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        # progress-bar redraws flood stderr; when a harness captures stdio
        # through PIPES the buffer backpressure stalls executor threads
        # (measured 113 s -> 23 s on an identical local[16] job) — disable
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
