"""SparkSession factory with the engine's scale-oriented defaults.

Local-mode testing stands in for a multi-executor cluster; every config here
is equally valid under ``spark-submit --py-files`` on a real cluster:

* AQE on (runtime re-plan, skew-join splitting, partition coalescing) —
  the skewed popular-entity dedup (SURVEY §2.5 J5) relies on it;
* Arrow enabled for the pandas-UDF tokenizer edge (SURVEY §2.11);
* shuffle partitions sized to parallelism, not the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "rdfshape_api_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        # local[N] → N; local[*] → cpu count; real cluster masters keep 2×cores
        if master.startswith("local["):
            inner = master[len("local[") : -1]
            shuffle_partitions = cpus if inner == "*" else int(inner)
        else:
            shuffle_partitions = 2 * cpus
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # dynamic-partition writes (the canonical store) use concurrent
        # writers instead of the sort-based fallback — the pre-write
        # repartition(pred_part, bucket) leaves only a handful of partition
        # dirs per task, and skipping the sort measured ~20-50% faster
        .config("spark.sql.maxConcurrentOutputFileWriters", "64")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
