"""SparkSession factory tuned for the KG-construction pipeline.

Defaults chosen for the 100 TB design point, scaled down to local mode:
- AQE on (runtime coalescing + skew-join splitting — our Stage-C mention
  self-join has a popularity long tail);
- Arrow transfer on for every pandas/Arrow UDF stage (the matching kernel
  moves through ``mapInPandas``; Arrow batch size capped so giant web pages
  don't blow the Python worker);
- shuffle partitions sized to cores in local mode (on a real cluster this is
  set to ~2-3x total cores by the submitter; AQE coalesces down).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(
    app_name: str = "gazetteer-kg",
    parallelism: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = parallelism or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle = shuffle_partitions or max(cpus, 8)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # AQE sizes post-shuffle partitions by *pre*-explode bytes; our
        # pair-expansion stages blow up ~window^2 after the shuffle, so the
        # default 64m advisory under-parallelizes them (measured 2x slower)
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for key, value in (extra_conf or {}).items():
        builder = builder.config(key, value)
    return builder.getOrCreate()
