"""SparkSession factory with scale-appropriate defaults."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "lightrag-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    Defaults chosen for the target workload (wide shuffles keyed by entity
    name / edge pair, Arrow-batched pandas UDFs):

    - AQE on (runtime coalescing + skew-join splitting),
    - Arrow execution on with a large batch size (the extraction UDF
      amortizes per-batch model/tokenizer overhead),
    - shuffle partitions sized to the local core count unless overridden
      (on a real cluster: ~2-3x total executor cores).
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    builder = SparkSession.builder.appName(app_name)
    builder = builder.master(master or f"local[{cpus}]")
    conf = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        # Without this, .persist() on a DataFrame pins its plan to the
        # non-adaptive physical strategy (static shuffle partitions, no
        # runtime broadcast/coalesce) — measured 10-20x slowdown of the
        # cached merge stage at local[32].
        "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning": "true",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.execution.arrow.maxRecordsPerBatch": "2048",
        "spark.sql.shuffle.partitions": str(shuffle_partitions or max(cpus, 8)),
        "spark.driver.memory": os.environ.get("SPARK_DRIVER_MEMORY", "8g"),
        "spark.ui.enabled": "false",
        "spark.sql.session.timeZone": "UTC",
    }
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
