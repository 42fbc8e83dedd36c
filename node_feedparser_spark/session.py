"""SparkSession factory with the scale-oriented defaults this engine assumes.

Local mode is the test harness; the configs are chosen so the same code is
correct on a 1000-executor cluster: AQE on (runtime re-plan + skew-join
splitting), shuffle partitions sized to parallelism, Arrow enabled for every
pandas UDF exchange, UTC timezone pinned so timestamp semantics match DuckDB
oracles.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app: str = "node_feedparser_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        if cpus:
            master = f"local[{cpus}]"
    # Under spark-submit the gateway JVM already carries --master; setting
    # .master() here would silently override it (and break the N-vs-4N
    # scaling bench).  Detect spark-submit via its gateway port.
    under_submit = "PYSPARK_GATEWAY_PORT" in os.environ
    effective = master or ("<from-spark-submit>" if under_submit else "local[*]")
    if shuffle_partitions is None:
        n = effective.removeprefix("local[").removesuffix("]")
        shuffle_partitions = 32 if not n.isdigit() else max(8, int(n))
    builder = SparkSession.builder.appName(app)
    if master is not None or not under_submit:
        builder = builder.master(effective)
    builder = (
        builder
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # 10k measured best for the extraction mapInPandas hot path:
        # an interleaved A/B at sf0.1 (3 trials each, same process/JVM,
        # warm JIT) gave minima 14.7 s @ 10k vs 16.2 s @ 100k — bigger
        # Arrow batches lose pipelining between the Python workers and
        # the JVM sink and raise peak worker memory for no win.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
