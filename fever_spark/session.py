"""SparkSession factory with scale-oriented defaults.

Local-mode knobs mirror what we'd set on a real cluster: AQE on (runtime
re-plan, skew-join splitting), shuffle partitions sized to parallelism
instead of the 200 default, Arrow enabled for every pandas UDF exchange.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(master: str | None = None, app_name: str = "fever_spark",
              shuffle_partitions: int | None = None,
              extra_conf: dict | None = None) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        # match parallelism; AQE coalesces small ones at runtime
        n = master[master.find("[") + 1:master.find("]")] if "[" in master else str(cpus)
        shuffle_partitions = cpus if n == "*" else max(int(n), 2)
    builder = (
        SparkSession.builder.master(master).appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # let AQE rewrite sort-merge joins to shuffled-hash when every
        # post-shuffle partition's build side fits the threshold (guide
        # §3.1): skips both sides' sorts. Size-gated at RUNTIME from real
        # partition bytes, so it scales with data (a too-big partition
        # keeps SMJ); measured on the 1M-doc LSH candidate join: 18.2s →
        # 17.1s, identical output. Env-tunable for hosts with tighter
        # task memory (the build side of one partition must fit).
        .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
                os.environ.get("FEVER_SHJ_THRESHOLD", "64MB"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.driver.memory", os.environ.get("FEVER_SPARK_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
