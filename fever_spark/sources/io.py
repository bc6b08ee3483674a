"""Iceberg-or-parquet IO seam (SURVEY.md §7.4.4).

On a real cluster the pages table is Iceberg, partitioned by
``days(warc_ts)`` with snapshot expiry standing in for the reference's
rotated-table retention (/root/reference/db/slurper_postgres.go:107-162).
The sandbox has no Iceberg runtime jar, so we degrade gracefully to parquet
with an identical physical layout (a ``day=YYYY-MM-DD`` partition column),
behind this one seam — every reader/writer goes through here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def write_table(df: DataFrame, target: str, partition_by_day_of: str | None = None,
                mode: str = "overwrite") -> None:
    """Write a table. ``target`` is an Iceberg table name when a catalog is
    configured, else a filesystem path for day-partitioned parquet."""
    spark = df.sparkSession
    if iceberg_available(spark) and "/" not in target:
        writer = df.writeTo(target)
        if partition_by_day_of:
            writer = writer.partitionedBy(F.days(F.col(partition_by_day_of)))
        writer.createOrReplace()
        return
    if partition_by_day_of:
        df = df.withColumn("day", F.date_format(F.col(partition_by_day_of), "yyyy-MM-dd"))
        df.write.mode(mode).partitionBy("day").parquet(target)
    else:
        df.write.mode(mode).parquet(target)


def read_pages(spark: SparkSession, source: str) -> DataFrame:
    """Read the pages table (Iceberg table name or parquet path), dropping
    the physical ``day`` partition column if present."""
    if iceberg_available(spark) and "/" not in source:
        df = spark.read.format("iceberg").load(source)
    else:
        df = spark.read.parquet(source)
    if "day" in df.columns:
        df = df.drop("day")
    return df


def parquet_row_count(path: str) -> int | None:
    """Row count of a LOCAL parquet dir from file FOOTERS — driver-side
    metadata only, no Spark job, no data scan. Returns None when the path
    isn't a local directory of parquet parts (object stores, Iceberg
    tables): callers fall back to a Spark count. Counting a just-written
    output this way saves a full re-scan job per pipeline run (the
    pattern run_pipeline uses for per-batch alert counts)."""
    import glob
    import os

    import pyarrow.parquet as pq

    if not os.path.isdir(path):
        return None
    parts = glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
    if not parts:
        return 0 if os.path.exists(os.path.join(path, "_SUCCESS")) else None
    return sum(pq.ParquetFile(p).metadata.num_rows for p in parts)
