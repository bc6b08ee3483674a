"""Network-oriented scalar functions: fever F8/F9/F12 + the rDNS join (J5).

The actual reverse-DNS resolver is STUBBED deterministically (no network in
this container, and a 100 TB job would use a prebuilt PTR table anyway);
the two real integration shapes — broadcast dim-table join and
per-partition-cached mapInPandas lookup — are both implemented and tested.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from fever_spark.operators.filters import ipv4_to_long


def ipv4_to_reversed_bytes(ip: Column) -> Column:
    """F8 (types/flow_event.go:38-58): dotted-quad → reversed 4-byte
    little-endian binary, null for invalid. Pure expressions: int form →
    4 bytes emitted low-octet-first."""
    v = ipv4_to_long(ip)
    return F.when(v.isNotNull(), F.concat(
        F.unhex(F.lpad(F.hex(v % 256), 2, "0")),
        F.unhex(F.lpad(F.hex(F.floor(v / 256) % 256), 2, "0")),
        F.unhex(F.lpad(F.hex(F.floor(v / 65536) % 256), 2, "0")),
        F.unhex(F.lpad(F.hex(F.floor(v / 16777216) % 256), 2, "0")),
    ))


def checked_uint32(col: Column, name: str = "value") -> Column:
    """F9 (types/flow_event.go:105-124): uint32 overflow guard — values
    outside [0, 2^32) fail the job with a named error instead of silently
    wrapping (the reference returns an error per record)."""
    bound = 4294967296
    return F.when((col >= 0) & (col < bound), col.cast("long")).otherwise(
        F.raise_error(F.concat(F.lit(f"{name} out of uint32 range: "),
                               col.cast("string"))))


def clamped_uint32(col: Column) -> Column:
    """Tolerant variant: clamp into uint32 range (for pipelines that prefer
    saturation over failure)."""
    return F.least(F.greatest(col, F.lit(0)), F.lit(4294967295)).cast("long")


def _fake_rdns(ip: str) -> str | None:
    """DETERMINISTIC FAKE resolver — stands in for socket.gethostbyaddr.
    Swap for a real resolver (or a PTR dim table) in production."""
    if ip is None:
        return None
    last = ip.rsplit(".", 1)[-1]
    return f"host-{last}.rdns.example." if last.isdigit() else None


def rdns_table(spark: SparkSession, ips: list[str]) -> DataFrame:
    """Hostname dim table for the broadcast-join enrichment path (J5).
    In production this is the pre-resolved PTR table."""
    rows = [(ip, (_fake_rdns(ip) or "").rstrip(".") or None) for ip in ips]
    return spark.createDataFrame(rows, "ip string, rdns string")


def enrich_rdns_join(df: DataFrame, lookup: DataFrame, ip_col: str,
                     private_only: bool = True) -> DataFrame:
    """J5 via broadcast hash join. ``private_only`` mirrors the reference's
    RFC1918 gate (rdns_handler.go:69-73): public IPs pass through
    unenriched."""
    from fever_spark.operators.filters import private_ip_predicate

    lk = F.broadcast(lookup.withColumnRenamed("rdns", f"{ip_col}_rdns"))
    joined = df.join(lk, df[ip_col] == lk["ip"], "left").drop("ip")
    if private_only:
        return joined.withColumn(
            f"{ip_col}_rdns",
            F.when(private_ip_predicate(F.col(ip_col)), F.col(f"{ip_col}_rdns")))
    return joined


def enrich_rdns_mapped(df: DataFrame, ip_col: str) -> DataFrame:
    """J5/F12 via mapInPandas with a per-partition cache — the shape of the
    reference's caching HostNamer (util/hostnamer_rdns.go:28-46): each
    executor resolves an IP once per partition, trailing dot trimmed."""
    out_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                           for f in df.schema.fields) + f", {ip_col}_rdns string"

    def lookup(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, str | None] = {}
        for pdf in batches:
            def resolve(ip):
                if ip not in cache:
                    r = _fake_rdns(ip)
                    cache[ip] = r.rstrip(".") if r else None  # trim dot
                return cache[ip]
            pdf[f"{ip_col}_rdns"] = pdf[ip_col].map(resolve)
            yield pdf

    return df.mapInPandas(lookup, schema=out_schema)
