"""Fever predicate parity (SURVEY.md §2.2) + CIDR range matching.

All pure Catalyst expressions except the PC-trie-equivalent CIDR join,
which is a broadcast range join on integer bounds — the distributed
translation of the reference's in-memory trie
(/root/reference/processing/ip_handler.go:80-160).
"""

from __future__ import annotations

import ipaddress

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def flow_quality_predicate(proto: Column, bytes_toclient: Column) -> Column:
    """P5 (unicorn_aggregator.go:202): proto == TCP && bytes_toclient > 0."""
    return (proto == "TCP") & (bytes_toclient > 0)


def proxy_port_predicate(dest_port: Column) -> Column:
    """P6 (unicorn_aggregator.go:215): port in [8000,8999] ∪ {3128, 80}."""
    return dest_port.between(8000, 8999) | dest_port.isin(3128, 80)


def nonempty_predicate(col: Column) -> Column:
    """P7 null/missing-key guard (context_collector.go:91-93)."""
    return col.isNotNull() & (col != "")


def event_type_filter(df: DataFrame, types: list[str]) -> DataFrame:
    """P8 forward-type filter (multi_forward.go:222-225)."""
    return df.filter(F.col("event_type").isin(types))


_PRIVATE_V4 = ["10.0.0.0/8", "172.16.0.0/12", "192.168.0.0/16"]


def private_ip_predicate(ip: Column) -> Column:
    """P9 RFC1918 membership (rdns_handler.go:39-51), IPv4 dotted-quad,
    as a pure range expression over the packed integer form."""
    as_int = ipv4_to_long(ip)
    pred = F.lit(False)
    for cidr in _PRIVATE_V4:
        net = ipaddress.ip_network(cidr)
        lo = int(net.network_address)
        hi = int(net.broadcast_address)
        pred = pred | as_int.between(lo, hi)
    return pred


def ipv4_to_long(ip: Column) -> Column:
    """Dotted-quad → int64, null for non-IPv4 strings. Pure expressions."""
    ok = ip.rlike(r"^\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}$")
    parts = F.split(ip, r"\.")
    val = (parts[0].cast("long") * 16777216 + parts[1].cast("long") * 65536
           + parts[2].cast("long") * 256 + parts[3].cast("long"))
    valid = (parts[0].cast("int") <= 255) & (parts[1].cast("int") <= 255) \
        & (parts[2].cast("int") <= 255) & (parts[3].cast("int") <= 255)
    return F.when(ok & valid, val)


def cidr_ranges_df(spark: SparkSession, cidrs: list[str]) -> DataFrame:
    """CIDR list → (network, lo, hi) bounds table (S6 ip-range source,
    ip_handler.go:80-113). IPv4 only; v6 entries are skipped like the
    reference skips malformed lines."""
    rows = []
    for c in cidrs:
        try:
            net = ipaddress.ip_network(c.strip(), strict=False)
        except ValueError:
            continue
        if net.version != 4:
            continue
        rows.append((str(net), int(net.network_address),
                     int(net.broadcast_address)))
    return spark.createDataFrame(rows, "network string, lo long, hi long")


def cidr_match(df: DataFrame, ranges: DataFrame, ip_col: str,
               how: str = "inner") -> DataFrame:
    """J3 CIDR containment join (ip_handler.go:128-160): every containing
    network yields a row, like the reference's per-network alert loop.
    The ranges side is broadcast → BroadcastNestedLoopJoin, no shuffle of
    the big side."""
    ip_int = ipv4_to_long(F.col(ip_col))
    return df.join(F.broadcast(ranges),
                   ip_int.between(F.col("lo"), F.col("hi")), how)


def ip_blacklist_alerts(df: DataFrame, ranges: DataFrame,
                        prefix: str = "IP-BLACKLIST") -> DataFrame:
    """P3/J3 end-to-end: alert rows for src or dest IP in any blacklisted
    range (ip_handler.go:128-160; default prefix run.go:727). One alert per
    (event, matching network, side), like the reference's double loop."""
    src = cidr_match(df, ranges, "src_ip").withColumn("matched_side", F.lit("src"))
    dst = cidr_match(df, ranges, "dest_ip").withColumn("matched_side", F.lit("dest"))
    out = src.unionByName(dst)
    ip = F.when(F.col("matched_side") == "src", F.col("src_ip")).otherwise(F.col("dest_ip"))
    return out.select(
        F.col("ts").alias("timestamp_event"),
        F.lit("alert").alias("event_type"),
        F.col("matched_side"),
        ip.alias("ioc"),
        F.col("network"),
        F.concat(F.lit(prefix + " Possibly bad traffic involving "), ip,
                 F.lit(" (in "), F.col("network"), F.lit(")")).alias("signature"),
    )
