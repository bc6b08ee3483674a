"""Capstone integration: raw WARC archives through the WHOLE platform —
parse -> pages table -> curation (quality + exact/span/near dedup) ->
token-budget training shards — using only the public jobs/operators."""

import gzip
import json
import os

from pyspark.sql import functions as F

from fever_spark.jobs.curate import curate
from fever_spark.jobs.shard_writer import write_training_shards
from fever_spark.sources.warc import read_warc, warc_to_pages


def _record(url, date, body):
    payload = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body)
    head = (b"WARC/1.0\r\nWARC-Type: response\r\n"
            b"WARC-Target-URI: " + url + b"\r\n"
            b"WARC-Date: " + date + b"\r\n"
            b"Content-Type: application/http; msgtype=response\r\n"
            b"Content-Length: " + str(len(payload)).encode() + b"\r\n\r\n")
    return head + payload + b"\r\n\r\n"


def test_warc_to_training_shards(spark, tmp_path):
    boiler = (b"all rights reserved cookies accepted terms of service "
              b"apply to this site always")
    members = []
    for i in range(30):
        body = ("<html><body>" + " ".join(
            f"doc{i}word{j}" for j in range(40)) + " ").encode() \
            + boiler + b"</body></html>"
        members.append(gzip.compress(_record(
            f"http://site.example/page{i}".encode(),
            b"2026-04-01T00:00:00Z", body)))
    # one exact duplicate page under a different URL + one junk page
    members.append(gzip.compress(_record(
        b"http://mirror.example/page0",
        b"2026-04-01T01:00:00Z",
        ("<html><body>" + " ".join(
            f"doc0word{j}" for j in range(40)) + " ").encode()
        + boiler + b"</body></html>")))
    members.append(gzip.compress(_record(
        b"http://junk.example/x", b"2026-04-01T02:00:00Z",
        b"<html><body>!!!</body></html>")))
    (tmp_path / "crawl.warc.gz").write_bytes(b"".join(members))

    # 1. raw archive -> pages table
    pages = warc_to_pages(read_warc(spark, str(tmp_path)))
    pages = pages.withColumn("doc_id", F.xxhash64("url"))
    src = str(tmp_path / "pages")
    pages.select("doc_id", "url", "text").write.parquet(src)
    assert spark.read.parquet(src).count() == 32

    # 2. curation: quality + exact dedup + ExactSubstr span dedup
    curated = str(tmp_path / "curated")
    man = curate(spark, src, curated, min_quality=0.0, min_tokens=5,
                 substring_dedup_k=8)
    c = man["counts"]
    assert c["after_quality_filter"] == 31        # junk page dropped
    assert c["after_exact_dedup"] == 30           # mirror collapsed
    # the boilerplate tail survives in exactly ONE curated doc
    carriers = spark.read.parquet(curated).filter(
        F.col("text").contains("rights reserved cookies")).count()
    assert carriers == 1

    # 3. token-budget training shards
    shards = str(tmp_path / "shards")
    sman = write_training_shards(spark, curated, shards, budget=300)
    assert sman["total_docs"] == c["written"]
    assert sman["n_shards"] >= 2
    per = {s["shard"]: s["tokens"] for s in sman["shards"]}
    # every shard except possibly the last stays within ~budget + one doc
    sizes = [per[k] for k in sorted(per)]
    assert all(sz <= 300 + 60 for sz in sizes)
    man_file = os.path.join(shards, "_shards_manifest.json")
    assert json.load(open(man_file))["budget_tokens"] == 300


def test_wet_to_training_shards(spark, tmp_path):
    """The WET fast path (provider-extracted text) through the same
    curation + sharding stack — no HTML stage at all."""
    from fever_spark.jobs.shard_writer import write_training_shards
    from fever_spark.sources.warc import read_wet

    recs = []
    for i in range(20):
        text = " ".join(f"wet{i}tok{j}" for j in range(40))
        payload = text.encode()
        recs.append(
            b"WARC/1.0\r\nWARC-Type: conversion\r\n"
            b"WARC-Target-URI: http://wet.example/p" + str(i).encode()
            + b"\r\nWARC-Date: 2026-04-01T00:00:00Z\r\n"
            b"Content-Type: text/plain\r\n"
            b"Content-Length: " + str(len(payload)).encode()
            + b"\r\n\r\n" + payload + b"\r\n\r\n")
    # one exact duplicate under another url
    recs.append(recs[0].replace(b"/p0\r\n", b"/mirror0\r\n"))
    (tmp_path / "seg.warc").write_bytes(b"".join(recs))

    pages = read_wet(spark, str(tmp_path)) \
        .withColumn("doc_id", F.xxhash64("url"))
    src = str(tmp_path / "pages")
    pages.select("doc_id", "url", "text").write.parquet(src)
    assert spark.read.parquet(src).count() == 21

    curated = str(tmp_path / "curated")
    man = curate(spark, src, curated, min_quality=0.0, min_tokens=5)
    assert man["counts"]["after_exact_dedup"] == 20   # mirror collapsed

    shards = str(tmp_path / "shards")
    sman = write_training_shards(spark, curated, shards, budget=400)
    assert sman["total_docs"] == man["counts"]["written"]
    assert sman["n_shards"] >= 2
