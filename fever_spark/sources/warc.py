"""WARC (ISO 28500) reader: raw Common-Crawl-style archives → pages rows.

The north-star input is "an Iceberg table of Common-Crawl-style web
pages"; this module is the step BEFORE that table exists — parsing the
crawler's native WARC output into (url, warc_ts, html, text) rows with a
real, spec-driven parser (no external warc library needed: a WARC record
is a header block, CRLF CRLF, a Content-Length-delimited payload, CRLF
CRLF).

Scale shape: the split unit is the FILE (the standard for WARC — crawls
ship as many ~1 GB .warc.gz members): ``binaryFile`` yields one row per
file, and an iterator ``mapInPandas`` parses records file-by-file, so
parallelism = file count and task memory = one archive + its records.
Multi-member gzip (how Common Crawl concatenates per-record compression)
is handled by looping zlib over ``unused_data``. Malformed records are
skipped, never fatal — the fever input discipline
(input/input_socket.go:94-101 logs-and-skips) applied to archives.
"""

from __future__ import annotations

import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["read_warc", "read_wet", "warc_to_pages"]

_CRLF2 = b"\r\n\r\n"


def _gunzip_members(data: bytes) -> bytes:
    """Decompress (possibly multi-member) gzip; pass through plain bytes."""
    if not data[:2] == b"\x1f\x8b":
        return data
    out = []
    buf = data
    while buf:
        d = zlib.decompressobj(47)  # gzip wrapper
        try:
            out.append(d.decompress(buf))
            out.append(d.flush())
        except zlib.error:
            break  # trailing garbage / truncated member: keep what we have
        buf = d.unused_data
    return b"".join(out)


def parse_warc_records(data: bytes) -> list[dict]:
    """All records of one (decompressed) WARC stream as dicts with keys
    type, url, date, content_type, payload. Spec-driven: header block →
    CRLFCRLF → Content-Length payload → CRLFCRLF. Records that fail to
    parse are skipped."""
    records = []
    pos = 0
    n = len(data)
    while pos < n:
        head_end = data.find(_CRLF2, pos)
        if head_end < 0:
            break
        head = data[pos:head_end]
        if not head.startswith(b"WARC/"):
            # resync: find the next record marker
            nxt = data.find(b"WARC/", pos + 1)
            if nxt < 0:
                break
            pos = nxt
            continue
        headers = {}
        for line in head.split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            if _:
                headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers.get(b"content-length", b""))
        except ValueError:
            pos = head_end + 4
            continue
        body_start = head_end + 4
        body_end = body_start + length
        if body_end > n:
            break  # truncated archive
        records.append({
            "type": headers.get(b"warc-type", b"").decode("ascii", "replace"),
            "url": headers.get(b"warc-target-uri", b"") .decode("utf-8",
                                                                "replace"),
            "date": headers.get(b"warc-date", b"").decode("ascii", "replace"),
            "content_type": headers.get(b"content-type", b"")
            .decode("ascii", "replace"),
            "payload": data[body_start:body_end],
        })
        pos = body_end + 4  # skip the record-terminating CRLFCRLF
    return records


def _http_body(payload: bytes) -> bytes:
    """Strip the HTTP response envelope of an application/http payload."""
    sep = payload.find(_CRLF2)
    return payload[sep + 4:] if sep >= 0 else payload


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """WARC archive files → one row per **response** record:
    (url, warc_ts, content_type, html binary, warc_file)."""
    files = spark.read.format("binaryFile").load(path) \
        .select("path", "content")

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path_, content in zip(pdf["path"], pdf["content"]):
                for r in parse_warc_records(_gunzip_members(bytes(content))):
                    if r["type"] != "response":
                        continue
                    body = (_http_body(r["payload"])
                            if "application/http" in r["content_type"]
                            else r["payload"])
                    rows.append((r["url"], r["date"], r["content_type"],
                                 body, path_))
            yield pd.DataFrame(rows, columns=["url", "warc_date",
                                              "content_type", "html",
                                              "warc_file"])

    parsed = files.mapInPandas(
        parse, schema="url string, warc_date string, content_type string, "
                      "html binary, warc_file string")
    return parsed.withColumn(
        "warc_ts", F.to_timestamp("warc_date")).drop("warc_date")


def warc_to_pages(warc_df: DataFrame) -> DataFrame:
    """Response records → the pages-table shape (url, warc_ts, html,
    text): html bytes decoded as UTF-8 (replacement on errors) and run
    through the library's deterministic text extraction."""
    from fever_spark.functions.text import extract_text

    html_str = F.decode(F.col("html"), "UTF-8")
    return warc_df.select(
        "url", "warc_ts", "html",
        extract_text(html_str).alias("text"))


def read_wet(spark: SparkSession, path: str) -> DataFrame:
    """WET archives (Common Crawl's pre-extracted text: WARC files whose
    ``conversion`` records carry plain UTF-8 text) → (url, warc_ts, text).
    Same parser, different record filter — the fast path when the crawl
    provider already ran extraction."""
    files = spark.read.format("binaryFile").load(path) \
        .select("path", "content")

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for content in pdf["content"]:
                for r in parse_warc_records(_gunzip_members(bytes(content))):
                    if r["type"] != "conversion":
                        continue
                    rows.append((r["url"], r["date"],
                                 r["payload"].decode("utf-8", "replace")))
            yield pd.DataFrame(rows, columns=["url", "warc_date", "text"])

    parsed = files.mapInPandas(
        parse, schema="url string, warc_date string, text string")
    return parsed.withColumn(
        "warc_ts", F.to_timestamp("warc_date")) \
        .select("url", "warc_ts", "text")
