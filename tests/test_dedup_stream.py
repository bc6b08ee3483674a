"""Streaming dedup on a real micro-batch file stream: duplicates arriving
in later batches (and within a batch) are suppressed; first occurrences
pass. Covers the exact (dropDuplicatesWithinWatermark) and the
bounded-memory Bloom-state paths."""

import pandas as pd

from fever_spark.streaming.dedup_stream import (
    bloom_stream_dedup, exact_stream_dedup)


def _write_batch(src, name, rows):
    pdf = pd.DataFrame(rows, columns=["doc_id", "ts", "text"])
    (src / name).write_text(pdf.to_json(orient="records", lines=True))


def _start(spark, src, ckpt, make_query, qname):
    stream = (spark.readStream
              .schema("doc_id long, ts string, text string")
              .json(str(src)))
    out = make_query(stream)
    return (out.writeStream.format("memory").queryName(qname)
            .option("checkpointLocation", str(ckpt))
            .outputMode("append").start())


class TestBloomStreamDedup:
    def test_cross_and_within_batch_dups_suppressed(self, spark, tmp_path):
        src = tmp_path / "src"
        src.mkdir()
        # batch 1: a, b, and a within-batch dup of a
        _write_batch(src, "b1.json", [
            (1, "t1", "page alpha"), (2, "t1", "page beta"),
            (3, "t1", "page alpha")])
        q = _start(spark, src, tmp_path / "ck",
                   lambda s: bloom_stream_dedup(
                       s, n_buckets=4, capacity=1000, fpp=1e-6,
                       ttl_ms=None),
                   "bloomdedup")
        try:
            q.processAllAvailable()
            got = {r["doc_id"] for r in
                   spark.sql("select * from bloomdedup").collect()}
            assert got == {1, 2}          # within-batch dup of alpha gone

            # batch 2: dup of alpha + dup of beta + genuinely new gamma
            _write_batch(src, "b2.json", [
                (4, "t2", "page alpha"), (5, "t2", "page beta"),
                (6, "t2", "page gamma")])
            q.processAllAvailable()
            got = {r["doc_id"] for r in
                   spark.sql("select * from bloomdedup").collect()}
            assert got == {1, 2, 6}       # cross-batch dups suppressed

            # batch 3: dup of gamma arrives again -> still suppressed
            _write_batch(src, "b3.json", [(7, "t3", "page gamma")])
            q.processAllAvailable()
            got = {r["doc_id"] for r in
                   spark.sql("select * from bloomdedup").collect()}
            assert got == {1, 2, 6}
        finally:
            q.stop()

    def test_generational_reset_keeps_accepting(self, spark, tmp_path):
        """Past per-bucket capacity the filter resets instead of
        saturating: new documents keep flowing (no over-drop collapse)."""
        src = tmp_path / "src"
        src.mkdir()
        _write_batch(src, "b1.json",
                     [(i, "t1", f"doc number {i}") for i in range(40)])
        q = _start(spark, src, tmp_path / "ck",
                   lambda s: bloom_stream_dedup(
                       s, n_buckets=1, capacity=10, fpp=1e-4,
                       ttl_ms=None),
                   "bloomgen")
        try:
            q.processAllAvailable()
            n1 = spark.sql("select * from bloomgen").count()
            assert n1 == 40               # all distinct -> all pass
            _write_batch(src, "b2.json",
                         [(100 + i, "t2", f"late doc {i}") for i in range(20)])
            q.processAllAvailable()
            got = spark.sql("select * from bloomgen").count()
            assert got == 60              # resets never block new docs
        finally:
            q.stop()


class TestExactStreamDedup:
    def test_dup_within_watermark_suppressed(self, spark, tmp_path):
        from pyspark.sql import functions as F

        src = tmp_path / "src"
        src.mkdir()
        _write_batch(src, "b1.json", [
            (1, "2026-01-01 00:00:00", "same text"),
            (2, "2026-01-01 00:00:10", "other text")])
        stream = (spark.readStream
                  .schema("doc_id long, ts string, text string")
                  .json(str(src))
                  .withColumn("event_ts", F.to_timestamp("ts")))
        out = exact_stream_dedup(stream, F.xxhash64("text"),
                                 "event_ts", "10 minutes")
        q = (out.writeStream.format("memory").queryName("exactdedup")
             .option("checkpointLocation", str(tmp_path / "ck"))
             .outputMode("append").start())
        try:
            q.processAllAvailable()
            _write_batch(src, "b2.json", [
                (3, "2026-01-01 00:01:00", "same text"),
                (4, "2026-01-01 00:01:30", "third text")])
            q.processAllAvailable()
            got = {r["doc_id"] for r in
                   spark.sql("select * from exactdedup").collect()}
            assert got == {1, 2, 4}
        finally:
            q.stop()


class TestBloomDedupStateFn:
    """Direct unit drive of the state function's TTL branch (the engine
    fires it with hasTimedOut=True; processAllAvailable can't — see
    session_collector_stream's docstring)."""

    class _FakeState:
        def __init__(self):
            self.exists = False
            self.hasTimedOut = True
            self.removed = False

        def remove(self):
            self.removed = True

    def test_timeout_removes_state_and_emits_nothing(self):
        from pyspark.sql import types as T
        from fever_spark.streaming.dedup_stream import _make_bloom_dedup_fn

        schema = T.StructType([T.StructField("doc_id", T.LongType()),
                               T.StructField("_fp", T.LongType())])
        fn = _make_bloom_dedup_fn(schema, capacity=100, fpp=1e-4,
                                  ttl_ms=1000)
        state = self._FakeState()
        out = list(fn(("bucket",), iter([]), state))
        assert out == [] and state.removed
