"""Load-shedding sink: fever's in-buffer-drop overflow policy
(input/input_socket.go:81-89 — drop + count, never block)."""

import time

import pytest
from pyspark.sql import functions as F

from fever_spark.streaming.load_shed import (
    BatchRecord, LoadSheddingSink, admission_controlled_file_stream)


class _Collector:
    def __init__(self):
        self.batches = []

    def __call__(self, df, batch_id):
        self.batches.append((batch_id, df.count()))


class TestLoadSheddingSink:
    def test_under_budget_passes_through(self, spark):
        down = _Collector()
        shed = LoadSheddingSink(max_rows_per_batch=1000, downstream=down)
        df = spark.range(100).withColumn("v", F.col("id") * 2)
        shed(df, 0)
        assert down.batches == [(0, 100)]
        assert shed.metrics == {"ingested_rows": 100, "dropped_rows": 0,
                                "batches": 1}

    def test_overflow_drops_and_counts(self, spark):
        down = _Collector()
        shed = LoadSheddingSink(max_rows_per_batch=1000, downstream=down)
        df = spark.range(10_000).withColumn("v", F.col("id") * 2)
        shed(df, 7)
        [(bid, kept)] = down.batches
        assert bid == 7
        # hash-threshold shedding: ~cap rows kept, everything accounted for
        assert 700 <= kept <= 1300
        rec = shed.history[0]
        assert rec.arrived == 10_000 and rec.kept + rec.dropped == 10_000
        assert shed.dropped_rows == rec.dropped > 0

    def test_shedding_is_deterministic_on_replay(self, spark):
        """An at-least-once replay of the same batch must shed the SAME
        rows — downstream idempotence depends on it."""
        df = spark.range(5_000).withColumn("v", F.col("id") * 3)
        seen = []

        def capture(kept_df, _):
            seen.append(frozenset(r["id"] for r in kept_df.collect()))

        shed = LoadSheddingSink(max_rows_per_batch=500, downstream=capture)
        shed(df, 0)
        shed(df, 0)  # replay
        assert seen[0] == seen[1]

    def test_empty_keep_skips_downstream(self, spark):
        down = _Collector()
        shed = LoadSheddingSink(max_rows_per_batch=1000, downstream=down)
        shed(spark.range(0), 0)
        assert down.batches == [] and shed.metrics["batches"] == 1


class TestStreamingIntegration:
    def test_overflowing_stream_sheds_and_finishes(self, spark, tmp_path):
        """Drive a real micro-batch stream through the sink: admission at
        the source (one file per trigger) + shedding at the sink."""
        src = str(tmp_path / "src")
        ckpt = str(tmp_path / "ckpt")
        big = spark.range(3_000).withColumn("payload",
                                            F.concat(F.lit("ev"), "id"))
        big.coalesce(1).write.parquet(src)

        down = _Collector()
        shed = LoadSheddingSink(max_rows_per_batch=200, downstream=down)
        stream = admission_controlled_file_stream(
            spark, src, big.schema, max_files_per_trigger=1)
        q = (stream.writeStream.foreachBatch(shed)
             .option("checkpointLocation", ckpt).start())
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        assert shed.metrics["batches"] >= 1
        assert shed.ingested_rows + shed.dropped_rows == 3_000
        assert shed.dropped_rows > 0  # the burst genuinely overflowed
        assert sum(n for _, n in down.batches) == shed.ingested_rows


class TestReviewRegressions:
    def test_replay_does_not_double_count(self, spark):
        down = _Collector()
        shed = LoadSheddingSink(max_rows_per_batch=100, downstream=down)
        df = spark.range(500).withColumn("v", F.col("id"))
        shed(df, 0)
        shed(df, 0)  # at-least-once replay of the same batch id
        assert shed.metrics["batches"] == 1
        assert shed.ingested_rows + shed.dropped_rows == 500

    def test_tiny_budget_still_admits_rows(self, spark):
        """threshold must never floor to zero on extreme overflow."""
        down = _Collector()
        shed = LoadSheddingSink(max_rows_per_batch=1, downstream=down)
        df = spark.range(50_000).withColumn("v", F.col("id"))
        shed(df, 0)
        rec = shed.history[0]
        assert rec.arrived == 50_000
        # max(1, int(p*BUCKETS)) keeps the admission probability positive;
        # with 50k rows and threshold>=1/1e6 some rows may or may not land
        # in bucket 0 — the invariant is accounting, not a kept minimum
        assert rec.kept + rec.dropped == 50_000


class TestBoundedAccounting:
    """Round-3 ADVICE fix: per-batch records are a bounded dict keyed by
    batch_id with O(1) incremental counters — not an ever-growing list
    re-summed every batch."""

    def _mini(self, spark, n):
        return spark.range(n).toDF("v")

    def test_counters_incremental_and_replay_idempotent(self, spark):
        from fever_spark.streaming.load_shed import LoadSheddingSink

        seen = []
        shed = LoadSheddingSink(max_rows_per_batch=50,
                                downstream=lambda df, b: seen.append(b))
        shed(self._mini(spark, 30), 0)
        shed(self._mini(spark, 200), 1)
        ing1, drop1 = shed.ingested_rows, shed.dropped_rows
        shed(self._mini(spark, 200), 1)   # at-least-once replay
        assert (shed.ingested_rows, shed.dropped_rows) == (ing1, drop1)
        assert shed.metrics["batches"] == 2
        assert shed.ingested_rows + shed.dropped_rows == 230

    def test_history_bounded_counters_cumulative(self, spark):
        from fever_spark.streaming.load_shed import LoadSheddingSink

        shed = LoadSheddingSink(max_rows_per_batch=100,
                                downstream=lambda df, b: None,
                                keep_last=3)
        for b in range(6):
            shed(self._mini(spark, 10), b)
        assert len(shed.records) == 3                 # bounded
        assert [r.batch_id for r in shed.history] == [3, 4, 5]
        assert shed.ingested_rows == 60               # counters never truncate
