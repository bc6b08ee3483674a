"""Streaming JVM sketch path (fever_spark/streaming/jvm_stream.py).

Pins: (a) windowed hll/cms states built INSIDE the streaming aggregation
state store match the batch JVM engine's estimates cell-for-cell; (b)
append-mode emission is exactly-once per window ACROSS a stop/resume from
checkpoint (no duplicates, no losses); (c) the long canonical output
shape matches jvm_sketches; (d) validation fails loudly. Reference
behavior: fever's flow aggregator window flush
(processing/flow_aggregator.go:111-170) — one final row per window.
"""

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from fever_spark.ops import jvm_cms_estimate, jvm_hll_estimate_col, jvm_sketches
from fever_spark.ops.build import SketchSpec
from fever_spark.streaming import (jvm_windowed_sketches_stream,
                                   start_jvm_sketch_sink)
from fever_spark.sources.synth import synth_pages

HLL = SketchSpec("u", "hll", "url", {"p": 12})
CMS = SketchSpec("toks", "cms", "lang", {"epsilon": 1e-3, "delta": 1e-3})


def _day_batches(n=3000):
    """synth pages split into per-day file drops + a far-future pusher row
    that advances the watermark past every real window."""
    pdf = synth_pages(n)
    day = pdf["warc_ts"].dt.floor("D")
    days = sorted(day.unique())
    drops = [pdf[day == d] for d in days]
    pusher = pdf.iloc[[0]].copy()
    pusher["warc_ts"] = pdf["warc_ts"].max() + pd.Timedelta(days=3)
    return drops, pusher


def _drain(spark, schema, src, out, ckpt):
    stream = spark.readStream.schema(schema).parquet(src + "/*")
    agg = jvm_windowed_sketches_stream(stream, "warc_ts", "1 day", ["lang"],
                                       [HLL, CMS], watermark="1 hour")
    q = start_jvm_sketch_sink(agg, out, ckpt, available_now=True)
    q.awaitTermination(180)
    return spark.read.parquet(out)


def _batch_expected(spark, pdf):
    df = spark.createDataFrame(pdf).withColumn(
        "w", F.window("warc_ts", "1 day"))
    wide = df.withColumn("window_start", F.col("w.start")) \
             .withColumn("window_end", F.col("w.end")).drop("w")
    return jvm_sketches(wide, ["window_start", "window_end", "lang"],
                        [HLL, CMS])


class TestJvmStream:
    def test_matches_batch_and_resumes_exactly_once(self, spark, tmp_path):
        drops, pusher = _day_batches()
        src, out, ckpt = [str(tmp_path / x) for x in ("src", "out", "ck")]
        os.makedirs(src)
        schema = spark.createDataFrame(drops[0]).schema

        # run 1: all but the last day's drop
        for i, d in enumerate(drops[:-1]):
            spark.createDataFrame(d).write.parquet(f"{src}/b{i}")
        got1 = _drain(spark, schema, src, out, ckpt).collect()
        assert len(got1) > 0  # watermark closed at least the early windows

        # run 2 resumes from the same checkpoint: last day + pusher closes
        # every real window
        spark.createDataFrame(drops[-1]).write.parquet(f"{src}/b_last")
        spark.createDataFrame(pusher).write.parquet(f"{src}/b_push")
        got2_df = _drain(spark, schema, src, out, ckpt)
        got2 = got2_df.collect()

        # exactly-once: no (window, lang, sketch) emitted twice, run-2
        # additions disjoint from run 1
        cells = [(r["window_start"], r["lang"], r["sketch"]) for r in got2]
        assert len(cells) == len(set(cells))
        cells1 = {(r["window_start"], r["lang"], r["sketch"]) for r in got1}
        assert cells1 < set(cells)

        # no losses: every real (day, lang) cell present for both sketches
        # (the pusher's own window stays OPEN — watermark sits 1h behind
        # it — so it is exactly the one cell append mode must NOT emit)
        all_pdf = pd.concat(drops + [pusher], ignore_index=True)
        real_pdf = pd.concat(drops, ignore_index=True)
        want_days = {(d.to_pydatetime(), lang)
                     for d, lang in zip(real_pdf["warc_ts"].dt.floor("D"),
                                        real_pdf["lang"])}
        for sk in ("u", "toks"):
            got_cells = {(r["window_start"], r["lang"])
                         for r in got2 if r["sketch"] == sk}
            assert got_cells == want_days

        # estimates match the batch JVM engine cell-for-cell (HLL registers
        # and CMS counters are order-independent, so equality is exact)
        exp = _batch_expected(spark, all_pdf)
        exp_hll = {(r["window_start"], r["lang"]): r["est"] for r in
                   exp.filter(F.col("sketch") == "u")
                   .withColumn("est", jvm_hll_estimate_col(F.col("state")))
                   .collect()}
        for r in got2:
            if r["sketch"] == "u":
                est = spark.createDataFrame(
                    [(bytearray(r["state"]),)], "state binary").select(
                    jvm_hll_estimate_col(F.col("state")).alias("e")
                ).collect()[0]["e"]
                assert est == exp_hll[(r["window_start"], r["lang"])]

        exp_cms = {(r["window_start"], r["lang"]): bytes(r["state"]) for r in
                   exp.filter(F.col("sketch") == "toks").collect()}
        langs = sorted(all_pdf["lang"].unique())
        for r in got2:
            if r["sketch"] == "toks":
                want = jvm_cms_estimate(
                    spark, exp_cms[(r["window_start"], r["lang"])], langs)
                got = jvm_cms_estimate(spark, bytes(r["state"]), langs)
                assert got == want

    def test_batch_df_rejected(self, spark):
        df = spark.range(3).withColumn("ts", F.current_timestamp())
        with pytest.raises(ValueError, match="streaming"):
            jvm_windowed_sketches_stream(df, "ts", "1 day", [], [HLL])

    def test_unsupported_kind_rejected(self, spark, tmp_path):
        src = str(tmp_path / "s")
        os.makedirs(src)
        stream = spark.readStream.schema("ts timestamp, v string") \
            .parquet(src + "/*")
        with pytest.raises(ValueError, match="no JVM aggregate"):
            jvm_windowed_sketches_stream(
                stream, "ts", "1 day", [],
                [SketchSpec("k", "kll", "v", {})])
        with pytest.raises(ValueError, match="at least one spec"):
            jvm_windowed_sketches_stream(stream, "ts", "1 day", [], [])


class TestJvmStreamKillResume:
    def test_mid_flight_stop_then_drain_is_exactly_once(self, spark, tmp_path):
        """Harsher than the two-drain resume above: a live processingTime
        query is stop()ped MID-FLIGHT (no graceful availableNow finish),
        then an availableNow drain resumes from the same checkpoint. The
        file sink's _spark_metadata commit log + the state store must
        yield no duplicate cells, no losses, and batch-equal estimates —
        wherever the kill landed."""
        drops, pusher = _day_batches(2000)
        src, out, ckpt = [str(tmp_path / x) for x in ("src", "out", "ck")]
        os.makedirs(src)
        schema = spark.createDataFrame(drops[0]).schema
        for i, d in enumerate(drops):
            spark.createDataFrame(d).write.parquet(f"{src}/b{i}")
        spark.createDataFrame(pusher).write.parquet(f"{src}/b_push")

        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", 1).parquet(src + "/*"))
        agg = jvm_windowed_sketches_stream(stream, "warc_ts", "1 day",
                                           ["lang"], [HLL],
                                           watermark="1 hour")
        # the documented live-cadence path of start_jvm_sketch_sink
        q = start_jvm_sketch_sink(agg, out, ckpt, trigger_seconds=0.1)
        # let a few 1-file triggers land, then kill mid-flight
        import time as _t
        deadline = _t.time() + 60
        while _t.time() < deadline:
            p = q.lastProgress
            if p and p["batchId"] >= 2:
                break
            _t.sleep(0.2)
        q.stop()

        # resuming the checkpoint with a DIFFERENT spec list must fail
        # loudly (state-store value schema check), never mis-merge state
        from pyspark.errors.exceptions.captured import StreamingQueryException
        with pytest.raises(StreamingQueryException):
            _drain(spark, schema, src, out, ckpt)  # [HLL, CMS] != [HLL]

        stream2 = spark.readStream.schema(schema).parquet(src + "/*")
        agg2 = jvm_windowed_sketches_stream(stream2, "warc_ts", "1 day",
                                            ["lang"], [HLL],
                                            watermark="1 hour")
        q2 = start_jvm_sketch_sink(agg2, out, ckpt, available_now=True)
        q2.awaitTermination(180)
        got = spark.read.parquet(out).collect()
        cells = [(r["window_start"], r["lang"]) for r in got]
        assert len(cells) == len(set(cells))  # no duplicates across the kill
        real = pd.concat(drops, ignore_index=True)
        want = {(d.to_pydatetime(), lang) for d, lang in
                zip(real["warc_ts"].dt.floor("D"), real["lang"])}
        assert set(cells) == want             # no losses either
        exp = {(r["window_start"], r["lang"]): r["e"] for r in
               _batch_expected(spark, pd.concat(drops + [pusher],
                                                ignore_index=True))
               .filter(F.col("sketch") == "u")
               .withColumn("e", jvm_hll_estimate_col(F.col("state")))
               .collect()}
        states = spark.createDataFrame(
            [(r["window_start"], r["lang"], bytearray(r["state"]))
             for r in got],
            "window_start timestamp, lang string, state binary")
        for r in states.withColumn(
                "e", jvm_hll_estimate_col(F.col("state"))).collect():
            assert r["e"] == exp[(r["window_start"], r["lang"])]


class TestJvmSessionStream:
    def test_sessions_match_batch_session_grouping(self, spark, tmp_path):
        """Session-gap windows with JVM sketch state: closed sessions'
        estimates equal a BATCH session_window groupBy over the same rows
        (session merging + hll registers are both order-independent); a
        session still inside watermark+gap reach stays open."""
        from fever_spark.streaming.jvm_stream import jvm_session_sketches_stream

        rows = [("u1", 0.0, "a"), ("u1", 10.0, "b"), ("u1", 400.0, "c"),
                ("u2", 5.0, "a"), ("u2", 2000.0, "d"), ("u2", 2001.0, "e"),
                ("u2", 2002.0, "d")]
        df = spark.createDataFrame(
            rows, "user string, off double, item string").select(
            "user",
            F.timestamp_seconds(F.lit(1700000000) + F.col("off")).alias("ts"),
            "item")
        src, out, ckpt = [str(tmp_path / x) for x in ("src", "out", "ck")]
        os.makedirs(src)
        df.write.parquet(src + "/b0")
        stream = spark.readStream.schema(df.schema).parquet(src + "/*")
        agg = jvm_session_sketches_stream(
            stream, "ts", "5 minutes", ["user"],
            [SketchSpec("items", "hll", "item", {"p": 12})],
            watermark="1 minute")
        q = start_jvm_sketch_sink(agg, out, ckpt)
        q.awaitTermination(120)
        got = {(r["user"], r["session_start"]):
               (r["session_end"], bytes(r["state"]))
               for r in spark.read.parquet(out).collect()}

        batch = {(r["user"], r["sw"]["start"]): (r["sw"]["end"], r["e"])
                 for r in df.groupBy(
                     F.session_window("ts", "5 minutes").alias("sw"), "user")
                 .agg(F.hll_sketch_agg("item", 12).alias("state"))
                 .withColumn("e", jvm_hll_estimate_col(F.col("state")))
                 .collect()}
        # u2's last burst (offs 2000-2002, max event time 2002) stays OPEN:
        # watermark = 2002-60s < session end 2002+300s
        closed = {k for k in batch
                  if batch[k][0].timestamp() <= 1700000000 + 2002 - 60}
        assert set(got) == closed and len(closed) == 3
        for k, (end, state) in got.items():
            est = spark.createDataFrame([(bytearray(state),)],
                                        "state binary").select(
                jvm_hll_estimate_col(F.col("state")).alias("e")
            ).collect()[0]["e"]
            assert (end, est) == batch[k], k

    def test_validation(self, spark, tmp_path):
        from fever_spark.streaming.jvm_stream import jvm_session_sketches_stream

        src = str(tmp_path / "s")
        os.makedirs(src)
        with pytest.raises(ValueError, match="streaming"):
            jvm_session_sketches_stream(
                spark.range(1).withColumn("ts", F.current_timestamp()),
                "ts", "5 minutes", [], [HLL])
        stream = spark.readStream.schema("ts timestamp, v string") \
            .parquet(src + "/*")
        with pytest.raises(ValueError, match="at least one spec"):
            jvm_session_sketches_stream(stream, "ts", "5 minutes", [], [])
