"""As-of join (operators/joins.py) vs DuckDB's native ASOF JOIN, plus
ties, tolerance, forward direction, unmatched rows, column collisions."""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from fever_spark.operators.joins import asof_join, range_join

QUOTES = [  # key, ts(sec), px
    ("aapl", 1, 10.0), ("aapl", 4, 40.0), ("aapl", 6, 60.0),
    ("msft", 2, 20.0), ("msft", 9, 90.0),
]
TRADES = [  # key, ts(sec), qty
    ("aapl", 2, 100), ("aapl", 4, 200), ("aapl", 5, 300),
    ("msft", 1, 400), ("msft", 9, 500), ("goog", 3, 600),
]


@pytest.fixture(scope="module")
def frames(spark):
    t = spark.createDataFrame(
        [(k, float(ts), q) for k, ts, q in TRADES],
        "sym string, ts double, qty long")
    q = spark.createDataFrame(
        [(k, float(ts), p) for k, ts, p in QUOTES],
        "sym string, ts double, px double")
    return t, q


def duck_asof(direction="backward"):
    con = duckdb.connect()
    con.register("t", pd.DataFrame(TRADES, columns=["sym", "ts", "qty"]))
    con.register("q", pd.DataFrame(QUOTES, columns=["sym", "ts", "px"]))
    op = ">=" if direction == "backward" else "<="
    return con.execute(f"""
        SELECT t.sym, t.ts, t.qty, q.ts AS ts_right, q.px
        FROM t ASOF LEFT JOIN q
          ON t.sym = q.sym AND t.ts {op} q.ts
        ORDER BY t.sym, t.ts""").fetchall()


class TestAsofJoin:
    def _collect(self, df):
        return [(r["sym"], r["ts"], r["qty"], r["ts_right"], r["px"])
                for r in df.orderBy("sym", "ts").collect()]

    def test_backward_matches_duckdb(self, spark, frames):
        t, q = frames
        got = self._collect(asof_join(t, q, on="sym"))
        assert got == duck_asof("backward")
        # spot semantics: trade at ts=4 matches quote at EXACTLY ts=4
        by = {(s, ts): (tr, px) for s, ts, _, tr, px in got}
        assert by[("aapl", 4.0)] == (4.0, 40.0)
        assert by[("goog", 3.0)] == (None, None)   # keyless: null match

    def test_forward_matches_duckdb(self, spark, frames):
        t, q = frames
        got = self._collect(asof_join(t, q, on="sym",
                                      direction="forward"))
        assert got == duck_asof("forward")

    def test_tolerance_nulls_stale_matches(self, spark, frames):
        t, q = frames
        got = self._collect(asof_join(t, q, on="sym",
                                      tolerance_seconds=1.0))
        by = {(s, ts): (tr, px) for s, ts, _, tr, px in got}
        assert by[("aapl", 2.0)] == (1.0, 10.0)    # gap 1 kept
        assert by[("aapl", 5.0)] == (4.0, 40.0)    # gap 1 kept
        assert by[("msft", 9.0)] == (9.0, 90.0)    # gap 0 kept
        # DuckDB replica with a tolerance filter
        con = duckdb.connect()
        con.register("t", pd.DataFrame(TRADES, columns=["sym", "ts", "qty"]))
        con.register("q", pd.DataFrame(QUOTES, columns=["sym", "ts", "px"]))
        expect = con.execute("""
            SELECT t.sym, t.ts, t.qty,
                   CASE WHEN t.ts - q.ts <= 1 THEN q.ts END AS ts_right,
                   CASE WHEN t.ts - q.ts <= 1 THEN q.px END AS px
            FROM t ASOF LEFT JOIN q ON t.sym = q.sym AND t.ts >= q.ts
            ORDER BY t.sym, t.ts""").fetchall()
        assert got == expect

    def test_column_collision_gets_suffix(self, spark, frames):
        t, q = frames
        q2 = q.withColumnRenamed("px", "qty")   # collide with left's qty
        out = asof_join(t, q2, on="sym")
        assert "qty" in out.columns and "qty_right" in out.columns
        [r] = out.filter((F.col("sym") == "aapl")
                         & (F.col("ts") == 5.0)).collect()
        assert r["qty"] == 300 and r["qty_right"] == 40.0

    def test_timestamp_typed_ts(self, spark):
        t = spark.createDataFrame(
            [("k", "2026-01-01 00:00:05")], "sym string, s string") \
            .select("sym", F.to_timestamp("s").alias("ts"))
        q = spark.createDataFrame(
            [("k", "2026-01-01 00:00:03", 1.5),
             ("k", "2026-01-01 00:00:06", 9.9)],
            "sym string, s string, px double") \
            .select("sym", F.to_timestamp("s").alias("ts"), "px")
        [r] = asof_join(t, q, on="sym", tolerance_seconds=10).collect()
        assert r["px"] == 1.5
        [r2] = asof_join(t, q, on="sym", tolerance_seconds=1).collect()
        assert r2["px"] is None


class TestRangeJoin:
    """Bucketed point-in-interval join vs a DuckDB inequality join —
    random data, boundary inclusivity, long-interval broadcast path."""

    def test_random_matches_duckdb(self, spark):
        import numpy as np

        rng = np.random.default_rng(11)
        pts = [(int(i), float(v)) for i, v in
               enumerate(rng.uniform(0, 1000, 300))]
        ivs = []
        for i in range(80):
            lo = float(rng.uniform(0, 990))
            ivs.append((int(i), lo, lo + float(rng.uniform(0.1, 30))))
        ivs.append((900, 0.0, 1000.0))      # one giant interval -> broadcast
        p = spark.createDataFrame(pts, "pid long, x double")
        iv = spark.createDataFrame(ivs, "iid long, start double, end double")
        got = sorted((r["pid"], r["iid"]) for r in
                     range_join(p, iv, "x").collect())
        con = duckdb.connect()
        con.register("p", pd.DataFrame(pts, columns=["pid", "x"]))
        con.register("iv", pd.DataFrame(ivs,
                                        columns=["iid", "start", "end"]))
        expect = sorted(map(tuple, con.execute("""
            SELECT pid, iid FROM p JOIN iv
            ON p.x BETWEEN iv.start AND iv.end""").fetchall()))
        assert got == expect and len(got) > 300  # giant interval hits all

    def test_boundaries_inclusive_and_no_dups(self, spark):
        p = spark.createDataFrame([(1, 10.0), (2, 20.0), (3, 15.0)],
                                  "pid long, x double")
        iv = spark.createDataFrame([(7, 10.0, 20.0)],
                                   "iid long, start double, end double")
        got = sorted((r["pid"], r["iid"]) for r in
                     range_join(p, iv, "x", bucket_width=3.0).collect())
        assert got == [(1, 7), (2, 7), (3, 7)]   # both ends inclusive, 1x

    def test_explicit_width_spans_buckets(self, spark):
        p = spark.createDataFrame([(i, float(i)) for i in range(50)],
                                  "pid long, x double")
        iv = spark.createDataFrame([(1, 5.0, 45.0)],
                                   "iid long, start double, end double")
        # width 1 -> interval covers 41 buckets but stays under the
        # long-interval factor: exercised through the exploded path
        n = range_join(p, iv, "x", bucket_width=1.0).count()
        assert n == 41
