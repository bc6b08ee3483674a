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


class TestAsofBucketed:
    """Hot-key pre-split (coarse_bucket_seconds): identical results to
    the unsplit path under planted 90% skew, and the window stage really
    partitions by (key, bucket) so the hot key fans out over tasks."""

    def _skewed(self, spark, seed=3):
        import numpy as np

        rng = np.random.default_rng(seed)
        syms = np.where(rng.uniform(size=400) < 0.9, "HOT",
                        rng.choice(["a", "b", "c"], size=400))
        trades = [(str(s), float(ts), int(i)) for i, (s, ts) in
                  enumerate(zip(syms, rng.uniform(0, 1000, 400)))]
        qsyms = np.where(rng.uniform(size=300) < 0.9, "HOT",
                         rng.choice(["a", "b", "d"], size=300))
        quotes = [(str(s), float(ts), float(p)) for s, ts, p in
                  zip(qsyms, rng.uniform(0, 1000, 300),
                      rng.uniform(1, 9, 300))]
        t = spark.createDataFrame(trades, "sym string, ts double, qty long")
        q = spark.createDataFrame(quotes, "sym string, ts double, px double")
        return t, q

    @pytest.mark.parametrize("direction", ["backward", "forward"])
    def test_identity_with_unsplit(self, spark, direction):
        t, q = self._skewed(spark)
        plain = asof_join(t, q, on="sym", direction=direction)
        split = asof_join(t, q, on="sym", direction=direction,
                          coarse_bucket_seconds=50.0)
        key = lambda r: (r["sym"], r["ts"], r["qty"])  # noqa: E731
        a = sorted(map(tuple, plain.collect()), key=lambda x: x[:3])
        b = sorted(map(tuple, split.collect()), key=lambda x: x[:3])
        assert plain.columns == split.columns
        assert a == b and len(a) == 400

    def test_identity_with_tolerance(self, spark):
        t, q = self._skewed(spark, seed=5)
        a = sorted(map(tuple, asof_join(
            t, q, on="sym", tolerance_seconds=20.0).collect()))
        b = sorted(map(tuple, asof_join(
            t, q, on="sym", tolerance_seconds=20.0,
            coarse_bucket_seconds=100.0).collect()))
        assert a == b

    def test_window_partitions_by_bucket(self, spark):
        t, q = self._skewed(spark)
        split = asof_join(t, q, on="sym", coarse_bucket_seconds=50.0)
        plan = split._jdf.queryExecution().executedPlan().toString()
        # the main (row-level) window must carry __ck in its partition
        # spec; the hot key alone spans many buckets -> many tasks
        win_lines = [ln for ln in plan.splitlines() if "Window" in ln
                     and "__ord" in ln]
        assert any("__ck" in ln for ln in win_lines), plan
        hot_buckets = (t.filter(F.col("sym") == "HOT")
                       .select((F.floor(F.col("ts") / 50.0)).alias("b"))
                       .distinct().count())
        assert hot_buckets > 4

    def test_empty_right(self, spark):
        t, _ = self._skewed(spark)
        q = t.sparkSession.createDataFrame(
            [], "sym string, ts double, px double")
        out = asof_join(t, q, on="sym", coarse_bucket_seconds=50.0)
        assert out.count() == 400
        assert out.filter(F.col("px").isNotNull()).count() == 0


class TestAsofRandomized:
    """Random corpora vs DuckDB's native ASOF JOIN — both directions,
    with and without the hot-key pre-split, duplicate timestamps and
    sparse keys included (the edge shapes fixed fixtures can miss)."""

    @pytest.mark.parametrize("direction", ["backward", "forward"])
    @pytest.mark.parametrize("seed", [11, 12])
    def test_random_corpus_matches_duckdb(self, spark, direction, seed):
        import numpy as np

        rng = np.random.default_rng(seed)
        nl, nr = 400, 250
        lkeys = rng.integers(0, 12, nl)          # some keys only on left
        rkeys = rng.integers(4, 16, nr)          # some only on right
        # integer-valued ts with heavy duplication → tie cases everywhere
        lts = rng.integers(0, 60, nl).astype(float)
        rts = rng.integers(0, 60, nr).astype(float)
        lpdf = pd.DataFrame({"k": lkeys, "ts": lts, "v": np.arange(nl)})
        rpdf = pd.DataFrame({"k": rkeys, "ts": rts,
                             "payload": np.arange(nr) * 10.0})
        # DuckDB ASOF breaks right-side ties arbitrarily; make the right
        # side tie-free per (k, ts) to keep the oracle deterministic
        rpdf = rpdf.drop_duplicates(["k", "ts"]).reset_index(drop=True)

        left = spark.createDataFrame(lpdf)
        right = spark.createDataFrame(rpdf)
        con = duckdb.connect()
        con.register("l", lpdf)
        con.register("r", rpdf)
        op = ">=" if direction == "backward" else "<="
        expect = sorted(con.execute(f"""
            SELECT l.k, l.ts, l.v, r.ts AS ts_right, r.payload
            FROM l ASOF LEFT JOIN r
              ON l.k = r.k AND l.ts {op} r.ts""").fetchall())

        for bucket in (None, 16.0):
            got = sorted(
                (r["k"], r["ts"], r["v"], r["ts_right"], r["payload"])
                for r in asof_join(left, right, on="k", left_ts="ts",
                                   direction=direction,
                                   coarse_bucket_seconds=bucket).collect())
            assert got == expect, f"bucket={bucket}"


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

    def test_empty_intervals_no_crash(self, spark):
        # auto-width has no quantile to read off an empty frame; the
        # result is correctly empty instead of a ValueError
        p = spark.createDataFrame([(1, 10.0)], "pid long, x double")
        iv = spark.createDataFrame([], "start double, end double, tag string")
        assert range_join(p, iv, "x").count() == 0

    def test_explicit_width_spans_buckets(self, spark):
        p = spark.createDataFrame([(i, float(i)) for i in range(50)],
                                  "pid long, x double")
        iv = spark.createDataFrame([(1, 5.0, 45.0)],
                                   "iid long, start double, end double")
        # width 1 -> interval covers 41 buckets but stays under the
        # long-interval factor: exercised through the exploded path
        n = range_join(p, iv, "x", bucket_width=1.0).count()
        assert n == 41
