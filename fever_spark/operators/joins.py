"""As-of join: each left row enriched with the temporally nearest right
row per key — the time-series join Spark lacks as a built-in.

Semantics match pandas ``merge_asof`` / DuckDB ``ASOF JOIN``:
``backward`` (default) pairs each left row with the right row having the
LARGEST right timestamp <= the left timestamp within the same join keys
(ties: a right row at exactly the left timestamp matches); ``forward``
pairs with the smallest right timestamp >= left. Left-join semantics —
unmatched (or out-of-``tolerance``) left rows keep nulls.

Spark-first shape: ONE union + ONE per-key ordered window —

    union(left tagged 1, right tagged 0, right payload as one struct)
      → window PARTITION BY keys ORDER BY (ts, tag)
        last_value(payload, ignorenulls) ROWS UNBOUNDED PRECEDING..CURRENT
      → keep left rows, unpack the struct

The right payload rides the shuffle ONCE as a single struct column; no
range join, no per-row candidate explosion, no driver loop. Scale note:
like every ordered-per-key operator the window partitions by the join
key and window partitions are not AQE-splittable — with a pathologically
hot key (one symbol carrying most of both streams), pass
``coarse_bucket_seconds`` to pre-split by a time bucket: the window then
partitions by (key, bucket) so a hot key fans out across tasks, and each
bucket is seeded with a carried-in "latest right row from any earlier
bucket" (computed by an as-of at BUCKET granularity over per-bucket
summaries — tiny, one row per (key, bucket)) so results are identical to
the unsplit path. For typical key cardinalities (flows, hosts,
instruments) the key domain IS the parallelism and no bucketing is
needed.

Reference behavior anchor: fever's flow-context correlation
(processing/context_collector.go:88-143) pairs events with the state of
their flow "as of" the event — this operator is that pattern generalized
to any keyed timeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "range_join"]


def _secs(df: DataFrame, c: str):
    """Epoch seconds (fractional) for a numeric or timestamp column.
    TIMESTAMP_NTZ (the parquet default) refuses a direct double cast in
    Spark 4 — hop through TIMESTAMP first (session tz is UTC here)."""
    col = F.col(c)
    if dict(df.dtypes).get(c, "").startswith("timestamp_ntz"):
        col = col.cast("timestamp")
    return col.cast("double")


def asof_join(left: DataFrame, right: DataFrame, on: list[str] | str,
              left_ts: str = "ts", right_ts: str | None = None,
              direction: str = "backward",
              tolerance_seconds: float | None = None,
              suffix: str = "_right",
              coarse_bucket_seconds: float | None = None) -> DataFrame:
    """As-of join ``left`` with ``right`` on key columns ``on``.

    Output: every left row + the matched right row's non-key columns
    (renamed with ``suffix`` on collision; the matched right timestamp is
    always present as ``<right_ts><suffix>``). ``tolerance_seconds``
    nulls out matches farther than the tolerance (inclusive).
    ``coarse_bucket_seconds`` enables the hot-key pre-split (see module
    docstring): same results, window partitioned by (key, time bucket)."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward/forward: {direction}")
    on = [on] if isinstance(on, str) else list(on)
    right_ts = right_ts or left_ts
    if coarse_bucket_seconds is not None:
        return _asof_bucketed(left, right, on, left_ts, right_ts,
                              direction, tolerance_seconds, suffix,
                              float(coarse_bucket_seconds))
    return _asof_core(left, right, on, left_ts, right_ts, direction,
                      tolerance_seconds, suffix)


def _asof_core(left: DataFrame, right: DataFrame, on: list[str],
               left_ts: str, right_ts: str, direction: str,
               tolerance_seconds: float | None, suffix: str) -> DataFrame:
    val_cols = [c for c in right.columns if c not in on and c != right_ts]
    payload = F.struct(F.col(right_ts).alias("__ts"),
                       *[F.col(c) for c in val_cols])
    r = right.select(*on,
                     F.col(right_ts).alias("__ord"),
                     F.lit(0).alias("__tag"),
                     payload.alias("__rv"),
                     *[F.lit(None).cast(left.schema[c].dataType).alias(c)
                       for c in left.columns if c not in on])
    l_cols = [c for c in left.columns if c not in on]
    l = left.select(*on,
                    F.col(left_ts).alias("__ord"),
                    F.lit(1).alias("__tag"),
                    F.lit(None).cast(
                        r.schema["__rv"].dataType).alias("__rv"),
                    *l_cols)

    # ORDER (ts asc, tag asc) puts a right row BEFORE the left row at an
    # equal timestamp, so ties match (backward); forward flips the ts
    # order and keeps the tag order so equal-ts rights still precede.
    asc = direction == "backward"
    order = [F.col("__ord").asc() if asc else F.col("__ord").desc(),
             F.col("__tag").asc()]
    w = (Window.partitionBy(*on).orderBy(*order)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    matched = (l.unionByName(r.select(*l.columns))
               .withColumn("__m", F.last("__rv", ignorenulls=True).over(w))
               .filter(F.col("__tag") == 1))

    m = F.col("__m")
    if tolerance_seconds is not None:
        lv, rv = F.col("__ord"), m.getField("__ts")
        if dict(left.dtypes).get(left_ts, "").startswith("timestamp_ntz"):
            lv = lv.cast("timestamp")
        if dict(right.dtypes).get(right_ts, "").startswith("timestamp_ntz"):
            rv = rv.cast("timestamp")
        gap = lv.cast("double") - rv.cast("double")
        if not asc:
            gap = -gap
        m = F.when(gap <= float(tolerance_seconds), m)
    out_ts = right_ts + suffix
    sel = ([F.col(c) for c in on]
           + [F.col(c) for c in l_cols]
           + [m.getField("__ts").alias(out_ts)]
           + [m.getField(c).alias(c + suffix if c in left.columns else c)
              for c in val_cols])
    return matched.select(*sel)


def _asof_bucketed(left: DataFrame, right: DataFrame, on: list[str],
                   left_ts: str, right_ts: str, direction: str,
                   tolerance_seconds: float | None, suffix: str,
                   width: float) -> DataFrame:
    """Hot-key pre-split: run the as-of window partitioned by
    (key, floor(ts/width)) so one pathological key spreads across tasks.

    A left row in bucket b can match an in-bucket right row OR, failing
    that, the nearest right row from an earlier (backward) / later
    (forward) bucket. That fallback is ONE row per (key, left-bucket):
    the per-bucket extreme right row, as-of-joined at bucket granularity
    (cardinality = touched buckets, so the key-only window there is
    trivially small) and injected into the left bucket's partition as a
    synthetic right row with its REAL timestamp — it sorts before/after
    every in-bucket right row by construction, so the core window picks
    it exactly when no in-bucket row qualifies. Result identity with the
    unsplit path is tested under planted 90%-hot-key skew."""
    backward = direction == "backward"
    bucket = lambda df, c: F.floor(_secs(df, c) / F.lit(width)) \
        .cast("long")  # noqa: E731

    r_cols = right.columns
    rb = right.withColumn("__ck", bucket(right, right_ts))
    # the only right row of a bucket that can ever serve a LATER (resp.
    # earlier) bucket's left rows is its max-ts (resp. min-ts) row
    pick = F.max_by if backward else F.min_by
    summaries = rb.groupBy(*on, "__ck").agg(
        pick(F.struct(*[F.col(c) for c in r_cols]),
             F.col(right_ts)).alias("__row"))
    # bucket-granularity as-of: for each (key, left bucket), the nearest
    # STRICTLY earlier/later non-empty right bucket's summary row
    shift = -1 if backward else 1
    lbuckets = (left.select(*on, bucket(left, left_ts).alias("__ck")).distinct()
                .withColumn("__t", F.col("__ck") + F.lit(shift)))
    carry = _asof_core(
        lbuckets, summaries.withColumnRenamed("__ck", "__t"),
        on, left_ts="__t", right_ts="__t", direction=direction,
        tolerance_seconds=None, suffix="_r")
    carried = (carry.filter(F.col("__row").isNotNull())
               .select(*on, "__ck",
                       *[F.col("__row").getField(c).alias(c)
                         for c in r_cols if c not in on]))
    r_all = rb.select(*on, "__ck",
                      *[c for c in r_cols if c not in on]) \
        .unionByName(carried)

    l2 = left.withColumn("__ck", bucket(left, left_ts))
    out = _asof_core(l2, r_all, on + ["__ck"], left_ts, right_ts,
                     direction, tolerance_seconds, suffix)
    return out.drop("__ck")


def range_join(points: DataFrame, intervals: DataFrame, point_col: str,
               start_col: str = "start", end_col: str = "end",
               bucket_width: float | None = None,
               long_interval_factor: float = 64.0) -> DataFrame:
    """Point-in-interval join (``start <= point <= end``, inclusive) as a
    scalable EQUI-join — Spark's own planner turns an inequality join
    into a broadcast nested loop (or worse, a cartesian) which dies at
    scale; this is the bucketing rewrite, the same technique the CIDR
    matcher uses for IP ranges generalized to any numeric axis.

    Shape: intervals explode over the fixed-width buckets they cover and
    points map to exactly ONE bucket, so bucket equality is a plain
    shuffled equi-join (AQE-splittable, skew-handled) and each
    (point, interval) pair arises exactly once; the exact containment
    predicate filters after the match. ``bucket_width`` defaults to the
    p90 interval length (one pass of approxQuantile), so ~90% of
    intervals cover <= 2 buckets. Intervals longer than
    ``long_interval_factor``×width would explode — they are split off
    and BROADCAST to an inequality join instead (they are few by
    construction: longer than the p90), and the two paths union.
    """
    lo, hi, pt = F.col(start_col), F.col(end_col), F.col(point_col)
    if bucket_width is None:
        qs = (intervals.select((hi - lo).cast("double").alias("len"))
              .approxQuantile("len", [0.9], 0.01))
        # empty / all-null intervals yield no quantile — any width gives
        # the right (empty) join result, so don't crash picking one
        bucket_width = max(float(qs[0]), 1e-9) if qs else 1.0
    w = float(bucket_width)

    is_long = (hi - lo) > F.lit(w * float(long_interval_factor))
    short_iv = intervals.filter(~is_long)
    long_iv = intervals.filter(is_long)

    exploded = short_iv.withColumn(
        "__b", F.explode(F.sequence(
            F.floor(lo / F.lit(w)).cast("long"),
            F.floor(hi / F.lit(w)).cast("long"))))
    keyed_pts = points.withColumn(
        "__b", F.floor(pt / F.lit(w)).cast("long"))
    short_hits = (keyed_pts.join(exploded, "__b")
                  .filter((pt >= lo) & (pt <= hi)).drop("__b"))

    long_hits = points.join(
        F.broadcast(long_iv), (pt >= lo) & (pt <= hi), "inner")
    return short_hits.unionByName(long_hits)
