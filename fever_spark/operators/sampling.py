"""Deterministic sampling for training-data pipelines.

df.sample() draws per-partition pseudo-randomly — re-partition the input
and the SELECTION CHANGES, which poisons reproducible pipeline runs and
incremental re-processing. These operators make membership a pure function
of the ROW KEY, so the same rows are chosen on any cluster, any partition
layout, any run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_BUCKETS = 1_000_000


def deterministic_sample(df: DataFrame, key_col: str, rate: float,
                         seed: int = 0) -> DataFrame:
    """Keep a row iff xxhash64(key, seed) lands in the first `rate` of the
    bucket space — stable under repartitioning/re-runs, and SPLITTABLE:
    disjoint seed values give independent samples, and rate r1 < r2 with
    the same seed gives nested samples (the r1 sample is a subset of r2's,
    handy for train/dev carve-outs)."""
    if not (0.0 <= rate <= 1.0):
        raise ValueError("rate must be in [0, 1]")
    bucket = F.pmod(F.xxhash64(F.col(key_col), F.lit(seed)), F.lit(_BUCKETS))
    return df.filter(bucket < int(rate * _BUCKETS))


def stratified_take(df: DataFrame, strata_cols: list[str], n: int,
                    order_col: str) -> DataFrame:
    """Exactly min(n, stratum size) rows per stratum, deterministically the
    first n by `order_col` — the exact-quota companion to the hash sample
    (per-lang evaluation slices, balanced debugging samples). One shuffle
    on the strata key; the window sort is per-stratum.

    Scale bound: the window carries the FULL stratum through one task
    (window partitions are not AQE-splittable), so this is for
    evaluation-sized quotas over bounded strata. For corpus-scale strata
    use deterministic_sample / weighted_sample (rate-based, zero-shuffle)
    or weighted_take (TakeOrdered) instead."""
    w = Window.partitionBy(*strata_cols).orderBy(F.col(order_col))
    return (df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= n).drop("_rn"))


def _unit_uniform(col, seed: int):
    """Deterministic uniform in [0, 1): top 53 bits of xxhash64(key, seed)
    as a double mantissa — the same value on any partition layout."""
    return (F.shiftrightunsigned(F.xxhash64(col, F.lit(seed)), 11)
            / F.lit(float(1 << 53)))


def weighted_sample(df: DataFrame, key_col: str, weight_col: str,
                    rate: float = 1.0, seed: int = 0) -> DataFrame:
    """Source-mixing Bernoulli sample: keep each row with probability
    min(1, rate * weight), decided by the deterministic key hash — the
    standard way to apply per-source up/down-weighting factors (e.g.
    wiki x3, CommonCrawl x0.3) in one pass over a mixed corpus. Rows with
    rate * weight >= 1 always survive; null or non-positive weights never
    do (loudly documented rather than silently kept). Repartition-stable
    and splittable by seed, like deterministic_sample. Zero shuffle."""
    u = _unit_uniform(F.col(key_col), seed)
    p = F.least(F.lit(1.0), F.lit(float(rate)) * F.col(weight_col))
    # explicit positive-weight guard: Spark's least() SKIPS nulls, so
    # least(1.0, rate * NULL) is 1.0 — without the filter a null weight
    # would be silently kept with probability 1
    return df.filter((F.col(weight_col) > 0) & (u < p))


def weighted_take(df: DataFrame, key_col: str, weight_col: str, k: int,
                  seed: int = 0) -> DataFrame:
    """Exact-size weighted sample without replacement (Efraimidis &
    Spirakis 2006): rank every row by u^(1/w) with u the deterministic
    key-hash uniform, take the global top k. Inclusion probability is
    proportional to weight; the result is identical on any partition
    layout. Plan shape is TakeOrderedAndProject — per-partition top-k
    merged on the driver, never a global sort. Null / non-positive
    weights are excluded."""
    if k <= 0:
        raise ValueError("k must be positive")
    ranked = (df.filter(F.col(weight_col) > 0)
              .withColumn("_es_rank",
                          F.pow(_unit_uniform(F.col(key_col), seed),
                                F.lit(1.0) / F.col(weight_col))))
    return ranked.orderBy(F.desc("_es_rank")).limit(k).drop("_es_rank")


def capped_take_per_group(df: DataFrame, group_col: str, n: int,
                          key_col: str, seed: int = 0,
                          margin: float = 2.0) -> DataFrame:
    """Exact per-group cap at corpus scale (the per-domain quota of web
    pipelines: keep at most n uniformly-chosen docs per host). A plain
    window would funnel a million-page domain through one task; instead:

    1. per-group counts (map-side-combined aggregation, tiny result
       relative to rows);
    2. Bernoulli PRE-FILTER by the deterministic key hash at rate
       ``margin * n / count`` — each oversized group shrinks to ~margin*n
       expected survivors BEFORE any ordering, groups at-or-under the cap
       pass whole;
    3. exact rank over the pre-filtered set only — the window input per
       group is now O(margin * n), bounded regardless of group size.

    Selection is "the n smallest key hashes per group": uniform,
    repartition-stable, and IDENTICAL to what the naive full window would
    pick as long as the pre-filter keeps at least min(n, count) rows per
    group. The expected survivor count per oversized group is
    max(margin*n, n + 6*sqrt(n) + 12) — the additive floor matters for
    SMALL n, where a bare margin*n would under-fill often (Poisson(2n)
    < n happens 13.5% of the time at n=1); with the floor the miss
    probability is < ~1e-8 per group, i.e. negligible across millions of
    domains, and a miss under-fills rather than biases (detectable by
    comparing output counts to min(n, count)). Rows with a NULL group
    key form their own group, like the naive window would.
    """
    if n <= 0:
        raise ValueError("n must be positive")
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("_gc"))
    u = _unit_uniform(F.col(key_col), seed)
    expected = max(margin * n, n + 6.0 * (n ** 0.5) + 12.0)
    rate = F.least(F.lit(1.0), F.lit(expected) / F.col("_gc"))
    # eqNullSafe: an equality join would silently drop every NULL-group
    # row (malformed hosts etc.); the naive window keeps them as a group
    pre = (df.alias("l")
           .join(counts.alias("r"),
                 F.col(f"l.{group_col}").eqNullSafe(F.col(f"r.{group_col}")))
           .select([F.col(f"l.{c}") for c in df.columns]
                   + [F.col("r._gc")])
           .filter(u < rate))
    # rank by the SAME uniform the pre-filter thresholds on (ordering by
    # raw signed xxhash64 would rank the negative hashes first — exactly
    # the rows the unsigned-derived pre-filter removed)
    w = Window.partitionBy(group_col).orderBy(
        _unit_uniform(F.col(key_col), seed), F.col(key_col))
    return (pre.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= n)
            .select(*df.columns))
