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
    on the strata key; the window sort is per-stratum."""
    w = Window.partitionBy(*strata_cols).orderBy(F.col(order_col))
    return (df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= n).drop("_rn"))
