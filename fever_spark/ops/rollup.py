"""Hypertable-style multi-resolution rollups over sketch states.

The continuous-aggregate pattern (TimescaleDB hypertables, druid rollups):
keep time-bucketed aggregates at a fine resolution and serve coarser
resolutions by combining the fine buckets — never rescanning raw data.
With MERGEABLE sketch states this is exact by construction: an hourly
HLL is the register-wise merge of its minutes' HLLs, so the whole rollup
ladder (minute → hour → day) costs one raw-data scan at the finest level
plus state-only merges upward, each O(groups × state_size).

fever's analog is the timer-flushed aggregation maps
(processing/flow_aggregator.go:80-109) — one fixed resolution, partials
merged associatively on flush; this generalizes the same associativity
into a resolution ladder.

Merge-identity guarantee: for the lattice sketches (HLL max-registers,
CMS counter-sums, Bloom ORs, KMV bottom-k) the rolled-up state is
BYTE-IDENTICAL to building directly at the coarse resolution (tested);
for the compaction sketches (KLL, t-digest) merge order affects the
internal layout, so rollup equals direct build only within the published
error bound — which the estimate gates check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fever_spark.ops.build import SketchSpec, build_sketches
from fever_spark.ops.merge import two_level_merge

__all__ = ["rollup_sketches"]

WINDOW_COL = "window_start"


def rollup_sketches(df: DataFrame, ts_col: str, keys: list[str],
                    specs: list[SketchSpec],
                    resolutions: list[str],
                    salt: int | None = None) -> dict[str, DataFrame]:
    """Build the rollup ladder: one sketch-state frame per resolution,
    keyed by (keys..., window_start, sketch).

    ``resolutions`` is ordered finest → coarsest (e.g. ``["1 hour",
    "1 day"]``); every coarser level MUST be a multiple of the finest
    (the window-of-windows truncation assumes aligned buckets — the
    hypertable contract). Raw data is scanned exactly once, at the
    finest level; every other level is a state-only two_level_merge."""
    if not resolutions:
        raise ValueError("need at least one resolution")
    # same aligned-buckets contract as the JVM ladder, now VALIDATED
    # (was documented-only): unaligned rungs silently mis-bucket
    from fever_spark.ops.jvm_sketch import validate_resolution_ladder

    validate_resolution_ladder(resolutions)
    finest = resolutions[0]
    fine = (df.withColumn(WINDOW_COL,
                          F.window(F.col(ts_col), finest)["start"]))
    ladder: dict[str, DataFrame] = {}
    states = two_level_merge(
        build_sketches(fine, keys + [WINDOW_COL], specs),
        keys + [WINDOW_COL], salt=salt)
    ladder[finest] = states

    prev = states
    for res in resolutions[1:]:
        coarser = prev.withColumn(
            WINDOW_COL, F.window(F.col(WINDOW_COL), res)["start"])
        # upward merges see <= (coarse/fine ratio) already-merged states
        # per key — skew-free by construction, so salt=1 (a single
        # shuffle) replaces the two-level tree: measured 2.0s -> sub-second
        # on the 336-state day level of the bench ladder
        prev = two_level_merge(coarser, keys + [WINDOW_COL], salt=1)
        ladder[res] = prev
    return ladder
