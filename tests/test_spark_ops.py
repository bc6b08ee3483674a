"""Spark integration tests for the build → two-level-merge pipeline.

Key invariant (SURVEY.md §7.1.3): the merged result is identical regardless
of salt factor and input partitioning — merge associativity "in anger".
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from fever_spark.ops import (
    SketchSpec, build_sketches, two_level_merge,
    hll_estimate_col, cms_estimate_col, quantile_col, bloom_contains_col,
)
from fever_spark.ops.build import sketches_to_dict
from fever_spark.ops.merge import merge_to_driver
from fever_spark.sketch import BloomFilter, HyperLogLog


@pytest.fixture(scope="module")
def docs(spark, sf_med):
    return spark.read.parquet(f"{sf_med}/documents.parquet").cache()


@pytest.fixture(scope="module")
def events(spark, sf_med):
    return spark.read.parquet(f"{sf_med}/events.parquet").cache()


def test_hll_per_lang_within_bound(spark, docs):
    specs = [SketchSpec("distinct_docs", "hll", "doc_id", {"p": 12})]
    merged = two_level_merge(build_sketches(docs, ["lang"], specs), ["lang"])
    est = merged.withColumn("est", hll_estimate_col(F.col("state"))) \
        .select("lang", "est").collect()
    exact = {r["lang"]: r["n"] for r in
             docs.groupBy("lang").agg(F.countDistinct("doc_id").alias("n")).collect()}
    bound = 4 * HyperLogLog(p=12).relative_error
    assert len(est) == len(exact)
    for row in est:
        rel = abs(row["est"] - exact[row["lang"]]) / exact[row["lang"]]
        assert rel <= bound, (row["lang"], row["est"], exact[row["lang"]])


def test_merge_invariant_to_salt_and_partitioning(spark, events):
    specs = [
        SketchSpec("users", "hll", "user_id", {"p": 10}),
        SketchSpec("types", "cms", "event_type", {"epsilon": 1e-3, "delta": 1e-2}),
        SketchSpec("members", "bloom", "user_id", {"capacity": 20000, "fpp": 1e-4}),
    ]

    def run(df, salt):
        merged = two_level_merge(build_sketches(df, ["event_type"], specs),
                                 ["event_type"], salt=salt)
        return {(r["event_type"], r["sketch"]): bytes(r["state"])
                for r in merged.collect()}

    base = run(events.repartition(4), salt=4)
    assert run(events.repartition(13), salt=1) == base
    assert run(events.repartition(2), salt=16) == base


def test_cms_estimates_vs_exact(spark, events):
    specs = [SketchSpec("type_counts", "cms", "event_type",
                        {"epsilon": 1e-4, "delta": 1e-3})]
    merged = two_level_merge(build_sketches(events, [], specs), [])
    exact = events.groupBy("event_type").count()
    probed = exact.crossJoin(merged.select("state")) \
        .withColumn("est", cms_estimate_col(F.col("state"), F.col("event_type"))) \
        .select("event_type", "count", "est").collect()
    n_total = events.count()
    for r in probed:
        assert r["est"] >= r["count"]  # CMS never undercounts
        assert r["est"] - r["count"] <= 1e-4 * n_total * 3


def test_kll_and_tdigest_quantiles_vs_exact(spark, events):
    specs = [SketchSpec("kll_value", "kll", "value", {"k": 200}),
             SketchSpec("td_value", "tdigest", "value", {"delta": 200.0})]
    merged = two_level_merge(build_sketches(events, [], specs), [])
    qs = [0.1, 0.5, 0.9]
    rows = {r["sketch"]: r["q"] for r in
            merged.withColumn("q", quantile_col(F.col("state"), qs))
            .select("sketch", "q").collect()}
    vals = np.array([r["value"] for r in events.select("value").collect()])
    svals = np.sort(vals)
    n = len(svals)
    for name, eps in (("kll_value", 2 * 2.296 / 200 ** 0.9), ("td_value", 0.02)):
        for q, est in zip(qs, rows[name]):
            true_rank = np.searchsorted(svals, est, side="right") / n
            assert abs(true_rank - q) <= eps, (name, q, true_rank)


def test_bloom_broadcast_filter_semi_join_parity(spark, docs):
    # Build filter over the doc_ids of one source, probe all docs; with zero
    # FN, might_contain ∧ exact-membership == exact semi-join (fever's
    # broadcast-side membership test, processing/flow_extractor.go:93-97).
    ids = [r["doc_id"] for r in
           docs.filter(F.col("source") == "web").select("doc_id").collect()]
    bf = BloomFilter(capacity=max(len(ids), 1), fpp=1e-6)
    bf.update(np.array(ids, dtype=np.int64))
    bc = spark.sparkContext.broadcast(bf.to_bytes())
    got = docs.filter(bloom_contains_col(bc, F.col("doc_id"))) \
        .select("doc_id").collect()
    got_ids = {r["doc_id"] for r in got}
    assert set(ids) <= got_ids  # zero false negatives
    # FP rate on the complement stays under bound (plus slack)
    n_non = docs.count() - len(ids)
    fps = len(got_ids - set(ids))
    assert fps <= max(3, 3 * 1e-6 * n_non)


def test_global_sketch_no_keys(spark, events):
    specs = [SketchSpec("all_users", "hll", "user_id", {"p": 12})]
    merged = two_level_merge(build_sketches(events, [], specs), [])
    assert merged.count() == 1
    sk = merge_to_driver(merged)
    exact = events.select("user_id").distinct().count()
    assert abs(sk.estimate() - exact) / exact <= 4 * sk.relative_error


def test_sketches_to_dict(spark, events):
    specs = [SketchSpec("u", "hll", "user_id", {"p": 8})]
    merged = two_level_merge(build_sketches(events, ["event_type"], specs),
                             ["event_type"])
    d = sketches_to_dict(merged, ["event_type"])
    assert all(k[-1] == "u" for k in d)
    assert len(d) == events.select("event_type").distinct().count()


def test_build_prunes_columns(spark, sf_med):
    # The stage-1 plan must read only key+value columns (SURVEY.md §4
    # projection-pushdown row). Clear the cache first: a cached full-table
    # read of the same path would otherwise substitute its InMemoryRelation
    # (all columns) into this plan.
    spark.catalog.clearCache()
    fresh = spark.read.parquet(f"{sf_med}/documents.parquet")
    specs = [SketchSpec("d", "hll", "doc_id", {"p": 8})]
    built = build_sketches(fresh, ["lang"], specs)
    plan = built._jdf.queryExecution().executedPlan().toString()
    assert "text" not in plan  # widest column must not be scanned
