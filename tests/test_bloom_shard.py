"""Partitioned (sharded) Bloom filter: distributed build + both probe paths.

Acceptance mirrors the reference's zero-false-negative invariant
(processing/bloom_handler_test.go:409-427) with sharding as the scale
addition: every true member MUST test positive through every path, and the
two paths must agree with the single unsharded filter's semantics.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from fever_spark.ops.bloom_shard import (
    bloom_semi_join_sharded, build_sharded_ioc_states, collect_shard_map,
    probe_sharded_col, shard_col)
from fever_spark.ops.build import prehash_col

N_SHARDS = 8


@pytest.fixture(scope="module")
def ioc_strings():
    rng = np.random.default_rng(9)
    return [f"bad-host-{i}.example.org" for i in range(2000)]


@pytest.fixture(scope="module")
def shard_states(spark, ioc_strings):
    iocs = spark.createDataFrame([(s,) for s in ioc_strings], "ioc string")
    return build_sharded_ioc_states(iocs, n_shards=N_SHARDS, fpp=1e-6).cache()


class TestShardedBuild:
    def test_one_state_per_shard(self, shard_states):
        rows = shard_states.collect()
        assert len(rows) == N_SHARDS
        assert {r["shard"] for r in rows} == set(range(N_SHARDS))

    def test_shard_assignment_matches_jvm_pmod(self, spark, ioc_strings):
        df = spark.createDataFrame([(s,) for s in ioc_strings[:50]], "ioc string")
        got = df.select("ioc", shard_col(F.col("ioc"), N_SHARDS).alias("s"),
                        F.xxhash64("ioc").alias("h")).collect()
        for r in got:
            assert r["s"] == (r["h"] % N_SHARDS + N_SHARDS) % N_SHARDS


class TestBroadcastDictPath:
    def test_zero_false_negatives_and_bounded_fps(self, spark, ioc_strings,
                                                  shard_states):
        shards_bc = spark.sparkContext.broadcast(collect_shard_map(shard_states))
        members = spark.createDataFrame(
            [(s,) for s in ioc_strings], "probe string")
        non = spark.createDataFrame(
            [(f"clean-host-{i}.example.net",) for i in range(5000)],
            "probe string")
        def hits(df):
            return (df.withColumn("m", probe_sharded_col(
                        shards_bc, N_SHARDS, prehash_col(F.col("probe"))))
                    .filter(F.col("m") != 0).count())
        assert hits(members) == len(ioc_strings)  # zero FN
        assert hits(non) <= 5                     # fpp=1e-6 over 5k probes

    def test_multi_column_bitmask(self, spark, ioc_strings, shard_states):
        shards_bc = spark.sparkContext.broadcast(collect_shard_map(shard_states))
        df = spark.createDataFrame(
            [(ioc_strings[0], "clean.example.net"),
             ("clean2.example.net", ioc_strings[1])],
            "a string, b string")
        got = df.select(probe_sharded_col(
            shards_bc, N_SHARDS,
            prehash_col(F.col("a")), prehash_col(F.col("b"))).alias("m")) \
            .collect()
        assert [r["m"] for r in got] == [1, 2]


class TestCogroupPath:
    def test_semi_join_zero_fn(self, spark, ioc_strings, shard_states):
        probes = spark.createDataFrame(
            [(i, s) for i, s in enumerate(ioc_strings)]
            + [(10_000 + i, f"clean-host-{i}.example.net") for i in range(3000)],
            "pid long, probe string").repartition(8)
        kept = bloom_semi_join_sharded(probes, shard_states, "probe",
                                       N_SHARDS)
        got_ids = {r["pid"] for r in kept.collect()}
        member_ids = set(range(len(ioc_strings)))
        assert member_ids <= got_ids            # zero FN
        assert len(got_ids - member_ids) <= 5   # bounded FP
        # schema passthrough
        assert kept.columns == ["pid", "probe"]

    def test_empty_probe_side(self, spark, shard_states):
        probes = spark.createDataFrame([], "pid long, probe string")
        assert bloom_semi_join_sharded(probes, shard_states, "probe",
                                       N_SHARDS).count() == 0
