"""CMSTopK kernel + Spark pipeline gates.

The reference role is UnicornAggregator's top-talker report
(/root/reference/processing/unicorn_aggregator.go:95-140); the sketch gate is
"CMS estimate + exact top-k verify" (SURVEY.md §2.6): the sketch's reported
top-k must equal the exact top-k on skewed data, and estimates must never
undercount (CMS one-sided error).
"""

import collections

import numpy as np
import pytest
from pyspark.sql import functions as F

from fever_spark.ops import SketchSpec, build_sketches, heavy_hitters_col, two_level_merge
from fever_spark.sketch import CMSTopK, sketch_from_bytes


def zipf_stream(n=200_000, n_keys=2000, s=1.2, seed=1):
    rng = np.random.default_rng(seed)
    w = 1.0 / np.arange(1, n_keys + 1) ** s
    w /= w.sum()
    return np.array([f"host{i}" for i in rng.choice(n_keys, size=n, p=w)],
                    dtype=object)


@pytest.fixture(scope="module")
def stream():
    return zipf_stream()


@pytest.fixture(scope="module")
def exact_top(stream):
    c = collections.Counter(stream.tolist())
    return c, [k for k, _ in sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))]


class TestCMSTopKKernel:
    def test_topk_matches_exact_and_never_undercounts(self, stream, exact_top):
        counts, order = exact_top
        tk = CMSTopK(epsilon=1e-4, delta=1e-3, track=256)
        for chunk in np.array_split(stream, 17):
            tk.update(chunk)
        hh = tk.heavy_hitters(20)
        assert [i for i, _ in hh] == order[:20]
        assert all(est >= counts[i] for i, est in hh)  # one-sided error
        assert all(est - counts[i] <= tk.error_bound() for i, est in hh)

    def test_merge_order_stable_topk(self, stream, exact_top):
        _, order = exact_top
        parts = np.array_split(stream, 8)

        def build(perm):
            acc = None
            for i in perm:
                s = CMSTopK(epsilon=1e-4, delta=1e-3, track=256)
                s.update(parts[i])
                acc = s if acc is None else acc.merge(s)
            return acc

        tops = [build(p).heavy_hitters(20)
                for p in ([*range(8)], [*reversed(range(8))], [3, 1, 7, 0, 5, 2, 6, 4])]
        assert tops[0] == tops[1] == tops[2]
        assert [i for i, _ in tops[0]] == order[:20]
        # weight conservation under any merge order
        assert build(range(8)).total == len(stream)

    def test_serde_roundtrip(self, stream):
        tk = CMSTopK(track=128)
        tk.update(stream[:50_000])
        rt = sketch_from_bytes(tk.to_bytes())
        assert isinstance(rt, CMSTopK)
        assert rt.heavy_hitters(10) == tk.heavy_hitters(10)
        assert rt.total == tk.total and rt.track == tk.track

    def test_int_items(self):
        tk = CMSTopK(track=64)
        tk.update(np.array([7, 7, 7, 8, 8, 9], dtype=np.int64))
        assert tk.heavy_hitters(2) == [(7, 3), (8, 2)]
        rt = sketch_from_bytes(tk.to_bytes())
        assert rt.heavy_hitters(2) == tk.heavy_hitters(2)

    def test_weighted_update(self):
        tk = CMSTopK(track=64)
        tk.update(np.array(["a", "b"], dtype=object),
                  np.array([10, 3], dtype=np.int64))
        tk.update(np.array(["b"], dtype=object), np.array([9], dtype=np.int64))
        assert tk.heavy_hitters(2) == [("b", 12), ("a", 10)]

    def test_mixed_item_types_rejected(self):
        tk = CMSTopK(track=8)
        tk.update(np.array(["a"], dtype=object))
        with pytest.raises(TypeError):
            tk.update(np.array([1], dtype=np.int64))

    def test_track_mismatch_rejected(self):
        a, b = CMSTopK(track=8), CMSTopK(track=16)
        with pytest.raises(ValueError):
            a.merge(b)


class TestCMSTopKSpark:
    def test_pipeline_topk_matches_exact(self, spark, stream, exact_top):
        counts, order = exact_top
        df = spark.createDataFrame(
            [(v,) for v in stream.tolist()], "host string").repartition(8)
        merged = two_level_merge(
            build_sketches(df, [], [SketchSpec(
                "hh", "cmstopk", "host",
                {"epsilon": 1e-4, "delta": 1e-3, "track": 512})]), [])
        row = (merged.select(F.explode(
            heavy_hitters_col(F.col("state"), 20)).alias("h"))
            .select("h.item", "h.est").collect())
        got = [(r["item"], r["est"]) for r in row]
        assert [i for i, _ in got] == order[:20]
        assert all(est >= counts[i] for i, est in got)
