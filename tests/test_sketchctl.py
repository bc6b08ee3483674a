"""sketchctl: driver-side show/estimate/merge over checkpointed sketch
state — the CLI must read back what the Spark job wrote and estimate
identically, with zero Spark involvement of its own."""

import json
import math
import os

import pytest
from pyspark.sql import functions as F

from fever_spark.jobs import SketchJob
from fever_spark.jobs.sketchctl import main as sketchctl
from fever_spark.ops.build import SketchSpec
from fever_spark.sources.synth import synth_pages_df

SPECS = [SketchSpec("urls", "hll", "url", {"p": 12}),
         SketchSpec("hosts_cnt", "cms", "url",
                    {"epsilon": 1e-3, "delta": 1e-2}),
         SketchSpec("len_q", "kll", "text_len", {"k": 128})]


def _prep(df):
    # numeric derived col for the quantile sketch, added on read
    return df.withColumn("text_len", F.length("text"))


@pytest.fixture(scope="module")
def ckpt(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("sketchctl")
    pages = str(base / "pages")
    synth_pages_df(spark, 6_000, partitions=6).write.parquet(pages)
    ck = str(base / "ckpt")
    SketchJob(input_path=pages, checkpoint_dir=ck, keys=["lang"],
              specs=SPECS, files_per_chunk=3, prepare=_prep).run(spark)
    return {"pages": pages, "ckpt": ck}


def _run(capsys, *argv):
    rc = sketchctl(list(argv))
    out = capsys.readouterr().out.strip()
    return rc, [json.loads(ln) for ln in out.splitlines() if ln]


class TestShow:
    def test_summary(self, ckpt, capsys):
        rc, rows = _run(capsys, "show", ckpt["ckpt"])
        assert rc == 0 and len(rows) == 1
        s = rows[0]
        assert s["completed"] is True and s["rows"] == 6_000
        assert s["keys"] == ["lang"]
        assert {x["name"] for x in s["specs"]} == {
            "urls", "hosts_cnt", "len_q"}


class TestEstimate:
    def test_hll_matches_exact_within_bound(self, spark, ckpt, capsys):
        rc, rows = _run(capsys, "estimate", ckpt["ckpt"], "--sketch", "urls")
        assert rc == 0
        exact = {r["lang"]: r["n"] for r in
                 spark.read.parquet(ckpt["pages"]).groupBy("lang")
                 .agg(F.countDistinct("url").alias("n")).collect()}
        assert {r["lang"] for r in rows} == set(exact)
        bound = 4 * 1.04 / math.sqrt(2 ** 12)
        for r in rows:
            assert r["kind"] == "hll"
            assert abs(r["estimate"] - exact[r["lang"]]) \
                <= bound * exact[r["lang"]]

    def test_kll_quantiles_and_cms_items(self, spark, ckpt, capsys):
        rc, rows = _run(capsys, "estimate", ckpt["ckpt"],
                        "--sketch", "len_q", "--quantiles", "0.5")
        assert rc == 0
        med = {r["lang"]: r["quantiles"]["0.5"] for r in rows}
        exact = {r["lang"]: r["m"] for r in
                 _prep(spark.read.parquet(ckpt["pages"])).groupBy("lang")
                 .agg(F.expr("percentile(text_len, 0.5)").alias("m"))
                 .collect()}
        for lang, m in med.items():
            # KLL rank error: the value at rank 0.5 +- eps
            lo, hi = exact[lang] * 0.5, exact[lang] * 1.5 + 2
            assert lo <= m <= hi, (lang, m, exact[lang])
        # CMS point queries never under-count
        url = spark.read.parquet(ckpt["pages"]).select("url").first()["url"]
        rc, rows = _run(capsys, "estimate", ckpt["ckpt"],
                        "--sketch", "hosts_cnt", "--items", url)
        assert rc == 0
        assert any(r["counts"][url] >= 1 for r in rows)

    def test_unknown_sketch_fails(self, ckpt, capsys):
        rc, _ = _run(capsys, "estimate", ckpt["ckpt"], "--sketch", "nope")
        assert rc == 1

    def test_incomplete_job_estimates_from_chunks(self, spark, ckpt,
                                                  tmp_path, capsys):
        # a resume-in-progress checkpoint (no final/) is inspectable:
        # driver-merged chunk partials estimate like the completed job
        ck2 = str(tmp_path / "partial")
        SketchJob(input_path=ckpt["pages"], checkpoint_dir=ck2,
                  keys=["lang"], specs=SPECS, files_per_chunk=3,
                  prepare=_prep).run(spark, max_chunks=1)
        assert not os.path.exists(os.path.join(ck2, "final"))
        rc, rows = _run(capsys, "estimate", ck2, "--sketch", "urls")
        assert rc == 0 and len(rows) >= 1
        assert all(r["estimate"] > 0 for r in rows)


class TestMerge:
    def test_two_job_merge_equals_one_job_over_union(self, spark, ckpt,
                                                     tmp_path, capsys):
        # split the corpus in two, run a job per half, sketchctl-merge the
        # checkpoints: estimates must equal the single-job-over-everything
        # states EXACTLY (merge associativity on identical kernels)
        pages = spark.read.parquet(ckpt["pages"])
        a, b = str(tmp_path / "a"), str(tmp_path / "b")
        pages.filter(F.length("text") % 2 == 0).write.parquet(a)
        pages.filter(F.length("text") % 2 == 1).write.parquet(b)
        cka, ckb = str(tmp_path / "cka"), str(tmp_path / "ckb")
        for path, ck in ((a, cka), (b, ckb)):
            SketchJob(input_path=path, checkpoint_dir=ck, keys=["lang"],
                      specs=SPECS, files_per_chunk=4,
                      prepare=_prep).run(spark)
        out = str(tmp_path / "merged")
        rc, rows = _run(capsys, "merge", cka, ckb, "--out", out)
        assert rc == 0 and rows[0]["groups"] > 0
        rc, merged = _run(capsys, "estimate", out, "--sketch", "urls")
        rc2, whole = _run(capsys, "estimate", ckpt["ckpt"],
                          "--sketch", "urls")
        assert {(r["lang"], r["estimate"]) for r in merged} == \
            {(r["lang"], r["estimate"]) for r in whole}

    def test_mismatched_specs_fail_loud(self, spark, ckpt, tmp_path,
                                        capsys):
        ck2 = str(tmp_path / "otherspec")
        SketchJob(input_path=ckpt["pages"], checkpoint_dir=ck2,
                  keys=["lang"], specs=[SketchSpec("urls", "hll", "url",
                                                   {"p": 10})],
                  files_per_chunk=4).run(spark)
        with pytest.raises(SystemExit, match="signature"):
            sketchctl(["merge", ckpt["ckpt"], ck2,
                       "--out", str(tmp_path / "bad")])
