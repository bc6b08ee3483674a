"""pages_report spark-submit main: the north_star battery end-to-end with
checkpoint/resume (SURVEY §7.1.6)."""

import collections
import json

import numpy as np
import pytest
from pyspark.sql import functions as F

from fever_spark.jobs.pages_report import build_report
from fever_spark.sources.synth import synth_pages_df


@pytest.fixture(scope="module")
def pages_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("pages") / "pages")
    synth_pages_df(spark, 20_000, partitions=6).write.parquet(d)
    return d


def test_report_battery_and_resume(spark, pages_dir, tmp_path):
    ckpt = str(tmp_path / "ckpt")
    rep = build_report(spark, pages_dir, ckpt, with_tokens=True, topk=10)

    # per (lang, day) HLL within bound of exact
    pages = spark.read.parquet(pages_dir).withColumn("day", F.to_date("warc_ts"))
    exact = {(r["lang"], str(r["day"])): r["x"] for r in
             pages.groupBy("lang", "day")
             .agg(F.countDistinct("url").alias("x")).collect()}
    url_cells = [c for c in rep["per_lang_day"] if c["sketch"] == "distinct_url"]
    assert len(url_cells) == len(exact)
    for c in url_cells:
        x = exact[(c["lang"], c["day"])]
        assert abs(c["estimate"] - x) / x <= 4 * 1.04 / 2 ** 7

    # top hosts = exact top hosts (Zipfian synth)
    host_counts = collections.Counter(
        r["h"] for r in pages.select(
            F.try_parse_url("url", F.lit("HOST")).alias("h")).collect())
    exact_top = [h for h, _ in sorted(host_counts.items(),
                                      key=lambda kv: (-kv[1], kv[0]))[:10]]
    assert [h["host"] for h in rep["top_hosts"]] == exact_top

    # quantiles are ordered and sane
    q = rep["page_bytes_q"]
    assert q["0.5"] <= q["0.95"] <= q["0.99"]
    assert rep["text_len_q"]["0.5"] > 0
    assert len(rep["top_tokens"]) == 10

    # cross-lang URL overlap: one entry per unordered lang pair; synth
    # urls embed the page id so langs are DISJOINT — shared estimates
    # must sit within the compounded inclusion-exclusion bound of zero
    langs = sorted({c["lang"] for c in url_cells})
    n_pairs = len(langs) * (len(langs) - 1) // 2
    assert len(rep["lang_url_overlap"]) == n_pairs
    n_urls = pages.select("url").distinct().count()
    for o in rep["lang_url_overlap"]:
        assert 0.0 <= o["jaccard"] <= 1.0
        assert abs(o["shared_est"]) <= 4 * 3 * (1.04 / 2 ** 7) * n_urls

    # resume: a second run must skip all chunks (manifest-complete) and
    # reproduce the identical report
    rep2 = build_report(spark, pages_dir, ckpt, with_tokens=True, topk=10)
    assert json.dumps(rep, sort_keys=True) == json.dumps(rep2, sort_keys=True)
    man = json.load(open(f"{ckpt}/global/manifest.json"))
    assert man["completed"] and len(man["chunks"]) >= 1


def test_report_with_ioc_file(spark, pages_dir, tmp_path):
    iocs = tmp_path / "iocs.txt"
    # one host guaranteed present
    host = spark.read.parquet(pages_dir).select(
        F.try_parse_url("url", F.lit("HOST")).alias("h")).first()["h"]
    iocs.write_text(f"{host}\nnot-present.example\n")
    rep = build_report(spark, pages_dir, str(tmp_path / "ck2"),
                       ioc_file=str(iocs))
    assert rep["ioc_matches"].get("http-host", 0) > 0


def test_report_jvm_engine(spark, pages_dir, tmp_path):
    """--engine jvm: the HLL groups run through ops/jvm_sketch (same
    report shape, same bounds); the global topk/quantile/KMV group stays
    on the checkpointed python path."""
    rep = build_report(spark, pages_dir, str(tmp_path / "ck"), engine="jvm")
    assert rep["engine"] == "jvm"

    pages = spark.read.parquet(pages_dir).withColumn(
        "day", F.to_date("warc_ts"))
    exact = {(r["lang"], str(r["day"])): r["x"] for r in
             pages.groupBy("lang", "day")
             .agg(F.countDistinct("url").alias("x")).collect()}
    url_cells = [c for c in rep["per_lang_day"]
                 if c["sketch"] == "distinct_url"]
    assert len(url_cells) == len(exact)
    for c in url_cells:
        x = exact[(c["lang"], c["day"])]
        assert abs(c["estimate"] - x) / x <= 4 * 1.04 / 2 ** 7

    # synth langs are URL-disjoint: overlap ~ 0 within the compounded
    # inclusion-exclusion bound, jaccard in [0, 1]
    langs = sorted({c["lang"] for c in url_cells})
    assert len(rep["lang_url_overlap"]) == len(langs) * (len(langs) - 1) // 2
    n_urls = pages.select("url").distinct().count()
    for o in rep["lang_url_overlap"]:
        assert 0.0 <= o["jaccard"] <= 1.0
        assert abs(o["shared_est"]) <= 4 * 3 * (1.04 / 2 ** 7) * n_urls

    # python-path groups unchanged in jvm mode
    assert len(rep["top_hosts"]) == 20
    assert rep["page_bytes_q"]["0.5"] <= rep["page_bytes_q"]["0.99"]
    assert rep["distinct_url_kmv"] > 0

    with pytest.raises(ValueError, match="engine"):
        build_report(spark, pages_dir, str(tmp_path / "ck2"), engine="rdd")


def test_jvm_overlap_langs_with_pipe_do_not_collide(spark, tmp_path):
    """Round-9 ADVICE fix: the jvm overlap path used to key pair union
    groups on f"{a}|{b}" — langs ('a', 'b|c') and ('a|b', 'c') collided
    into one group, merging FOUR states and corrupting both pairs'
    shared_est/jaccard. Keys are two columns now; with URL-disjoint
    langs every pair's shared estimate must sit near zero."""
    pages = synth_pages_df(spark, 8_000, partitions=4)
    remapped = pages.withColumn(
        "lang",
        F.when(F.col("lang") == "en", F.lit("a"))
        .when(F.col("lang") == "de", F.lit("b|c"))
        .when(F.col("lang") == "fr", F.lit("a|b"))
        .otherwise(F.lit("c")))
    d = str(tmp_path / "pages")
    remapped.write.parquet(d)
    rep = build_report(spark, d, str(tmp_path / "ck"), engine="jvm")
    langs = sorted({c["lang"] for c in rep["per_lang_day"]})
    assert {"a", "a|b", "b|c", "c"} <= set(langs)
    n_urls = remapped.select("url").distinct().count()
    bound = 4 * 3 * (1.04 / 2 ** 7) * n_urls
    pairs = {(o["lang_a"], o["lang_b"]) for o in rep["lang_url_overlap"]}
    assert ("a", "b|c") in pairs and ("a|b", "c") in pairs
    for o in rep["lang_url_overlap"]:
        # the collision drove shared_est to about -(half the corpus);
        # disjoint langs must stay within the inclusion-exclusion bound
        assert abs(o["shared_est"]) <= bound, o
        assert 0.0 <= o["jaccard"] <= 1.0
