"""Corpus curation: the canonical LLM training-data pipeline, composed from
the library's first-class operators —

  annotate (lang-id, quality score, token count; all whole-stage codegen)
    → threshold filter (quality / language / token bounds / repetition)
    → PII redaction (optional, chained codegen regexp)
    → paragraph dedup (optional, cross-doc boilerplate removal)
    → exact dedup (normalized-content fingerprint)
    → ExactSubstr span dedup (optional: duplicated runs of >= k tokens cut
      everywhere but their first occurrence)
    → near-dup dedup (MinHash-LSH pairs → connected components → keep the
      canonical doc per cluster)
    → contamination screen (optional: drop docs sharing word n-grams with a
      benchmark corpus — Bloom broadcast, zero FN, exact verify)
    → deterministic hash sample (repartition-stable membership)
    → partitioned write + a JSON manifest of per-stage survivor counts.

Run: spark-submit --py-files fever_spark.zip -m fever_spark.jobs.curate \
       --input /data/documents --output /data/curated [--min-quality 0.5]
       [--langs en,de] [--min-tokens 10] [--max-tokens 100000]
       [--near-dup-threshold 0.7] [--sample-rate 1.0] [--redact-pii]
       [--paragraph-dedup] [--max-dup-word-frac 0.7]
       [--benchmark /data/benchmark] [--substring-dedup-k 20]

Scale shape: annotate/filter are one codegen'd pass; exact dedup is one
hash-shuffle; LSH is signature UDF + banded equi-join (ids only); cluster
propagation shuffles only the pair graph; the sample is a filter. Stage
frames are persisted so per-stage counts don't recompute upstream stages.
"""

from __future__ import annotations

import json
import os
import time

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fever_spark.functions import text as TXT
from fever_spark.operators import curation, dedup, sampling


def curate(spark: SparkSession, input_path: str, output_path: str,
           text_col: str = "text", id_col: str = "doc_id",
           min_quality: float = 0.5, langs: list[str] | None = None,
           min_tokens: int = 5, max_tokens: int = 1_000_000,
           near_dup_threshold: float = 0.7, sample_rate: float = 1.0,
           seed: int = 0, redact_pii: bool = False,
           paragraph_dedup: bool = False,
           max_dup_word_frac: float | None = None,
           benchmark_path: str | None = None,
           contamination_ngram: int = 8,
           substring_dedup_k: int | None = None) -> dict:
    docs = spark.read.parquet(input_path)
    counts = {"input": docs.count()}
    # wall seconds per pipeline stage (stage = work up to its survivor
    # count), recorded in the manifest so the composed pipeline — not just
    # its pieces — is benchmarkable (bench.py's curate entry reads this)
    stage_seconds = {}
    _t = time.time()

    def _mark(stage: str) -> None:
        nonlocal _t
        stage_seconds[stage] = round(time.time() - _t, 3)
        _t = time.time()

    # every persisted intermediate is tracked and unpersisted at the end —
    # stages that REASSIGN a name (paragraph/substring dedup shadow their
    # input frame) must not leak the shadowed cache entry for the app's
    # lifetime when curate() runs repeatedly in one session
    persisted = []

    def _persist(df):
        df = df.persist(StorageLevel.MEMORY_AND_DISK)
        persisted.append(df)
        return df

    annotated = docs.select(
        "*",
        TXT.lang_id(F.col(text_col)).alias("_lang"),
        TXT.quality_score(F.col(text_col)).alias("quality"),
        TXT.whitespace_token_count(F.col(text_col)).alias("n_tokens"))
    cond = ((F.col("quality") >= min_quality)
            & (F.col("n_tokens") >= min_tokens)
            & (F.col("n_tokens") <= max_tokens))
    if langs:
        # prefer a trusted lang column when the corpus carries one
        lang_col = F.col("lang") if "lang" in docs.columns else F.col("_lang")
        cond = cond & lang_col.isin(list(langs))
    if max_dup_word_frac is not None:
        cond = cond & (curation.duplicate_word_fraction(F.col(text_col))
                       <= max_dup_word_frac)
    filtered = annotated.filter(cond).drop("_lang")
    if redact_pii:
        # same pass as the filter — redaction is a codegen'd projection
        filtered = filtered.withColumn(text_col,
                                       curation.redact_pii(F.col(text_col)))
    filtered = _persist(filtered)
    counts["after_quality_filter"] = filtered.count()
    _mark("quality_filter")

    if paragraph_dedup:
        # docs reduced to zero CONTENT paragraphs are fully-duplicated
        # boilerplate — drop them here, or an empty canonical doc would
        # survive exact dedup into the output (trim: blank paragraphs are
        # dedup-exempt structure, so such docs reassemble to whitespace)
        filtered = _persist(
            curation.paragraph_dedup(filtered, id_col, text_col)
            .filter(F.trim(F.col(text_col)) != ""))
        counts["after_paragraph_dedup"] = filtered.count()
        _mark("paragraph_dedup")

    exact = _persist(dedup.exact_dedup(filtered, text_col, id_col))
    counts["after_exact_dedup"] = exact.count()
    _mark("exact_dedup")

    if substring_dedup_k:
        # ExactSubstr span removal (Lee et al. 2022) between exact and
        # near-dup: shared boilerplate runs >= k tokens are cut before
        # MinHash, so near-dup similarity reflects the docs' own content
        # rather than their common chrome. Docs cut to nothing are
        # fully-duplicated text — drop them like the paragraph pass does.
        exact = _persist(
            curation.substring_dedup(exact, id_col, text_col,
                                     k=substring_dedup_k)
            .filter(F.trim(F.col(text_col)) != "")
            .drop("removed_tokens"))
        counts["after_substring_dedup"] = exact.count()
        _mark("substring_dedup")

    pairs = dedup.minhash_near_duplicates(
        exact, text_col, id_col, threshold=near_dup_threshold) \
        .select("id_a", "id_b")
    neardup = _persist(dedup.dedup_keep_canonical(exact, pairs, id_col))
    counts["after_near_dup"] = neardup.count()
    _mark("near_dup")

    if benchmark_path:
        # Two-stage discipline (the documented FP-removal contract of
        # curation.py): the Bloom screen's zero-FN semantics mean
        # hit_ngrams == 0 is a SAFE keep — those docs skip the verify
        # entirely; the (tiny) flagged subset goes through the EXACT
        # n-gram join and only docs with real shared n-grams are dropped,
        # so Bloom false positives never over-drop clean documents.
        bench = spark.read.parquet(benchmark_path)
        bf = curation.build_benchmark_bloom(bench, text_col,
                                            n=contamination_ngram)
        bc = spark.sparkContext.broadcast(bf.to_bytes())
        flagged_ids = (curation.contamination_screen(
            neardup, bc, contamination_ngram, text_col, id_col)
            .filter(F.col("hit_ngrams") > 0).select(id_col))
        flagged_docs = neardup.join(flagged_ids, id_col, "left_semi")
        counts["contamination_flagged"] = flagged_docs.count()
        confirmed_ids = (curation.contamination_exact(
            flagged_docs, bench, contamination_ngram, text_col, id_col)
            .filter(F.col("contaminated_ngrams") > 0).select(id_col))
        neardup = _persist(neardup.join(confirmed_ids, id_col, "left_anti"))
        counts["after_contamination_screen"] = neardup.count()
        _mark("contamination")

    out = (sampling.deterministic_sample(neardup, id_col, sample_rate, seed)
           if sample_rate < 1.0 else neardup)
    out.write.mode("overwrite").parquet(output_path)
    counts["written"] = spark.read.parquet(output_path).count()
    _mark("sample_and_write")

    manifest = {
        "input": input_path, "output": output_path, "counts": counts,
        "stage_seconds": stage_seconds,
        "params": {"min_quality": min_quality, "langs": langs,
                   "min_tokens": min_tokens, "max_tokens": max_tokens,
                   "near_dup_threshold": near_dup_threshold,
                   "sample_rate": sample_rate, "seed": seed,
                   "redact_pii": redact_pii,
                   "paragraph_dedup": paragraph_dedup,
                   "max_dup_word_frac": max_dup_word_frac,
                   "benchmark": benchmark_path,
                   "contamination_ngram": contamination_ngram,
                   "substring_dedup_k": substring_dedup_k},
    }
    tmp = os.path.join(output_path, "_curation_manifest.json.tmp")
    final = os.path.join(output_path, "_curation_manifest.json")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmp, final)
    for df in persisted:
        df.unpersist()
    return manifest


def main(argv: list[str] | None = None) -> None:
    import argparse

    from fever_spark.session import get_spark

    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--min-quality", type=float, default=0.5)
    ap.add_argument("--langs", default="")
    ap.add_argument("--min-tokens", type=int, default=5)
    ap.add_argument("--max-tokens", type=int, default=1_000_000)
    ap.add_argument("--near-dup-threshold", type=float, default=0.7)
    ap.add_argument("--sample-rate", type=float, default=1.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--redact-pii", action="store_true")
    ap.add_argument("--paragraph-dedup", action="store_true")
    ap.add_argument("--max-dup-word-frac", type=float, default=None)
    ap.add_argument("--benchmark", default=None,
                    help="parquet path of an eval corpus to screen against")
    ap.add_argument("--contamination-ngram", type=int, default=8)
    ap.add_argument("--substring-dedup-k", type=int, default=None,
                    help="enable ExactSubstr span removal of duplicated "
                         "runs of >= k tokens")
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    spark = get_spark(master=args.master, app_name="fever_spark_curate")
    manifest = curate(
        spark, args.input, args.output,
        min_quality=args.min_quality,
        langs=[x for x in args.langs.split(",") if x] or None,
        min_tokens=args.min_tokens, max_tokens=args.max_tokens,
        near_dup_threshold=args.near_dup_threshold,
        sample_rate=args.sample_rate, seed=args.seed,
        redact_pii=args.redact_pii, paragraph_dedup=args.paragraph_dedup,
        max_dup_word_frac=args.max_dup_word_frac,
        benchmark_path=args.benchmark,
        contamination_ngram=args.contamination_ngram,
        substring_dedup_k=args.substring_dedup_k)
    print(json.dumps(manifest))
    spark.stop()


if __name__ == "__main__":
    main()
