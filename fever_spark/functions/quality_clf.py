"""Trusted-vs-crawl quality classifier — the GPT-3/LLaMA filtering recipe.

The public pretraining pipelines (GPT-3 appendix A; LLaMA; PaLM) filter
Common Crawl with a linear classifier trained to separate a TRUSTED
corpus (Wikipedia/books/reference pages) from random crawl text, then
keep crawl documents the classifier scores as trusted-like. This module
is that recipe on Spark MLlib: featurize with the library's existing
whole-stage-codegen text signals (no tokenizer, no embedding — one
projection), train LogisticRegression on trusted∪crawl samples, score
the corpus distributed.

Scale shape: featurization is a codegen projection (zero Python, zero
shuffle); MLlib LR training is the standard distributed L-BFGS over the
(small) labeled sample; scoring broadcasts the coefficient vector — one
map, no shuffle. The model is a plain dict of named coefficients, so it
serializes to JSON and needs no MLlib at scoring time.
"""

from __future__ import annotations

import math
from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fever_spark.functions import text as TXT
from fever_spark.operators.curation import duplicate_word_fraction

__all__ = ["quality_features", "train_quality_classifier", "quality_proba",
           "FEATURE_NAMES"]

FEATURE_NAMES = ["alpha_frac", "punct_frac", "digit_frac", "upper_frac",
                 "mean_word_len", "stopword_frac", "dup_word_frac",
                 "log_n_chars", "line_len_mean"]


def quality_features(text: Column) -> list[Column]:
    """The feature projection, one codegen pass — aliased to
    FEATURE_NAMES order. All cheap surface statistics; the separability
    of prose vs crawl junk lives in their JOINT distribution, which is
    exactly what the linear model learns."""
    n = F.greatest(F.length(text), F.lit(1)).cast("double")
    words = F.greatest(TXT.whitespace_token_count(text), F.lit(1)) \
        .cast("double")
    lines = F.greatest(F.size(F.split(text, "\n")), F.lit(1)).cast("double")
    return [
        (F.regexp_count(text, F.lit(r"[A-Za-z]")) / n).alias("alpha_frac"),
        (F.regexp_count(text, F.lit(r"[^\w\s]")) / n).alias("punct_frac"),
        (F.regexp_count(text, F.lit(r"[0-9]")) / n).alias("digit_frac"),
        (F.regexp_count(text, F.lit(r"[A-Z]")) / n).alias("upper_frac"),
        (n / words).alias("mean_word_len"),
        TXT.stopword_fraction(text).alias("stopword_frac"),
        duplicate_word_fraction(text).alias("dup_word_frac"),
        F.log1p(F.length(text).cast("double")).alias("log_n_chars"),
        (n / lines).alias("line_len_mean"),
    ]


def train_quality_classifier(trusted: DataFrame, crawl: DataFrame,
                             text_col: str = "text",
                             max_iter: int = 50,
                             reg_param: float = 0.01) -> dict:
    """Fit LR to separate ``trusted`` (label 1) from ``crawl`` (label 0).

    Returns a broadcastable plain-dict model:
    {"coefficients": {name: w}, "intercept": b, "auc": train AUC} —
    JSON-serializable, scored without MLlib."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.evaluation import BinaryClassificationEvaluator
    from pyspark.ml.feature import VectorAssembler

    def feats(df, label):
        return df.select(*quality_features(F.col(text_col)),
                         F.lit(label).alias("label"))

    data = feats(trusted, 1.0).unionByName(feats(crawl, 0.0))
    assembled = VectorAssembler(inputCols=FEATURE_NAMES,
                                outputCol="features",
                                handleInvalid="keep").transform(data)
    lr = LogisticRegression(maxIter=max_iter, regParam=reg_param,
                            standardization=True)
    model = lr.fit(assembled)
    auc = BinaryClassificationEvaluator().evaluate(
        model.transform(assembled))
    return {
        "coefficients": dict(zip(FEATURE_NAMES,
                                 [float(c) for c in model.coefficients])),
        "intercept": float(model.intercept),
        "auc": float(auc),
        "n_trusted": trusted.count(), "n_crawl": crawl.count(),
    }


def quality_proba(text: Column, model: dict) -> Column:
    """P(trusted-like | doc) under the trained model as a codegen column —
    the coefficient dict inlines into the plan, so scoring 100 TB is one
    projection with no Python, no broadcast variable, no shuffle. Use as
    ``df.filter(quality_proba(F.col('text'), m) >= 0.5)`` or keep the
    column for CCNet-style bucketing."""
    coefs = model["coefficients"]
    feats = quality_features(text)
    z = F.lit(float(model["intercept"]))
    for col, name in zip(feats, FEATURE_NAMES):
        z = z + col * F.lit(float(coefs[name]))
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
