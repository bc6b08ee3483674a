"""N-gram language-model perplexity scoring — the CCNet quality signal.

CCNet (Wenzek et al. 2020, "CCNet: Extracting High Quality Monolingual
Datasets from Web Crawl Data") ranks crawled documents by the perplexity
of a language model trained on a trusted corpus: low perplexity ≈
well-formed prose, high ≈ gibberish/boilerplate/wrong language. The
original uses a KenLM 5-gram model; this is the same signal from a
Jelinek–Mercer-interpolated word n-gram model small enough to broadcast —
trained distributed, scored in one Arrow pass.

Scale shape mirrors functions/bpe.py: TRAINING's only raw-text scan is
one explode + map-side-combined groupBy per order (n-gram counts);
the model is the top-``max_ngrams`` counts per order (truncation loud in
stats — the tail carries negligible probability mass), broadcast once.
SCORING is a pandas iterator over docs: per-token log-prob from the
highest matching order, backing off with fixed interpolation weights;
zero shuffle, zero join.
"""

from __future__ import annotations

import math
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["train_ngram_lm", "perplexity", "NgramLM"]

BOS = "<s>"
EOS = "</s>"
UNK = "<unk>"


def _tokens_col(text_col: str, lowercase: bool):
    t = F.col(text_col)
    if lowercase:
        t = F.lower(t)
    return F.filter(F.split(F.trim(t), r"\s+"), lambda w: w != "")


class NgramLM:
    """Broadcastable model state: per-order count dicts + vocab size.
    Probability of token w given context c: Jelinek–Mercer interpolation
    of maximum-likelihood estimates at orders n..2 with an add-k unigram
    floor, weights renormalized over the orders whose CONTEXT was seen.
    Add-k at the higher orders would floor every unseen n-gram at ~1/V
    regardless of word identity — gibberish and prose would score alike
    (measured); ML-with-backoff sends unseen-word mass down to the
    unigram, which punishes OOV properly, and the per-context weight
    renormalization keeps Σ_w p(w|c) = 1 exactly (tested)."""

    def __init__(self, order: int, counts: list[dict], context_totals:
                 list[dict], vocab_size: int, k: float = 0.1,
                 stats: dict | None = None):
        self.order = order
        self.counts = counts                  # counts[i]: (i+1)-gram -> n
        self.context_totals = context_totals  # totals[i]: i-gram ctx -> n
        self.vocab_size = max(vocab_size, 1)
        self.k = k
        self.stats = stats or {}

    def weights(self) -> list:
        """Interpolation weights, highest order first. The published
        5-entry ladder for order <= 5; beyond that each extra order
        extends the geometric tail (half the previous weight) so the
        unigram floor is NEVER dropped — with a truncated list an
        unseen-context doc at order>5 would hit log2(0)."""
        w = [0.7, 0.2, 0.1, 0.05, 0.025]
        while len(w) < self.order:
            w.append(w[-1] / 2)
        return w[:self.order]

    def logprob(self, context: tuple, word: str) -> float:
        """log2 p(word | context) under the interpolation above."""
        weights = self.weights()
        num = 0.0
        den = 0.0
        for i, w in enumerate(weights):      # i=0 → highest order
            n = self.order - i
            if n > 1:
                ctx = context[len(context) - (n - 1):]
                tot = self.context_totals[n - 1].get(ctx, 0)
                if tot == 0:
                    continue  # unseen context: order drops out entirely
                p_n = self.counts[n - 1].get(ctx + (word,), 0) / tot
            else:
                tot = self.context_totals[0].get((), 0)
                p_n = ((self.counts[0].get((word,), 0) + self.k)
                       / (tot + self.k * self.vocab_size))
            num += w * p_n
            den += w
        return math.log2(num / den)

    def doc_logprob(self, tokens: list[str]) -> tuple[float, int]:
        vocab = self.counts[0]
        toks = [t if (t,) in vocab else UNK for t in tokens] + [EOS]
        context = tuple([BOS] * (self.order - 1))
        total = 0.0
        for t in toks:
            total += self.logprob(context, t)
            context = (context + (t,))[1:] if self.order > 1 else ()
        return total, len(toks)


def train_ngram_lm(df: DataFrame, order: int = 3, text_col: str = "text",
                   lowercase: bool = True, max_ngrams: int = 2_000_000,
                   min_count: int = 1, k: float = 0.1) -> NgramLM:
    """Train over a (trusted) corpus: one distributed count per order,
    BOS/EOS padded, top-``max_ngrams`` per order kept. Everything after
    the groupBys is dict-building on the driver — the model must
    broadcast, so its size is the cap, and the cap is reported."""
    toks = df.select(_tokens_col(text_col, lowercase).alias("t")) \
        .filter(F.size("t") > 0)
    padded = toks.select(
        F.concat(F.array(*[F.lit(BOS)] * (order - 1)), F.col("t"),
                 F.array(F.lit(EOS))).alias("t"))
    padded = padded.persist()
    counts: list[dict] = []
    totals: list[dict] = []
    truncated = []
    try:
        for n in range(1, order + 1):
            grams = padded.select(F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size("t") - n),
                    lambda i: F.slice("t", i + 1, n))).alias("g")) \
                .groupBy("g").agg(F.count(F.lit(1)).alias("c")) \
                .filter(F.col("c") >= min_count)
            rows = grams.orderBy(F.col("c").desc(), F.col("g")) \
                .limit(int(max_ngrams)).collect()
            truncated.append(len(rows) == int(max_ngrams))
            counts.append({tuple(r["g"]): int(r["c"]) for r in rows})
    finally:
        padded.unpersist()
    # context totals from the counts themselves (consistent when
    # truncated: a context's total covers exactly the grams we kept)
    for n in range(1, order + 1):
        t: dict = {}
        for gram, c in counts[n - 1].items():
            t[gram[:-1]] = t.get(gram[:-1], 0) + c
        totals.append({(): sum(counts[0].values())} if n == 1 else t)
    vocab_size = len(counts[0]) + 1  # + UNK
    return NgramLM(order, counts, totals, vocab_size, k=k, stats={
        "order": order, "vocab_size": vocab_size,
        "ngrams_kept": [len(c) for c in counts],
        "truncated": truncated})


def perplexity(df: DataFrame, lm: NgramLM, text_col: str = "text",
               out_col: str = "perplexity",
               lowercase: bool = True) -> DataFrame:
    """Per-document perplexity under ``lm`` as a new double column —
    broadcast model, one Arrow pass, no shuffle. Empty docs score null.
    Filter with e.g. ``df.filter(F.col('perplexity') <= head_threshold)``
    (CCNet buckets head/middle/tail by per-language thresholds)."""
    bc = df.sparkSession.sparkContext.broadcast(lm)

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        model = bc.value
        for pdf in batches:
            vals = []
            for t in pdf[text_col]:
                t = (t or "")
                toks = (t.lower() if lowercase else t).split()
                if not toks:
                    vals.append(None)
                    continue
                lp, n = model.doc_logprob(toks)
                vals.append(float(2 ** (-lp / n)))
            pdf = pdf.copy()
            pdf[out_col] = vals
            yield pdf

    schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields]
        + [f"{out_col} double"])
    return df.mapInPandas(score, schema=schema)
