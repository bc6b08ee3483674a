"""Distributed BPE tokenizer training + corpus encoding.

Byte-pair encoding per Sennrich, Haddow & Birch 2016 ("Neural Machine
Translation of Rare Words with Subword Units"): start from characters
(plus an end-of-word marker), repeatedly merge the most frequent adjacent
symbol pair.

Scale shape — the part that touches 100 TB is WORD COUNTING: one
explode + map-side-combined groupBy over the corpus, after which the
distinct-word frequency table IS the compressed corpus (training never
reads raw text again — the same design as the reference tokenizer
trainers, which collect word counts and train in memory). Training runs
the greedy merge loop over that table on the driver, capped at the top
``max_words`` most frequent words — the rare tail contributes vanishing
pair counts and cannot change merge order until far beyond practical
vocab sizes; the cap is loud in the returned stats. Encoding is
distributed again: merge ranks broadcast once, applied per word inside an
Arrow-batched pandas iterator with a per-worker cache (word frequency is
Zipfian — the cache hit rate is the point).
"""

from __future__ import annotations

from collections import Counter, defaultdict
from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["word_counts", "train_bpe", "bpe_encode", "END_OF_WORD"]

END_OF_WORD = "</w>"


def word_counts(df: DataFrame, text_col: str = "text",
                lowercase: bool = True) -> DataFrame:
    """(word, count) over the corpus — one explode + groupBy with partial
    aggregation; the only stage that scans the raw text."""
    t = F.col(text_col)
    if lowercase:
        t = F.lower(t)
    words = F.filter(F.split(F.trim(t), r"\s+"), lambda w: w != "")
    return (df.select(F.explode(words).alias("word"))
            .groupBy("word").agg(F.count(F.lit(1)).alias("count")))


def _symbols(word: str) -> list[str]:
    return list(word) + [END_OF_WORD]


def _merge_symbols(syms: list[str], pair: tuple[str, str]) -> list[str]:
    out = []
    i = 0
    joined = pair[0] + pair[1]
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == pair[0] and syms[i + 1] == pair[1]:
            out.append(joined)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def train_bpe(counts: DataFrame, num_merges: int, min_freq: int = 2,
              max_words: int = 1_000_000) -> dict:
    """Greedy BPE merges from a word-count frame (the word_counts output).

    Deterministic tie-break: highest pair count, then lexicographically
    largest pair — so training is independent of partitioning and dict
    order. Incremental pair-count maintenance (only words containing the
    merged pair are re-segmented per step), the standard trainer shape.

    Returns {"merges": [(a, b), ...], "vocab": [token, ...],
    "stats": {...}} — stats records the word-table cap so a truncated
    tail is never silent."""
    top = (counts.orderBy(F.col("count").desc(), F.col("word"))
           .limit(int(max_words)).collect())
    total_words = counts.count()
    words: list[tuple[list[str], int]] = [
        (_symbols(r["word"]), int(r["count"])) for r in top]

    pair_counts: Counter = Counter()
    pair_to_wids: dict = defaultdict(set)
    for wid, (syms, freq) in enumerate(words):
        for p in zip(syms, syms[1:]):
            pair_counts[p] += freq
            pair_to_wids[p].add(wid)

    merges: list[tuple[str, str]] = []
    for _ in range(int(num_merges)):
        if not pair_counts:
            break
        best, best_n = max(pair_counts.items(), key=lambda kv: (kv[1], kv[0]))
        if best_n < min_freq:
            break
        merges.append(best)
        for wid in list(pair_to_wids.pop(best, ())):
            syms, freq = words[wid]
            for p in zip(syms, syms[1:]):
                pair_counts[p] -= freq
                if pair_counts[p] <= 0:
                    del pair_counts[p]
                pair_to_wids[p].discard(wid)
            syms = _merge_symbols(syms, best)
            words[wid] = (syms, freq)
            for p in zip(syms, syms[1:]):
                pair_counts[p] += freq
                pair_to_wids[p].add(wid)

    vocab = sorted({s for syms, _ in words for s in syms}
                   | {a + b for a, b in merges})
    return {"merges": merges, "vocab": vocab,
            "stats": {"distinct_words": int(total_words),
                      "trained_on_words": len(words),
                      "word_table_truncated": total_words > len(words),
                      "n_merges": len(merges)}}


def _encode_word(word: str, ranks: dict) -> list[str]:
    syms = _symbols(word)
    while len(syms) > 1:
        best = None
        best_rank = None
        for p in zip(syms, syms[1:]):
            r = ranks.get(p)
            if r is not None and (best_rank is None or r < best_rank):
                best, best_rank = p, r
        if best is None:
            break
        syms = _merge_symbols(syms, best)
    return syms


def bpe_encode(df: DataFrame, merges: list, text_col: str = "text",
               out_col: str = "bpe_tokens", lowercase: bool = True,
               cache_size: int = 200_000) -> DataFrame:
    """Corpus encoding with a trained merge list: broadcast the ranks,
    segment every word rank-lowest-first inside one Arrow pass, cache
    per-word results (Zipfian reuse). Adds ``out_col`` array<string>."""
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    bc = df.sparkSession.sparkContext.broadcast(ranks)

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from functools import lru_cache

        r = bc.value

        @lru_cache(maxsize=cache_size)
        def one(word: str) -> tuple:
            return tuple(_encode_word(word, r))

        for pdf in batches:
            toks = []
            for t in pdf[text_col]:
                t = (t or "")
                if lowercase:
                    t = t.lower()
                out = []
                for w in t.split():
                    out.extend(one(w))
                toks.append(out)
            pdf = pdf.copy()
            pdf[out_col] = toks
            yield pdf

    schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields]
        + [f"{out_col} array<string>"])
    return df.mapInPandas(encode, schema=schema)
