"""CCNet-style n-gram LM perplexity (functions/ngram_lm.py): counts vs a
pure-python reference, scoring exactness, the fluent-vs-gibberish signal,
partitioning invariance."""

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from fever_spark.functions.ngram_lm import (BOS, EOS, UNK, NgramLM,
                                            perplexity, train_ngram_lm)

TRAIN = [
    "the cat sat on the mat",
    "the dog sat on the rug",
    "a cat and a dog sat together",
    "the cat and the dog are friends",
] * 5


@pytest.fixture(scope="module")
def train_df(spark):
    return spark.createDataFrame([(t,) for t in TRAIN], "text string")


def ref_counts(order):
    """Independent n-gram counting."""
    out = [Counter() for _ in range(order)]
    for t in TRAIN:
        toks = [BOS] * (order - 1) + t.split() + [EOS]
        for n in range(1, order + 1):
            for i in range(len(toks) - n + 1):
                out[n - 1][tuple(toks[i:i + n])] += 1
    return out


class TestTraining:
    def test_counts_match_reference(self, spark, train_df):
        lm = train_ngram_lm(train_df, order=3)
        expect = ref_counts(3)
        for n in range(3):
            assert lm.counts[n] == dict(expect[n]), f"order {n+1}"
        assert lm.stats["truncated"] == [False, False, False]

    def test_training_is_one_action(self, spark, train_df):
        """The per-order top-K collects were collapsed into ONE window-
        ranked collect: one action, no persist. AQE materializes each
        exchange as its own job, so the event log shows <= 4 jobs
        (explode+agg shuffle, local rank shuffle, global rank shuffle,
        result) — measured 5 for the old persist + 3-collect path, and
        the old path additionally merge-sorted numPartitions*K rows on
        the driver per order."""
        sc = spark.sparkContext
        sc.setJobGroup("lm_train_jobcount", "train_ngram_lm")
        try:
            train_ngram_lm(train_df, order=3)
        finally:
            sc.setJobGroup("", "")
        jobs = sc.statusTracker().getJobIdsForGroup("lm_train_jobcount")
        assert len(jobs) <= 4, f"expected <= 4 training jobs, saw {len(jobs)}"

    def test_partitioning_invariance(self, spark, train_df):
        a = train_ngram_lm(train_df.repartition(1), order=2)
        b = train_ngram_lm(train_df.repartition(5), order=2)
        assert a.counts == b.counts and a.vocab_size == b.vocab_size

    def test_truncation_reported(self, spark, train_df):
        lm = train_ngram_lm(train_df, order=2, max_ngrams=5)
        assert lm.stats["truncated"] == [True, True]
        assert all(len(c) == 5 for c in lm.counts)


class TestScoring:
    def test_scores_match_driver_model(self, spark, train_df):
        """Distributed scoring == calling the model object directly."""
        lm = train_ngram_lm(train_df, order=3)
        docs = spark.createDataFrame(
            [(0, "the cat sat on the mat"), (1, "dog rug mat unknownword"),
             (2, "")], "doc_id long, text string")
        got = {r["doc_id"]: r["perplexity"] for r in
               perplexity(docs, lm).collect()}
        for i, t in [(0, "the cat sat on the mat"),
                     (1, "dog rug mat unknownword")]:
            lp, n = lm.doc_logprob(t.split())
            assert got[i] == pytest.approx(2 ** (-lp / n), rel=1e-9)
        assert got[2] is None

    def test_fluent_beats_gibberish(self, spark, train_df):
        lm = train_ngram_lm(train_df, order=3)
        docs = spark.createDataFrame(
            [(0, "the cat sat on the mat"),
             (1, "the dog sat on the mat"),          # novel but in-domain
             (2, "mat the on sat cat the"),          # scrambled
             (3, "zq xv qqq wpl zzz krr ttt glk")],  # gibberish
            "doc_id long, text string")
        ppl = {r["doc_id"]: r["perplexity"] for r in
               perplexity(docs, lm).collect()}
        assert ppl[0] < ppl[2]          # seen order beats scrambled
        assert ppl[1] < ppl[2]          # in-domain novel beats scrambled
        assert ppl[0] < ppl[3]          # and beats OOV gibberish
        assert ppl[1] < ppl[3]

    def test_probability_mass_sums_to_one_unsmoothed_context(self,
                                                            spark,
                                                            train_df):
        """Over the full vocab (+UNK), conditional probabilities from a
        trained context must sum to ~1 for every interpolation order."""
        lm = train_ngram_lm(train_df, order=2)
        vocab = [g[0] for g in lm.counts[0]] + [UNK]
        ctx = ("the",)
        total = sum(2 ** lm.logprob(ctx, w) for w in vocab)
        # add-k over (vocab_size) with UNK in vocab: sums to 1 exactly
        assert total == pytest.approx(1.0, abs=1e-6)


class TestHighOrder:
    def test_order_above_five_keeps_unigram_floor(self, spark, train_df):
        """Regression: weights were once a hardcoded 5-entry list, so
        order>5 silently dropped the unigram floor and an unseen context
        raised math.log2(0). The derived ladder must cover every order."""
        lm = train_ngram_lm(train_df, order=6)
        w = lm.weights()
        assert len(w) == 6 and w[:5] == [0.7, 0.2, 0.1, 0.05, 0.025]
        assert w[5] == pytest.approx(0.0125)
        # an all-OOV doc: every context unseen, only the unigram floor
        # contributes — must score finite, not raise
        lp, n = lm.doc_logprob(["zzz", "qqq", "xxx"])
        assert math.isfinite(lp) and n == 4
        docs = spark.createDataFrame([(0, "zzz qqq xxx")],
                                     "doc_id long, text string")
        [r] = perplexity(docs, lm).collect()
        assert r["perplexity"] is not None and math.isfinite(r["perplexity"])


class TestVectorizedScorer:
    def test_parity_on_random_corpus(self, spark, train_df):
        """Vectorized batch scorer == pure-python doc_logprob at 1e-9 on
        a corpus mixing in-vocab, OOV, repeated and single-token docs."""
        import numpy as np

        lm = train_ngram_lm(train_df, order=3)
        rng = np.random.default_rng(7)
        pool = ("the cat dog sat on mat rug a and are friends together "
                "zzz qqq unknownword xx9").split()
        docs = [" ".join(rng.choice(pool, size=int(n)))
                for n in rng.integers(1, 40, size=60)]
        vm = lm.vectorized()
        got = vm.score_tokens([d.split() for d in docs])
        for d, g in zip(docs, got):
            lp, n = lm.doc_logprob(d.split())
            assert g == pytest.approx(2 ** (-lp / n), rel=1e-9), d

    def test_literal_padding_tokens_when_bos_truncated(self, spark):
        """If BOS is truncated out of the kept unigram table, a literal
        '<s>' DOCUMENT token must UNK-map in the vectorized scorer exactly
        as doc_logprob maps it — padding ids are reserved for synthetic
        positions only."""
        # unigram counts: the=15 > </s>=3 = <s>=3 = zap=3; tie-break is
        # lexicographic on the gram, so max_ngrams=2 keeps {the, </s>}
        # and BOS is truncated OUT of the vocab
        df = spark.createDataFrame(
            [("the the the the the zap",)] * 3, "text string")
        lm = train_ngram_lm(df, order=2, max_ngrams=2)
        assert (BOS,) not in lm.counts[0] and (EOS,) in lm.counts[0]
        vm = lm.vectorized()
        for doc in ["<s> the", "</s> the zap", "<s> </s> <unk>"]:
            toks = doc.split()
            lp, n = lm.doc_logprob(toks)
            got = vm.score_tokens([toks])[0]
            assert got == pytest.approx(2 ** (-lp / n), rel=1e-9), doc

    def test_distributed_parity_and_nulls(self, spark, train_df):
        lm = train_ngram_lm(train_df, order=2)
        rows = [(0, "the cat sat"), (1, None), (2, "   "),
                (3, "oov1 oov2 oov3")]
        got = {r["doc_id"]: r["perplexity"] for r in
               perplexity(spark.createDataFrame(
                   rows, "doc_id long, text string"), lm).collect()}
        assert got[1] is None and got[2] is None
        for i, t in [(0, "the cat sat"), (3, "oov1 oov2 oov3")]:
            lp, n = lm.doc_logprob(t.split())
            assert got[i] == pytest.approx(2 ** (-lp / n), rel=1e-9)
