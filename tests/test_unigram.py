"""Unigram-LM tokenizer gates (operators/unigram.py, Kudo 2018):
conservation (segmentations exactly cover each word), determinism
under repartitioning (the integer Viterbi-EM claim), learnability
(frequent words become single pieces), and the BPE-vs-unigram budget
comparison the registered queries exist for."""

from __future__ import annotations

from pyspark.sql import functions as F

from helium_etl_lite_spark.operators import bpe, unigram


def _docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the the the quick quick brown"),
        (3, "internationalization and localization considerations"),
        (4, "spark shuffles partition data across the cluster"),
        (5, "the fox and the dog and the fox again"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestUnigramTrainer:
    def test_segmentation_conserves_characters(self, spark):
        # Every Viterbi segmentation must concatenate back to the word —
        # the lattice-coverage invariant that makes token counts
        # meaningful. Checked for every distinct word in the corpus.
        d = _docs(spark)
        logp = unigram.train_unigram(d, vocab_target=60, seed_size=200)
        words = {
            w
            for (t,) in d.select("text").collect()
            for w in t.split()
        }
        for w in words:
            seg = unigram.viterbi_segment(w, logp)
            assert "".join(seg) == w, (w, seg)
            assert all(len(p) >= 1 for p in seg)

    def test_frequent_word_becomes_single_piece(self, spark):
        # 'the' dominates the corpus; EM must keep it whole (one piece)
        # while a rare long word splits into several.
        d = _docs(spark)
        logp = unigram.train_unigram(d, vocab_target=60, seed_size=200)
        assert unigram.viterbi_segment("the", logp) == ["the"]
        rare = unigram.viterbi_segment("internationalization", logp)
        assert len(rare) >= 2

    def test_training_is_partitioning_invariant(self, spark):
        # Integer Viterbi-EM counts make the E-step aggregation exact,
        # so the trained piece table — and therefore every token
        # count — must be identical however the corpus is partitioned.
        d = _docs(spark)
        logp_1 = unigram.train_unigram(d.coalesce(1), vocab_target=60, seed_size=200)
        logp_7 = unigram.train_unigram(d.repartition(7), vocab_target=60, seed_size=200)
        assert set(logp_1) == set(logp_7)
        for p in logp_1:
            assert abs(logp_1[p] - logp_7[p]) == 0.0
        c1 = {
            r["doc_id"]: r["n"]
            for r in unigram.unigram_token_counts(d.repartition(5), logp_1)
            .select("doc_id", F.col("n_tokens_unigram").alias("n"))
            .collect()
        }
        c2 = {
            r["doc_id"]: r["n"]
            for r in unigram.unigram_token_counts(d.coalesce(1), logp_7)
            .select("doc_id", F.col("n_tokens_unigram").alias("n"))
            .collect()
        }
        assert c1 == c2

    def test_unknown_characters_still_segment(self, spark):
        d = _docs(spark)
        logp = unigram.train_unigram(d, vocab_target=60, seed_size=200)
        seg = unigram.viterbi_segment("zzzézzz", logp)
        assert "".join(seg) == "zzzézzz"

    def test_unigram_vs_bpe_budget_comparison(self, spark, sf_dir):
        # The registered query's point: the two tokenizer families
        # price the same corpus differently, but both sit in a sane
        # band around the whitespace count (>= ws: subword splits only
        # add tokens; <= 8x ws: vocab coverage keeps words from
        # exploding into characters).
        from helium_etl_lite_spark import registry

        registry.load_all()
        rows = registry.QUERIES["text_tokenize_unigram_lm"](
            spark, sf_dir
        ).collect()
        assert len(rows) > 0
        for r in rows:
            assert r.n_tokens_unigram >= r.n_tokens_ws
            assert r.n_tokens_bpe >= r.n_tokens_ws
            assert r.n_tokens_unigram <= 8 * r.n_tokens_ws
            assert r.n_tokens_bpe <= 8 * r.n_tokens_ws
        # and they must actually DIFFER somewhere — otherwise the
        # comparison carries no information.
        assert any(r.n_tokens_unigram != r.n_tokens_bpe for r in rows)

    def test_budget_query_conserves_budget(self, spark, sf_dir):
        from helium_etl_lite_spark import registry

        registry.load_all()
        rows = registry.QUERIES["sample_token_budget_unigram"](
            spark, sf_dir
        ).collect()
        assert len(rows) > 0
        assert max(r.cum_tokens_unigram for r in rows) <= 20000


class TestUnigramPortable:
    """Integer-cost Viterbi twin (operators/unigram.py
    viterbi_cost_segment): DP optimality vs brute-force enumeration,
    combined-integer decode, corpus coverage."""

    def test_dp_matches_bruteforce_on_random_words(self):
        import itertools
        import random

        from helium_etl_lite_spark.operators.unigram import (
            UNIGRAM_PORTABLE_COSTS,
            UNIGRAM_PORTABLE_MAX_PIECE,
            viterbi_cost_segment,
        )

        def brute(word):
            n = len(word)
            best = None
            # enumerate all compositions of n into parts <= max piece
            for cuts in itertools.product(
                [0, 1], repeat=max(0, n - 1)
            ):
                bounds = (
                    [0]
                    + [i + 1 for i, c in enumerate(cuts) if c]
                    + [n]
                )
                pieces = [
                    word[a:b] for a, b in zip(bounds, bounds[1:])
                ]
                if any(
                    len(p) > UNIGRAM_PORTABLE_MAX_PIECE
                    or p not in UNIGRAM_PORTABLE_COSTS
                    for p in pieces
                ):
                    continue
                v = sum(
                    1024 * UNIGRAM_PORTABLE_COSTS[p] + 1 for p in pieces
                )
                if best is None or v < best:
                    best = v
            return (best % 1024, best // 1024)

        rng = random.Random(910)
        words = ["customer", "window", "the", "a", "spark"]
        for _ in range(30):
            n = rng.randint(1, 8)
            words.append(
                "".join(rng.choice("abcdefghijklmnopqrstuvwxyz") for _ in range(n))
            )
        for w in words:
            assert viterbi_cost_segment(
                w, UNIGRAM_PORTABLE_COSTS, UNIGRAM_PORTABLE_MAX_PIECE
            ) == brute(w), w

    def test_portable_query_runs_exact_shape(self, spark, sf_dir):
        from helium_etl_lite_spark import registry

        registry.load_all()
        rows = registry.QUERIES["text_tokenize_unigram_portable"](
            spark, sf_dir
        ).collect()
        assert len(rows) > 0
        for r in rows:
            assert r.n_tokens_unigram >= r.n_words  # >=1 token per word
            assert r.total_cost > 0

    def test_unsegmentable_word_fails_loud(self):
        import pytest

        from helium_etl_lite_spark.operators.unigram import (
            UNIGRAM_PORTABLE_COSTS,
            UNIGRAM_PORTABLE_MAX_PIECE,
            viterbi_cost_segment,
        )

        with pytest.raises(ValueError, match="unsegmentable"):
            viterbi_cost_segment(
                "Héllo", UNIGRAM_PORTABLE_COSTS, UNIGRAM_PORTABLE_MAX_PIECE
            )
