"""BPE tokenizer: merge learning, encoding invariants, Spark wiring."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from helium_etl_lite_spark.operators import bpe


class TestTrainMerges:
    def test_textbook_example(self):
        # Sennrich's worked example shape: 'low'x5 'lower'x2 'newest'x6
        # 'widest'x3 — the first merges must assemble the frequent
        # 'est</w>' suffix (e+s=9+... pair counts: ('e','s') appears in
        # newest(6)+widest(3)=9, the max).
        wc = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
        merges = bpe.train_merges(wc, num_merges=4)
        assert merges[0] == ("e", "s")
        assert merges[1] == ("es", "t")
        assert merges[2] == ("est", bpe.END)

    def test_deterministic_tiebreak(self):
        # Two pairs with equal counts -> lexicographically smaller wins.
        wc = [("ab", 3), ("cd", 3)]
        merges = bpe.train_merges(wc, num_merges=1)
        assert merges[0] == ("a", "b")

    def test_empty_and_exhausted(self):
        assert bpe.train_merges([], 10) == []
        # single-char word: only pair is (c, END); loop then exhausts
        merges = bpe.train_merges([("a", 1)], 10)
        assert merges == [("a", bpe.END)]


class TestEncodeWord:
    def test_roundtrip_concatenation(self):
        # Concatenating the tokens (end marker stripped) rebuilds the
        # word exactly, for any merge table.
        wc = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
        ranks = {tuple(p): i for i, p in enumerate(bpe.train_merges(wc, 6))}
        for w in ["low", "lower", "newest", "widest", "lowest", "zzz"]:
            toks = bpe.encode_word(w, ranks)
            assert "".join(toks).replace(bpe.END, "") == w

    def test_zero_merges_is_char_level(self):
        assert bpe.encode_word("abc", {}) == ["a", "b", "c", bpe.END]

    def test_more_merges_never_increase_count(self):
        wc = [("banana", 4), ("bandana", 2), ("ananas", 3)]
        all_merges = bpe.train_merges(wc, 12)
        prev = None
        for k in range(len(all_merges) + 1):
            ranks = {tuple(p): i for i, p in enumerate(all_merges[:k])}
            n = len(bpe.encode_word("banana", ranks))
            if prev is not None:
                assert n <= prev
            prev = n

    def test_fully_trained_frequent_word_is_one_token(self):
        wc = [("spark", 50)]
        ranks = {tuple(p): i for i, p in enumerate(bpe.train_merges(wc, 20))}
        assert bpe.encode_word("spark", ranks) == ["spark" + bpe.END]


class TestSparkWiring:
    @pytest.fixture(scope="class")
    def docs(self, spark):
        rows = [
            (0, "the quick brown fox jumps over the lazy dog"),
            (1, "the quick fox"),
            (2, None),
            (3, ""),
            (4, "the the the the"),
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_counts_match_local_encoder(self, docs):
        merges = bpe.train_bpe(docs, num_merges=30)
        ranks = {tuple(p): i for i, p in enumerate(merges)}
        got = {
            r["doc_id"]: r["n_tokens_bpe"]
            for r in bpe.bpe_token_counts(docs, merges).collect()
        }
        for row in docs.collect():
            text = row["text"] or ""
            want = sum(len(bpe.encode_word(w, ranks)) for w in text.split())
            assert got[row["doc_id"]] == want

    def test_bounds_vs_whitespace_and_chars(self, docs):
        # n_words <= n_tokens_bpe <= n_nonspace_chars + n_words (the
        # char-level ceiling includes one END marker per word).
        merges = bpe.train_bpe(docs, num_merges=5)
        out = bpe.bpe_token_counts(docs, merges).collect()
        for r in out:
            text = next(
                x["text"] for x in docs.collect() if x["doc_id"] == r["doc_id"]
            )
            words = (text or "").split()
            n_chars = sum(len(w) for w in words)
            assert len(words) <= r["n_tokens_bpe"] <= n_chars + len(words)

    def test_partition_invariance(self, spark, docs):
        merges = bpe.train_bpe(docs, num_merges=30)
        a = sorted(
            (r["doc_id"], r["n_tokens_bpe"])
            for r in bpe.bpe_token_counts(docs, merges).collect()
        )
        b = sorted(
            (r["doc_id"], r["n_tokens_bpe"])
            for r in bpe.bpe_token_counts(
                docs.repartition(7, "doc_id"), merges
            ).collect()
        )
        assert a == b

    def test_training_partition_invariance(self, docs):
        m1 = bpe.train_bpe(docs, num_merges=20)
        m2 = bpe.train_bpe(docs.repartition(5), num_merges=20)
        assert m1 == m2

    def test_vocab_limit_truncates_by_frequency(self, docs):
        # With vocab_limit=1 only the most frequent word ('the') trains
        # the merges; 'the' must encode to one token, rare words stay
        # multi-token.
        merges = bpe.train_bpe(docs, num_merges=10, vocab_limit=1)
        ranks = {tuple(p): i for i, p in enumerate(merges)}
        assert bpe.encode_word("the", ranks) == ["the" + bpe.END]
        assert len(bpe.encode_word("jumps", ranks)) > 1

    def test_budget_query_runs(self, spark):
        from helium_etl_lite_spark.queries.curation import (
            sample_token_budget_bpe,
        )

        out = sample_token_budget_bpe(spark, "/root/testdata/sf0.001")
        rows = out.collect()
        assert len(rows) > 0
        assert set(out.columns) == {
            "doc_id", "n_chars", "n_tokens_bpe", "cum_tokens_bpe"
        }
        # the running total respects the budget and each row's count
        assert all(r["cum_tokens_bpe"] <= 20000 for r in rows)
        assert all(r["n_tokens_bpe"] >= 1 for r in rows)


class TestBpeProperties:
    def test_roundtrip_and_bounds_random_words(self):
        # hypothesis: for any corpus and any merge count, every word's
        # encoding concatenates back to the word and token counts stay
        # within [1, len(word)+1].
        from hypothesis import given, settings
        from hypothesis import strategies as st

        word = st.text(alphabet="abcdef", min_size=1, max_size=8)

        @settings(max_examples=50, deadline=None)
        @given(
            words=st.lists(word, min_size=1, max_size=12),
            n_merges=st.integers(min_value=0, max_value=30),
        )
        def check(words, n_merges):
            wc = [(w, i + 1) for i, w in enumerate(dict.fromkeys(words))]
            merges = bpe.train_merges(wc, n_merges)
            ranks = {tuple(p): i for i, p in enumerate(merges)}
            for w in words:
                toks = bpe.encode_word(w, ranks)
                assert "".join(toks).replace(bpe.END, "") == w
                assert 1 <= len(toks) <= len(w) + 1

        check()


class TestPretrainingBpeVariant:
    def test_flagship_bpe_conserves_token_accounting(self, spark, sf_dir):
        # r6 verdict item 7 gate: the BPE-budgeted flagship must (a)
        # stay within budget, (b) carry per-doc BPE counts inside the
        # conservation envelope [n_words, n_chars+n_words] vs the doc's
        # own text, and (c) have cumulative sums that replay exactly in
        # (score DESC, doc_id) selection order.
        from helium_etl_lite_spark.queries.curation import (
            _pretraining_scored,
            pipeline_pretraining_select_bpe,
        )

        out = pipeline_pretraining_select_bpe(spark, sf_dir).collect()
        assert out
        assert all(r["cum_tokens_bpe"] <= 6000 for r in out)
        texts = {
            r["doc_id"]: r["text"]
            for r in _pretraining_scored(spark, sf_dir, keep_text=True).collect()
        }
        for r in out:
            words = texts[r["doc_id"]].split()
            n_chars = sum(len(w) for w in words)
            assert len(words) <= r["n_tokens"] <= n_chars + len(words)
        sel = sorted(out, key=lambda r: (-r["score_raw"], r["doc_id"]))
        acc = 0
        for r in sel:
            acc += r["n_tokens"]
            assert r["cum_tokens_bpe"] == acc


class TestBpePortableVsReference:
    """The distributed portable trainer vs a from-scratch classic BPE
    implemented independently here (Sennrich-style greedy merges on
    word frequency) — catches replace-semantics divergence that the
    cross-engine oracle, which shares the replace trick, cannot."""

    @staticmethod
    def _reference_bpe(word_counts, rounds):
        import collections

        seqs = {w: tuple(list(w) + ["_"]) for w in word_counts}
        merges = []
        for _ in range(rounds):
            pairs = collections.Counter()
            for w, n in word_counts.items():
                s = seqs[w]
                for i in range(len(s) - 1):
                    pairs[(s[i], s[i + 1])] += n
            if not pairs:
                break
            # argmax with (count DESC, pair ASC) tie-break
            best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            merges.append((best[0] + " " + best[1], pairs[best]))
            out = {}
            for w, s in seqs.items():
                r, i = [], 0
                while i < len(s):
                    if i + 1 < len(s) and (s[i], s[i + 1]) == best:
                        r.append(s[i] + s[i + 1])
                        i += 2
                    else:
                        r.append(s[i])
                        i += 1
                out[w] = tuple(r)
            seqs = out
        return merges

    def test_merge_sequence_matches_reference(self, spark, tmp_path):
        import re as _re

        from helium_etl_lite_spark import registry

        registry.load_all()
        texts = [
            "the cat sat on the mat",
            "the cats sat",
            "a hat a mat a cat",
            "aaa aa aaa aa aaa",  # overlapping same-symbol merges
            "x",                  # single-char word collapses to 1 token
        ]
        rows = [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)]
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
        got = registry.QUERIES["text_bpe_train_portable"](
            spark, str(tmp_path)
        ).collect()

        import collections

        wc = collections.Counter(
            w for t in texts for w in _re.findall(r"[a-z]+", t.lower())
        )
        want = self._reference_bpe(dict(wc), rounds=len(got))
        assert [(r["pair"], r["pair_cnt"]) for r in got] == want


class TestBpeApplyTrickFuzz:
    """The padded double-space literal-replace merge (llm_ops.py
    _bpep_apply_sql) vs an independent greedy left-to-right scan —
    pure-Python property test (str.replace is leftmost-nonoverlapping,
    the same contract as Spark/DuckDB replace), so hypothesis can fuzz
    thousands of sequences without an engine."""

    @staticmethod
    def _trick(seq, a, b):
        padded = " " + seq.replace(" ", "  ") + " "
        out = padded.replace(f" {a}  {b} ", f" {a}{b} ")
        return out.replace("  ", " ").strip()

    @staticmethod
    def _greedy(seq, a, b):
        s = seq.split(" ")
        r, i = [], 0
        while i < len(s):
            if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                r.append(a + b)
                i += 2
            else:
                r.append(s[i])
                i += 1
        return " ".join(r)

    def test_fuzz_equivalence(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        symbol = st.text(alphabet="ab_", min_size=1, max_size=3)

        @settings(max_examples=2000, deadline=None)
        @given(
            st.lists(symbol, min_size=1, max_size=12),
            symbol,
            symbol,
        )
        def check(symbols, a, b):
            seq = " ".join(symbols)
            assert self._trick(seq, a, b) == self._greedy(seq, a, b)

        check()
