"""Unit tests for the reusable operators (SURVEY §5.2): tiny literal
DataFrames, golden edge cases."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from helium_etl_lite_spark.operators import dedup, knn, multimodal, text
from helium_etl_lite_spark.operators.asof_join import asof_join


@pytest.fixture()
def docs(spark):
    rows = [
        (1, "the quick brown fox", "en"),
        (2, "the quick brown fox", "en"),          # exact dup of 1
        (3, "the quick brown foxes", "en"),        # near dup
        (4, "completely different words here now", "en"),
        (5, "otra frase totalmente distinta", "es"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


class TestAsofJoin:
    def test_picks_latest_at_or_before(self, spark):
        left = spark.createDataFrame(
            [(1, 10, 100), (2, 10, 205), (3, 20, 150)], "id long, key long, ts long"
        )
        right = spark.createDataFrame(
            [(10, 90, 7), (10, 200, 8), (10, 205, 9), (20, 160, 10)],
            "key long, ts long, val long",
        )
        out = asof_join(
            left, right, left_id="id", left_on="key", right_on="key",
            left_ts="ts", right_ts="ts", right_tiebreak="val",
        ).select("id", "val").collect()
        got = {r["id"]: r["val"] for r in out}
        assert got[1] == 7       # only ts=90 <= 100
        assert got[2] == 9       # ts=205 == 205 inclusive
        assert got[3] is None    # no right row at or before 150 for key 20

    def test_tie_breaks_deterministically(self, spark):
        left = spark.createDataFrame([(1, 10, 100)], "id long, key long, ts long")
        right = spark.createDataFrame(
            [(10, 100, 1), (10, 100, 2)], "key long, ts long, val long"
        )
        out = asof_join(
            left, right, left_id="id", left_on="key", right_on="key",
            left_ts="ts", right_ts="ts", right_tiebreak="val",
        ).collect()
        assert len(out) == 1 and out[0]["val"] == 2  # highest tiebreak wins


class TestDedup:
    def test_exact_dedup_groups_identical_text(self, spark, docs):
        out = dedup.exact_dedup(docs).collect()
        by_keeper = {r["keeper_doc_id"]: r["n_copies"] for r in out}
        assert by_keeper[1] == 2          # docs 1,2 collapse
        assert len(out) == 4              # 5 docs → 4 distinct texts

    def test_minhash_lsh_finds_planted_near_dup(self, spark, docs):
        pairs = dedup.minhash_lsh_pairs(docs, num_perm=16, bands=8, jaccard_threshold=0.5)
        got = {(r["doc_a"], r["doc_b"]) for r in pairs.collect()}
        assert (1, 2) in got              # exact dup always survives
        assert (1, 3) in got or (2, 3) in got  # near dup (jaccard 0.6)
        assert all(a < b for a, b in got)

    def test_simhash_hamming_zero_for_identical(self, spark, docs):
        pairs = dedup.simhash_near_pairs(docs, max_hamming=8)
        got = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in pairs.collect()}
        assert got[(1, 2)] == 0

    def test_minhash_signature_positions_are_distinct_permutations(self, spark):
        # Regression: a two-parameter transform lambda is dispatched as
        # (element, index), shadowing the permutation constant — every
        # signature position then held the identical single-permutation
        # min. Assert the positions differ AND match an independent
        # explode+groupBy reference computation.
        docs = spark.createDataFrame(
            [(1, "a b c d e f"), (2, "w x y z")], "doc_id long, text string"
        )
        sig = {r["doc_id"]: r["sig"] for r in dedup.minhash_signatures(docs, 8).collect()}
        for s in sig.values():
            assert len(set(s)) > 1, "all signature positions identical — permutation collapsed"
        M = dedup._MERSENNE
        ref = (
            docs.select("doc_id", F.explode(F.array_distinct(F.split("text", " "))).alias("tok"))
            .select(
                "doc_id",
                *[
                    F.pmod(
                        F.lit(dedup._PERM_AB[p][0]) * F.pmod(F.xxhash64("tok"), F.lit(M))
                        + F.lit(dedup._PERM_AB[p][1]),
                        F.lit(M),
                    ).alias(f"h{p}")
                    for p in range(8)
                ],
            )
            .groupBy("doc_id")
            .agg(*[F.min(f"h{p}").alias(f"m{p}") for p in range(8)])
            .collect()
        )
        for r in ref:
            assert sig[r["doc_id"]] == [r[f"m{p}"] for p in range(8)]

    def test_minhash_signatures_exclude_null_text(self, spark):
        docs = spark.createDataFrame(
            [(1, "a b c"), (2, None), (3, None)], "doc_id long, text string"
        )
        out = dedup.minhash_signatures(docs, 4).collect()
        assert {r["doc_id"] for r in out} == {1}
        # and the downstream pair generator never emits NULL-doc collisions
        pairs = dedup.minhash_lsh_pairs(docs, 8, 4, 0.1).collect()
        assert not any(2 in (r["doc_a"], r["doc_b"]) or 3 in (r["doc_a"], r["doc_b"]) for r in pairs)

    def test_ngram_jaccard_respects_blocking(self, spark, docs):
        pairs = dedup.ngram_jaccard_pairs(docs, block_col="lang", threshold=0.1)
        got = {(r["doc_a"], r["doc_b"]) for r in pairs.collect()}
        assert (1, 2) in got
        assert not any(5 in p for p in got)  # es doc never pairs with en docs


class TestKnn:
    @pytest.fixture()
    def vecs(self, spark):
        rows = [
            (0, [1.0, 0.0, 0.0]),
            (1, [0.9, 0.1, 0.0]),   # close to 0
            (2, [0.0, 1.0, 0.0]),
            (3, [-1.0, 0.0, 0.0]),  # opposite of 0
        ]
        return spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    def test_topk_orders_by_cosine(self, spark, vecs):
        out = knn.cosine_topk(vecs, vecs.where(F.col("vec_id") == 0), k=3).collect()
        ranked = [r["vec_id"] for r in sorted(out, key=lambda r: r["rn"])]
        assert ranked == [1, 2, 3]

    def test_centroid_assignment(self, spark, vecs):
        out = knn.assign_nearest_centroid(vecs, vecs.where(F.col("vec_id") <= 1))
        got = {r["vec_id"]: r["centroid_id"] for r in out.collect()}
        assert got[0] == 0 and got[1] == 1
        assert got[2] in (0, 1) and got[3] == 1  # 3 is closer to 1 than to 0

    def test_lsh_buckets_deterministic(self, spark, vecs):
        b1 = {r["vec_id"]: r["bucket"] for r in knn.hyperplane_lsh_buckets(vecs, 8, 3).collect()}
        b2 = {r["vec_id"]: r["bucket"] for r in knn.hyperplane_lsh_buckets(vecs, 8, 3).collect()}
        assert b1 == b2
        assert all(len(v) == 8 for v in b1.values())

    def test_lloyd_refine_moves_centroid_to_member_mean(self, spark, vecs):
        # seed = vec 0 only → every vector assigns to it → refined
        # centroid is the mean of all four embeddings.
        cents = knn.lloyd_refine(vecs, vecs.where(F.col("vec_id") == 0)).collect()
        assert len(cents) == 1
        got = cents[0]["embedding"]
        assert [round(x, 6) for x in got] == [0.225, 0.275, 0.0]

    def test_ivf_probe_finds_true_neighbor(self, spark, vecs):
        # With every list probed, IVF must agree with brute force.
        out = knn.ann_topk_ivf(
            vecs, vecs.where(F.col("vec_id") == 0), k=3, n_lists=2, nprobe=2
        ).collect()
        ranked = [r["vec_id"] for r in sorted(out, key=lambda r: r["rn"])]
        assert ranked[0] == 1  # nearest neighbor survives the probe

    def test_ivf_lists_cover_all_vectors(self, spark, vecs):
        _, lists = knn.ivf_build(vecs, n_lists=2)
        assert lists.count() == vecs.count()
        assert lists.select("vec_id").distinct().count() == vecs.count()


class TestKmeansPortable:
    """kmeans_portable_quantized vs an independent numpy model of the
    same quantized-Lloyd spec — the operator's exactness claim is that
    EVERY engine computes these integers identically, so the test
    model recomputes them from scratch (half-away rounding, integer
    squared distances, floor(sum/count) re-centering, centroid-id
    ties)."""

    SCALE = 1000

    @pytest.fixture()
    def vecs(self, spark):
        import numpy as np

        rng = np.random.default_rng(7)
        self._emb = rng.uniform(-0.5, 0.5, size=(12, 4)).astype("float32")
        rows = [(i, [float(x) for x in self._emb[i]]) for i in range(12)]
        return spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    def _numpy_model(self, emb, k, rounds, scale):
        import numpy as np

        v = emb.astype("float64") * scale
        q = np.sign(v) * np.floor(np.abs(v) + 0.5)  # half away from zero
        cents = {i: q[i].copy() for i in range(k)}

        def assign():
            out = {}
            for i in range(len(q)):
                best = min(
                    cents.items(),
                    key=lambda kv: (float(np.sum((q[i] - kv[1]) ** 2)), kv[0]),
                )
                out[i] = (best[0], float(np.sum((q[i] - best[1]) ** 2)))
            return out

        for _ in range(rounds):
            a = assign()
            new = {}
            for cid in set(c for c, _ in a.values()):
                members = [q[i] for i, (c, _) in a.items() if c == cid]
                new[cid] = np.floor(np.sum(members, axis=0) / len(members))
            cents = new
        final = assign()
        stats = {}
        for i, (c, d) in final.items():
            n, s = stats.get(c, (0, 0))
            stats[c] = (n + 1, s + int(d))
        return stats

    def test_matches_numpy_model(self, spark, vecs):
        stats, _ = knn.kmeans_portable_quantized(
            vecs, k=2, scale=self.SCALE, rounds=2, n_tasks=4
        )
        got = {r["centroid_id"]: (r["n_members"], r["inertia_q"]) for r in stats.collect()}
        want = self._numpy_model(self._emb, k=2, rounds=2, scale=self.SCALE)
        assert got == want

    def test_ivf_portable_full_probe_equals_brute_force(self, spark, vecs):
        # nprobe == n_lists removes the approximation: the probe must
        # return exactly the integer-distance brute-force top-k.
        out = knn.ann_topk_ivf_portable(
            vecs, vecs.where(F.col("vec_id") < 2), k=3,
            n_lists=2, nprobe=2, scale=self.SCALE, rounds=1, n_tasks=4,
        ).collect()
        import numpy as np

        v = self._emb.astype("float64") * self.SCALE
        q = np.sign(v) * np.floor(np.abs(v) + 0.5)
        for qid in (0, 1):
            dists = sorted(
                (int(np.sum((q[qid] - q[j]) ** 2)), j)
                for j in range(len(q)) if j != qid
            )
            want = [(j, d) for d, j in dists[:3]]
            got = [
                (r["vec_id"], r["dist_q"])
                for r in sorted(
                    (r for r in out if r["q_id"] == qid), key=lambda r: r["rn"]
                )
            ]
            assert got == want

    def test_ivf_portable_partial_probe_is_subset(self, spark, vecs):
        # nprobe < n_lists may MISS neighbors but must never invent
        # one: every returned (q, neighbor, dist) also appears in the
        # full-probe result with the same exact distance.
        full = {
            (r["q_id"], r["vec_id"]): r["dist_q"]
            for r in knn.ann_topk_ivf_portable(
                vecs, vecs.where(F.col("vec_id") < 2), k=12,
                n_lists=3, nprobe=3, scale=self.SCALE, rounds=1, n_tasks=4,
            ).collect()
        }
        part = knn.ann_topk_ivf_portable(
            vecs, vecs.where(F.col("vec_id") < 2), k=12,
            n_lists=3, nprobe=1, scale=self.SCALE, rounds=1, n_tasks=4,
        ).collect()
        assert part  # probe of the query's own nearest list is never empty
        for r in part:
            assert full[(r["q_id"], r["vec_id"])] == r["dist_q"]

    def test_inertia_monotone_over_rounds(self, spark, vecs):
        # Lloyd's algorithm never increases total inertia: each assign
        # step is optimal given centroids, each re-center is optimal
        # given assignments (floor() perturbs by <1 quantum per dim —
        # negligible against these inertia magnitudes).
        totals = []
        for r in (1, 2, 3):
            stats, _ = knn.kmeans_portable_quantized(
                vecs, k=2, scale=self.SCALE, rounds=r, n_tasks=4
            )
            totals.append(sum(row["inertia_q"] for row in stats.collect()))
        assert totals[0] >= totals[1] >= totals[2]


class TestText:
    def test_quality_features(self, spark, docs):
        out = {r["doc_id"]: r for r in text.quality_features(docs).collect()}
        assert out[1]["n_tokens"] == 4
        assert out[1]["stopword_ratio"] == 0.25          # 'the' of 4 tokens
        assert out[1]["type_token_ratio"] == 1.0
        assert out[2]["quality_score"] == out[1]["quality_score"]

    def test_fingerprint_stable_and_distinct(self, spark, docs):
        out = {r["doc_id"]: r["fingerprint"] for r in text.rolling_fingerprint(docs).collect()}
        assert out[1] == out[2]            # identical text → identical fp
        assert out[1] != out[3]

    def test_lang_id_runs(self, spark, docs):
        out = {r["doc_id"]: r["lang_pred"] for r in text.lang_id_heuristic(docs).collect()}
        assert set(out) == {1, 2, 3, 4, 5}
        assert all(isinstance(v, str) for v in out.values())


class TestMultimodal:
    def test_binary_roundtrip_schema(self, spark, docs):
        assets = multimodal.to_binary_assets(docs)
        decoded = multimodal.decode_assets(assets)
        assert decoded.columns == [
            "doc_id", "fmt", "n_bytes", "width", "height",
            "channels", "maxval", "n_frames", "mean_pixel", "checksum",
        ]
        rows = {r["doc_id"]: r for r in decoded.collect()}
        assert rows[1]["fmt"] == "opaque"  # text payload, no image magic
        assert rows[1]["n_bytes"] == len("the quick brown fox")
        assert rows[1]["width"] == rows[1]["n_bytes"] % 640
        assert rows[1]["checksum"] == rows[2]["checksum"]

    def test_decode_ppm_p6(self):
        # 2x2 RGB, one comment line, pixel plane = 12 known bytes
        plane = bytes([10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120])
        img = multimodal.decode_image(b"P6\n# fixture\n2 2\n255\n" + plane)
        assert img == {
            "fmt": "ppm", "width": 2, "height": 2, "channels": 3,
            "maxval": 255, "mean_pixel": round(sum(plane) / 12, 6),
        }

    def test_decode_pgm_16bit(self):
        # 3x1 grayscale with maxval 65535 → big-endian 2-byte samples
        import struct

        samples = (0, 1000, 65535)
        img = multimodal.decode_image(
            b"P5\n3 1\n65535\n" + struct.pack(">3H", *samples)
        )
        assert img["fmt"] == "pgm" and img["channels"] == 1
        assert (img["width"], img["height"], img["maxval"]) == (3, 1, 65535)
        assert img["mean_pixel"] == round(sum(samples) / 3, 6)

    def test_decode_bmp_24bpp_row_padding(self):
        # 3x2 bottom-up 24bpp: row stride pads 9 bytes → 12; padding
        # must not leak into the pixel mean.
        import struct

        rows = [bytes(range(9)) + b"\xff\xff\xff",       # row + junk padding
                bytes(range(100, 109)) + b"\xff\xff\xff"]
        pixel_array = b"".join(rows)
        header = (
            b"BM" + struct.pack("<IHHI", 54 + len(pixel_array), 0, 0, 54)
            + struct.pack("<IiiHHIIiiII", 40, 3, 2, 1, 24, 0,
                          len(pixel_array), 2835, 2835, 0, 0)
        )
        img = multimodal.decode_image(header + pixel_array)
        true_px = list(range(9)) + list(range(100, 109))
        assert (img["fmt"], img["width"], img["height"], img["channels"]) == ("bmp", 3, 2, 3)
        assert img["mean_pixel"] == round(sum(true_px) / len(true_px), 6)

    def test_decode_truncated_image_raises(self):
        with pytest.raises(ValueError):
            multimodal.decode_netpbm(b"P6\n4 4\n255\n\x00\x01")  # plane too short
        assert multimodal.decode_image(b"GIF89a....") is None  # unknown magic

    def test_encode_decode_ppm_roundtrip(self, spark, docs):
        # encode_ppm renders text bytes into a real P6 payload; the real
        # decoder must recover the declared geometry and the exact mean
        # (text bytes + zero padding over width*height*3).
        decoded = {r["doc_id"]: r for r in
                   multimodal.decode_assets(multimodal.encode_ppm(docs, width=4)).collect()}
        text = "the quick brown fox"
        raw = text.encode()
        h = -(-len(raw) // 12)
        assert decoded[1]["fmt"] == "ppm"
        assert decoded[1]["width"] == 4 and decoded[1]["height"] == h
        assert decoded[1]["mean_pixel"] == round(sum(raw) / (4 * h * 3), 6)
        assert decoded[1]["n_frames"] == 1

    def test_feature_extract_byte_stats(self, spark, docs):
        feats = {r["doc_id"]: r for r in
                 multimodal.extract_features(multimodal.to_binary_assets(docs)).collect()}
        text = "the quick brown fox"
        assert feats[1]["n_bytes"] == len(text)
        assert feats[1]["mean_byte"] == round(sum(text.encode()) / len(text), 6)
        assert feats[1]["max_byte"] == max(text.encode())
        assert feats[1]["n_distinct_bytes"] == len(set(text.encode()))

    def test_resize_fits_box_and_preserves_aspect(self, spark):
        decoded = spark.createDataFrame(
            [(1, 640, 480), (2, 100, 50), (3, 0, 0)],
            "doc_id long, width long, height long",
        )
        out = {r["doc_id"]: r for r in multimodal.resize_assets(decoded, 320, 240).collect()}
        assert (out[1]["out_w"], out[1]["out_h"]) == (320, 240)   # downscale 0.5
        assert (out[2]["out_w"], out[2]["out_h"]) == (100, 50)    # no upscale
        assert out[3]["out_w"] >= 0                               # zero dims safe

    def test_frame_sample_strides(self, spark):
        decoded = spark.createDataFrame([(1, 9), (2, 1)], "doc_id long, n_frames long")
        out = multimodal.sample_frames(decoded, every_n=4).collect()
        by_doc: dict[int, list[int]] = {}
        for r in out:
            by_doc.setdefault(r["doc_id"], []).append(r["frame_idx"])
        assert sorted(by_doc[1]) == [0, 4, 8]
        assert sorted(by_doc[2]) == [0]


class TestSplit:
    def test_train_test_split_deterministic_and_partition_invariant(self, spark, sf_dir):
        from helium_etl_lite_spark.registry import QUERIES, load_all

        load_all()
        fn = QUERIES["sample_split_train_test"]
        a = {(r["doc_id"], r["split"]) for r in fn(spark, sf_dir).collect()}
        b = {(r["doc_id"], r["split"])
             for r in fn(spark, sf_dir).repartition(13).collect()}
        assert a == b                      # pure function of the key
        n = len(a)
        n_train = sum(1 for _, s in a if s == "train")
        assert 0.8 * n <= n_train <= 0.97 * n   # ~90% within hash tolerance


class TestConnectedComponents:
    def test_chain_and_island_merge(self, spark):
        # chain 1-2-3 plus island 10-11: closure must unify the chain
        # even though (1,3) is not an edge.
        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (10, 11)], "doc_a long, doc_b long"
        )
        out = dedup.connected_components(edges, "doc_a", "doc_b")
        got = {r["id"]: r["component"] for r in out.collect()}
        assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}

    def test_long_path_converges(self, spark):
        # path of length 12 → needs ~log rounds of propagation, well
        # under max_iter; min label must reach the far end.
        edges = spark.createDataFrame(
            [(i, i + 1) for i in range(12)], "doc_a long, doc_b long"
        )
        out = dedup.connected_components(edges, "doc_a", "doc_b")
        comps = {r["component"] for r in out.collect()}
        assert comps == {0}


class TestAsofJoinUnion:
    def test_matches_pairwise_variant(self, spark):
        from helium_etl_lite_spark.operators.asof_join import asof_join_union

        left = spark.createDataFrame(
            [(1, 10, 100), (2, 10, 205), (3, 20, 150), (4, 30, 50)],
            "id long, key long, ts long",
        )
        right = spark.createDataFrame(
            [(10, 90, 7), (10, 200, 8), (10, 205, 9), (20, 160, 10)],
            "key long, ts long, val long",
        )
        out = asof_join_union(
            left, right, left_on="key", right_on="key",
            left_ts="ts", right_ts="ts", right_tiebreak="val",
        ).collect()
        got = {r["id"]: r["val"] for r in out}
        assert got == {1: 7, 2: 9, 3: None, 4: None}
        assert len(out) == 4  # left-outer: every left row exactly once

    def test_tiebreak_picks_max(self, spark):
        from helium_etl_lite_spark.operators.asof_join import asof_join_union

        left = spark.createDataFrame([(1, 10, 100)], "id long, key long, ts long")
        right = spark.createDataFrame(
            [(10, 100, 1), (10, 100, 2)], "key long, ts long, val long"
        )
        out = asof_join_union(
            left, right, left_on="key", right_on="key",
            left_ts="ts", right_ts="ts", right_tiebreak="val",
        ).collect()
        assert len(out) == 1 and out[0]["val"] == 2


class TestArrowFeatureParity:
    def test_arrow_and_pandas_kernels_agree(self, spark, docs):
        assets = multimodal.to_binary_assets(docs)
        via_pandas = {tuple(r) for r in multimodal.extract_features(assets).collect()}
        via_arrow = {tuple(r) for r in multimodal.extract_features_arrow(assets).collect()}
        assert via_arrow == via_pandas and len(via_arrow) == 5


class TestJaccardBlasKernel:
    def test_blas_kernel_matches_jvm_form(self, spark, sf_dir):
        # The incidence-matrix kernel is a physical rewrite: identical
        # pair set AND identical 6-decimal scores to the JVM
        # array_intersect form on the real corpus.
        from helium_etl_lite_spark.operators import dedup
        from helium_etl_lite_spark.tables import Tables

        docs = Tables(spark, sf_dir).documents
        jvm = dedup.ngram_jaccard_pairs(docs, block_col="lang", threshold=0.85)
        blas = dedup.ngram_jaccard_pairs_blas(docs, block_col="lang", threshold=0.85)
        assert jvm.exceptAll(blas).count() == 0
        assert blas.exceptAll(jvm).count() == 0


class TestAnnRecall:
    # Measured-recall gates on the real sf0.001 embeddings (500
    # uniform-random 64-dim vectors — the worst case for hyperplane
    # contrast). Everything here is deterministic: plane coefficients,
    # centroid seeds, and tie-breaks carry no RNG state.

    @pytest.fixture(scope="class")
    def emb(self, spark, sf_dir):
        from helium_etl_lite_spark.tables import Tables

        return Tables(spark, sf_dir).embeddings

    @pytest.fixture(scope="class")
    def truth(self, spark, emb):
        q = emb.where(F.col("vec_id") < 5)
        sets: dict = {}
        for r in knn.cosine_topk(emb, q, 10).collect():
            sets.setdefault(r["q_id"], set()).add(r["vec_id"])
        return q, sets

    @staticmethod
    def _recall(got_rows, sets):
        got: dict = {}
        for r in got_rows:
            got.setdefault(r["q_id"], set()).add(r["vec_id"])
        return sum(len(got.get(k, set()) & s) for k, s in sets.items()) / sum(
            len(s) for s in sets.values()
        )

    def test_ivf_recall(self, spark, emb, truth):
        q, sets = truth
        rec = self._recall(
            knn.ann_topk_ivf(emb, q, 10, n_lists=8, nprobe=2).collect(), sets
        )
        assert rec >= 0.85, rec  # measured 0.92

    def test_lsh_recall_and_table_independence(self, spark, emb, truth):
        # Defaults must clear the measured floor, and recall must GROW
        # with table count — the property the correlated Weyl-sequence
        # planes broke (recall plateaued from L=16 to L=24).
        q, sets = truth
        r_default = self._recall(knn.ann_topk_lsh(emb, q, 10).collect(), sets)
        assert r_default >= 0.5, r_default  # measured 0.56 at L=24, b=6
        r_small = self._recall(
            knn.ann_topk_lsh(emb, q, 10, n_tables=8, bits_per_table=6).collect(),
            sets,
        )
        assert r_default > r_small, (r_default, r_small)

    def test_lsh_np_buckets_match_jvm_form(self, spark, emb):
        # The mapInPandas matmul kernel must produce the same
        # (id, table, bucket) rows as the Catalyst higher-order-function
        # reference on real vectors (dots are far from 0, so float
        # association order cannot flip a sign bit).
        sub = emb.where(F.col("vec_id") < 50)
        jvm = {
            (r["vec_id"], r["table"], r["bucket"])
            for r in knn.lsh_table_buckets(sub, 4, 6).collect()
        }
        np_ = {
            (r["vec_id"], r["table"], r["bucket"])
            for r in knn._lsh_table_buckets_np(sub, 4, 6, 64).collect()
        }
        assert jvm == np_


class TestSemanticDedupPairs:
    # operators/knn.py semantic_dedup_pairs — the r6 scale-lane fix:
    # sqrt(N) clusters, numpy assignment, sub-blocked in-cluster pairs.

    def _vecs(self, spark, rows):
        return spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    def test_finds_exact_duplicates(self, spark):
        # identical vectors always co-cluster (same distances), so
        # exact dups are found regardless of cluster count
        base = [[float(i % 7), float((i * 3) % 5), 1.0] for i in range(30)]
        rows = [(i, base[i]) for i in range(30)]
        rows += [(100 + i, base[i]) for i in range(30)]  # exact copies
        out = knn.semantic_dedup_pairs(
            self._vecs(spark, rows), threshold=0.999999
        )
        got = {(r["vec_a"], r["vec_b"]) for r in out.collect()}
        for i in range(30):
            assert (i, 100 + i) in got

    def test_subset_of_exact_pairs_and_sim_values_match(self, spark):
        # every reported pair must appear in the exact all-pairs result
        # with the same rounded similarity (clustering may drop pairs,
        # never invent or mis-score them)
        rows = [
            (i, [float((i * j) % 11 - 5) for j in range(1, 9)])
            for i in range(60)
        ]
        v = self._vecs(spark, rows)
        approx = {
            (r["vec_a"], r["vec_b"]): r["cos_sim"]
            for r in knn.semantic_dedup_pairs(v, threshold=0.4).collect()
        }
        exact = {
            (r["vec_a"], r["vec_b"]): r["cos_sim"]
            for r in knn.cosine_pairs_blocked_np(v, threshold=0.4).collect()
        }
        assert set(approx) <= set(exact)
        for k, s in approx.items():
            assert abs(s - exact[k]) < 1e-9

    def test_partition_invariance(self, spark):
        rows = [
            (i, [float((i * j) % 7 - 3) for j in range(1, 7)])
            for i in range(50)
        ]
        a = sorted(
            (r["vec_a"], r["vec_b"])
            for r in knn.semantic_dedup_pairs(
                self._vecs(spark, rows), 0.4
            ).collect()
        )
        b = sorted(
            (r["vec_a"], r["vec_b"])
            for r in knn.semantic_dedup_pairs(
                self._vecs(spark, rows).repartition(7), 0.4
            ).collect()
        )
        assert a == b

    def test_subblocking_splits_hot_cluster(self, spark):
        # with block_target=4 a 40-vector cluster must spread over
        # multiple block-pair groups yet report the same pairs
        base = [(i, [1.0, float(i) * 1e-6, 0.0]) for i in range(40)]
        v = self._vecs(spark, base)
        fine = sorted(
            (r["vec_a"], r["vec_b"])
            for r in knn.semantic_dedup_pairs(
                v, 0.999, n_lists=1, block_target=4
            ).collect()
        )
        coarse = sorted(
            (r["vec_a"], r["vec_b"])
            for r in knn.semantic_dedup_pairs(
                v, 0.999, n_lists=1, block_target=1024
            ).collect()
        )
        assert fine == coarse and len(fine) > 0

    def test_centroid_guard_raises(self, spark):
        rows = [(i, [float(i), 1.0]) for i in range(20)]
        import pytest

        with pytest.raises(ValueError, match="max_centroid_rows"):
            knn.semantic_dedup_pairs(
                self._vecs(spark, rows), 0.5, n_lists=10, max_centroid_rows=5
            )


class TestDhashAssets:
    # operators/multimodal.py dhash_assets: perceptual difference hash

    @staticmethod
    def _ppm(gray_rows):
        # build a P5 (grayscale) netpbm from a 2-D list of 0-255 ints
        import numpy as np

        a = np.asarray(gray_rows, dtype=np.uint8)
        h, w = a.shape
        return b"P5\n%d %d\n255\n" % (w, h) + a.tobytes()

    def _assets(self, spark, payloads):
        return spark.createDataFrame(
            [(i, bytearray(p)) for i, p in enumerate(payloads)],
            "doc_id long, payload binary",
        )

    def test_identical_payloads_collide(self, spark):
        import numpy as np

        from helium_etl_lite_spark.operators import multimodal

        img = self._ppm(np.arange(16 * 18).reshape(16, 18) % 256)
        out = multimodal.dhash_assets(
            self._assets(spark, [img, img, img])
        ).collect()
        assert len({r["phash"] for r in out}) == 1
        assert all(r["fmt"] == "pgm" for r in out)

    def test_distinct_gradients_differ(self, spark):
        import numpy as np

        from helium_etl_lite_spark.operators import multimodal

        inc = self._ppm(np.tile(np.arange(0, 180, 10), (16, 1)))
        dec = self._ppm(np.tile(np.arange(180, 0, -10), (16, 1)))
        out = {r["doc_id"]: r["phash"] for r in multimodal.dhash_assets(
            self._assets(spark, [inc, dec])
        ).collect()}
        assert out[0] != out[1]

    def test_brightness_and_resolution_invariance(self, spark):
        # dHash depends only on the SIGN of adjacent block-mean
        # differences: doubling brightness or resolution preserves it.
        import numpy as np

        from helium_etl_lite_spark.operators import multimodal

        base = np.tile(np.arange(0, 90, 5), (16, 1))
        bright = np.clip(base * 2, 0, 255)
        hires = np.kron(base, np.ones((2, 2))).astype(np.uint8)
        out = {r["doc_id"]: r["phash"] for r in multimodal.dhash_assets(
            self._assets(
                spark,
                [self._ppm(base), self._ppm(bright), self._ppm(hires)],
            )
        ).collect()}
        assert out[0] == out[1] == out[2]

    def test_opaque_fallback_deterministic(self, spark):
        from helium_etl_lite_spark.operators import multimodal

        out = multimodal.dhash_assets(
            self._assets(spark, [b"not an image at all", b"not an image at all"])
        ).collect()
        assert out[0]["phash"] == out[1]["phash"]
        assert all(r["fmt"] == "opaque" for r in out)


class TestProductQuantization:
    # operators/knn.py pq_train / pq_encode / pq_ann_topk

    def _vecs(self, spark, rows):
        return spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    @staticmethod
    def _clustered(n_per, n_clusters, dim=8):
        # well-separated clusters: PQ must achieve high recall here
        rows = []
        for c in range(n_clusters):
            center = [10.0 * ((c >> b) & 1) for b in range(dim)]
            for i in range(n_per):
                rows.append(
                    (
                        c * n_per + i,
                        [center[d] + 0.01 * ((i * (d + 1)) % 7) for d in range(dim)],
                    )
                )
        return rows

    def test_train_shape_and_determinism(self, spark):
        v = self._vecs(spark, self._clustered(10, 4))
        b1 = knn.pq_train(v, m=4, k=4)
        b2 = knn.pq_train(v.repartition(5), m=4, k=4)
        assert b1.shape == (4, 4, 2)
        import numpy as np

        assert np.array_equal(b1, b2)

    def test_encode_codes_in_range_and_stable(self, spark):
        v = self._vecs(spark, self._clustered(10, 4))
        books = knn.pq_train(v, m=4, k=4)
        codes = {r["vec_id"]: r["codes"] for r in knn.pq_encode(v, books).collect()}
        assert len(codes) == 40
        assert all(0 <= c < 4 for cs in codes.values() for c in cs)
        codes2 = {
            r["vec_id"]: r["codes"]
            for r in knn.pq_encode(v.repartition(3), books).collect()
        }
        assert codes == codes2

    def test_recall_on_clustered_data(self, spark):
        # neighbors of a query are its own cluster; PQ@10 must recover
        # most of the exact L2 top-10 on separated clusters (ADC
        # approximates L2, so the baseline must be L2 — not cosine,
        # which is degenerate for the origin-centered cluster)
        import numpy as np

        rows = self._clustered(12, 4)
        v = self._vecs(spark, rows)
        books = knn.pq_train(v, m=4, k=8)
        q_ids = [0, 12, 24]
        queries = v.where(F.col("vec_id").isin(q_ids))
        approx = knn.pq_ann_topk(v, queries, books, k_neighbors=10)
        a = {(r["q_id"], r["vec_id"]) for r in approx.collect()}
        X = {i: np.asarray(e, dtype=np.float64) for i, e in rows}
        e = set()
        for q in q_ids:
            d = sorted(
                (float(((X[q] - X[i]) ** 2).sum()), i)
                for i in X
                if i != q
            )
            e |= {(q, i) for _, i in d[:10]}
        recall = len(a & e) / len(e)
        assert recall >= 0.7, recall

    def test_dim_not_divisible_raises(self, spark):
        import pytest

        v = self._vecs(spark, [(0, [1.0, 2.0, 3.0])])
        with pytest.raises(ValueError, match="not divisible"):
            knn.pq_train(v, m=2, k=2)


class TestIvfPq:
    def test_ivfpq_subset_of_pq_and_recall(self, spark):
        # IVF pruning can only REMOVE candidates: every IVFPQ neighbor
        # must carry the same ADC distance PQ computes for it, and with
        # nprobe == n_lists (no pruning) results must equal plain PQ.
        from tests.test_operators import TestProductQuantization as TPQ

        rows = TPQ._clustered(12, 4)
        v = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        books = knn.pq_train(v, m=4, k=8)
        queries = v.where(F.col("vec_id").isin([0, 12, 24]))
        full = {
            (r["q_id"], r["vec_id"]): r["adc_dist"]
            for r in knn.pq_ann_topk(v, queries, books, k_neighbors=10).collect()
        }
        nopruning = {
            (r["q_id"], r["vec_id"]): r["adc_dist"]
            for r in knn.pq_ann_topk_ivf(
                v, queries, books, n_lists=4, nprobe=4, k_neighbors=10
            ).collect()
        }
        assert nopruning == full
        pruned = {
            (r["q_id"], r["vec_id"]): r["adc_dist"]
            for r in knn.pq_ann_topk_ivf(
                v, queries, books, n_lists=4, nprobe=1, k_neighbors=10
            ).collect()
        }
        # pruned distances agree with the unpruned ADC wherever present
        for key, dist in pruned.items():
            assert abs(dist - full.get(key, dist)) < 1e-9
        # separated clusters: the query's own cluster is its nearest
        # list, so even nprobe=1 keeps most of the true top-10
        overlap = len(set(pruned) & set(full)) / len(full)
        assert overlap >= 0.7, overlap


class TestPCA:
    def test_fit_matches_numpy_and_projection_decorrelates(self, spark, sf_dir):
        import numpy as np
        import pyspark.sql.functions as F

        from helium_etl_lite_spark.operators import pca
        from helium_etl_lite_spark.tables import Tables

        v = Tables(spark, sf_dir).embeddings.select(
            "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("e")
        )
        mean, comps, evals = pca.fit_pca(v, vec_col="e", k=8)

        # ground truth: single-node numpy over the same vectors
        X = np.stack([r["e"] for r in v.collect()]).astype(np.float64)
        np.testing.assert_allclose(mean, X.mean(axis=0), rtol=0, atol=1e-9)
        cov = np.cov(X, rowvar=False, bias=True)
        ref_evals = np.sort(np.linalg.eigvalsh(cov))[::-1][:8]
        np.testing.assert_allclose(evals, ref_evals, rtol=1e-8)

        # components are orthonormal and variance-sorted
        np.testing.assert_allclose(comps @ comps.T, np.eye(8), atol=1e-9)
        assert all(evals[i] >= evals[i + 1] - 1e-12 for i in range(7))

        # projected data is decorrelated with per-component variance = eval
        P = np.stack(
            [r["pc"] for r in pca.project(v, mean, comps, vec_col="e").collect()]
        )
        pcov = np.cov(P, rowvar=False, bias=True)
        np.testing.assert_allclose(np.diag(pcov), evals, rtol=1e-6)
        off = pcov - np.diag(np.diag(pcov))
        assert np.abs(off).max() < 1e-8

    def test_fit_is_deterministic(self, spark, sf_dir):
        import numpy as np
        import pyspark.sql.functions as F

        from helium_etl_lite_spark.operators import pca
        from helium_etl_lite_spark.tables import Tables

        v = Tables(spark, sf_dir).embeddings.select(
            "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("e")
        )
        m1, c1, e1 = pca.fit_pca(v, vec_col="e", k=4)
        m2, c2, e2 = pca.fit_pca(v.repartition(7), vec_col="e", k=4)
        np.testing.assert_allclose(m1, m2, atol=1e-12)
        np.testing.assert_allclose(e1, e2, rtol=1e-9)
        # sign canonicalization makes the component matrices themselves equal
        np.testing.assert_allclose(c1, c2, atol=1e-8)


def test_hll_sketch_union_matches_exact_within_error(spark, sf_dir):
    import pyspark.sql.functions as F

    from helium_etl_lite_spark import registry
    from helium_etl_lite_spark.tables import Tables

    registry.load_all()
    out = {
        r["event_type"]: r["approx_users"]
        for r in registry.QUERIES["agg_hll_sketch_union"](spark, sf_dir).collect()
    }
    ev = Tables(spark, sf_dir).events
    exact_all = ev.select("user_id").distinct().count()
    # lgConfigK=12 -> ~1.6% stderr; allow 5 sigma
    assert abs(out["ALL"] - exact_all) <= max(3, 0.08 * exact_all)
    per = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("n")).collect()
    }
    for k, n in per.items():
        assert abs(out[k] - n) <= max(3, 0.08 * n)


def test_minhash_state_sig_version_fail_fast(spark, tmp_path):
    # A persisted LSH state from a different signature construction must
    # refuse to serve probes instead of silently missing every near-dup.
    import pytest as _pytest

    from helium_etl_lite_spark.operators import dedup

    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, "f g h i j")], "doc_id long, text string"
    )
    state = str(tmp_path / "state")
    fresh = dedup.minhash_filter_new(spark, docs, state)
    dedup.minhash_state_add(spark, fresh, state)
    # normal probe works
    assert dedup.minhash_filter_new(spark, docs, state).count() >= 0

    # tamper: wrong version marker
    with open(state + "/_sig_version", "w") as f:
        f.write("minhash-xxhash64-perm-v1")
    with _pytest.raises(ValueError, match="rebuild the state"):
        dedup.minhash_filter_new(spark, docs, state).count()

    # tamper: missing marker (pre-versioning state)
    import os

    os.remove(state + "/_sig_version")
    with _pytest.raises(ValueError, match="no signature-version"):
        dedup.minhash_filter_new(spark, docs, state).count()


def test_dhash_short_images_keep_full_bit_entropy():
    # Regression: a gray strip with fewer than 8 rows used to feed
    # empty chunks to np.array_split — NaN means silently forced 56 of
    # 64 bits to zero, collapsing unrelated short images into one
    # perceptual bucket. After row/col upsampling, distinct content
    # must produce distinct hashes and identical content identical ones.
    import numpy as np

    from helium_etl_lite_spark.operators.multimodal import _dhash_bits

    rng_a = np.arange(24, dtype=np.float64).reshape(1, 24)          # height 1
    rng_b = (np.arange(24, dtype=np.float64)[::-1]).reshape(1, 24)  # reversed
    tiny = np.array([[1.0, 200.0], [3.0, 4.0]])                     # 2x2
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("error")  # NaN-mean RuntimeWarning = fail
        ha, hb, ht = _dhash_bits(rng_a), _dhash_bits(rng_b), _dhash_bits(tiny)
    assert ha != hb
    assert _dhash_bits(rng_a) == ha  # deterministic
    # ascending gradient: every left block mean < right block mean, so
    # ALL 64 bits must be 1 — the NaN bug forced 56 of them to 0
    assert ha == (1 << 64) - 1
    assert hb == 0  # descending gradient: the exact mirror


class TestIncrementalPCA:
    def test_folded_moments_equal_full_fit(self, spark, sf_dir, tmp_path):
        # Fold two disjoint batches into the moment state; the refit
        # must equal the from-scratch fit over the whole table.
        import numpy as np
        import pyspark.sql.functions as F

        from helium_etl_lite_spark.operators import pca
        from helium_etl_lite_spark.tables import Tables

        v = Tables(spark, sf_dir).embeddings.select(
            "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("e")
        )
        state = str(tmp_path / "pca_state.json")
        pca.moments_update(spark, v.where(F.col("vec_id") % 2 == 0), state, "e")
        pca.moments_update(spark, v.where(F.col("vec_id") % 2 == 1), state, "e")
        m_inc, c_inc, e_inc = pca.fit_pca_from_state(state, k=6)
        m_full, c_full, e_full = pca.fit_pca(v, vec_col="e", k=6)
        np.testing.assert_allclose(m_inc, m_full, atol=1e-9)
        np.testing.assert_allclose(e_inc, e_full, rtol=1e-9)
        np.testing.assert_allclose(c_inc, c_full, atol=1e-7)

    def test_dimension_mismatch_fails_fast(self, spark, tmp_path):
        import pytest as _pytest

        from helium_etl_lite_spark.operators import pca

        a = spark.createDataFrame([(1, [1.0, 2.0])], "id long, e array<double>")
        b = spark.createDataFrame([(2, [1.0, 2.0, 3.0])], "id long, e array<double>")
        state = str(tmp_path / "s.json")
        pca.moments_update(spark, a, state, "e")
        with _pytest.raises(ValueError, match="dimension"):
            pca.moments_update(spark, b, state, "e")


class TestContainmentScreened:
    """dedup_containment_screened gate (r6 verdict item 4): the screen
    must never invent pairs (screened ⊆ exact), must find the planted
    high-containment clusters (measured recall), and must bound the
    exact verifier's input to screen survivors."""

    def _fixture(self, spark):
        # 4 clusters of 5 near-identical docs (pairwise containment
        # ~1.0, high Jaccard so the band screen is in-distribution)
        # + 20 unrelated docs.
        rows = []
        did = 0
        for c in range(4):
            base = [f"c{c}tok{i}" for i in range(30)]
            for v in range(5):
                toks = base + ([f"c{c}extra{v}"] if v else [])
                rows.append((did, " ".join(toks)))
                did += 1
        for j in range(20):
            rows.append((did, " ".join(f"solo{j}tok{i}" for i in range(25))))
            did += 1
        return spark.createDataFrame(rows, "doc_id long, text string")

    def _exact_pairs(self, rows, threshold=0.95):
        toks = {r[0]: set(r[1].split(" ")) for r in rows}
        out = set()
        for a in toks:
            for b in toks:
                if a != b and len(toks[a] & toks[b]) / len(toks[a]) >= threshold:
                    out.add((a, b))
        return out

    def test_screened_subset_of_exact_with_recall(self, spark):
        docs = self._fixture(spark)
        rows = [(r["doc_id"], r["text"]) for r in docs.collect()]
        exact = self._exact_pairs(rows)
        got = {
            (r["doc_src"], r["doc_sup"])
            for r in dedup.containment_screened_pairs(docs).collect()
        }
        assert got <= exact, f"screen invented pairs: {got - exact}"
        # in-distribution recall: the planted clusters share ~97% of
        # tokens, P(band collision) ≈ 1 at that Jaccard
        recall = len(got) / len(exact)
        assert recall >= 0.9, f"recall {recall:.2f} on planted clusters"
        # containment values are exact where emitted
        vals = {
            (r["doc_src"], r["doc_sup"]): r["containment"]
            for r in dedup.containment_screened_pairs(docs).collect()
        }
        toks = {r[0]: set(r[1].split(" ")) for r in rows}
        for (a, b), v in vals.items():
            want = round(len(toks[a] & toks[b]) / len(toks[a]), 6)
            assert abs(v - want) < 1e-9

    def test_verifier_input_bounded_by_screen(self, spark):
        docs = self._fixture(spark)
        n = docs.count()
        sig = dedup.minhash_signatures(docs, 16)
        band_rows = dedup._band_rows(sig, 16, 8)
        l, r = band_rows.alias("l"), band_rows.alias("r")
        cand = (
            l.join(
                r,
                (F.col("l.band") == F.col("r.band"))
                & (F.col("l.bucket") == F.col("r.bucket"))
                & (F.col("l.doc_id") != F.col("r.doc_id")),
            )
            .select("l.doc_id", "r.doc_id")
            .distinct()
            .count()
        )
        # screen survivors ≪ all directed pairs: only intra-cluster
        # collisions (4 clusters × 5×4 directed) + hash accidents
        assert cand < n * (n - 1) / 4, f"screen not selective: {cand} of {n*(n-1)}"


class TestParagraphDedupKeyForms:
    def test_hashed_span_key_equals_string_key(self, spark, sf_dir):
        # r6 verdict item 5: the production form windows on
        # xxhash64(span) (8-byte shuffle keys); it must produce exactly
        # the string-key (oracle) form's result at sf0.001.
        from helium_etl_lite_spark.queries.llm_ops import _paragraph_dedup

        hashed = {
            (r["doc_id"], r["n_spans_kept"], r["text_dedup"])
            for r in _paragraph_dedup(spark, sf_dir, hash_key=True).collect()
        }
        strform = {
            (r["doc_id"], r["n_spans_kept"], r["text_dedup"])
            for r in _paragraph_dedup(spark, sf_dir, hash_key=False).collect()
        }
        assert hashed == strform


class TestPngCodec:
    """Pure-numpy PNG lane: filters round-trip, PNG/PPM stat parity,
    corrupt payloads raise (never return wrong stats)."""

    def _filtered_png(self, px, channels, ftype):
        # hand-apply PNG filter `ftype` to every scanline, then wrap in
        # valid chunks — exercises decode paths the filter-0 encoder
        # never emits.
        import zlib

        import numpy as np

        from helium_etl_lite_spark.operators import multimodal as mm

        h, stride = px.shape
        w = stride // channels
        bpp = channels
        out = []
        prev = np.zeros(stride, np.int32)
        for y in range(h):
            cur = px[y].astype(np.int32)
            left = np.concatenate([np.zeros(bpp, np.int32), cur[:-bpp]])
            upleft = np.concatenate([np.zeros(bpp, np.int32), prev[:-bpp]])
            if ftype == 0:
                f = cur
            elif ftype == 1:
                f = cur - left
            elif ftype == 2:
                f = cur - prev
            elif ftype == 3:
                f = cur - ((left + prev) >> 1)
            else:
                p = left + prev - upleft
                pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - upleft)
                pred = np.where(
                    (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft)
                )
                f = cur - pred
            out.append(bytes([ftype]) + bytes((f & 0xFF).astype(np.uint8)))
            prev = cur
        color_type = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
        ihdr = (
            w.to_bytes(4, "big") + h.to_bytes(4, "big")
            + bytes([8, color_type, 0, 0, 0])
        )
        return (
            mm._PNG_SIG
            + mm._png_chunk(b"IHDR", ihdr)
            + mm._png_chunk(b"IDAT", zlib.compress(b"".join(out)))
            + mm._png_chunk(b"IEND", b"")
        )

    def test_all_five_filters_decode_to_same_pixels(self):
        import numpy as np

        from helium_etl_lite_spark.operators import multimodal as mm

        rng = np.random.default_rng(7)
        for channels in (1, 3, 4):
            px = rng.integers(0, 256, size=(5, 6 * channels), dtype=np.uint8)
            want = round(float(px.mean()), 6)
            for ftype in range(5):
                img = mm.decode_png(self._filtered_png(px, channels, ftype))
                assert img["mean_pixel"] == want, (channels, ftype)
                assert (img["width"], img["height"]) == (6, 5)
                assert img["channels"] == channels

    def test_roundtrip_matches_source_plane(self):
        from helium_etl_lite_spark.operators import multimodal as mm

        plane = bytes(range(256)) * 3 + b"\x00" * (24 * 11 * 3 - 768)
        data = mm.encode_png_bytes(plane, 24, 11, 3)
        img = mm.decode_png(data)
        import numpy as np

        assert img["mean_pixel"] == round(
            float(np.frombuffer(plane, np.uint8).mean()), 6
        )
        assert img["fmt"] == "png" and img["maxval"] == 255

    def test_png_and_ppm_paths_agree_on_stats(self, spark, docs):
        from helium_etl_lite_spark.operators import multimodal as mm

        cols = ["doc_id", "width", "height", "channels", "mean_pixel"]
        png = {
            tuple(r[c] for c in cols)
            for r in mm.decode_assets(mm.encode_png(docs)).collect()
        }
        ppm = {
            tuple(r[c] for c in cols)
            for r in mm.decode_assets(mm.encode_ppm(docs)).collect()
        }
        assert png == ppm

    def test_corrupt_and_unsupported_raise(self):
        import pytest as _pytest

        from helium_etl_lite_spark.operators import multimodal as mm

        good = mm.encode_png_bytes(bytes(range(72)), 24, 1, 3)
        with _pytest.raises(ValueError):
            mm.decode_png(good[: len(good) // 2])  # truncated inside IDAT
        with _pytest.raises(ValueError):
            mm.decode_png(b"\x89PNG\r\n\x1a\njunk")
        # 16-bit depth flagged unsupported, not mis-decoded
        bad_ihdr = bytearray(good)
        bad_ihdr[8 + 8 + 8] = 16  # bit depth byte inside IHDR body
        with _pytest.raises(ValueError, match="unsupported PNG"):
            mm.decode_png(bytes(bad_ihdr))


class TestPagerank:
    def _model(self, edges, n_nodes_map, damping, iters):
        import numpy as np

        nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
        idx = {v: i for i, v in enumerate(nodes)}
        n = len(nodes)
        out_deg = np.zeros(n)
        for a, _ in edges:
            out_deg[idx[a]] += 1
        r = np.full(n, 1.0 / n)
        for _ in range(iters):
            contrib = np.zeros(n)
            for a, b in edges:
                contrib[idx[b]] += r[idx[a]] / out_deg[idx[a]]
            dangling = r[out_deg == 0].sum()
            r = (1 - damping) / n + damping * (contrib + dangling / n)
        return {v: r[idx[v]] for v in nodes}

    def test_matches_numpy_model_with_dangling(self, spark):
        from helium_etl_lite_spark.operators.graph import pagerank

        # chain with a hub and a dangling sink (4 has no out-edges)
        edges = [(1, 2), (2, 3), (3, 1), (1, 3), (3, 4), (2, 4)]
        df = spark.createDataFrame(edges, "src long, dst long")
        got = {r["node"]: r["rank"] for r in pagerank(df, iterations=12).collect()}
        want = self._model(edges, None, 0.85, 12)
        assert set(got) == set(want)
        for k in want:
            assert abs(got[k] - want[k]) < 1e-9, k
        assert abs(sum(got.values()) - 1.0) < 1e-9  # rank conservation

    def test_empty_graph(self, spark):
        from helium_etl_lite_spark.operators.graph import pagerank

        df = spark.createDataFrame([], "src long, dst long")
        assert pagerank(df, iterations=3).count() == 0


class TestPqRerank:
    def test_rerank_recall_at_least_pq_and_exact_distances(self, spark):
        # The refine stage can only help: recall@10 of rerank >= plain
        # PQ on the same clustered fixture, and every returned distance
        # must equal the brute-force L2 (the rerank IS exact on its
        # shortlist).
        import numpy as np

        from tests.test_operators import TestProductQuantization as TPQ

        rows = TPQ._clustered(12, 4)
        v = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        books = knn.pq_train(v, m=4, k=8)
        q_ids = [0, 12, 24]
        queries = v.where(F.col("vec_id").isin(q_ids))

        X = {i: np.asarray(e, dtype=np.float64) for i, e in rows}
        exact = {}
        for q in q_ids:
            d = sorted(
                (float(((X[q] - X[i]) ** 2).sum()), i) for i in X if i != q
            )
            exact[q] = {i for _, i in d[:10]}

        def recall(pairs):
            got = {}
            for a, b in pairs:
                got.setdefault(a, set()).add(b)
            return sum(len(got.get(q, set()) & s) for q, s in exact.items()) / sum(
                len(s) for s in exact.values()
            )

        pq_pairs = {
            (r["q_id"], r["vec_id"])
            for r in knn.pq_ann_topk(v, queries, books, 10).collect()
        }
        rr = knn.pq_ann_rerank(v, queries, books, k_neighbors=10, oversample=4)
        rr_rows = rr.collect()
        rr_pairs = {(r["q_id"], r["vec_id"]) for r in rr_rows}
        assert recall(rr_pairs) >= recall(pq_pairs)
        assert recall(rr_pairs) >= 0.9  # refine on separated clusters ~exact
        for r in rr_rows:
            want = round(float(((X[r["q_id"]] - X[r["vec_id"]]) ** 2).sum()), 6)
            assert abs(r["l2_dist"] - want) < 1e-6


class TestJpegCodec:
    """Pure-numpy baseline JPEG (operators/jpeg.py): known-answer
    blocks, tolerance-bounded roundtrips across 4:4:4 / 4:2:0 /
    restart-marker layouts, Spark-lane parity, fail-stop on modes the
    decoder does not implement."""

    def test_flat_blocks_roundtrip_exactly(self):
        import numpy as np

        from helium_etl_lite_spark.operators import jpeg

        for val in (0, 90, 128, 200, 255):
            px = np.full((16, 24), val, dtype=np.uint8)
            d = jpeg.decode_jpeg(jpeg.encode_jpeg_bytes(px))
            assert np.array_equal(d["pixels"], px), val
            assert (d["width"], d["height"], d["channels"]) == (24, 16, 1)

    def test_gradient_roundtrip_within_quant_tolerance(self):
        import numpy as np

        from helium_etl_lite_spark.operators import jpeg

        x = np.linspace(0, 255, 32)
        gray = np.clip(np.add.outer(x, x) / 2, 0, 255).astype(np.uint8)
        d = jpeg.decode_jpeg(jpeg.encode_jpeg_bytes(gray))
        assert np.abs(d["pixels"].astype(int) - gray.astype(int)).max() <= 8

        g = np.clip(np.add.outer(np.linspace(0, 200, 24), np.linspace(0, 55, 24)), 0, 255)
        rgb = np.stack([g, g * 0.5, 255 - g], axis=-1).astype(np.uint8)
        for kwargs in (
            {},  # 4:4:4
            {"subsample_420": True},
            {"subsample_420": True, "restart_interval": 1},
            {"restart_interval": 2},
        ):
            d = jpeg.decode_jpeg(jpeg.encode_jpeg_bytes(rgb, **kwargs))
            err = np.abs(d["pixels"].astype(int) - rgb.astype(int)).max()
            assert err <= 25, (kwargs, err)  # chroma quant dominates
            assert (d["width"], d["height"], d["channels"]) == (24, 24, 3)

    def test_odd_sizes_pad_and_crop(self):
        import numpy as np

        from helium_etl_lite_spark.operators import jpeg

        # 90 - 128 = -38: 8*(-38)/16 = -19 exactly, so the flat value
        # survives quantization bit-for-bit even at odd dimensions
        px = np.full((13, 19), 90, dtype=np.uint8)
        d = jpeg.decode_jpeg(jpeg.encode_jpeg_bytes(px))
        assert (d["width"], d["height"]) == (19, 13)
        assert np.abs(d["pixels"].astype(int) - 90).max() == 0

    def test_dc_only_known_answer(self):
        # A flat block quantizes to a single DC coefficient
        # DC = round(8*(v-128)/q00) with q00 = 16: every even offset
        # (v-128) gives an exactly-representable DC, so the decode must
        # reproduce v bit-for-bit — this pins the DCT scale factor, the
        # quant-table slot and zigzag position 0 in one identity (any
        # scaling error shifts every v != 128). Odd offsets sit on the
        # .5 quantizer boundary where FP decides the direction, so they
        # belong to the tolerance test, not here.
        import numpy as np

        from helium_etl_lite_spark.operators import jpeg

        assert int(jpeg.QUANT_LUMA[0, 0]) == 16
        for v in (2, 50, 90, 130, 254):
            px = np.full((8, 8), v, dtype=np.uint8)
            d = jpeg.decode_jpeg(jpeg.encode_jpeg_bytes(px))
            assert np.array_equal(d["pixels"], np.full((8, 8), v, np.uint8)), v

    def test_unsupported_modes_and_corruption_raise(self):
        import numpy as np
        import pytest as _pytest

        from helium_etl_lite_spark.operators import jpeg

        px = np.full((8, 8), 128, dtype=np.uint8)
        good = jpeg.encode_jpeg_bytes(px)
        with _pytest.raises(ValueError):
            jpeg.decode_jpeg(b"\x00\x01junk")
        with _pytest.raises(ValueError):
            jpeg.decode_jpeg(good[: len(good) // 2])
        # flip SOF0 -> SOF2 (progressive): must fail fast, not mis-decode
        prog = bytearray(good)
        idx = prog.find(b"\xff\xc0")
        prog[idx + 1] = 0xC2
        with _pytest.raises(ValueError, match="baseline"):
            jpeg.decode_jpeg(bytes(prog))

    def test_spark_lane_stats_close_to_source_plane(self, spark, docs):
        import numpy as np

        from helium_etl_lite_spark.operators import multimodal as mm

        decoded = {
            r["doc_id"]: r
            for r in mm.decode_assets(mm.encode_jpeg(docs)).collect()
        }
        for row in docs.collect():
            raw = row["text"].encode()
            h = max(1, -(-len(raw) // 72))
            plane = np.frombuffer(raw.ljust(72 * h, b"\x00"), np.uint8)
            d = decoded[row["doc_id"]]
            assert d["fmt"] == "jpeg" and d["channels"] == 3
            assert (d["width"], d["height"]) == (24, h)
            assert abs(d["mean_pixel"] - plane.mean()) <= 6.0

    def test_batched_dct_pair_matches_per_block_reference(self):
        # The r14 vectorization runs DCT/quant (encode) and dequant/IDCT
        # (decode) over a whole stack of blocks with one broadcast
        # matmul. Pin bit-equality against the historical
        # block-at-a-time expressions: both orderings run the same
        # 8-long dot products, so the floats must be IDENTICAL, not
        # merely close — any drift here silently changes quantized
        # streams and decoded samples.
        import numpy as np

        from helium_etl_lite_spark.operators import jpeg

        rng = np.random.RandomState(7)
        plane = rng.randint(0, 256, (24, 32)).astype(np.float64)
        zz = jpeg._component_zigzag_blocks(plane, jpeg.QUANT_LUMA)
        for br in range(3):
            for bc in range(4):
                block = plane[br * 8 : br * 8 + 8, bc * 8 : bc * 8 + 8]
                coef = jpeg._DCT @ (block - 128.0) @ jpeg._DCT.T
                q = np.round(coef / jpeg.QUANT_LUMA).astype(np.int32)
                ref = np.array([q[r, c] for r, c in jpeg.ZIGZAG], np.int32)
                assert np.array_equal(zz[br, bc], ref), (br, bc)
        # decode direction: stacked IDCT == per-block IDCT, bit for bit
        coefs = rng.randint(-300, 300, (12, 8, 8)).astype(np.float64)
        batched = jpeg._DCT.T @ coefs @ jpeg._DCT + 128.0
        for i in range(12):
            single = jpeg._DCT.T @ coefs[i] @ jpeg._DCT + 128.0
            assert np.array_equal(batched[i], single), i

    def test_encoded_stream_golden_digest(self):
        # Freeze the exact byte stream for a deterministic image across
        # every layout variant the encoder supports. The r14 entropy
        # rewrite (nonzero-only RLE, fused category+amplitude writes)
        # was verified bit-identical to the historical per-coefficient
        # loop; this digest keeps any future "optimization" honest.
        import hashlib

        import numpy as np

        from helium_etl_lite_spark.operators import jpeg

        g = np.clip(
            np.add.outer(np.linspace(0, 200, 21), np.linspace(0, 55, 19)), 0, 255
        )
        rgb = np.stack([g, g * 0.5, 255 - g], axis=-1).astype(np.uint8)
        digests = {}
        for tag, kwargs in (
            ("444", {}),
            ("420", {"subsample_420": True}),
            ("420rst", {"subsample_420": True, "restart_interval": 2}),
        ):
            digests[tag] = hashlib.sha256(
                jpeg.encode_jpeg_bytes(rgb, **kwargs)
            ).hexdigest()[:16]
        assert digests == {
            "444": "8ea6e15a2bfb4689",
            "420": "0320ef6bc974e20b",
            "420rst": "e43a61e80597c2d3",
        }, digests


class TestCrossFormatPhash:
    def test_same_plane_hashes_identically_across_lossless_formats(self, spark, docs):
        # The r7 generalization: perceptual dedup must see THROUGH the
        # container format. The same pixel plane transported as PPM and
        # PNG (lossless) hashes bit-identically; as JPEG (lossy) it
        # stays within a few hamming bits.
        from helium_etl_lite_spark.operators import multimodal as mm

        def hashes(assets):
            return {
                r["doc_id"]: (r["phash"], r["fmt"])
                for r in mm.dhash_assets(assets).collect()
            }

        ppm = hashes(mm.encode_ppm(docs))
        png = hashes(mm.encode_png(docs))
        jpg = hashes(mm.encode_jpeg(docs))
        for did in ppm:
            assert ppm[did][0] == png[did][0], did
            assert ppm[did][1] == "ppm" and png[did][1] == "png"
            assert jpg[did][1] == "jpeg"
        # lossy transport: VISUALLY IDENTICAL images must still collide
        # (docs 1 and 2 share the exact pixel plane) — that is the dedup
        # property; per-pixel hamming vs the lossless hash is unbounded
        # for byte-noise planes (JPEG's worst case), so it is not
        # asserted here.
        assert jpg[1][0] == jpg[2][0]
        # and distinct planes stay distinct after JPEG
        assert jpg[1][0] != jpg[4][0]


def test_jpeg_zigzag_matches_spec_literal():
    # Pin the generated scan order against ITU T.81's literal zigzag
    # index sequence (row-major indices; the same table libjpeg ships
    # as jpeg_natural_order). A TRANSPOSED generator is self-consistent
    # across our encode->decode roundtrips and only this external
    # constant catches it (review find).
    from helium_etl_lite_spark.operators import jpeg

    spec = [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ]
    assert [8 * r + c for r, c in jpeg.ZIGZAG] == spec


def test_jpeg_decodes_hand_built_spec_stream():
    # Independent validation: a JPEG byte stream constructed BY HAND
    # from the spec (identity quant table, Annex K Huffman tables, DC
    # category 3 code '100' + amplitude '101' = DC 5, AC EOB '1010')
    # must decode to the flat value round(5/8 + 128) = 129. Unlike the
    # encode->decode roundtrips, nothing here flows through our
    # encoder, so marker parsing, canonical Huffman construction, the
    # EXTEND rule and IDCT scaling are all checked against the spec's
    # own arithmetic.
    import numpy as np

    from helium_etl_lite_spark.operators import jpeg

    def seg(m, body):
        return bytes([0xFF, m]) + (len(body) + 2).to_bytes(2, "big") + body

    stream = (
        b"\xff\xd8"
        + seg(0xDB, bytes([0]) + bytes([1] * 64))
        + seg(
            0xC0,
            bytes([8]) + (8).to_bytes(2, "big") + (8).to_bytes(2, "big")
            + bytes([1]) + bytes([1, 0x11, 0]),
        )
        + seg(0xC4, bytes([0x00] + jpeg.DC_LUMA_BITS) + bytes(jpeg.DC_LUMA_VALS))
        + seg(0xC4, bytes([0x10] + jpeg.AC_LUMA_BITS) + bytes(jpeg.AC_LUMA_VALS))
        + seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
        + bytes([0b10010110, 0b10111111])  # '100'+'101'+'1010'+1-padding
        + b"\xff\xd9"
    )
    d = jpeg.decode_jpeg(stream)
    assert (d["width"], d["height"], d["channels"]) == (8, 8, 1)
    assert np.array_equal(d["pixels"], np.full((8, 8), 129, np.uint8))


class TestPathNotFoundClassifier:
    def test_substring_fallback_and_class_precedence(self):
        from pyspark.errors import AnalysisException

        from helium_etl_lite_spark.errors import is_path_not_found

        # hand-constructed exceptions carry no error class -> substring
        assert is_path_not_found(AnalysisException("[PATH_NOT_FOUND] x"))
        assert is_path_not_found(AnalysisException("Path does not exist: /x"))
        assert not is_path_not_found(AnalysisException("TABLE_OR_VIEW_NOT_FOUND"))
        # non-Analysis exceptions only ever match by substring
        assert not is_path_not_found(RuntimeError("boom"))

    def test_real_missing_path_read(self, spark, tmp_path):
        from pyspark.errors import AnalysisException

        from helium_etl_lite_spark.errors import is_path_not_found

        try:
            spark.read.parquet(str(tmp_path / "nope")).collect()
            raise AssertionError("expected AnalysisException")
        except AnalysisException as exc:
            # the engine-raised form must classify via its error class
            assert is_path_not_found(exc)


class TestSpanDedupOverlap:
    """Alignment-robustness contract (r7 verdict missing #1): a passage
    duplicated at an offset shift of 10 tokens is invisible to the
    aligned 20-token form and removed by the stride-10 overlap form."""

    @staticmethod
    def _fixture_docs(spark, tmp_path):
        a_toks = [f"a{i}" for i in range(100)]
        # B: 10 fresh tokens, then A[20:60] (a 40-token passage whose
        # offset differs from A's by 10 — ≡ 0 mod 10 but NOT mod 20),
        # then 10 fresh tokens.
        b_toks = [f"b{i}" for i in range(10)] + a_toks[20:60] + [
            f"c{i}" for i in range(10)
        ]
        docs = spark.createDataFrame(
            [
                (1, " ".join(a_toks), "en", "web", len(" ".join(a_toks))),
                (2, " ".join(b_toks), "en", "web", len(" ".join(b_toks))),
            ],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        sf_dir = str(tmp_path / "fixture")
        docs.coalesce(1).write.parquet(f"{sf_dir}/documents.parquet")
        return sf_dir, " ".join(a_toks), " ".join(b_toks)

    def test_aligned_form_misses_shifted_passage(self, spark, tmp_path):
        from helium_etl_lite_spark.queries.llm_ops import text_paragraph_dedup

        sf_dir, a_text, b_text = self._fixture_docs(spark, tmp_path)
        out = {
            r["doc_id"]: r for r in text_paragraph_dedup(spark, sf_dir).collect()
        }
        # the aligned form provably keeps the whole duplicated passage:
        # B's spans at multiples of 20 never line up with A's
        assert out[2]["text_dedup"] == b_text
        assert out[1]["text_dedup"] == a_text

    def test_overlap_form_removes_shifted_passage(self, spark, tmp_path):
        from helium_etl_lite_spark.queries.llm_ops import text_span_dedup_overlap

        sf_dir, a_text, b_text = self._fixture_docs(spark, tmp_path)
        out = {
            r["doc_id"]: r
            for r in text_span_dedup_overlap(spark, sf_dir).collect()
        }
        # first occurrence (doc A) survives untouched
        assert out[1]["text_dedup"] == a_text
        assert out[1]["n_tokens_kept"] == 100
        # B keeps exactly its fresh head and tail; the copied passage
        # B[10:50] is removed once, in order
        expect_b = " ".join([f"b{i}" for i in range(10)] + [f"c{i}" for i in range(10)])
        assert out[2]["text_dedup"] == expect_b
        assert out[2]["n_tokens_kept"] == 20

    def test_fully_duplicate_doc_drops_out(self, spark):
        from helium_etl_lite_spark.operators.dedup import span_dedup_overlap

        toks = " ".join(f"t{i}" for i in range(40))
        docs = spark.createDataFrame(
            [(1, toks), (2, toks)], "doc_id long, text string"
        )
        out = span_dedup_overlap(docs, span_len=20, stride=10)
        rows = {r["doc_id"]: r for r in out.collect()}
        assert rows[1]["n_tokens_kept"] == 40
        assert 2 not in rows  # every token covered by a duplicate span

    def test_output_is_subsequence_and_short_docs_survive(self, spark):
        from helium_etl_lite_spark.operators.dedup import span_dedup_overlap

        docs = spark.createDataFrame(
            [(1, "x y z"), (2, "p q"), (3, "x y z")],
            "doc_id long, text string",
        )
        out = {r["doc_id"]: r for r in span_dedup_overlap(docs).collect()}
        # docs shorter than span_len form one whole-doc span: doc 3 is
        # an exact dup of doc 1 and drops; doc 2 is unique and survives
        assert out[1]["text_dedup"] == "x y z"
        assert out[2]["text_dedup"] == "p q"
        assert 3 not in out


class TestPhashNearDup:
    """Hamming-band near-dup contract: pigeonhole recall at k<=3,
    dHash perceptual invariance, exact verification."""

    def test_planted_pairs_collapse_and_far_hashes_stay(self, spark):
        from helium_etl_lite_spark.operators.multimodal import phash_band_neardup

        base1 = 0x0123456789ABCDEF
        near1 = base1 ^ 0b101  # 2 bits flipped, same 16-bit band
        base2 = 0xFEDCBA9876543210
        near2 = base2 ^ (1 << 20) ^ (1 << 40) ^ (1 << 60)  # 3 bits, 3 bands
        far = 0x00FF00FF00FF00FF
        rows = [
            (1, format(base1, "016x")),
            (2, format(near1, "016x")),
            (3, format(base2, "016x")),
            (4, format(near2, "016x")),
            (5, format(far, "016x")),
        ]
        hashed = spark.createDataFrame(rows, "doc_id long, phash string")
        out = {r["doc_id"]: r for r in phash_band_neardup(hashed, k=3).collect()}
        assert out[2]["keeper_doc_id"] == 1 and out[2]["hamming"] == 2
        assert out[4]["keeper_doc_id"] == 3 and out[4]["hamming"] == 3
        for selfkept in (1, 3, 5):
            assert out[selfkept]["keeper_doc_id"] == selfkept
            assert out[selfkept]["hamming"] == 0

    def test_pigeonhole_recall_on_random_pairs(self, spark):
        import random

        from helium_etl_lite_spark.operators.multimodal import phash_band_neardup

        rng = random.Random(7)
        rows, expected = [], {}
        for i in range(40):
            base = rng.getrandbits(64)
            flips = rng.sample(range(64), rng.randint(1, 3))
            near = base
            for b in flips:
                near ^= 1 << b
            a_id, b_id = 2 * i, 2 * i + 1
            rows += [(a_id, format(base, "016x")), (b_id, format(near, "016x"))]
            expected[b_id] = a_id
        hashed = spark.createDataFrame(rows, "doc_id long, phash string")
        out = {r["doc_id"]: r["keeper_doc_id"]
               for r in phash_band_neardup(hashed, k=3).collect()}
        # every planted near pair must collapse (pigeonhole: <=3 flips
        # leave >=1 of 4 bands exact). Random 64-bit bases make cross-
        # pair collisions vanishingly unlikely, so keepers match exactly.
        hits = sum(1 for b_id, a_id in expected.items() if out[b_id] == a_id)
        assert hits == len(expected), f"recall {hits}/{len(expected)}"

    def test_dhash_invariant_to_brightness_and_contrast(self):
        import numpy as np

        from helium_etl_lite_spark.operators.multimodal import _dhash_bits

        rng = np.random.default_rng(3)
        gray = rng.uniform(0, 200, size=(16, 16))
        h0 = _dhash_bits(gray)
        assert _dhash_bits(gray + 30.0) == h0          # brightness shift
        assert _dhash_bits(gray * 1.25) == h0          # contrast scale
        # a real content change must move the hash
        other = gray.copy()
        other[:, :8] = other[:, :8][:, ::-1]
        assert _dhash_bits(other) != h0


class TestContainmentScreenedBucketCap:
    """r7 verdict directive 3: hot (band, bucket) groups must not
    materialize quadratic candidate pairs; at-or-under-cap corpora are
    byte-identical to the uncapped form."""

    def test_output_identical_when_no_bucket_overflows(self, spark):
        fix = TestContainmentScreened()
        docs = fix._fixture(spark)
        capped = {
            (r["doc_src"], r["doc_sup"], r["containment"])
            for r in dedup.containment_screened_pairs(docs, bucket_cap=256).collect()
        }
        uncapped = {
            (r["doc_src"], r["doc_sup"], r["containment"])
            for r in dedup.containment_screened_pairs(
                docs, bucket_cap=10**9
            ).collect()
        }
        assert capped == uncapped

    def test_hot_bucket_routes_through_representative(self, spark, caplog):
        import logging

        # 300 byte-identical docs: every band bucket holds all 300.
        # All-pairs would emit 300*299 = 89700 directed candidates; the
        # routed form emits exactly 2*(300-1) = 598 (every member vs the
        # min-id representative, both directions), all of which verify
        # at containment 1.0.
        n = 300
        text = " ".join(f"tok{i}" for i in range(30))
        docs = spark.createDataFrame(
            [(i, text) for i in range(n)], "doc_id long, text string"
        )
        with caplog.at_level(logging.WARNING, logger="helium_etl_lite_spark"):
            out = dedup.containment_screened_pairs(docs, bucket_cap=64).collect()
        assert len(out) == 2 * (n - 1)
        assert all(r["containment"] == 1.0 for r in out)
        assert {r["doc_sup"] for r in out if r["doc_src"] != 0} == {0}
        # the cap is never silent
        assert any("over cap" in m for m in caplog.messages)

    def test_mixed_corpus_keeps_small_bucket_pairs(self, spark):
        # one hot cluster + one small pair: capping the hot bucket must
        # not affect the small bucket's all-pairs screen
        text_hot = " ".join(f"h{i}" for i in range(30))
        text_a = " ".join(f"p{i}" for i in range(30))
        rows = [(i, text_hot) for i in range(100)]
        rows += [(1000, text_a), (1001, text_a + " p_extra")]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            (r["doc_src"], r["doc_sup"])
            for r in dedup.containment_screened_pairs(docs, bucket_cap=16).collect()
        }
        assert (1000, 1001) in got  # small-bucket pair survives capping
        assert all(s == 0 or d == 0 for (s, d) in got if s < 1000 and d < 1000)


class TestWinnowFingerprints:
    """Schleimer 2003 contracts: the density bound and the shared-run
    guarantee (two docs sharing >= w+k-1 consecutive tokens share at
    least one fingerprint hash, at ANY alignment)."""

    def test_shared_run_guarantee_any_alignment(self, spark):
        from helium_etl_lite_spark.operators.text import winnow_fingerprints

        a_toks = [f"a{i}" for i in range(60)]
        shared = a_toks[23:31]  # 8 = w+k-1 tokens, arbitrary offset
        rows = [(1, " ".join(a_toks))]
        # plant the shared run at every alignment 0..9 in doc B
        for shift in range(10):
            b = [f"b{shift}x{j}" for j in range(shift)] + shared + [
                f"b{shift}y{j}" for j in range(8)
            ]
            rows.append((100 + shift, " ".join(b)))
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        fps = winnow_fingerprints(docs, k=4, w=5).collect()
        by_doc = {}
        for r in fps:
            by_doc.setdefault(r["doc_id"], set()).add(r["fp_hash"])
        for shift in range(10):
            assert by_doc[1] & by_doc[100 + shift], f"no shared fp at shift {shift}"

    def test_density_and_short_doc(self, spark):
        import random

        from helium_etl_lite_spark.operators.text import winnow_fingerprints

        rng = random.Random(11)
        text = " ".join(f"t{rng.randrange(10**9)}" for _ in range(2000))
        docs = spark.createDataFrame(
            [(1, text), (2, "only three tokens")], "doc_id long, text string"
        )
        out = winnow_fingerprints(docs, k=4, w=5).collect()
        n1 = sum(1 for r in out if r["doc_id"] == 1)
        # expected density 2/(w+1) = 1/3 of ~1997 grams; generous band
        assert 0.2 * 1997 < n1 < 0.5 * 1997, n1
        # short doc (< w grams) keeps exactly its global-min fingerprint
        assert sum(1 for r in out if r["doc_id"] == 2) == 1


class TestWinnowStopgramFilter:
    def test_hot_fingerprint_dropped_small_kept(self, spark, caplog):
        import logging

        from helium_etl_lite_spark.operators.text import winnow_stopgram_filter

        rows = [(d, 7) for d in range(100)]          # hot: 100 docs share fp 7
        rows += [(1, 11), (2, 11), (3, 99)]          # small fps survive
        fpd = spark.createDataFrame(rows, "doc_id long, fp_hash long")
        with caplog.at_level(logging.WARNING, logger="helium_etl_lite_spark"):
            out = winnow_stopgram_filter(fpd, max_docs_per_fp=64).collect()
        hashes = {r["fp_hash"] for r in out}
        assert 7 not in hashes
        assert hashes == {11, 99}
        assert len(out) == 3
        assert any("stop-gram" in m for m in caplog.messages)

    def test_noop_below_cap(self, spark):
        from helium_etl_lite_spark.operators.text import winnow_stopgram_filter

        fpd = spark.createDataFrame(
            [(1, 5), (2, 5), (3, 6)], "doc_id long, fp_hash long"
        )
        assert winnow_stopgram_filter(fpd, max_docs_per_fp=64).count() == 3


class TestPortableMinhash:
    def test_portable_collapses_planted_cluster_like_production(self, spark):
        # Same planted-cluster fixture contract as the production form:
        # near-identical docs collapse to the min-id keeper with high
        # jaccard; unrelated docs stay self-kept. (Bucket collisions
        # differ between hash families, so keepers are compared on the
        # planted structure, not row-for-row.)
        base = [f"tok{i}" for i in range(40)]
        rows = [(i, " ".join(base + ([f"x{i}"] if i else []))) for i in range(5)]
        rows += [(100 + j, " ".join(f"solo{j}w{i}" for i in range(30)))
                 for j in range(5)]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        for fn in (dedup.minhash_dedup_assign, dedup.minhash_dedup_assign_portable):
            out = {r["doc_id"]: r for r in fn(docs).collect()}
            for i in range(1, 5):
                assert out[i]["keeper_doc_id"] == 0, fn.__name__
                assert out[i]["keeper_jaccard"] >= 0.9
            for j in range(5):
                assert out[100 + j]["keeper_doc_id"] == 100 + j, fn.__name__

    def test_portable_signatures_are_distinct_per_position(self, spark):
        # same r5-ADVICE pin as the production form: the permutation
        # lambdas must not collapse to one
        from helium_etl_lite_spark.operators.dedup import (
            _MERSENNE,
            _md5_32,
            _perm_min,
            _token_set,
        )

        docs = spark.createDataFrame(
            [(1, " ".join(f"w{i}" for i in range(50)))], "doc_id long, text string"
        )
        base = F.transform(_token_set("text"), lambda t: F.pmod(_md5_32(t), F.lit(_MERSENNE)))
        sig = docs.select(F.array(*[_perm_min(base, p) for p in range(16)]).alias("s")).first()["s"]
        assert len(set(sig)) > 8, sig


class TestPortableHll:
    def test_estimate_within_standard_error(self, spark):
        import math

        from helium_etl_lite_spark.queries.aggregates import _hll_registers

        n, m = 5000, 64
        keys = spark.range(n).select((F.col("id") * 7919 + 13).alias("k"))
        regs = {r["bucket"]: r["reg"] for r in _hll_registers(keys, m=m).collect()}
        alpha = 0.709  # alpha_64
        s = sum(2.0 ** -regs.get(b, 0) for b in range(m))
        est = alpha * m * m / s
        # 1.04/sqrt(64) ~ 13% standard error; allow 3 sigma
        assert abs(est - n) / n < 3 * 1.04 / math.sqrt(m), est

    def test_merge_equals_one_pass(self, spark):
        from helium_etl_lite_spark.queries.aggregates import _hll_registers

        keys = spark.range(2000).select((F.col("id") * 31 + 5).alias("k"))
        full = {(r["bucket"], r["reg"]) for r in _hll_registers(keys).collect()}
        a = _hll_registers(keys.where(F.col("k") % 3 == 0))
        b = _hll_registers(keys.where(F.col("k") % 3 != 0))
        merged = {
            (r["bucket"], r["reg"])
            for r in a.unionByName(b)
            .groupBy("bucket")
            .agg(F.max("reg").alias("reg"))
            .collect()
        }
        assert merged == full


class TestPortableSimhash:
    def test_near_dup_collapses_distinct_survive(self, spark):
        # one extra token in 200 flips only bits whose vote margin is
        # ~0 — fixture chosen so the md5-simhash distance is exactly 1
        # (verified against a local python model below)
        base = [f"tok{i}" for i in range(200)]
        near = base + ["zzz_extra"]
        rows = [
            (1, " ".join(base)),
            (2, " ".join(near)),
            (3, " ".join(f"other{i}" for i in range(60))),
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        out = {r["doc_id"]: r for r in dedup.simhash_assign_portable(docs, k=3).collect()}
        assert out[2]["keeper_doc_id"] == 1 and out[2]["hamming"] == 1
        assert out[1]["keeper_doc_id"] == 1
        assert out[3]["keeper_doc_id"] == 3 and out[3]["hamming"] == 0

    def test_spark_simhash_matches_python_model(self, spark):
        import hashlib

        def model(toks):
            votes = [0] * 32
            for t in set(toks):
                hv = int(hashlib.md5(t.encode()).hexdigest()[:8], 16)
                for b in range(32):
                    votes[b] += 1 if (hv >> b) & 1 else -1
            return sum((1 << b) for b in range(32) if votes[b] >= 0)

        toks = [f"w{i}" for i in range(37)]
        docs = spark.createDataFrame([(1, " ".join(toks))], "doc_id long, text string")
        # keeper of a singleton is itself; recover its simhash through
        # the internal band rows by re-deriving via the operator path
        out = dedup.simhash_assign_portable(docs).collect()
        assert out[0]["keeper_doc_id"] == 1
        # cross-check the hash value itself via the oracle SQL path
        import duckdb

        con = duckdb.connect()
        text = " ".join(toks)
        con.execute(
            f"CREATE VIEW documents AS SELECT 1::BIGINT AS doc_id, '{text}' AS text"
        )
        row = con.execute(
            dedup.simhash_portable_oracle_sql(k=3)
        ).fetchall()
        assert row == [(1, 1, 0)]
        sh_sql = con.execute(
            """WITH toks AS (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok FROM documents),
            th AS (SELECT doc_id, CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT) AS th FROM toks),
            votes AS (SELECT doc_id, """
            + ", ".join(
                f"SUM(CASE WHEN (th >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS v{b}"
                for b in range(32)
            )
            + " FROM th GROUP BY doc_id) SELECT "
            + " + ".join(
                f"CASE WHEN v{b} >= 0 THEN CAST({1 << b} AS BIGINT) ELSE 0 END"
                for b in range(32)
            )
            + " FROM votes"
        ).fetchone()[0]
        assert sh_sql == model(toks)


class TestTriangleCounts:
    def test_k4_plus_pendant(self, spark):
        from helium_etl_lite_spark.operators.graph import triangle_counts

        # K4 on {1,2,3,4}: 4 triangles total, every node in 3 of them;
        # pendant node 5 hangs off 1 and joins none. Feed duplicates,
        # a reversed edge and a self-loop to prove normalization.
        edges = [
            (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
            (2, 1),          # reversed duplicate
            (3, 4), (3, 3),  # duplicate + self-loop
            (1, 5),
        ]
        df = spark.createDataFrame(edges, "a long, b long")
        got = {r["node"]: (r["degree"], r["triangles"])
               for r in triangle_counts(df).collect()}
        assert got == {1: (4, 3), 2: (3, 3), 3: (3, 3), 4: (3, 3)}
        # node 5 participates in no triangle, so it has no row

    def test_triangle_free_bipartite(self, spark):
        from helium_etl_lite_spark.operators.graph import triangle_counts

        # complete bipartite K2,3 is triangle-free
        edges = [(a, b) for a in (1, 2) for b in (10, 20, 30)]
        df = spark.createDataFrame(edges, "a long, b long")
        assert triangle_counts(df).count() == 0

    def test_each_triangle_counted_once(self, spark):
        from helium_etl_lite_spark.operators.graph import triangle_counts

        # two triangles sharing an edge: {1,2,3} and {2,3,4}
        edges = [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4)]
        df = spark.createDataFrame(edges, "a long, b long")
        got = {r["node"]: r["triangles"] for r in triangle_counts(df).collect()}
        assert got == {1: 1, 2: 2, 3: 2, 4: 1}


class TestBloomPrunedJoin:
    def test_equals_plain_join(self, spark, sf_dir):
        # the bloom prune is semantics-free: false positives die in the
        # real join, true matches always pass the sketch (no false
        # negatives by Bloom construction) — so the query must equal
        # the plain join+agg bit-for-bit inside Spark too, not just
        # against the DuckDB oracle.
        import pyspark.sql.functions as F

        from helium_etl_lite_spark import registry
        from helium_etl_lite_spark.tables import Tables

        registry.load_all()
        got = registry.QUERIES["join_bloom_pruned"](spark, sf_dir)
        t = Tables(spark, sf_dir)
        plain = (
            t.lineitem.join(
                t.supplier.where(F.col("s_nationkey").isin(3, 7)),
                F.col("l_suppkey") == F.col("s_suppkey"),
            )
            .groupBy("s_suppkey")
            .agg(
                F.count(F.lit(1)).alias("n_items"),
                F.sum(
                    F.round(
                        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                    ).cast("long")
                ).alias("revenue_cents"),
            )
            .orderBy("s_suppkey")
        )
        assert got.collect() == plain.collect()


class TestBitsamplePortable:
    def test_planted_near_pair_found_at_rank_one(self, spark, tmp_path):
        # pigeonhole guarantee made concrete: flip exactly 2 of the 32
        # comparison bits -> hamming 2 <= 3 -> the pair MUST share a
        # band and surface as each other's top candidate.
        import numpy as np

        from helium_etl_lite_spark import registry

        registry.load_all()
        rng = np.random.RandomState(7)
        base = rng.randn(64).astype("float32")
        near = base.copy()
        for pair in (0, 5):  # swap two element pairs -> flips bits 0 and 5
            a, b = 2 * pair, 2 * pair + 1
            near[a], near[b] = near[b], near[a]
        far = [rng.randn(64).astype("float32") for _ in range(20)]
        rows = [(0, [float(x) for x in base], 0),
                (100, [float(x) for x in near], 0)] + [
            (200 + i, [float(x) for x in v], 1) for i, v in enumerate(far)
        ]
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        )
        df.write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
        out = registry.QUERIES["vec_ann_bitsample_portable"](
            spark, str(tmp_path)
        ).collect()
        mine = [r for r in out if r["q_id"] == 0]
        assert mine, "query vector produced no candidates"
        top = min(mine, key=lambda r: r["rn"])
        assert top["neighbor_id"] == 100
        assert top["hamming"] == 2

    def test_signature_orders_by_similarity_in_expectation(self, spark, sf_dir):
        # on a diffuse corpus true cosine neighbors are NOT within the
        # banding radius (measured: mean hamming ~13/32 at sf0.001) —
        # the honest property of a comparison-coded signature is
        # ORDERING: cosine top-5 pairs sit measurably closer in hamming
        # than random pairs.
        import random

        import pyspark.sql.functions as F

        from helium_etl_lite_spark.operators import knn
        from helium_etl_lite_spark.queries.llm_ops import _bitsample_sig_sql
        from helium_etl_lite_spark.tables import Tables

        t = Tables(spark, sf_dir)
        sig = {
            r["vec_id"]: r["sig"]
            for r in t.embeddings.selectExpr(
                "vec_id", _bitsample_sig_sql("spark") + " AS sig"
            ).collect()
        }
        exact = knn.cosine_topk(
            t.embeddings, t.embeddings.where(F.col("vec_id") < 8), k=5
        ).collect()
        ham_top = [
            bin(sig[r["q_id"]] ^ sig[r["vec_id"]]).count("1") for r in exact
        ]
        rnd = random.Random(0)
        ids = sorted(sig)
        ham_rand = [
            bin(sig[rnd.choice(ids)] ^ sig[rnd.choice(ids)]).count("1")
            for _ in range(1000)
        ]
        top_mean = sum(ham_top) / len(ham_top)
        rand_mean = sum(ham_rand) / len(ham_rand)
        assert top_mean < rand_mean - 1.0, (top_mean, rand_mean)


class TestKcorePeel:
    def test_k5_with_pendant_chain(self, spark):
        from helium_etl_lite_spark.operators.graph import kcore_peel

        # K5 on {1..5} plus chain 5-6-7: at k=3 the chain peels away
        # over two rounds (7 first, then 6) and the 3-core is exactly
        # K5, every member at degree 4.
        k5 = [(a, b) for a in range(1, 6) for b in range(a + 1, 6)]
        edges = k5 + [(5, 6), (6, 7)]
        df = spark.createDataFrame(edges, "a long, b long")
        got = {r["node"]: r["core_degree"]
               for r in kcore_peel(df, k=3, rounds=4).collect()}
        assert got == {1: 4, 2: 4, 3: 4, 4: 4, 5: 4}

    def test_registered_query_is_at_fixed_point(self, spark, sf_dir):
        # the registry contract says 6 peel rounds; the exactness claim
        # "this IS the k-core" needs the fixed point reached within the
        # budget — peel one extra round and require identical output.
        import pyspark.sql.functions as F

        from helium_etl_lite_spark.operators.graph import kcore_peel
        from helium_etl_lite_spark.queries.extras import (
            _KCORE_K,
            _KCORE_ROUNDS,
        )
        from helium_etl_lite_spark.tables import Tables

        t = Tables(spark, sf_dir)
        li = t.lineitem.select("l_orderkey", "l_partkey")
        pairs = li.join(
            li.withColumnRenamed("l_partkey", "p2"), "l_orderkey"
        ).where(F.col("l_partkey") != F.col("p2"))
        a = kcore_peel(pairs, k=_KCORE_K, rounds=_KCORE_ROUNDS,
                       a_col="l_partkey", b_col="p2").orderBy("node").collect()
        b = kcore_peel(pairs, k=_KCORE_K, rounds=_KCORE_ROUNDS + 1,
                       a_col="l_partkey", b_col="p2").orderBy("node").collect()
        assert a == b
        assert len(a) > 0


class TestBm25:
    def test_matches_reference_formula_on_tiny_corpus(self, spark, tmp_path):
        import math

        from helium_etl_lite_spark import registry

        registry.load_all()
        docs = [
            (0, "scan merge window scan", "en", "s", 23),
            (1, "scan table table table", "en", "s", 22),
            (2, "group sort filter join", "en", "s", 22),
            (3, "window window merge scan table sort", "en", "s", 35),
        ]
        spark.createDataFrame(
            docs, "doc_id long, text string, lang string, source string, n_chars long"
        ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
        got = {r["doc_id"]: r["bm25"] for r in registry.QUERIES[
            "text_bm25_topk"](spark, str(tmp_path)).collect()}

        # reference computation, same k1/b/idf convention
        k1, b = 1.2, 0.75
        texts = {d[0]: d[1].split(" ") for d in docs}
        n = len(docs)
        avgdl = sum(len(v) for v in texts.values()) / n
        terms = ["scan", "merge", "window"]
        want = {}
        for did, toks in texts.items():
            score = 0.0
            for term in terms:
                tf = toks.count(term)
                if tf == 0:
                    continue
                df = sum(1 for v in texts.values() if term in v)
                idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
                score += idf * (tf * (k1 + 1)) / (
                    tf + k1 * (1 - b + b * len(toks) / avgdl)
                )
            if score:
                want[did] = round(score, 6)
        assert set(got) == set(want)
        for did in want:
            assert abs(got[did] - want[did]) < 1e-9, did


class TestWavCodec:
    def test_stdlib_wave_reads_our_output(self):
        import io
        import wave

        import numpy as np

        from helium_etl_lite_spark.operators.multimodal import (
            encode_wav_bytes,
        )

        s = np.array([0, 1000, -2000, 32767, -32768, 7], dtype="<i2")
        w = wave.open(io.BytesIO(encode_wav_bytes(s, 16000)))
        assert (w.getframerate(), w.getnchannels(), w.getsampwidth(),
                w.getnframes()) == (16000, 1, 2, 6)
        got = np.frombuffer(w.readframes(6), dtype="<i2")
        assert (got == s).all()

    def test_we_read_stdlib_wave_output(self):
        import io
        import wave

        import numpy as np

        from helium_etl_lite_spark.operators.multimodal import decode_wav

        s = np.array([5, -5, 12345, -12345], dtype="<i2")
        buf = io.BytesIO()
        w = wave.open(buf, "wb")
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(44100)
        w.writeframes(s.tobytes())
        w.close()
        d = decode_wav(buf.getvalue())
        assert d["sample_rate"] == 44100
        assert d["n_channels"] == 1
        assert (d["samples"] == s).all()

    def test_fail_stop_on_garbage(self):
        import struct

        import numpy as np
        import pytest

        from helium_etl_lite_spark.operators.multimodal import (
            decode_wav,
            encode_wav_bytes,
        )

        good = encode_wav_bytes(np.array([1, 2, 3], dtype="<i2"), 8000)
        with pytest.raises(ValueError):
            decode_wav(b"RIFX" + good[4:])          # bad magic
        with pytest.raises(ValueError):
            decode_wav(good[:20])                   # truncated
        # declared RIFF size exceeding actual payload
        bad_sz = good[:4] + struct.pack("<I", len(good) + 100) + good[8:]
        with pytest.raises(ValueError):
            decode_wav(bad_sz)
        # non-PCM encoding (IEEE float = format 3)
        nonpcm = bytearray(good)
        nonpcm[20] = 3
        with pytest.raises(ValueError):
            decode_wav(bytes(nonpcm))

    def test_chunk_walk_skips_foreign_chunks(self):
        # a LIST/INFO chunk before fmt/data (common in real files, and
        # chunks are word-aligned) must be skipped, not break parsing
        import struct

        import numpy as np

        from helium_etl_lite_spark.operators.multimodal import (
            decode_wav,
            encode_wav_bytes,
        )

        good = encode_wav_bytes(np.array([9, -9, 42], dtype="<i2"), 8000)
        body = good[12:]
        foreign = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # odd size, padded
        patched = (
            b"RIFF"
            + struct.pack("<I", 4 + len(foreign) + len(body))
            + b"WAVE"
            + foreign
            + body
        )
        d = decode_wav(patched)
        assert list(d["samples"]) == [9, -9, 42]


class TestQuantileSketchPortable:
    """agg_quantile_sketch_portable: merge semantics + estimator error
    bound (the exact-oracle sweep already pins cross-engine equality)."""

    def _true_quantiles(self, spark, sf_dir, qs):
        import numpy as np

        from helium_etl_lite_spark.tables import Tables

        vals = np.array(
            [
                r[0]
                for r in Tables(spark, sf_dir)
                .lineitem.select("l_extendedprice")
                .collect()
            ]
        )
        # inverted_cdf: the rank-ceil(q*N) value — the rank the
        # equi-width estimator targets (see grouped test note).
        return {
            q: float(np.quantile(vals, q, method="inverted_cdf")) for q in qs
        }, vals

    def test_estimates_within_one_bin_width(self, spark, sf_dir):
        from helium_etl_lite_spark import registry
        from helium_etl_lite_spark.queries.aggregates import (
            _QSKETCH_BINS,
            _QSKETCH_QS,
        )

        registry.load_all()
        rows = registry.QUERIES["agg_quantile_sketch_portable"](
            spark, sf_dir
        ).collect()
        assert len(rows) == len(_QSKETCH_QS)
        true, vals = self._true_quantiles(spark, sf_dir, _QSKETCH_QS)
        width = (vals.max() - vals.min()) / _QSKETCH_BINS
        for r in rows:
            # classic equi-width histogram bound: the interpolated
            # estimate lands inside the bin containing the true
            # quantile, so |err| <= one bin width.
            assert abs(r["est"] - true[r["q"]]) <= width + 1e-9, (
                r["q"],
                r["est"],
                true[r["q"]],
            )

    def test_per_group_sketches_merge_to_global(self, spark, sf_dir):
        # The re-aggregatability contract: summing per-group (bin,cnt)
        # partials equals building one global sketch — same invariant
        # the CMS/HLL/bitmap family pins, lossless here.
        from helium_etl_lite_spark.queries.aggregates import _QSKETCH_BINS
        from helium_etl_lite_spark.tables import Tables

        t = Tables(spark, sf_dir)
        t.register_views()
        edges = spark.sql(
            "SELECT MIN(l_extendedprice) lo, MAX(l_extendedprice) hi FROM lineitem"
        ).first()
        w = (edges["hi"] - edges["lo"]) / _QSKETCH_BINS
        binned = t.lineitem.select(
            "l_returnflag",
            F.least(
                F.lit(_QSKETCH_BINS - 1),
                F.floor((F.col("l_extendedprice") - edges["lo"]) / w).cast(
                    "bigint"
                ),
            ).alias("bin"),
        )
        per_group = binned.groupBy("l_returnflag", "bin").count()
        merged = {
            r["bin"]: r["n"]
            for r in per_group.groupBy("bin")
            .agg(F.sum("count").alias("n"))
            .collect()
        }
        direct = {
            r["bin"]: r["count"] for r in binned.groupBy("bin").count().collect()
        }
        assert merged == direct


class TestPqPortable:
    def test_partitioning_invariant(self, spark, sf_dir):
        # The exactness claim is determinism: the full train->encode->
        # ADC path must be bit-identical under a different input
        # partitioning (no order-dependent float summation anywhere).
        from helium_etl_lite_spark.operators import knn
        from helium_etl_lite_spark.tables import Tables

        emb = Tables(spark, sf_dir).embeddings
        q = emb.where(F.col("vec_id") < 3)
        a = knn.ann_topk_pq_portable(emb, q, k=5).collect()
        b = knn.ann_topk_pq_portable(emb.repartition(7), q, k=5).collect()
        assert [tuple(r) for r in a] == [tuple(r) for r in b]
        # ADC distances are integral (quantized arithmetic end to end)
        assert all(isinstance(r["adc_dist"], int) for r in a)


class TestPageRankPortable:
    def _edges(self, spark, sf_dir):
        from helium_etl_lite_spark.tables import Tables

        t = Tables(spark, sf_dir)
        trade = (
            t.lineitem.select("l_orderkey", "l_suppkey")
            .join(
                t.orders.select("o_orderkey", "o_custkey"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .select(
                F.col("o_custkey").alias("cust"),
                (F.col("l_suppkey") + F.lit(1_000_000)).alias("supp"),
            )
            .distinct()
        )
        return trade.select(
            F.col("cust").alias("src"), F.col("supp").alias("dst")
        ).unionByName(
            trade.select(F.col("supp").alias("src"), F.col("cust").alias("dst"))
        )

    def test_partitioning_invariant(self, spark, sf_dir):
        from helium_etl_lite_spark.operators.graph import (
            pagerank_portable_quantized,
        )

        e = self._edges(spark, sf_dir)
        a = {
            r["node"]: r["rank_q"]
            for r in pagerank_portable_quantized(e, rounds=3).collect()
        }
        b = {
            r["node"]: r["rank_q"]
            for r in pagerank_portable_quantized(
                e.repartition(7), rounds=3
            ).collect()
        }
        assert a == b  # bit-identical, not just close

    def test_ordering_faithful_to_float_pagerank(self, spark, sf_dir):
        # The integer fixed point is a SCORE; its ranking must track
        # the float operator's at the same round count (floor division
        # perturbs ranks by O(1) mass units, far below the rank gaps
        # on this graph).
        from helium_etl_lite_spark.operators.graph import (
            pagerank,
            pagerank_portable_quantized,
        )

        e = self._edges(spark, sf_dir)
        fi = [
            r["node"]
            for r in pagerank(e, iterations=4)
            .orderBy(F.col("rank").desc(), F.col("node").asc())
            .limit(10)
            .collect()
        ]
        qi = [
            r["node"]
            for r in pagerank_portable_quantized(e, rounds=4)
            .orderBy(F.col("rank_q").desc(), F.col("node").asc())
            .limit(10)
            .collect()
        ]
        assert len(set(fi) & set(qi)) >= 8, (fi, qi)
        assert fi[:3] == qi[:3]


class TestIvfPqPortable:
    def test_full_probe_full_shortlist_equals_brute_force(self, spark, sf_dir):
        # With nprobe = n_lists (every list probed) and an unbounded
        # shortlist, the ADC stage only SELECTS candidates — the exact
        # rerank then must return exactly the integer brute-force
        # top-k. This pins the whole coarse/residual/ADC plumbing: any
        # mis-assignment or LUT bug would leak a wrong id into (or
        # drop a right id from) the shortlist.
        from helium_etl_lite_spark.operators import knn
        from helium_etl_lite_spark.tables import Tables

        emb = Tables(spark, sf_dir).embeddings
        n = emb.count()
        q = emb.where(F.col("vec_id") < 3)
        got = knn.ann_topk_ivfpq_portable(
            emb, q, k=5, shortlist=n, n_lists=4, nprobe=4
        ).collect()

        # integer brute force twin
        qv = emb.select(
            "vec_id",
            F.transform(
                "embedding", lambda x: F.round(x.cast("double") * 10000.0, 0)
            ).alias("q"),
        )
        import itertools

        vecs = {r["vec_id"]: r["q"] for r in qv.collect()}
        want = []
        for qid in sorted(v for v in vecs if v < 3):
            d = sorted(
                (
                    int(
                        sum((a - b) ** 2 for a, b in zip(vecs[qid], vecs[v]))
                    ),
                    v,
                )
                for v in vecs
                if v != qid
            )[:5]
            want.extend(
                (qid, v, dist, rn + 1) for rn, (dist, v) in enumerate(d)
            )
        assert [tuple(r) for r in got] == want

    def test_partitioning_invariant(self, spark, sf_dir):
        from helium_etl_lite_spark.operators import knn
        from helium_etl_lite_spark.tables import Tables

        emb = Tables(spark, sf_dir).embeddings
        q = emb.where(F.col("vec_id") < 2)
        a = knn.ann_topk_ivfpq_portable(emb, q, k=5).collect()
        b = knn.ann_topk_ivfpq_portable(emb.repartition(5), q, k=5).collect()
        assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_grouped_quantile_sketch_error_bound(spark, sf_dir):
    # Per-group twin of TestQuantileSketchPortable's bound: every
    # estimate within one per-group bin width of the true quantile.
    import numpy as np

    from helium_etl_lite_spark import registry
    from helium_etl_lite_spark.queries.aggregates import _QSG_BINS, _QSG_QS
    from helium_etl_lite_spark.tables import Tables

    registry.load_all()
    rows = registry.QUERIES["agg_quantile_sketch_grouped"](
        spark, sf_dir
    ).collect()
    by_type = {}
    for r in Tables(spark, sf_dir).events.select("event_type", "value").collect():
        by_type.setdefault(r["event_type"], []).append(r["value"])
    assert {r["event_type"] for r in rows} == set(by_type)
    for r in rows:
        vals = np.array(by_type[r["event_type"]])
        width = (vals.max() - vals.min()) / _QSG_BINS
        # inverted_cdf = the value at rank ceil(q*N), which is the
        # rank the histogram estimator targets; numpy's default
        # (linear, position q*(n-1)) can sit a whole order-stat jump
        # away in a sparse tail, which is a convention difference,
        # not estimator error.
        true = float(np.quantile(vals, r["q"], method="inverted_cdf"))
        assert abs(r["est"] - true) <= width + 1e-9, (
            r["event_type"], r["q"], r["est"], true,
        )


class TestGridRadiusSelfJoin:
    def _run(self, spark, rows, r):
        from helium_etl_lite_spark.operators.spatial import grid_radius_self_join

        pts = spark.createDataFrame(rows, "vec_id long, x long, y long")
        return {
            (row["a_id"], row["b_id"]): row["dist_sq_q"]
            for row in grid_radius_self_join(pts, r).collect()
        }

    def test_matches_brute_force_including_cross_cell_pairs(self, spark):
        # Points straddling a cell boundary (r=10: x=9 and x=11 live in
        # different cells) must still pair via the 3x3 neighborhood.
        rows = [(1, 9, 0), (2, 11, 0), (3, 25, 0), (4, -9, -9), (5, 200, 200)]
        got = self._run(spark, rows, 10)
        brute = {}
        for i, (ai, ax, ay) in enumerate(rows):
            for bi, bx, by in rows[i + 1:]:
                d = (ax - bx) ** 2 + (ay - by) ** 2
                if d <= 100:
                    brute[(ai, bi)] = d
        assert got == brute
        assert (1, 2) in got  # the cross-cell pair

    def test_radius_boundary_is_inclusive_and_no_self_pairs(self, spark):
        # dist == r exactly is IN; dist just beyond is OUT; a point
        # never pairs with itself and each pair appears exactly once.
        rows = [(1, 0, 0), (2, 5, 0), (3, 6, 0)]
        got = self._run(spark, rows, 5)
        assert got == {(1, 2): 25, (2, 3): 1}

    def test_negative_coordinates_floor_correctly(self, spark):
        # Spark `div` truncates toward zero on negatives; the offset
        # shift makes cell assignment a true floor — a pair with both
        # points negative and near a cell edge must not be lost.
        rows = [(1, -101, -1), (2, -99, 1)]
        got = self._run(spark, rows, 100)
        assert (1, 2) in got

    def test_rejects_nonpositive_radius(self, spark):
        import pytest as _pytest

        from helium_etl_lite_spark.operators.spatial import grid_radius_self_join

        pts = spark.createDataFrame([(1, 0, 0)], "vec_id long, x long, y long")
        with _pytest.raises(ValueError):
            grid_radius_self_join(pts, 0)


class TestGridDensityStencil:
    def test_neighborhood_sum_matches_hand_computed(self, spark):
        from helium_etl_lite_spark.operators.spatial import (
            grid_density,
            grid_neighborhood_sum,
        )

        # cell width 16 divides COORD_OFFSET (2^20) so cell ids are
        # predictable: (0,0)x2, (1,0)x1, (3,3)x1 — the first two cells
        # are neighbors; (3,3) is isolated.
        pts = spark.createDataFrame(
            [(1, 5), (2, 3), (17, 1), (50, 50)], "x long, y long"
        )
        d = grid_density(pts, 16)
        out = {
            (r["cx"], r["cy"]): (r["n_pts"], r["nbr_sum"])
            for r in grid_neighborhood_sum(d).collect()
        }
        base = (1 << 20) // 16
        assert out[(base, base)] == (2, 3)          # itself 2 + neighbor 1
        assert out[(base + 1, base)] == (1, 3)      # itself 1 + neighbor 2
        assert out[(base + 3, base + 3)] == (1, 1)  # isolated
        assert len(out) == 3                        # only occupied cells

    def test_rejects_nonpositive_cell(self, spark):
        import pytest as _pytest

        from helium_etl_lite_spark.operators.spatial import grid_density

        pts = spark.createDataFrame([(1, 1)], "x long, y long")
        with _pytest.raises(ValueError):
            grid_density(pts, 0)


class TestSampleQuotaWaterfill:
    """Closed-form waterfill vs a brute-force level search on
    synthetic skew (the driver-gate corpus exercises level/saturation/
    remainder; these pin the algebra on hand-built edges)."""

    @staticmethod
    def _write_docs(spark, tmp_path, sizes):
        rows = []
        did = 0
        for b, n in enumerate(sizes):
            for _ in range(n):
                rows.append((did, f"text {did}", "en", f"s{b}", 10 + did % 7))
                did += 1
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    @staticmethod
    def _brute(sizes, num=3, den=5):
        total = sum(sizes)
        budget = total * num // den
        lvl = 0
        while sum(min(n, lvl + 1) for n in sizes) <= budget:
            lvl += 1
        quotas = [min(n, lvl) for n in sizes]
        rem = budget - sum(quotas)
        order = sorted(
            range(len(sizes)),
            key=lambda i: (-sizes[i], f"en/s{i}"),
        )
        for i in order:
            if rem <= 0:
                break
            if sizes[i] > lvl:
                quotas[i] += 1
                rem -= 1
        return lvl, quotas, budget

    def _run(self, spark, tmp_path, sizes):
        from helium_etl_lite_spark import registry

        registry.load_all()
        self._write_docs(spark, tmp_path, sizes)
        rows = registry.QUERIES["sample_quota_waterfill"](
            spark, str(tmp_path)
        ).collect()
        lvl, quotas, budget = self._brute(sizes)
        got = {r["bucket"]: r for r in rows}
        for b, n in enumerate(sizes):
            r = got[f"en/s{b}"]
            assert r["n_docs"] == n
            assert r["quota"] == quotas[b], (b, r["quota"], quotas[b])
            assert r["selected_docs"] == quotas[b]
            assert r["water_level"] == lvl
        assert sum(r["quota"] for r in rows) == budget

    def test_saturation_and_remainder(self, spark, tmp_path):
        # sizes 1,2,10,14: level 6, buckets 0/1 saturate, remainder 1
        # goes to the largest unsaturated bucket.
        self._run(spark, tmp_path, [1, 2, 10, 14])

    def test_uniform_exact_fill_no_remainder(self, spark, tmp_path):
        # 5 equal buckets: level = budget/5 exactly, remainder 0.
        self._run(spark, tmp_path, [5, 5, 5, 5, 5])

    def test_single_bucket(self, spark, tmp_path):
        self._run(spark, tmp_path, [10])


class TestContainmentScreenedPortable:
    def test_capped_equals_uncapped_when_no_overflow(self, spark, sf_dir):
        from helium_etl_lite_spark.operators.dedup import (
            containment_screened_pairs_portable,
        )
        from helium_etl_lite_spark.tables import Tables

        docs = Tables(spark, sf_dir).documents.orderBy("doc_id").limit(60)
        hi = containment_screened_pairs_portable(docs, bucket_cap=10_000)
        lo = containment_screened_pairs_portable(docs, bucket_cap=256)
        assert hi.exceptAll(lo).count() == 0
        assert lo.exceptAll(hi).count() == 0

    def test_overfull_bucket_routes_through_min_representative(self, spark):
        from helium_etl_lite_spark.operators.dedup import (
            containment_screened_pairs_portable,
        )

        # Five identical docs: every band bucket holds all five, so at
        # bucket_cap=2 the all-pairs path is empty and every candidate
        # pair must involve the min-id doc (the representative).
        docs = spark.createDataFrame(
            [(i, "alpha beta gamma delta epsilon") for i in range(5)],
            "doc_id long, text string",
        )
        out = containment_screened_pairs_portable(
            docs, containment_threshold=0.9, bucket_cap=2
        ).collect()
        assert out, "identical docs must verify as containment pairs"
        assert all(r["doc_src"] == 0 or r["doc_sup"] == 0 for r in out)
        # both directions against the representative survive the verify
        assert {(r["doc_src"], r["doc_sup"]) for r in out} == (
            {(0, i) for i in range(1, 5)} | {(i, 0) for i in range(1, 5)}
        )
        assert all(r["containment"] == 1.0 for r in out)


class TestPackConcatChunk:
    def test_every_chunk_full_except_last(self, spark, sf_dir):
        from helium_etl_lite_spark import registry

        registry.load_all()
        rows = registry.QUERIES["pack_concat_chunk"](spark, sf_dir).collect()
        assert rows, "corpus must produce at least one chunk"
        *full, last = rows
        assert all(r["tokens_in_chunk"] == 256 for r in full)
        assert 0 < last["tokens_in_chunk"] <= 256
        # chunk ids are the dense range 0..n-1 and spans are ordered
        assert [r["chunk_id"] for r in rows] == list(range(len(rows)))
        assert all(r["first_doc"] <= r["last_doc"] for r in rows)
        # total fill equals the corpus token mass
        total = sum(r["tokens_in_chunk"] for r in rows)
        from pyspark.sql import functions as F

        from helium_etl_lite_spark.tables import Tables

        mass = (
            Tables(spark, sf_dir)
            .documents.select(F.sum(F.size(F.split("text", " "))).alias("m"))
            .first()["m"]
        )
        assert total == mass


class TestLshPortable:
    def test_planted_near_duplicate_is_rank_one(self, spark, tmp_path):
        import numpy as np

        from helium_etl_lite_spark import registry

        registry.load_all()
        rng = np.random.default_rng(7)
        base = rng.normal(size=(40, 64)).astype("float32") * 0.2
        # vec 25 = vec 3 (a query: id < 8 forms the query set) with a
        # sub-quantization-step perturbation: identical after
        # round(x*100) -> identical signature AND distance 0.
        base[25] = base[3] + 1e-5
        rows = [(i, [float(x) for x in base[i]], 0) for i in range(40)]
        spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
        out = registry.QUERIES["vec_ann_lsh_portable"](
            spark, str(tmp_path)
        ).collect()
        top = {r["q_id"]: r for r in out if r["rn"] == 1}
        assert top[3]["neighbor_id"] == 25
        assert top[3]["dist_q"] == 0


class TestLshMultiprobe:
    def test_pigeonhole_covers_hamming_7(self, spark, sf_dir):
        """Every (query, point) pair within signature-hamming 7 must
        appear in the multiprobe candidate set (4 bands, <=7 mismatches
        -> some band has <=1 -> probed); the exact-band form only
        guarantees hamming <= 3. Signatures recomputed independently in
        numpy from the same _lshp_sign constants."""
        import numpy as np

        from helium_etl_lite_spark.queries.llm_ops import (
            _LSHP_NQ,
            _LSHP_SCALE,
            _lshp_sign,
        )
        from helium_etl_lite_spark.tables import Tables

        emb = Tables(spark, sf_dir).embeddings.orderBy("vec_id").collect()
        ids = np.array([r["vec_id"] for r in emb])
        x = np.array([r["embedding"] for r in emb], dtype=np.float64)
        q = np.round(x * _LSHP_SCALE)
        signs = np.array(
            [[_lshp_sign(b, i) for i in range(64)] for b in range(16)]
        )
        bits = (q @ signs.T >= 0).astype(np.int64)  # (N, 16)
        sig = (bits << np.arange(16)).sum(axis=1)

        from helium_etl_lite_spark import registry

        registry.load_all()
        import pyspark.sql.functions as F

        # candidate set = every (q_id, c_id) surviving the probe join,
        # before top-k: recompute by lifting the query's rerank cap
        out = registry.QUERIES["vec_ann_lsh_multiprobe_portable"](
            spark, sf_dir
        )
        got_top = {(r["q_id"], r["neighbor_id"]) for r in out.collect()}
        assert got_top, "multiprobe must return neighbors"

        # pigeonhole assertion on the FULL candidate relation: any pair
        # at hamming <= 7 shares a band within one bit of a probe
        for qi in range(min(_LSHP_NQ, len(ids))):
            hq = sig[ids == qi][0]
            for cid, hc in zip(ids, sig):
                if cid == qi:
                    continue
                ham = bin(int(hq) ^ int(hc)).count("1")
                if ham <= 7:
                    shares = any(
                        bin(((int(hq) >> (4 * k)) & 15)
                            ^ ((int(hc) >> (4 * k)) & 15)).count("1") <= 1
                        for k in range(4)
                    )
                    assert shares, (qi, cid, ham)


class TestSubstringAnchorDedup:
    """Lee-2022-grade exact-substring dedup via winnow anchors: the
    alignment-FREE guarantee (any duplicated passage of >= span_len+w-1
    tokens loses >= span_len tokens from every later copy) plus the
    fixture the stride grid provably cannot catch."""

    def _mk(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_stride10_provably_misses_offset3_copy(self, spark):
        # A 60-token passage copied at offset 3 (residue 3 mod 10):
        # every stride-10 span of B maps to an A-start = 7 (mod 10),
        # never on A's grid — the grid is blind at ANY passage length.
        # Content-defined anchors land at the same token of both
        # copies, so the anchored form removes >= 50 tokens of B.
        from helium_etl_lite_spark.operators.dedup import (
            span_dedup_overlap,
            substring_anchor_dedup,
        )

        a_text = " ".join(f"a{i}" for i in range(100))
        b_text = " ".join(
            [f"b{i}" for i in range(3)]
            + [f"a{i}" for i in range(60)]
            + [f"c{i}" for i in range(17)]
        )
        docs = self._mk(spark, [(1, a_text), (2, b_text)])

        grid = {r["doc_id"]: r for r in
                span_dedup_overlap(docs, span_len=20, stride=10).collect()}
        assert grid[2]["text_dedup"] == b_text  # grid: blind
        assert grid[1]["text_dedup"] == a_text

        anch = {r["doc_id"]: r for r in
                substring_anchor_dedup(docs, span_len=50).collect()}
        assert anch[1]["text_dedup"] == a_text  # first occurrence intact
        assert anch[1]["n_tokens_kept"] == 100
        assert anch[2]["n_tokens_kept"] <= 80 - 50  # >= 50 tokens removed
        # fresh head always survives (no anchor span can cover it)
        assert anch[2]["text_dedup"].startswith("b0 b1 b2")

    def test_guarantee_holds_at_every_alignment(self, spark):
        # The documented bound: region length 54 = span_len + w - 1.
        # Plant the same 54-token passage at offsets 0..9 — every
        # residue class mod the old stride — and check >= 50 tokens
        # drop from the later copy each time.
        from helium_etl_lite_spark.operators.dedup import substring_anchor_dedup

        passage = [f"p{i}" for i in range(54)]
        a_text = " ".join(f"a{i}" for i in range(20)) + " " + " ".join(passage)
        rows = [(1, a_text)]
        for off in range(10):
            b = [f"x{off}_{j}" for j in range(off)] + passage + [
                f"y{off}_{j}" for j in range(12)
            ]
            rows.append((10 + off, " ".join(b)))
        docs = self._mk(spark, rows)
        out = {r["doc_id"]: r for r in
               substring_anchor_dedup(docs, span_len=50).collect()}
        assert out[1]["n_tokens_kept"] == 74  # first occurrence intact
        for off in range(10):
            doc_len = off + 54 + 12
            kept = out.get(10 + off)
            n_kept = kept["n_tokens_kept"] if kept is not None else 0
            assert n_kept <= doc_len - 50, (
                f"offset {off}: only {doc_len - n_kept} tokens removed"
            )

    def test_short_duplicates_below_span_len_survive(self, spark):
        # Contract floor: nothing below span_len is ever removed — a
        # 30-token copy in fresh context produces no 50-token span
        # match. (Detection is exact ABOVE the bound, never below the
        # span length.)
        from helium_etl_lite_spark.operators.dedup import substring_anchor_dedup

        shared = [f"s{i}" for i in range(30)]
        a = " ".join([f"a{i}" for i in range(40)] + shared)
        b = " ".join(shared + [f"b{i}" for i in range(40)])
        docs = self._mk(spark, [(1, a), (2, b)])
        out = {r["doc_id"]: r for r in
               substring_anchor_dedup(docs, span_len=50).collect()}
        assert out[1]["n_tokens_kept"] == 70
        assert out[2]["n_tokens_kept"] == 70


def test_kcore_rejects_zero_rounds(spark):
    from helium_etl_lite_spark.operators.graph import kcore_peel

    import pytest as _pytest

    edges = spark.createDataFrame([(1, 2)], "a long, b long")
    with _pytest.raises(ValueError, match="rounds >= 1"):
        kcore_peel(edges, k=2, rounds=0)


def test_contamination_substring_flags_planted_leak(spark, tmp_path):
    # plant an eval doc (doc_id % 10 == 0) whose 60-token passage
    # reappears inside a training doc at offset 3 (alignment the old
    # n-gram grid would need luck for; the anchored form guarantees
    # detection at >= 54 tokens) — the training doc must be flagged,
    # the clean doc must not.
    import os
    from helium_etl_lite_spark.registry import QUERIES, load_all

    load_all()
    passage = [f"p{i}" for i in range(60)]
    bench = " ".join(passage + [f"e{i}" for i in range(20)])
    leaked = " ".join(
        [f"t{i}" for i in range(3)] + passage + [f"u{i}" for i in range(10)]
    )
    clean = " ".join(f"c{i}" for i in range(80))
    docs = spark.createDataFrame(
        [(10, bench, "en", "s", 1), (11, leaked, "en", "s", 1),
         (12, clean, "en", "s", 1)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    d = str(tmp_path / "sf")
    os.makedirs(d)
    docs.write.parquet(f"{d}/documents.parquet")
    out = {r["doc_id"]: r for r in
           QUERIES["text_contamination_substring"](spark, d).collect()}
    assert 11 in out and out[11]["n_contaminated_spans"] >= 1
    assert 12 not in out
    assert 10 not in out  # the eval split itself is never flagged


class TestSubstringAnchorIncremental:
    def test_state_hit_drops_and_fresh_survives(self, spark, tmp_path):
        from helium_etl_lite_spark.operators.dedup import (
            span_state_add,
            substring_anchor_dedup_incremental,
        )

        passage = [f"p{i}" for i in range(60)]
        landed = spark.createDataFrame(
            [(1, " ".join(passage + [f"a{i}" for i in range(20)]))],
            "doc_id long, text string",
        )
        state = str(tmp_path / "state")
        span_state_add(spark, landed, state)
        # batch: one doc re-quoting the landed passage at offset 4, one
        # fresh doc
        batch = spark.createDataFrame(
            [
                (2, " ".join([f"x{i}" for i in range(4)] + passage
                             + [f"y{i}" for i in range(12)])),
                (3, " ".join(f"f{i}" for i in range(76))),
            ],
            "doc_id long, text string",
        )
        out = {r["doc_id"]: r for r in
               substring_anchor_dedup_incremental(spark, batch, state).collect()}
        assert out[2]["n_tokens_kept"] <= 76 - 50  # the quoted copy drops
        assert out[3]["n_tokens_kept"] == 76       # fresh doc untouched

    def test_replayed_fold_in_changes_nothing(self, spark, tmp_path):
        # crash-replay idempotence: appending the same batch's span
        # hashes twice is a set-union no-op for every probe
        from helium_etl_lite_spark.operators.dedup import (
            span_state_add,
            substring_anchor_dedup_incremental,
        )

        landed = spark.createDataFrame(
            [(1, " ".join(f"p{i}" for i in range(70)))],
            "doc_id long, text string",
        )
        state = str(tmp_path / "state")
        span_state_add(spark, landed, state)
        batch = spark.createDataFrame(
            [(2, " ".join(f"p{i}" for i in range(70)))],
            "doc_id long, text string",
        )
        once = sorted(
            substring_anchor_dedup_incremental(spark, batch, state).collect()
        )
        span_state_add(spark, landed, state)  # replayed fold-in
        twice = sorted(
            substring_anchor_dedup_incremental(spark, batch, state).collect()
        )
        assert once == twice

    def test_missing_state_is_first_ingest(self, spark, tmp_path):
        from helium_etl_lite_spark.operators.dedup import (
            substring_anchor_dedup_incremental,
        )

        dup = " ".join(f"d{i}" for i in range(60))
        batch = spark.createDataFrame(
            [(5, dup), (6, dup)], "doc_id long, text string"
        )
        out = {r["doc_id"]: r for r in substring_anchor_dedup_incremental(
            spark, batch, str(tmp_path / "nostate")).collect()}
        assert out[5]["n_tokens_kept"] == 60  # first occurrence intact
        assert 6 not in out or out[6]["n_tokens_kept"] <= 10


class TestQualityClassifierTrainer:
    """Accuracy gates for the distributed hashed logistic-regression
    trainer (queries/curation.py train_hashed_classifier) — the r9
    verdict item 3 deliverable. Correctness vs the DuckDB oracle is
    tests/test_queries_oracle.py's job; these gates prove the training
    DYNAMICS: the model actually learns the seeded split."""

    def test_planted_separable_corpus_reaches_perfect_accuracy(self, spark):
        # Perfectly separable fixture: positives are stopword-dense
        # ('the' every other token -> ratio 1/2 >= 1/16), negatives
        # carry zero stopwords. Six epochs must separate it exactly.
        from helium_etl_lite_spark.queries.curation import (
            train_hashed_classifier,
        )

        pos = [
            (i, " ".join(("the word%d" % (j + i)) for j in range(20)))
            for i in range(20)
        ]
        neg = [
            (100 + i, " ".join(("word%d token%d" % (j, j + i)) for j in range(20)))
            for i in range(20)
        ]
        docs = spark.createDataFrame(pos + neg, "doc_id long, text string")
        rows = train_hashed_classifier(docs).collect()
        assert len(rows) == 40
        labels = {r.doc_id: r.label for r in rows}
        assert all(labels[i] == 1 for i in range(20))
        assert all(labels[100 + i] == 0 for i in range(20))
        acc = sum(1 for r in rows if r.pred == (r.label == 1)) / len(rows)
        assert acc == 1.0, f"separable fixture accuracy {acc}"

    def test_real_corpus_accuracy_beats_chance(self, spark, sf_dir):
        # The sf0.001 corpus split (stopword ratio >= 1/16) is linearly
        # separable in the count/n feature space; the six-epoch halving
        # schedule measures 0.842 at sf0.001 / 0.884 at sf0.01 — gate
        # at 0.8 (chance is ~0.5 on the near-balanced split).
        from helium_etl_lite_spark import registry

        registry.load_all()
        rows = registry.QUERIES["text_quality_classifier_train"](
            spark, sf_dir
        ).collect()
        acc = sum(1 for r in rows if r.pred == (r.label == 1)) / len(rows)
        assert acc >= 0.8, f"trainer accuracy {acc}"
        # both classes must actually be predicted (a constant model can
        # score > chance on an imbalanced split)
        preds = {r.pred for r in rows}
        assert preds == {True, False}

    def test_held_out_eval_generalizes(self, spark, sf_dir):
        # the eval query trains on 80% and scores the unseen 20%:
        # measured 0.85 at sf0.01 — gate at 0.7 (must beat chance by a
        # wide margin on data the gradients never saw), and the
        # confusion totals must reconcile.
        from helium_etl_lite_spark import registry

        registry.load_all()
        row = registry.QUERIES["text_quality_classifier_eval"](
            spark, sf_dir
        ).collect()[0]
        assert row.tp + row.fp + row.tn + row.fn == row.n_test
        assert row.accuracy >= 0.7, row


class TestStarConnectedComponents:
    """Kiveris-2014 large-star/small-star CC (operators/dedup.py
    connected_components_star) — equal-closure property vs the
    min-label loop, plus the worst-case topology the star algorithm
    exists for."""

    def _assert_equal_closure(self, spark, edge_rows):
        from helium_etl_lite_spark.operators.dedup import (
            connected_components,
            connected_components_star,
        )

        edges = spark.createDataFrame(edge_rows, "src long, dst long")
        ref = {
            (r.id, r.component)
            for r in connected_components(edges).collect()
        }
        star = {
            (r.id, r.component)
            for r in connected_components_star(edges).collect()
        }
        assert star == ref

    def test_random_graphs_equal_closure(self, spark):
        import random

        rng = random.Random(910)
        for trial in range(3):
            n = 60
            m = rng.randint(20, 80)
            rows = [
                (rng.randrange(n), rng.randrange(n)) for _ in range(m)
            ]
            rows = [(a, b) for a, b in rows if a != b] or [(0, 1)]
            self._assert_equal_closure(spark, rows)

    def test_long_path_collapses_in_log_rounds(self, spark):
        # A 200-node path: min-label needs ~200 rounds (the
        # connected_components max_iter=25 default would NOT converge);
        # star contraction must finish well inside 50 phases and still
        # label every node with the path minimum.
        from helium_etl_lite_spark.operators.dedup import (
            connected_components_star,
        )

        rows = [(i, i + 1) for i in range(199)]
        edges = spark.createDataFrame(rows, "src long, dst long")
        got = {
            (r.id, r.component)
            for r in connected_components_star(edges).collect()
        }
        assert got == {(i, 0) for i in range(200)}

    def test_self_loops_and_duplicate_edges_ignored(self, spark):
        self._assert_equal_closure(
            spark, [(1, 1), (1, 2), (2, 1), (1, 2), (5, 5), (5, 6)]
        )

    def test_self_loop_only_node_keeps_its_own_label(self, spark):
        # review find: a node appearing ONLY in a self-loop must still
        # label itself (the min-label twin keeps it; star must too).
        self._assert_equal_closure(spark, [(1, 2), (7, 7)])


class TestAudioSpectrogram:
    """Fixed-point DFT band energies (operators/multimodal.py,
    r9 verdict item 7): Parseval pin on the integer tables, exactness
    of the kernel-vs-restatement contract, window accounting."""

    def test_parseval_bounds_fixed_point_error(self):
        # For one FULL window, exact-DFT Parseval says
        #   sum_k |X_k|^2 = N * sum_n x_n^2   (k = 0..N-1).
        # With S-scaled integer tables the left side is
        #   sum_k (re_k^2 + im_k^2) / S^2  — pin its relative error.
        import math

        import numpy as np

        from helium_etl_lite_spark.operators import multimodal as M

        rng = np.random.default_rng(910)
        N, S = M.SPEC_WINDOW, M.SPEC_SCALE
        for _ in range(5):
            x = rng.integers(-32768, 32768, size=N, dtype=np.int64)
            total = 0
            for k in range(N):
                cos_t = np.asarray(
                    [
                        int(round(math.cos(2 * math.pi * k * p / N) * S))
                        for p in range(N)
                    ],
                    dtype=np.int64,
                )
                sin_t = np.asarray(
                    [
                        int(round(math.sin(2 * math.pi * k * p / N) * S))
                        for p in range(N)
                    ],
                    dtype=np.int64,
                )
                re = int((x * cos_t).sum())
                im = int((x * sin_t).sum())
                total += re * re + im * im
            lhs = total / (S * S)
            rhs = N * int((x * x).sum())
            assert abs(lhs - rhs) / rhs < 2e-3, (lhs, rhs)

    def test_band_energies_match_numpy_fft(self):
        # The analyzed bins (1..4) must agree with numpy's FFT within
        # the fixed-point tolerance — the tables actually measure the
        # frequencies they claim to.
        import numpy as np

        from helium_etl_lite_spark.operators import multimodal as M

        N = M.SPEC_WINDOW
        t = np.arange(N)
        # a pure bin-2 tone must light band 2 and leave bands 1/3/4 ~0
        x = np.round(10000 * np.cos(2 * np.pi * 2 * t / N)).astype(np.int64)
        sp = M.spectrogram_band_energies(x)
        e = sp["energies"]
        assert sp["n_windows"] == 1
        assert e[2] > 100 * max(e[1], e[3], e[4])
        fft = np.abs(np.fft.fft(x.astype(float))) ** 2
        approx2 = e[2] * M.SPEC_ENERGY_SHIFT / (M.SPEC_SCALE**2)
        assert abs(approx2 - fft[2]) / fft[2] < 5e-3

    def test_partial_window_and_empty_stream(self):
        import numpy as np

        from helium_etl_lite_spark.operators import multimodal as M

        sp = M.spectrogram_band_energies(np.asarray([5, -5, 7], dtype=np.int64))
        assert sp["n_windows"] == 1  # 3 samples -> one partial window
        sp0 = M.spectrogram_band_energies(np.zeros(1, dtype=np.int64))
        assert sp0["n_windows"] == 1
        assert all(v == 0 for v in sp0["energies"].values())
        sp33 = M.spectrogram_band_energies(
            np.ones(33, dtype=np.int64)
        )
        assert sp33["n_windows"] == 3  # 16 + 16 + 1


class TestAudioFingerprint:
    """Haitsma-Kalker-style audio fingerprint + banded near-dup
    (operators/multimodal.py): planted-pair recall, pigeonhole
    completeness vs brute force, determinism."""

    def test_planted_near_identical_audio_is_found(self, spark):
        import numpy as np

        from helium_etl_lite_spark.operators import multimodal as M

        rng = np.random.default_rng(910)
        rows = []
        for i in range(20):
            x = rng.integers(0, 32000, 160)
            rows.append((i, M.audio_fingerprint(x)[1]))
        # plant: doc 100 = doc 0's audio with one sample nudged — the
        # sign-of-delta bits shrug off small perturbations
        base = rng.integers(0, 32000, 160)
        pert = base.copy()
        pert[7] += 3
        rows.append((100, M.audio_fingerprint(base)[1]))
        rows.append((101, M.audio_fingerprint(pert)[1]))
        fps = spark.createDataFrame(
            [(i, 1, s) for i, s in rows], "doc_id long, n_windows long, sig long"
        )
        pairs = {
            (r.doc_a, r.doc_b)
            for r in M.audio_fingerprint_neardup(fps, max_hamming=2).collect()
        }
        assert (100, 101) in pairs

    def test_banded_join_equals_bruteforce(self, spark):
        import itertools
        import random

        from helium_etl_lite_spark.operators import multimodal as M

        rng = random.Random(3)
        sigs = [(i, rng.randrange(1 << 15)) for i in range(60)]
        fps = spark.createDataFrame(
            [(i, 1, s) for i, s in sigs], "doc_id long, n_windows long, sig long"
        )
        got = {
            (r.doc_a, r.doc_b, r.hamming)
            for r in M.audio_fingerprint_neardup(fps, max_hamming=2).collect()
        }
        want = set()
        for (i, a), (j, b) in itertools.combinations(sigs, 2):
            h = bin(a ^ b).count("1")
            if h <= 2:
                want.add((min(i, j), max(i, j), h))
        assert got == want

    def test_fingerprint_deterministic_and_short_streams(self):
        import numpy as np

        from helium_etl_lite_spark.operators import multimodal as M

        x = np.arange(200, dtype=np.int64) % 3000
        assert M.audio_fingerprint(x) == M.audio_fingerprint(x.copy())
        nw, sig = M.audio_fingerprint(np.zeros(1, dtype=np.int64))
        assert (nw, sig) == (1, 0)


class TestHtmlExtract:
    """Markup extraction (operators/markup.py): each gating rule on
    hand-written HTML, entity decode, and Spark/DuckDB rule parity on
    adversarial markup (the oracle-side generators restate the same
    constants)."""

    HTML = (
        "<html><body>"
        '<div id="menu"><a href="/x">One</a> <a href="/y">Two</a></div>'
        "<p>short</p>"
        "<p>This paragraph is long enough to pass the length gate "
        "and has no links at all in it.</p>"
        "<p>Tom &amp; Jerry say &quot;hi&quot; &lt;loudly&gt; and this "
        "line is long enough to be kept as content.</p>"
        "<p>Mostly <a href='/z'>link link link link link link</a> here</p>"
        "<div>Copyright 2020 Someone. All rights reserved.</div>"
        "</body></html>"
    )

    def _extract(self, spark, html):
        from helium_etl_lite_spark.operators.markup import html_extract

        df = spark.createDataFrame([(1, html)], "doc_id long, html string")
        return html_extract(df).collect()[0]

    def test_gates_and_entity_decode(self, spark):
        row = self._extract(spark, self.HTML)
        kept = row["text_extract"].split("\n")
        assert row["n_kept"] == 2
        assert kept[0].startswith("This paragraph is long enough")
        # entities decoded AFTER the tag strip
        assert kept[1].startswith('Tom & Jerry say "hi" <loudly>')
        # nav (link density), "short" (length), link-heavy line (link
        # density), copyright (rule list) all dropped but counted
        assert row["n_blocks"] == 6

    def test_empty_and_tagless(self, spark):
        row = self._extract(spark, "no tags at all but plenty long text here ok")
        assert row["n_blocks"] == row["n_kept"] == 1
        row = self._extract(spark, "<p></p><div></div>")
        assert row["n_blocks"] == row["n_kept"] == 0
        assert row["text_extract"] == ""

    def test_duckdb_parity_on_adversarial_markup(self, spark):
        # the generated oracle rules must agree with the Spark rules on
        # markup the fixture generator never produces (self-closing
        # tags, attributes with '>', uppercase tags, nested entities)
        import duckdb

        from helium_etl_lite_spark.operators.markup import (
            html_extract,
            html_extract_sql,
        )

        cases = [
            self.HTML,
            "<P CLASS='X'>Uppercase tagged but clearly long enough to keep</P>",
            "<br/>line one that is long enough to keep around<br/>tiny",
            "<p>&amp;lt; stays escaped-once and this sentence is long "
            "enough</p>",
            "plain text with an <a href='u'>inline anchor</a> and lots "
            "of surrounding words so density stays low",
        ]
        df = spark.createDataFrame(
            [(i, h) for i, h in enumerate(cases)], "doc_id long, html string"
        )
        got = {
            r["doc_id"]: (r["n_blocks"], r["n_kept"], r["text_extract"])
            for r in html_extract(df).collect()
        }
        con = duckdb.connect()
        ex = html_extract_sql("h")
        for i, h in enumerate(cases):
            nb, nk, te = con.execute(
                f"SELECT {ex['n_blocks']}, {ex['n_kept']}, "
                f"{ex['text_extract']} FROM (SELECT ? AS h)",
                [h],
            ).fetchone()
            assert got[i] == (nb, nk, te), (i, got[i], (nb, nk, te))


class TestAviVideo:
    """RIFF/AVI video codec (operators/multimodal.py): raw-DIB
    losslessness, MJPEG tolerance, fail-stop discipline, and the
    planted-pair recall gate for frame-level near-dup."""

    def _frames(self):
        import numpy as np

        rng = np.random.RandomState(7)
        return [
            rng.randint(0, 256, size=(12, 16)).astype(np.uint8)
            for _ in range(3)
        ]

    def test_raw_roundtrip_lossless(self):
        import numpy as np

        from helium_etl_lite_spark.operators import multimodal as mm

        frames = self._frames()
        d = mm.decode_avi(mm.encode_avi_bytes(frames, fps=8, codec="raw"))
        assert (d["width"], d["height"], d["n_frames"]) == (16, 12, 3)
        assert d["fps"] == 8.0
        for a, b in zip(frames, d["frames"]):
            assert (a == b).all()

    def test_mjpeg_roundtrip_tolerance(self):
        import numpy as np

        from helium_etl_lite_spark.operators import multimodal as mm

        frames = self._frames()
        d = mm.decode_avi(mm.encode_avi_bytes(frames, codec="mjpeg"))
        assert d["n_frames"] == 3
        for a, b in zip(frames, d["frames"]):
            # baseline JPEG on random noise: loose but bounded
            assert abs(a.astype(int) - b.astype(int)).mean() < 16

    def test_fail_stops(self):
        import struct

        import numpy as np
        import pytest

        from helium_etl_lite_spark.operators import multimodal as mm

        good = mm.encode_avi_bytes(self._frames(), codec="raw")
        with pytest.raises(ValueError, match="RIFF/AVI"):
            mm.decode_avi(b"RIFF" + good[4:8] + b"WAVE" + good[12:])
        with pytest.raises(ValueError, match="truncated|exceeds"):
            mm.decode_avi(good[:-20])
        # flip biCompression to an unknown fourcc
        comp = struct.unpack("<I", b"MJPG")[0]
        pos = good.find(b"strf") + 8 + 16
        bad = good[:pos] + struct.pack("<I", 0xDEAD) + good[pos + 4 :]
        with pytest.raises(ValueError, match="biCompression"):
            mm.decode_avi(bad)
        # header/movi frame-count disagreement
        pos = good.find(b"avih") + 8 + 16
        bad = good[:pos] + struct.pack("<I", 99) + good[pos + 4 :]
        with pytest.raises(ValueError, match="frame count"):
            mm.decode_avi(bad)
        with pytest.raises(ValueError, match="empty frame"):
            mm.encode_avi_bytes([], codec="raw")
        with pytest.raises(ValueError, match="unsupported codec"):
            mm.encode_avi_bytes(self._frames(), codec="h264")

    def test_encode_video_ascii_fail_stop(self, spark):
        import pytest

        from helium_etl_lite_spark.operators import multimodal as mm

        df = spark.createDataFrame(
            [(1, "café latte")], "doc_id long, text string"
        )
        with pytest.raises(Exception, match="ASCII-only"):
            mm.encode_video(df).collect()

    def test_planted_pair_recall(self, spark):
        # two docs sharing their first 192 bytes -> identical first
        # MJPEG frames -> hamming-0 pairing; an unrelated doc must not
        # pair with either.
        from pyspark.sql import functions as F

        from helium_etl_lite_spark.operators import multimodal as mm

        base = ("spark row value table " * 12)[:192]  # exactly one frame
        rows = [
            (1, base + " tail one"),
            (2, base + " different second frame entirely xyz"),
            (3, "completely unrelated content qqq zzz " * 6),
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        assets = mm.encode_video(docs, codec="mjpeg")
        hashed = mm.video_frame_dhash(assets).select(
            (F.col("doc_id") * 4096 + F.col("frame_idx")).alias("doc_id"),
            "phash",
        )
        out = {
            r["doc_id"]: (r["keeper_doc_id"], r["hamming"])
            for r in mm.phash_band_neardup(hashed).collect()
        }
        # doc 2 frame 0 routes to doc 1 frame 0 (unit 4096) at hamming 0
        assert out[2 * 4096] == (1 * 4096, 0)
        # doc 3's frames keep themselves
        for unit, (keeper, _h) in out.items():
            if unit // 4096 == 3:
                assert keeper == unit


class TestVideoKeyframes:
    def test_repeated_frames_are_not_keyframes(self, spark):
        # a video whose frames repeat has zero temporal delta after
        # frame 0; changing content crosses the threshold again.
        import numpy as np

        from helium_etl_lite_spark.operators import multimodal as mm

        same = np.full((12, 16), 120, dtype=np.uint8)
        changed = np.full((12, 16), 180, dtype=np.uint8)
        payload = mm.encode_avi_bytes([same, same, changed], codec="raw")
        df = spark.createDataFrame(
            [(1, bytearray(payload))], "doc_id long, payload binary"
        )
        rows = {
            r["frame_idx"]: (r["delta_energy"], r["is_keyframe"])
            for r in mm.video_keyframes(df, min_delta=1000).collect()
        }
        assert rows[0] == (120 * 192, True)   # vs black
        assert rows[1] == (0, False)          # identical frame
        assert rows[2] == (60 * 192, True)    # scene cut


class TestSemanticIncremental:
    """semantic_filter_new / semantic_state_add (operators/knn.py): the
    embedding family's persisted-state ingest loop."""

    def _mkvecs(self, spark, rows):
        return spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in rows],
            "vec_id long, embedding array<float>",
        )

    def _rand(self, seed, d=64):
        import numpy as np

        rng = np.random.RandomState(seed)
        v = rng.randn(d)
        return v / np.linalg.norm(v)

    def test_planted_near_copy_is_dropped_and_survivors_kept(self, spark, tmp_path):
        import numpy as np

        from helium_etl_lite_spark.operators import knn

        state = str(tmp_path / "sem_state")
        base = [(i, self._rand(i)) for i in range(10)]
        b1 = self._mkvecs(spark, base)
        f1 = knn.semantic_filter_new(spark, b1, state, threshold=0.8)
        kept1 = sorted(r["vec_id"] for r in f1.select("vec_id").collect())
        assert kept1 == list(range(10))  # random unit vectors: no dups
        knn.semantic_state_add(spark, f1, state)
        # batch 2: a near-copy of kept vector 3 (cos ~ 0.999) + a fresh one
        near = self._rand(3) + 0.02 * self._rand(99)
        near = near / np.linalg.norm(near)
        b2 = self._mkvecs(spark, [(100, near), (101, self._rand(500))])
        f2 = knn.semantic_filter_new(spark, b2, state, threshold=0.8)
        kept2 = sorted(r["vec_id"] for r in f2.select("vec_id").collect())
        assert kept2 == [101], kept2

    def test_in_batch_min_id_keeper(self, spark, tmp_path):
        import numpy as np

        from helium_etl_lite_spark.operators import knn

        state = str(tmp_path / "sem_state2")
        v = self._rand(7)
        near = v + 0.02 * self._rand(42)
        near = near / np.linalg.norm(near)
        batch = self._mkvecs(spark, [(1, v), (2, near), (3, self._rand(8))])
        f = knn.semantic_filter_new(spark, batch, state, threshold=0.8)
        assert sorted(r["vec_id"] for r in f.collect()) == [1, 3]

    def test_replay_is_idempotent_and_zero_norm_passes_through(self, spark, tmp_path):
        from helium_etl_lite_spark.operators import knn

        state = str(tmp_path / "sem_state3")
        b1 = self._mkvecs(spark, [(i, self._rand(i)) for i in range(5)])
        f1 = knn.semantic_filter_new(spark, b1, state, threshold=0.8)
        knn.semantic_state_add(spark, f1, state)
        # crash replay: the same batch probed again folds in duplicate
        # rows; the probe must still drop ALL of batch 1 (each vector is
        # its own near-dup at cos = 1) and keep a zero-norm row (no
        # bucket, cosine undefined -> pass-through survivor).
        b1z = self._mkvecs(spark, [(i, self._rand(i)) for i in range(5)] + [(50, [0.0] * 64)])
        f_replay = knn.semantic_filter_new(spark, b1z, state, threshold=0.8)
        assert sorted(r["vec_id"] for r in f_replay.collect()) == [50]

    def test_marker_only_state_dir_reads_as_empty(self, spark, tmp_path):
        """r11 ADVICE item 2: a crash between _sem_write_version and the
        first parquet append leaves a MARKER-ONLY directory; the next
        probe must treat it as empty state (not wedge the ingest loop
        on UNABLE_TO_INFER_SCHEMA) so replay converges as the docstring
        promises — while a WRONG-version marker still fails fast."""
        import pytest

        from helium_etl_lite_spark.operators import knn

        state = str(tmp_path / "sem_state_crash")
        # simulate the crash window: marker stamped, no shard data
        knn._sem_write_version(state)
        b1 = self._mkvecs(spark, [(i, self._rand(i)) for i in range(5)])
        f1 = knn.semantic_filter_new(spark, b1, state, threshold=0.8)
        assert sorted(r["vec_id"] for r in f1.collect()) == list(range(5))
        # the replay then folds in and the loop proceeds normally
        knn.semantic_state_add(spark, f1, state)
        f2 = knn.semantic_filter_new(spark, b1, state, threshold=0.8)
        assert f2.count() == 0
        # wrong-version marker-only dir: the incompatibility guard
        # outranks the empty-state shortcut
        bad = str(tmp_path / "sem_state_badver")
        import os

        os.makedirs(bad)
        with open(knn._sem_version_path(bad), "w") as fh:
            fh.write("semdedup-other-construction-v0")
        with pytest.raises(ValueError, match="built under"):
            knn.semantic_filter_new(spark, b1, bad, threshold=0.8)

    def test_kept_set_mutually_neardup_free(self, spark, sf_dir):
        """After the full incremental run over the fixture embeddings,
        NO two kept vectors that share an LSH bucket clear the
        threshold — brute-force numpy verification of the keeper
        invariant (bucket-visible completeness is the declared
        approximation contract)."""
        import numpy as np

        from helium_etl_lite_spark import registry

        registry.load_all()
        kept = {
            r["vec_id"]
            for r in registry.QUERIES["vec_dedup_semantic_incremental"](
                spark, sf_dir
            ).collect()
        }
        # batch 1 keepers are also in the final kept corpus
        from helium_etl_lite_spark.operators import knn
        from helium_etl_lite_spark.tables import Tables

        emb = Tables(spark, sf_dir).embeddings
        rows = knn._sem_bucket_rows(emb).collect()
        by_bucket = {}
        vecs = {}
        for r in rows:
            by_bucket.setdefault((r["band"], r["bucket"]), []).append(r["vec_id"])
            vecs[r["vec_id"]] = np.array(r["e"])
        # final kept corpus = batch-1 survivors (folded) + batch-2 survivors;
        # recompute batch-1 survivors the same way the query does
        state_kept = kept | {
            v for v in vecs if v % 2 == 0 and self._b1_kept(vecs, by_bucket, v)
        }
        for ids in by_bucket.values():
            ks = sorted(i for i in ids if i in state_kept)
            for i in range(len(ks)):
                for j in range(i + 1, len(ks)):
                    a, b = vecs[ks[i]], vecs[ks[j]]
                    cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
                    assert cos < 0.35, (ks[i], ks[j], cos)

    def _b1_kept(self, vecs, by_bucket, v):
        # batch-1 (even ids) min-id-dominated rule over bucket-visible pairs
        import numpy as np

        for ids in by_bucket.values():
            if v not in ids:
                continue
            for u in ids:
                if u < v and u % 2 == 0:
                    a, b = vecs[u], vecs[v]
                    if float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b))) >= 0.35:
                        return False
        return True


class TestUrlCuration:
    """operators/url.py — canonicalization rules, blocklist semantics,
    fixture collision structure (r11 verdict item 3)."""

    def _canon(self, spark, urls):
        from pyspark.sql import functions as F

        from helium_etl_lite_spark.operators import url as U

        df = spark.createDataFrame([(i, u) for i, u in enumerate(urls)], "i long, url string")
        return [
            r["c"]
            for r in df.select(U.canonical_url(F.col("url")).alias("c"))
            .orderBy("i")
            .collect()
        ]

    def test_canonicalization_rules(self, spark):
        got = self._canon(
            spark,
            [
                "HTTP://Example.COM:80/path?utm_source=a&id=3#frag",
                "https://example.com:443/",
                "https://example.com:8080/a",     # non-default port KEPT
                "http://example.com:443/a",       # 443 is NOT http's default
                "http://example.com",             # empty path -> "/"
                "https://h.io/p?utm_campaign=x&gclid=1&fbclid=2&ref=z",
                "https://h.io/p?b=2&a=1",         # order preserved, no sort
            ],
        )
        assert got == [
            "http://example.com/path?id=3",
            "https://example.com/",
            "https://example.com:8080/a",
            "http://example.com:443/a",
            "http://example.com/",
            "https://h.io/p",
            "https://h.io/p?b=2&a=1",
        ]

    def test_blocklist_subdomain_semantics(self, spark):
        from pyspark.sql import functions as F

        from helium_etl_lite_spark.operators import url as U

        hosts = [
            ("ads-site.net", True),
            ("tracker.ads-site.net", True),
            ("deep.sub.ads-site.net", True),
            ("notads-site.net", False),   # suffix without the dot boundary
            ("ads-site.net.evil.com", False),
            ("example.com", False),
        ]
        df = spark.createDataFrame(hosts, "host string, want boolean")
        rows = df.select("want", U.host_blocked(F.col("host")).alias("got")).collect()
        assert all(r["want"] == r["got"] for r in rows)

    def test_fixture_has_canonical_collisions(self, spark, sf_dir):
        # URL dedup must have real work: distinct canonical URLs ==
        # URL_GROUPS at any corpus size >= URL_GROUPS docs.
        from helium_etl_lite_spark import registry
        from helium_etl_lite_spark.operators import url as U

        registry.load_all()
        out = registry.QUERIES["url_dedup_canonical"](spark, sf_dir).collect()
        assert len(out) == U.URL_GROUPS
        assert sum(r["n_docs"] for r in out) == registry.QUERIES[
            "url_canonicalize"
        ](spark, sf_dir).count()


class TestPairDedup:
    """operators/multimodal.py pair_dedup — the cross-modal (image,
    caption) keeper policy (r11 verdict item 6): strict dups collapse,
    caption variants cap at max_captions, byte-different but
    visually-identical/near images share one cluster."""

    @staticmethod
    def _ppm(gray):
        import numpy as np

        h, w = gray.shape
        plane = np.repeat(gray[..., None].astype(np.uint8), 3, axis=2).tobytes()
        return b"P6\n%d %d\n255\n" % (w, h) + plane

    def test_policy_and_near_image_recall(self, spark):
        import numpy as np

        from helium_etl_lite_spark.operators import multimodal as mm

        rng = np.random.default_rng(11)
        base = rng.integers(0, 200, size=(16, 16)).astype(np.uint8)
        h0 = mm._dhash_bits(base.astype(float))
        # brightness-shifted re-encode: different BYTES, hamming 0
        bright = (base + 30).astype(np.uint8)
        # planted near image: one 2x2 block lifted +80 -> hamming 1..3
        # (position found deterministically; assert the precondition so
        # a future dhash change fails loudly here, not as a recall slip)
        near = base.astype(int)
        near[0:2, 0:2] = np.clip(near[0:2, 0:2] + 80, 0, 255)
        near = near.astype(np.uint8)
        d = bin(h0 ^ mm._dhash_bits(near.astype(float))).count("1")
        assert 1 <= d <= 3, d
        far = rng.integers(0, 200, size=(16, 16)).astype(np.uint8)
        assert bin(h0 ^ mm._dhash_bits(far.astype(float))).count("1") > 3

        rows = [
            # strict dups: same image, same caption
            (10, self._ppm(base), "a red bird"),
            (11, self._ppm(base), "a red bird"),
            # caption variants on the same image (ranks 2..4)
            (12, self._ppm(base), "bird, red"),
            (13, self._ppm(base), "red bird photo"),
            (14, self._ppm(base), "oiseau rouge"),
            # re-encode (different bytes, hamming 0) + near image
            (15, self._ppm(bright), "a red bird"),
            (16, self._ppm(near), "slightly edited bird"),
            # unrelated pair
            (20, self._ppm(far), "a blue car"),
        ]
        pairs = spark.createDataFrame(
            [(i, bytearray(p), c) for i, p, c in rows],
            "doc_id long, payload binary, caption string",
        )
        out = mm.pair_dedup(pairs, k=3, max_captions=2).collect()
        by_cap = {(r["image_keeper"], r["caption_hash"]): r for r in out}
        clusters = {r["image_keeper"] for r in out}
        # the far pair is its own cluster; everything else is ONE
        assert clusters == {10, 20}, clusters
        # strict dups collapsed: the "a red bird" caption group holds
        # 10, 11 AND the re-encoded 15 (same cluster, same caption) —
        # n_pairs counts the whole group INCLUDING the keeper (3 pairs,
        # 2 strict duplicates dropped)
        red_bird = [
            r for r in out
            if r["image_keeper"] == 10 and r["pair_keeper"] == 10
        ]
        assert len(red_bird) == 1 and red_bird[0]["n_pairs"] == 3
        # caption ranks: keeper caption first, cap at 2
        cluster_rows = sorted(
            (r for r in out if r["image_keeper"] == 10),
            key=lambda r: r["caption_rank"],
        )
        assert [r["pair_keeper"] for r in cluster_rows] == [10, 12, 13, 14, 16]
        assert [r["is_kept"] for r in cluster_rows] == [
            True, True, False, False, False,
        ]
        # far pair survives untouched
        assert by_cap[(20, [r for r in out if r["image_keeper"] == 20][0]["caption_hash"])]["is_kept"]

    def test_custom_id_col(self, spark):
        """r12 ADVICE: pair_dedup(id_col=...) used to fail analysis for
        any non-default value because dhash_assets hardcoded doc_id in
        its output schema — pin the renamed-id path end to end."""
        from helium_etl_lite_spark.operators import multimodal as mm

        rows = [
            (100, self._ppm(__import__("numpy").full((16, 16), 120, dtype="uint8")), "same cap"),
            (101, self._ppm(__import__("numpy").full((16, 16), 120, dtype="uint8")), "same cap"),
            (102, self._ppm(__import__("numpy").full((16, 16), 120, dtype="uint8")), "other cap"),
        ]
        pairs = spark.createDataFrame(
            [(i, bytearray(p), c) for i, p, c in rows],
            "img_id long, payload binary, caption string",
        )
        out = mm.pair_dedup(pairs, k=3, max_captions=1, id_col="img_id").collect()
        got = {(r["image_keeper"], r["pair_keeper"]): (r["n_pairs"], r["is_kept"]) for r in out}
        assert got == {(100, 100): (2, True), (100, 102): (1, False)}, got

    def test_registered_query_shape(self, spark, sf_dir):
        from helium_etl_lite_spark import registry

        registry.load_all()
        rows = registry.QUERIES["multimodal_pair_dedup"](spark, sf_dir).collect()
        # every fixture doc contributes exactly one pair
        from helium_etl_lite_spark.tables import Tables

        n_docs = Tables(spark, sf_dir).documents.count()
        assert sum(r["n_pairs"] for r in rows) == n_docs
        assert all(r["n_kept"] <= 2 for r in rows)
        assert all(r["n_kept"] <= r["n_captions"] for r in rows)
        # byte-identical group images can never split: at most 25
        # image clusters exist (groups may legitimately merge)
        assert len(rows) <= 25


class TestPiiRedact:
    """operators/pii.py — placeholder substitution, per-class counts,
    byte-identical no-op path."""

    def test_rules_and_noop(self, spark):
        from pyspark.sql import functions as F

        from helium_etl_lite_spark.operators import pii as P

        rows = [
            (1, "write to jane.doe+x@sub.example.co.uk today"),
            (2, "call 555-123-4567 or 555 987 6543 now"),
            (3, "hosts 10.0.0.1 and 192.168.254.3"),
            (4, "mixed a@b.io then 555-000-1111 at 8.8.8.8"),
            (5, "clean text with no identifiers at all"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        c = P.pii_counts(F.col("text"))
        out = {
            r["doc_id"]: r
            for r in df.select(
                "doc_id", c["email"].alias("e"), c["phone"].alias("p"),
                c["ip"].alias("i"), P.pii_redact(F.col("text")).alias("red"),
            ).collect()
        }
        assert (out[1]["e"], out[1]["p"], out[1]["i"]) == (1, 0, 0)
        assert out[1]["red"] == "write to <EMAIL> today"
        assert (out[2]["e"], out[2]["p"], out[2]["i"]) == (0, 2, 0)
        assert out[2]["red"] == "call <PHONE> or <PHONE> now"
        assert (out[3]["e"], out[3]["p"], out[3]["i"]) == (0, 0, 2)
        assert out[3]["red"] == "hosts <IP> and <IP>"
        assert (out[4]["e"], out[4]["p"], out[4]["i"]) == (1, 1, 1)
        assert out[4]["red"] == "mixed <EMAIL> then <PHONE> at <IP>"
        # the no-op path is byte-identical
        assert (out[5]["e"], out[5]["p"], out[5]["i"]) == (0, 0, 0)
        assert out[5]["red"] == rows[4][1]

    def test_dotted_sequences(self, spark):
        """r12 ADVICE: octets bound to 0-255 (999-quads no longer
        match); the documented residual over-match — the leading quad
        of a longer dotted sequence — is pinned so a future pattern
        change surfaces here, and Spark/DuckDB agree on every case."""
        import duckdb
        from pyspark.sql import functions as F

        from helium_etl_lite_spark.operators import pii as P

        rows = [
            (1, "bad quad 999.999.999.999 stays"),
            (2, "edge 255.255.255.255 and 0.0.0.0 match"),
            (3, "over 256.1.1.1 and 1.1.1.256 do not"),
            (4, "version 1.2.3.4.5 loses its leading quad"),
            (5, "decimal 3.14159 is untouched"),
        ]
        expect = {
            1: (0, "bad quad 999.999.999.999 stays"),
            2: (2, "edge <IP> and <IP> match"),
            # "256.1.1.1": no full-quad match ("56.1.1.1" is blocked by
            # \b after the 2); "1.1.1.256" likewise (the trailing "256"
            # caps at "25"/"6", no boundary parse works)
            3: (0, "over 256.1.1.1 and 1.1.1.256 do not"),
            4: (1, "version <IP>.5 loses its leading quad"),
            5: (0, "decimal 3.14159 is untouched"),
        }
        df = spark.createDataFrame(rows, "doc_id long, text string")
        c = P.pii_counts(F.col("text"))
        got = {
            r["doc_id"]: (r["i"], r["red"])
            for r in df.select(
                "doc_id", c["ip"].alias("i"),
                P.pii_redact(F.col("text")).alias("red"),
            ).collect()
        }
        assert got == expect, got
        # cross-engine parity on the same cases via the generated SQL
        con = duckdb.connect()
        for doc_id, text in rows:
            n, red = con.execute(
                "SELECT " + P.pii_counts_sql("t")["ip"] + ", "
                + P.pii_redact_sql("t") + " FROM (SELECT ? AS t)",
                [text],
            ).fetchone()
            assert (n, red) == expect[doc_id], (doc_id, n, red)


class TestDsirImportance:
    """queries/curation.py DSIR — beyond oracle parity, the SEMANTIC
    claim: documents from the target distribution ('en') must score a
    higher mean importance weight than the rest, and the budget
    selection must prefer them."""

    def test_target_slice_scores_higher(self, spark, sf_dir):
        from pyspark.sql import functions as F

        from helium_etl_lite_spark import registry
        from helium_etl_lite_spark.tables import Tables

        registry.load_all()
        w = registry.QUERIES["text_dsir_importance"](spark, sf_dir)
        langs = Tables(spark, sf_dir).documents.select("doc_id", "lang")
        m = (
            w.join(langs, "doc_id")
            .groupBy(F.col("lang") == "en")
            .agg(F.avg("avg_logw").alias("m"))
            .collect()
        )
        by = {r[0]: r["m"] for r in m}
        assert by[True] > by[False], by

    def test_budget_selection_prefers_target(self, spark, sf_dir):
        from pyspark.sql import functions as F

        from helium_etl_lite_spark import registry
        from helium_etl_lite_spark.tables import Tables

        registry.load_all()
        sel = registry.QUERIES["sample_dsir_token_budget"](spark, sf_dir)
        langs = Tables(spark, sf_dir).documents.select("doc_id", "lang")
        t = Tables(spark, sf_dir).documents
        corpus_en = t.where(F.col("lang") == "en").count() / t.count()
        got = sel.join(langs, "doc_id")
        sel_en = got.where(F.col("lang") == "en").count() / got.count()
        # the selected set is strictly enriched in the target language
        assert sel_en > corpus_en, (sel_en, corpus_en)
        # and the running total respects the budget
        from helium_etl_lite_spark.queries.curation import _DSIR_BUDGET

        assert got.agg(F.max("cum_tokens")).first()[0] <= _DSIR_BUDGET
