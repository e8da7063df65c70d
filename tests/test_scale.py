"""Scale-technique operators (operators/scale.py): salted skew join,
binned range join, bucketed co-located join. Each must be result-
equivalent to its naive counterpart; bucketing must also remove the
shuffle from the plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from helium_etl_lite_spark.operators import scale
from helium_etl_lite_spark.plans.explain_tools import formatted_plan


@pytest.fixture()
def facts(spark):
    # key 1 is hot: 6 of 8 rows.
    rows = [(1, i * 1.0) for i in range(6)] + [(2, 10.0), (3, 20.0)]
    return spark.createDataFrame(rows, "k long, v double")


@pytest.fixture()
def dim(spark):
    return spark.createDataFrame([(1, "a"), (2, "b"), (4, "d")], "k long, name string")


class TestSaltedJoin:
    def test_matches_plain_inner_join(self, spark, facts, dim):
        plain = sorted((r["k"], r["v"], r["name"]) for r in facts.join(dim, "k").collect())
        salted = sorted(
            (r["k"], r["v"], r["name"])
            for r in scale.salted_join(facts, dim, "k", n_salts=4).collect()
        )
        assert salted == plain and len(salted) == 7

    def test_left_join_keeps_unmatched(self, spark, facts, dim):
        out = scale.salted_join(facts, dim, "k", n_salts=4, how="left")
        assert out.count() == facts.count()
        assert out.where(F.col("name").isNull()).select("k").distinct().collect()[0]["k"] == 3

    def test_no_duplicate_rows_from_replication(self, spark, facts, dim):
        # Each fact row must match its dim row exactly once despite the
        # dim side being exploded n_salts times.
        out = scale.salted_join(facts, dim, "k", n_salts=8)
        assert out.where(F.col("k") == 2).count() == 1


class TestBinnedRangeJoin:
    @pytest.fixture()
    def points(self, spark):
        return spark.createDataFrame([(i, float(i)) for i in range(20)], "pid long, pt double")

    @pytest.fixture()
    def intervals(self, spark):
        # spans bin boundaries (width 5): [3,7], [4,4], [15,19], [30,40]
        rows = [(100, 3.0, 7.0), (200, 4.0, 4.0), (300, 15.0, 19.0), (400, 30.0, 40.0)]
        return spark.createDataFrame(rows, "iid long, lo double, hi double")

    def test_matches_theta_join(self, spark, points, intervals):
        theta = sorted(
            (r["pid"], r["iid"])
            for r in points.join(
                intervals, (F.col("pt") >= F.col("lo")) & (F.col("pt") <= F.col("hi"))
            ).collect()
        )
        binned = sorted(
            (r["pid"], r["iid"])
            for r in scale.binned_range_join(
                points, intervals, "pt", "lo", "hi", bin_width=5.0
            ).collect()
        )
        assert binned == theta
        assert len(binned) > 0

    def test_interval_spanning_many_bins(self, spark, points, intervals):
        out = scale.binned_range_join(points, intervals, "pt", "lo", "hi", bin_width=2.0)
        got = {(r["pid"], r["iid"]) for r in out.collect()}
        assert (15, 300) in got and (19, 300) in got  # whole [15,19] covered


class TestBucketedJoin:
    def test_join_is_shuffle_free_and_correct(self, spark, facts, dim):
        out = scale.bucketed_join(spark, facts, dim, "k", n_buckets=4, name_prefix="t_bkt")
        plan = formatted_plan(out)
        assert "Exchange" not in plan, plan
        got = sorted((r["k"], r["name"]) for r in out.select("k", "name").collect())
        assert got == sorted(
            (r["k"], r["name"]) for r in facts.join(dim, "k").select("k", "name").collect()
        )


def test_salted_join_rejects_right_outer(spark):
    f = spark.createDataFrame([(1, 1.0)], "k long, v double")
    d = spark.createDataFrame([(1, "a")], "k long, name string")
    with pytest.raises(ValueError, match="per salt"):
        scale.salted_join(f, d, "k", how="right")


def test_aqe_splits_skewed_join_partition(spark):
    """The README's skew claim, demonstrated: one hot key dominating a
    sort-merge join gets split by AQE (skew=true in the final adaptive
    plan) instead of serializing on one reducer."""
    import contextlib
    import io

    from pyspark.sql import functions as F

    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        hot = spark.range(200000).select(F.lit(1).alias("k"), F.col("id").alias("v"))
        rest = spark.range(1000).select((F.col("id") % 50 + 2).alias("k"), F.col("id").alias("v"))
        dim = spark.range(60).select(F.col("id").alias("k"), (F.col("id") * 10).alias("w"))
        j = hot.union(rest).join(dim.hint("merge"), "k")
        assert len(j.collect()) == 201000
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            j.explain("formatted")
        plan = buf.getvalue()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan
    finally:
        for k, v in saved.items():
            if v is not None:
                spark.conf.set(k, v)


class TestDistributedNtileEdges:
    # ADVICE r2: empty input crashed createDataFrame inference, NULL
    # value rows were silently dropped by the equality join, and a
    # high-cardinality value_col could collect an unbounded control
    # table. All three are now defined behavior.

    def test_empty_input(self, spark):
        df = spark.createDataFrame([], "id long, v long")
        out = scale.distributed_ntile(df, "v", "id", n_tiles=4)
        assert out.count() == 0
        assert "tile" in out.columns

    def test_null_values_kept_and_tiled_first(self, spark):
        from pyspark.sql import Window

        rows = [(0, None), (1, 3), (2, None), (3, 1), (4, 2), (5, 1)]
        df = spark.createDataFrame(rows, "id long, v long")
        got = {
            (r["id"], r["tile"])
            for r in scale.distributed_ntile(df, "v", "id", n_tiles=3).collect()
        }
        # Spark ASC ordering is nulls-first, so plain ntile is the oracle.
        w = Window.orderBy(F.col("v").asc(), F.col("id").asc())
        want = {
            (r["id"], r["t"])
            for r in df.withColumn("t", F.ntile(3).over(w)).collect()
        }
        assert got == want
        assert len(got) == 6  # no row dropped

    def test_cardinality_guard_raises(self, spark):
        df = spark.createDataFrame([(i, i) for i in range(50)], "id long, v long")
        with pytest.raises(ValueError, match="max_control_rows"):
            scale.distributed_ntile(df, "v", "id", n_tiles=4, max_control_rows=10)


class TestPrefixSumTwoLevel:
    # r4 verdict item 5: the driver must hold superbucket rows only
    # (~N/(bucket_width*super_width)), never per-bucket rows; the result
    # must equal the single-task window form exactly at every bucket
    # geometry, including widths that leave empty/sparse buckets.

    def _oracle(self, df):
        from pyspark.sql import Window

        w = (
            Window.orderBy(F.col("id").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        return {
            (r["id"], r["c"])
            for r in df.withColumn("c", F.sum("v").over(w)).collect()
        }

    @pytest.mark.parametrize(
        "bucket_width,super_width", [(7, 3), (100, 4), (1, 2), (10_000, 4096)]
    )
    def test_matches_window_form(self, spark, bucket_width, super_width):
        # sparse ids: buckets of wildly different fill, some empty.
        ids = [0, 1, 2, 5, 6, 13, 14, 15, 99, 100, 101, 250, 999, 1000, 5000]
        rows = [(i, (i * 37) % 11 - 3) for i in ids]  # negatives too
        df = spark.createDataFrame(rows, "id long, v long")
        got = {
            (r["id"], r["cumsum"])
            for r in scale.prefix_sum(
                df, "id", "v",
                bucket_width=bucket_width, super_width=super_width,
            ).collect()
        }
        assert got == self._oracle(df)

    def test_no_single_partition_exchange(self, spark):
        df = spark.range(1000).select(
            F.col("id"), (F.col("id") % 7).alias("v")
        )
        out = scale.prefix_sum(df, "id", "v", bucket_width=50, super_width=4)
        assert "SinglePartition" not in formatted_plan(out)

    def test_empty_input(self, spark):
        df = spark.createDataFrame([], "id long, v long")
        out = scale.prefix_sum(df, "id", "v")
        assert out.count() == 0
        assert "cumsum" in out.columns

    def test_superbucket_guard_raises(self, spark):
        df = spark.createDataFrame([(i, i) for i in range(64)], "id long, v long")
        with pytest.raises(ValueError, match="superbuckets"):
            scale.prefix_sum(
                df, "id", "v", bucket_width=1, super_width=2, max_control_rows=4
            )

    def test_driver_share_is_superbucket_scale(self, spark):
        # 64 buckets / super_width 16 -> the guard sees 4 superbuckets:
        # passing max_control_rows=4 must NOT raise (it would with the
        # old per-bucket collect).
        df = spark.createDataFrame([(i, 1) for i in range(64)], "id long, v long")
        out = scale.prefix_sum(
            df, "id", "v", bucket_width=1, super_width=16, max_control_rows=4
        )
        assert out.where(F.col("id") == 63).collect()[0]["cumsum"] == 64


def test_ntile_driver_share_is_per_value(spark):
    # Two-level control plane: the guard sees DISTINCT VALUES (3), not
    # (value, id-bucket) keys (30 here with bucket_width=1) — the old
    # per-key collect would trip max_control_rows=3.
    from pyspark.sql import Window

    rows = [(i, i % 3) for i in range(30)]
    df = spark.createDataFrame(rows, "id long, v long")
    got = {
        (r["id"], r["tile"])
        for r in scale.distributed_ntile(
            df, "v", "id", n_tiles=4, bucket_width=1, max_control_rows=3
        ).collect()
    }
    w = Window.orderBy(F.col("v").asc(), F.col("id").asc())
    want = {
        (r["id"], r["t"])
        for r in df.withColumn("t", F.ntile(4).over(w)).collect()
    }
    assert got == want


class TestSelectTokenBudget:
    def test_matches_window_form(self, spark):
        from pyspark.sql import Window

        rows = [(i, (i * 7) % 5 + 1, (i * 3) % 9 + 1) for i in range(40)]
        df = spark.createDataFrame(rows, "id long, score long, w long")
        got = {
            (r["id"], r["cum_weight"])
            for r in scale.select_token_budget(
                df, "score", "id", "w", budget=60, bucket_width=4
            ).collect()
        }
        win = Window.orderBy(
            F.col("score").desc_nulls_last(), F.col("id").asc()
        ).rowsBetween(Window.unboundedPreceding, 0)
        want = {
            (r["id"], r["c"])
            for r in df.withColumn("c", F.sum("w").over(win))
            .where(F.col("c") <= 60)
            .collect()
        }
        assert got == want

    def test_empty_and_guard(self, spark):
        empty = spark.createDataFrame([], "id long, score long, w long")
        out = scale.select_token_budget(empty, "score", "id", "w", budget=10)
        assert out.count() == 0 and "cum_weight" in out.columns
        df = spark.createDataFrame(
            [(i, i, 1) for i in range(20)], "id long, score long, w long"
        )
        with pytest.raises(ValueError, match="max_control_rows"):
            scale.select_token_budget(
                df, "score", "id", "w", budget=5, max_control_rows=3
            )


class TestMixtureInterleave:
    def test_exact_quota_per_group_up_and_down(self, spark, sf_dir):
        # per-group output size must be exactly floor(w_g * total):
        # upsampled groups repeat docs (epochs), downsampled groups
        # select a subset — one formula, both directions.
        from helium_etl_lite_spark import registry
        from helium_etl_lite_spark.queries.curation import (
            MIXTURE_SPEC,
            MIXTURE_TOTAL,
        )

        registry.load_all()
        out = registry.QUERIES["sample_mixture_interleave"](spark, sf_dir)
        got = {r["lang"]: r["n"] for r in out.groupBy("lang").count().withColumnRenamed("count", "n").collect()}
        want = {lang: int(w * MIXTURE_TOTAL) for lang, w in MIXTURE_SPEC}
        assert got == {k: v for k, v in want.items() if v > 0}
        # upsampled groups: every epoch beyond 0 is a full repeat set;
        # epochs are dense per doc (0..reps-1)
        per_doc = (
            out.groupBy("doc_id", "lang")
            .agg({"epoch": "max", "*": "count"})
            .withColumnRenamed("max(epoch)", "max_epoch")
            .withColumnRenamed("count(1)", "n_rows")
            .collect()
        )
        for r in per_doc:
            assert r["n_rows"] == r["max_epoch"] + 1, r
