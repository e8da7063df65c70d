"""Physical-plan shape checks (SURVEY §4).

At 100 TB a correct-but-mis-planned query is a failure: a scan that
reads every column, a dim join that shuffles both sides, or an
aggregate with no map-side combine each turn linear work into cluster-
melting work. These helpers turn the desired plan shape into assertions
so regressions show up in CI, not on the cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    try:
        return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
            df._jdf.queryExecution(), "formatted"
        )
    except Exception:
        # fallback: capture the printed explain output
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        return buf.getvalue()


def assert_pushed_filter(df: DataFrame, fragment: str) -> None:
    """The filter must reach the parquet scan (PushedFilters: [...])."""
    plan = formatted_plan(df)
    pushed = [line for line in plan.splitlines() if "PushedFilters" in line]
    assert pushed and any(fragment in line for line in pushed), (
        f"filter {fragment!r} not pushed to scan:\n" + "\n".join(pushed or ["<no PushedFilters>"])
    )


def assert_read_schema_only(df: DataFrame, allowed: set[str]) -> None:
    """Column pruning: the scan's ReadSchema must not exceed `allowed`."""
    plan = formatted_plan(df)
    for line in plan.splitlines():
        if "ReadSchema" in line:
            schema_part = line.split("ReadSchema:", 1)[1]
            read_cols = {
                frag.split(":")[0].strip()
                for frag in schema_part.strip().lstrip("struct<").rstrip(">").split(",")
                if frag.strip()
            }
            extra = read_cols - allowed
            assert not extra, f"scan reads unnecessary columns {extra}: {line}"
            return
    raise AssertionError("no ReadSchema found in plan")


def assert_broadcast_join(df: DataFrame) -> None:
    plan = formatted_plan(df)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, (
        "expected a broadcast join in plan:\n" + plan[:2000]
    )


def assert_partial_aggregate(df: DataFrame) -> None:
    """Two-phase hash agg: a partial_ function evaluation before the
    exchange (map-side combine) — linear-scaling group-by."""
    plan = formatted_plan(df)
    assert "partial_" in plan, "expected partial aggregation (map-side combine):\n" + plan[:2000]


def count_shuffles(df: DataFrame) -> int:
    """Number of shuffle Exchange operators in the plan. Counts only the
    details-section headers ("(12) Exchange"), not the tree rendering of
    the same node, so one shuffle counts once."""
    import re

    plan = formatted_plan(df)
    return sum(
        1
        for line in plan.splitlines()
        if re.match(r"\(\d+\) Exchange\b", line.strip())
    )


def count_key_shuffles(df: DataFrame) -> int:
    """Number of KEY-partitioned shuffle Exchanges — i.e. count_shuffles
    minus round-robin fan-outs. The multimodal encode kernels fan a
    small scan out to the cluster's parallelism (operators/multimodal.py
    _fan_out_small: a RoundRobinPartitioning exchange that exists ONLY
    in the tiny-input regime and moves sub-MB payloads); the plan
    property worth pinning is that no hash/range repartition of payload
    data ever appears, so that is what this counts."""
    import re

    plan = formatted_plan(df)
    details: dict[int, str] = {}
    cur = None
    for line in plan.splitlines():
        m = re.match(r"\((\d+)\) Exchange\b", line.strip())
        if m:
            cur = int(m.group(1))
            details[cur] = ""
        elif cur is not None:
            if re.match(r"\(\d+\) ", line.strip()):
                cur = None
            else:
                details[cur] += line + "\n"
    return sum(
        1
        for body in details.values()
        if "roundrobinpartitioning" not in body.lower()
    )


def assert_whole_stage_codegen(df: DataFrame) -> None:
    # Under AQE the plan is finalized only at execution time, and only
    # this DataFrame's own QueryExecution carries it — collect() (count()
    # would spawn a separate plan), then inspect.
    df.collect()
    plan = formatted_plan(df)
    # codegen'd operators carry a '*' prefix in explain output
    # ('* HashAggregate (7)' / '*(2) HashAggregate'); WholeStageCodegen
    # appears verbatim only in non-AQE plans.
    assert "WholeStageCodegen" in plan or "+- * " in plan or "*(" in plan, (
        "expected whole-stage-codegen'd operators in executed plan:\n" + plan[:1500]
    )
