"""SparkSession factory tuned for this engine.

Local testing runs on local[N]; the settings below are chosen so the
same logical plans scale to a multi-executor cluster: AQE for runtime
re-planning (skew joins, partition coalescing), explicit shuffle
partition counts, Arrow for the Python boundary, UTC session time.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# events.parquet stores TIMESTAMP(NANOS) which Spark's vectorized parquet
# reader rejects; this legacy flag reads nanos as long and tables.py
# converts to timestamp_ntz at microsecond precision (matching DuckDB).
NANOS_AS_LONG = "spark.sql.legacy.parquet.nanosAsLong"


def get_spark(app_name: str = "helium_etl_lite_spark", cpus: int | None = None) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    # Python workers inherit PYTHONPATH from the driver env, not from
    # runtime sys.path edits — make this package importable on workers
    # even when the driver script runs from elsewhere.
    pkg_parent = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if pkg_parent not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            f"{pkg_parent}{os.pathsep}{existing}" if existing else pkg_parent
        )
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # 64 MB broadcast ceiling: a dimension table this size is still a
        # cheap one-time transfer per executor at cluster scale, and it
        # keeps mid-size dims (orders-scale) off the shuffle path. Facts
        # beyond it still sort-merge.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.adaptive.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(NANOS_AS_LONG, "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        # saveAsTable targets (bucketed layouts) land outside the repo;
        # static conf, so it only applies to sessions this factory creates.
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/helium_spark_warehouse"),
        )
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def ensure_session_conf(spark: SparkSession) -> None:
    """Best-effort: apply runtime-settable confs this engine relies on to a
    session we did not create (the driver hands us its own session)."""
    for key, value in [
        (NANOS_AS_LONG, "true"),
        ("spark.sql.adaptive.enabled", "true"),
    ]:
        try:
            spark.conf.set(key, value)
        except Exception:
            pass
