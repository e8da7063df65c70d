"""As-of join: for each left row, the latest right row with
right.ts <= left.ts within an equality key.

Spark has no built-in as-of join; this composes one from a range join +
window dedup. At 100 TB the open range should be bounded (pass
``tolerance`` to turn it into a band, letting AQE and partition pruning
cut the candidate space) and the right side pre-bucketed on the key.

Strategy: equi-join on the key with the range predicate, then keep the
max-ts right match per left row via row_number over the left row id.
Ties on ts are broken by ``right_tiebreak`` (descending) so results are
deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    left_on: str,
    right_on: str,
    left_ts: str,
    right_ts: str,
    right_tiebreak: str,
    how: str = "left",
    tolerance=None,
) -> DataFrame:
    """``left_id`` must uniquely identify left rows (e.g. event_id)."""
    cond = (left[left_on] == right[right_on]) & (right[right_ts] <= left[left_ts])
    if tolerance is not None:
        cond = cond & (right[right_ts] >= left[left_ts] - tolerance)
    joined = left.join(right, cond, how)
    w = Window.partitionBy(left[left_id]).orderBy(
        right[right_ts].desc_nulls_last(), right[right_tiebreak].desc_nulls_last()
    )
    return joined.withColumn("__rn", F.row_number().over(w)).where(F.col("__rn") == 1).drop("__rn")
