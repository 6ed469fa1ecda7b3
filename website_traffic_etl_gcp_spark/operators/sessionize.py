"""Gap-based sessionization — the classic web-analytics operator the
reference's warehouse table feeds into.

Pure window composition (lag → boundary flag → running sum), no UDF:
the whole operator is three Catalyst window expressions partitioned by
``user_id``, so at 100 TB it's one shuffle on the user key and the
per-user state never leaves the executor. Ordering includes the unique
``event_id`` tie-break so results are deterministic under timestamp
ties."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.money import dec

DEFAULT_GAP_SECONDS = 30 * 60


def with_session_id(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_tiebreak: str = "event_id",
    gap_seconds: int = DEFAULT_GAP_SECONDS,
) -> DataFrame:
    """Assign ``session_id`` (1-based per user) via the gap rule: a new
    session starts when the previous event is more than ``gap_seconds``
    older (or absent)."""
    w = Window.partitionBy(user_col).orderBy(ts_col, order_tiebreak)
    us = F.unix_micros(F.col(ts_col))
    prev = F.lag(us).over(w)
    is_new = F.when(
        prev.isNull() | ((us - prev) > gap_seconds * 1_000_000), 1
    ).otherwise(0)
    run = Window.partitionBy(user_col).orderBy(ts_col, order_tiebreak).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn("session_id", F.sum(is_new).over(run))


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    gap_seconds: int = DEFAULT_GAP_SECONDS,
) -> DataFrame:
    """Per-session rollup: start/end, duration, event count, value sum."""
    tagged = with_session_id(df, user_col, ts_col, gap_seconds=gap_seconds)
    start_us = F.min(F.unix_micros(F.col(ts_col)))
    end_us = F.max(F.unix_micros(F.col(ts_col)))
    return tagged.groupBy(user_col, "session_id").agg(
        F.date_format(F.min(ts_col), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
            "session_start"
        ),
        F.date_format(F.max(ts_col), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
            "session_end"
        ),
        ((end_us - start_us).cast("double") / F.lit(1_000_000.0)).alias(
            "duration_s"
        ),
        F.count(F.lit(1)).alias("n_events"),
        F.sum(dec(value_col)).cast("double").alias("value_sum"),
    )
