"""Event-stream batch analytics: sessionization and activity profiles.

``sessionize_batch`` is the batch analog of
``streaming.stream_sessionize`` — gaps-and-islands on the time axis per
user (exactly the interval ``cluster`` construction with time points).
Tie-safe: islands run over distinct (user, ts) with multiplicity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize_batch(events: DataFrame, gap_ms: int,
                     ts_ms_col: str = "ts_ms", key_col: str = "user_id") -> DataFrame:
    """Per-key sessions: consecutive events within ``gap_ms`` share a
    session. Output: key, session_start, session_end (ms), n_events.

    One shuffle by key; the windows are per-key running comparisons over
    distinct timestamps (duplicate timestamps pre-aggregated — total sort
    order, no tie instability).
    """
    dd = events.groupBy(key_col, ts_ms_col).agg(F.count(F.lit(1)).alias("__mult"))
    w = Window.partitionBy(key_col).orderBy(ts_ms_col)
    prev = F.lag(ts_ms_col).over(w)
    border = F.when(prev.isNull(), F.lit(True)).otherwise(
        F.col(ts_ms_col) - prev > gap_ms
    )
    dd = dd.withColumn(
        "__session",
        F.sum(border.cast("long")).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return dd.groupBy(key_col, "__session").agg(
        F.min(ts_ms_col).alias("session_start"),
        F.max(ts_ms_col).alias("session_end"),
        F.sum("__mult").alias("n_events"),
    ).drop("__session")
