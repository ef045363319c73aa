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


def sessionize_native(events: DataFrame, gap: str = "30 seconds",
                      ts_col: str = "ts", key_col: str = "user_id") -> DataFrame:
    """Sessionization via Spark's built-in ``session_window`` (a TIMESTAMP
    column, not ms ints) — the one-liner plan for both batch frames and
    streams (with a watermark). Semantics differ from
    ``sessionize_batch`` at the boundary: ``session_window`` closes a
    session when the NEXT event is >= gap later (window end =
    last_event + gap), while the gaps-and-islands form keeps events
    exactly ``gap`` apart in one session and reports the last event time
    as the end."""
    return (
        events.groupBy(key_col, F.session_window(F.col(ts_col), gap))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            key_col,
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )
