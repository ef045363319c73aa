"""Structured Streaming surface (net-new vs the reference, which is
batch-only — SURVEY.md §2.8).

Streaming analogs of the batch operators that are order-insensitive:
- ``stream_binnify_counts``: tumbling genomic-bin aggregation of an
  interval stream (the streaming analog of binnify + count_overlaps).
- ``stream_event_windows``: event-time windowed aggregation with
  watermarks for late data.
- ``stream_overlap_static``: stream-static interval join against a
  broadcastable annotation table (stream-side rows join a static
  interval set — the common "annotate events as they arrive" pattern).

Order-sensitive operators (merge/cluster/complement) are NOT offered as
streams: their gaps-and-islands semantics need total per-chrom order,
which an unbounded stream can only approximate per-watermark-window; use
foreachBatch + the batch operators instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..core.specs import _resolve_cols
from ..functions.intervals import overlap_predicate


def stream_binnify_counts(stream: DataFrame, bin_size: int, cols=None) -> DataFrame:
    """Count stream intervals per (chrom, genomic bin) — each interval
    contributes to every bin it touches (explode + groupBy, incremental
    partial aggregation under the hood)."""
    ck, sk, ek = _resolve_cols(cols)
    first = F.floor(F.col(sk) / bin_size)
    last = F.floor((F.col(ek) - 1) / bin_size)
    binned = stream.withColumn("__bin", F.explode(F.sequence(first, F.greatest(last, first))))
    return (
        binned.groupBy(ck, "__bin")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col(ck),
            (F.col("__bin") * bin_size).alias(sk),
            ((F.col("__bin") + 1) * bin_size).alias(ek),
            "n",
        )
    )


def stream_event_windows(events: DataFrame, ts_col: str = "ts",
                         window: str = "1 hour", watermark: str = "2 hours",
                         keys: list[str] | None = None) -> DataFrame:
    """Event-time tumbling windows with a watermark for late data."""
    keys = keys or []
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window), *keys)
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value"))
    )


def stream_overlap_static(stream: DataFrame, annotations: DataFrame,
                          cols1=None, cols2=None,
                          suffixes=("", "_ann")) -> DataFrame:
    """Stream-static interval join: annotate arriving intervals against a
    static (broadcast) interval table. Static side is broadcast per
    micro-batch; no state store needed."""
    ck1, sk1, ek1 = _resolve_cols(cols1)
    ck2, sk2, ek2 = _resolve_cols(cols2)
    sfx1, sfx2 = suffixes
    ann = annotations.select([F.col(c).alias(c + sfx2) for c in annotations.columns])
    left = stream.select([F.col(c).alias(c + sfx1) for c in stream.columns])
    cond = (F.col(ck1 + sfx1) == F.col(ck2 + sfx2)) & overlap_predicate(
        F.col(sk1 + sfx1), F.col(ek1 + sfx1),
        F.col(sk2 + sfx2), F.col(ek2 + sfx2),
    )
    return left.join(F.broadcast(ann), cond, "left_outer")
