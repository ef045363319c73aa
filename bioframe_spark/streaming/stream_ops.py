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
- ``stream_sessionize``: custom stateful operator
  (``applyInPandasWithState``) — per-key gap-based session windows, the
  time-axis analog of ``cluster(min_dist=gap)``.

- ``stream_closest_static``: nearest static annotation(s) per arriving
  interval — stateless mapInPandas over per-chromosome collected
  annotation frames, running the batch cogroup kernel, so stream rows
  are byte-identical to batch ``closest`` on replay.
- ``stream_count_overlaps_static``: running per-annotation overlap
  counts (incremental streaming aggregation over the stream-static
  join) — the streaming analog of ``count_overlaps``; final emissions
  equal the batch counts (live-tested).
- ``stream_merge``: stateful interval merge (``applyInPandasWithState``,
  update mode) — per-chrom island state re-merged each trigger; EXACT
  for any arrival order because weighted island merging is associative
  (the same invariant the batch pre-merge path relies on). The emitted
  snapshot per chrom always equals ``merge()`` of everything seen.

- ``stream_complement``: gap snapshots from the same island state.
- ``stream_cluster``: per-chrom distinct-row snapshots with island-
  assigned cluster ids (per-chrom dense ordinals — global numbering
  would need cross-chromosome coordination a keyed stateful operator
  cannot do). Completes the streaming window family: merge, complement
  and cluster all derive from the shared island state, each emission a
  pure function of the row set seen so far.
"""

from __future__ import annotations

import pandas as pd  # annotation target for the scoring Arrow UDF

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..core.specs import _resolve_cols
from ..functions.intervals import overlap_predicate


from contextlib import contextmanager  # noqa: E402


@contextmanager
def sized_state_shuffle(spark, n_keys: int):
    """Size a stateful streaming query's state-store count to its
    GROUPING-KEY cardinality (r9 measurement: a chrom-keyed stateful op
    at the 32-partition session default pays load/commit/maintenance on
    24 empty state stores per micro-batch — 4.7 → 3.1 s on the sf0.1
    drive at 8 keys; a 200-partition cluster default is worse).

    Structured Streaming offers no per-operator partitioning override:
    stateful operators require hash partitioning with EXACTLY
    ``spark.sql.shuffle.partitions`` partitions, captured into the
    checkpoint's offset metadata when the FIRST micro-batch is
    constructed (asynchronously, after ``.start()``) and pinned for the
    checkpoint's lifetime. So the sizing must be a session-conf window
    spanning query start through first-batch construction::

        with sized_state_shuffle(spark, n_keys=len(view)):
            q = stream_merge(stream).writeStream...start()
            q.awaitTermination()

    ``n_keys`` = the distinct grouping-key count (chromosome count for
    the interval ops — bounded by the assembly, not the data size; use
    a multiple for composite or high-cardinality keys). Scale-adaptive
    by construction: useful parallelism of a keyed stateful operator is
    bounded by its distinct keys at any corpus size. The previous value
    is restored on exit; batch queries planned inside the window also
    see it, so keep the window tight around the streaming drive."""
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(int(n_keys)))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


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


def stream_sessionize(events: DataFrame, gap: str = "30 seconds",
                      ts_col: str = "ts", key_col: str = "user_id",
                      watermark: str = "1 minute") -> DataFrame:
    """Custom stateful operator: per-key session windows with an
    inactivity gap, via ``applyInPandasWithState`` — the streaming analog
    of ``cluster(min_dist=gap)`` on the time axis.

    State per key = (session_start, last_seen, n_events); a batch of
    events extends the open session or closes it and opens a new one;
    sessions are emitted when closed by a gap or by state timeout
    (event-time timeout driven by the watermark).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    gap_ms = _duration_ms(gap)
    out_schema = T.StructType([
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
    ])
    state_schema = T.StructType([
        T.StructField("start_ms", T.LongType()),
        T.StructField("last_ms", T.LongType()),
        T.StructField("n", T.LongType()),
    ])

    def fn(key, pdfs, state):
        closed = []
        if state.hasTimedOut:
            (start_ms, last_ms, n) = state.get
            closed.append((key[0], start_ms, last_ms, n))
            state.remove()
        else:
            start_ms = last_ms = None
            n = 0
            if state.exists:
                (start_ms, last_ms, n) = state.get
            ts_all = []
            for pdf in pdfs:
                ts_all.extend(int(t.value // 10**6) for t in pd.to_datetime(pdf[ts_col]))
            for t in sorted(ts_all):
                if last_ms is None:
                    start_ms, last_ms, n = t, t, 1
                elif t - last_ms > gap_ms:
                    closed.append((key[0], start_ms, last_ms, n))
                    start_ms, last_ms, n = t, t, 1
                else:
                    last_ms, n = t, n + 1
            if last_ms is not None:
                state.update((start_ms, last_ms, n))
                state.setTimeoutTimestamp(last_ms + gap_ms)
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [c[0] for c in closed],
                    "session_start": [pd.Timestamp(c[1], unit="ms") for c in closed],
                    "session_end": [pd.Timestamp(c[2], unit="ms") for c in closed],
                    "n_events": [c[3] for c in closed],
                }
            )

    # a null ts arrives in the kernel as NaT, whose .value is int64-min —
    # not a crash but a garbage session spanning the epoch; null keys and
    # timestamps carry no session information, drop them at the source
    return (
        events.filter(F.col(key_col).isNotNull() & F.col(ts_col).isNotNull())
        .withWatermark(ts_col, watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            fn, out_schema, state_schema, "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


def _island_merge_arrays(s, e, c, min_dist):
    """Vectorized weighted island merge over int64 numpy arrays
    (r9 optimization-round rewrite of the per-tuple Python loop, guide
    §4.2: the stateful kernels hand whole batches to numpy instead of
    sorting Python tuple lists — the per-batch cost was the sort +
    interpreted fuse loop over every input row).

    Semantics identical to the historical sequential loop (the border
    test against the PREFIX running max equals the test against the
    current island's max end, because a border is exactly where the
    prefix max is cleared): sort by (start, end, count); border where
    start clears prev running max end (+ min_dist; strict ``>=`` when
    min_dist is None so coincident points never fuse); per-island
    (min start, max end, sum count) via reduceat. The overflow clamp
    mirrors batch ``try_add`` semantics: a running max near INT64_MAX
    (sentinel ends) + min_dist saturates, so nothing can clear it and
    the border is false.
    """
    import numpy as np

    n = len(s)
    if n == 0:
        return s, e, c
    order = np.lexsort((c, e, s))
    s, e, c = s[order], e[order], c[order]
    prev = np.empty(n, dtype=np.int64)
    prev[0] = np.iinfo(np.int64).min
    if n > 1:
        np.maximum.accumulate(e[:-1], out=prev[1:])
    if min_dist is None:
        border = s >= prev
    else:
        lim = np.iinfo(np.int64).max - int(min_dist)
        border = s > np.minimum(prev, lim) + np.int64(min_dist)
    border[0] = True
    idx = np.flatnonzero(border)
    return s[idx], np.maximum.reduceat(e, idx), np.add.reduceat(c, idx)


def _weighted_island_merge(rows, min_dist):
    """Weighted island merge of (start, end, count) tuples — the
    reference border rule (strict ``>=`` under min_dist=None, so
    coincident points never fuse). The core invariant ``stream_merge``
    relies on: this function is ASSOCIATIVE over row batches — merging
    any prefix first and feeding its islands (as weighted rows) back in
    with the rest yields the same islands as one pass (fuzz-tested over
    random splits in tests/test_round4.py; the fuzz now also covers the
    vectorized kernel, which this list API delegates to)."""
    import numpy as np

    if not rows:
        return []
    arr = np.asarray(rows, dtype=np.int64)
    s, e, c = _island_merge_arrays(arr[:, 0], arr[:, 1], arr[:, 2], min_dist)
    return list(zip(s.tolist(), e.tolist(), c.tolist()))


def stream_merge(stream: DataFrame, min_dist: int | None = 0,
                 cols=None) -> DataFrame:
    """Stateful streaming interval merge: per chromosome, state holds the
    CURRENT island set (disjoint spans + interval counts); each trigger
    re-merges the batch's intervals into it and emits the chromosome's
    full island snapshot (update mode — downstream keeps the latest row
    set per chrom, e.g. a memory/Delta sink keyed by chrom).

    EXACT under any arrival order: an island is an invariant of the row
    SET (union span + count), and weighted island merging is associative
    — merging early islands into later data yields the same islands as
    one batch pass (the same argument that makes the batch pre-merge
    path exact, ``ops._premerge_local``). The ``min_dist=None`` strict
    border keeps coincident points as separate islands, so point islands
    always carry count 1 and re-merge losslessly.

    State per chrom = the island arrays — bounded by the OUTPUT size
    (for merge-friendly genomic data, orders of magnitude below the
    input), not the stream length. Batch equivalence is live-tested:
    the final snapshot equals ``bf.merge`` of every injected row.
    """
    import pandas as pd

    ck, sk, ek = _resolve_cols(cols)
    if min_dist is not None and min_dist < 0:
        raise ValueError("min_dist>=0 or None required")
    out_schema = T.StructType([
        T.StructField(ck, T.StringType()),
        T.StructField(sk, T.LongType()),
        T.StructField(ek, T.LongType()),
        T.StructField("n_intervals", T.LongType()),
    ])
    state_schema = T.StructType([
        T.StructField("starts", T.ArrayType(T.LongType())),
        T.StructField("ends", T.ArrayType(T.LongType())),
        T.StructField("counts", T.ArrayType(T.LongType())),
    ])

    def fn(key, pdfs, state):
        import numpy as np

        # array-native end to end (no Python tuple lists): state arrays
        # + batch columns concatenate into one int64 triple fed to the
        # vectorized island kernel
        ss, es, cs = [], [], []
        if state.exists:
            starts, ends, counts = state.get
            ss.append(np.asarray(starts, dtype="int64"))
            es.append(np.asarray(ends, dtype="int64"))
            cs.append(np.asarray(counts, dtype="int64"))
        for pdf in pdfs:
            if len(pdf):
                ss.append(pdf[sk].to_numpy("int64"))
                es.append(pdf[ek].to_numpy("int64"))
                cs.append(np.ones(len(pdf), dtype="int64"))
        if not ss:
            return
        s, e, c = _island_merge_arrays(
            np.concatenate(ss), np.concatenate(es), np.concatenate(cs),
            min_dist)
        state.update((s.tolist(), e.tolist(), c.tolist()))
        yield pd.DataFrame({
            ck: np.repeat(key[0], len(s)),
            sk: s,
            ek: e,
            "n_intervals": c,
        })

    from pyspark.sql.streaming.state import GroupStateTimeout

    # Null-TRIPLE rows (legal bedframe annotations that batch merge
    # passes through untouched) are dropped here, not crashed on: a
    # null start/end arrives from Arrow as NaN and would poison the
    # stateful kernel's int cast FOREVER (checkpoint restart re-reads
    # the same file and dies again). An island snapshot has no
    # deterministic place for pass-through rows — filter/route them
    # upstream if they must be kept.
    return (
        stream.filter(F.col(ck).isNotNull() & F.col(sk).isNotNull()
                      & F.col(ek).isNotNull())
        .groupBy(ck)
        .applyInPandasWithState(fn, out_schema, state_schema, "update",
                                GroupStateTimeout.NoTimeout)
    )


def stream_complement(stream: DataFrame, view: dict,
                      cols=None) -> DataFrame:
    """Stateful streaming complement: per chromosome, emit the GAPS of
    the running island set against a fixed view ``{chrom: length}``
    (update mode — each trigger re-emits the touched chromosome's full
    gap snapshot, which only ever shrinks as more coverage arrives).

    Same state machinery as :func:`stream_merge` (the island set is the
    sufficient statistic for both: islands are emitted there, their
    set-complement here), hence exact under any arrival order. Island
    semantics are ``min_dist=0`` (touching intervals fuse), matching
    batch ``complement``'s merge step; intervals are clipped to the
    view span. Chromosomes in the view that the stream has not touched
    emit nothing (stateful operators only fire on keyed input) — a
    snapshot consumer unions ``[0, length)`` for untouched chroms, the
    same convention as the batch operator's view join; chromosomes NOT
    in the view are ignored. Batch equivalence is live-tested against
    ``bf.complement`` of every injected row.

    State per chrom = the island arrays, bounded by the island count
    (output-sized, not stream-length-sized)."""
    import pandas as pd

    ck, sk, ek = _resolve_cols(cols)
    view = {str(k): int(v) for k, v in view.items()}
    out_schema = T.StructType([
        T.StructField(ck, T.StringType()),
        T.StructField(sk, T.LongType()),
        T.StructField(ek, T.LongType()),
    ])
    state_schema = T.StructType([
        T.StructField("starts", T.ArrayType(T.LongType())),
        T.StructField("ends", T.ArrayType(T.LongType())),
    ])

    def fn(key, pdfs, state):
        import numpy as np

        chrom = key[0]
        length = view.get(chrom)
        ss, es = [], []
        if state.exists:
            starts, ends = state.get
            ss.append(np.asarray(starts, dtype="int64"))
            es.append(np.asarray(ends, dtype="int64"))
        for pdf in pdfs:
            if len(pdf):
                ss.append(pdf[sk].to_numpy("int64"))
                es.append(pdf[ek].to_numpy("int64"))
        if not ss or length is None:
            return
        sarr = np.concatenate(ss)
        isl_s, isl_e, _ = _island_merge_arrays(
            sarr, np.concatenate(es), np.ones(len(sarr), dtype="int64"), 0)
        state.update((isl_s.tolist(), isl_e.tolist()))
        # the gap sweep stays a Python loop — islands are output-sized
        # (disjoint spans), orders of magnitude below the row count
        gaps = []
        cur = 0
        for s, e in zip(isl_s, isl_e):
            s, e = max(int(s), 0), min(int(e), length)
            if e <= 0 or s >= length:
                continue
            if s > cur:
                gaps.append((cur, s))
            cur = max(cur, e)
        if cur < length:
            gaps.append((cur, length))
        if not gaps:
            # a chromosome that became FULLY covered must still overwrite
            # its previous snapshot at the consumer (update-mode replace
            # fires per emitted key): emit one zero-width row [L, L) —
            # it carries no gap (start < end filters it) but keys the
            # replacement
            gaps = [(length, length)]
        yield pd.DataFrame({
            ck: [chrom] * len(gaps),
            sk: [s for s, _ in gaps],
            ek: [e for _, e in gaps],
        })

    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        stream.filter(F.col(ck).isNotNull() & F.col(sk).isNotNull()
                      & F.col(ek).isNotNull()
                      & F.col(ck).isin(*list(view)))
        .groupBy(ck)
        .applyInPandasWithState(fn, out_schema, state_schema, "update",
                                GroupStateTimeout.NoTimeout)
    )


def stream_cluster(stream: DataFrame, min_dist: int = 0,
                   cols=None) -> DataFrame:
    """Stateful streaming cluster: per chromosome, every trigger emits
    the chromosome's FULL row snapshot tagged with cluster ids — the
    streaming analog of batch :func:`~bioframe_spark.cluster`
    (reference ``ops.py:559-708``), completing the streaming window
    family (merge + complement + cluster share the island state).

    Emitted columns: ``(chrom, start, end, n_copies, cluster,
    cluster_start, cluster_end)`` — one row per DISTINCT (start, end)
    with its multiplicity (identical intervals are interchangeable for
    clustering, so the distinct row set is the minimal sufficient
    statistic), ``cluster`` a dense PER-CHROMOSOME 0-based ordinal by
    island start. Documented deviations from batch ``cluster``: ids are
    per-chrom (global dense numbering needs cross-chromosome
    coordination a keyed stateful operator cannot do — a consumer
    renumbers with one pass over the snapshot), duplicates are
    multiplicity-compressed, and ``min_dist`` must be an int >= 0
    (``None``'s coincident-point rule makes per-row island membership
    ambiguous under searchsorted assignment; batch handles it with the
    tie-safe islands construction).

    EXACT under any arrival order at every trigger: the emission is a
    pure function of the row SET seen so far (unlike a per-row tagging
    stream, whose early emissions would go stale when a later interval
    fuses two islands). State per chrom = the distinct-row arrays —
    OUTPUT-sized (cluster's output is its input), not island-sized like
    ``stream_merge``; the per-trigger re-emission is the price of
    retroactively-correct ids and is bounded by the touched chromosome's
    distinct rows. Batch equivalence is live-tested vs ``bf.cluster``
    replay of every injected row.

    Assignment reuses the premerge kernel's searchsorted discipline
    (``ops._cluster_premerged``): islands sorted by start, each row's
    island = rightmost island start <= row start.
    """
    import numpy as np
    import pandas as pd

    ck, sk, ek = _resolve_cols(cols)
    if not isinstance(min_dist, int) or min_dist < 0:
        raise ValueError("stream_cluster requires an int min_dist >= 0 "
                         "(min_dist=None's coincident-point islands need "
                         "the batch tie-safe construction)")
    out_schema = T.StructType([
        T.StructField(ck, T.StringType()),
        T.StructField(sk, T.LongType()),
        T.StructField(ek, T.LongType()),
        T.StructField("n_copies", T.LongType()),
        T.StructField("cluster", T.LongType()),
        T.StructField("cluster_start", T.LongType()),
        T.StructField("cluster_end", T.LongType()),
    ])
    state_schema = T.StructType([
        T.StructField("starts", T.ArrayType(T.LongType())),
        T.StructField("ends", T.ArrayType(T.LongType())),
        T.StructField("counts", T.ArrayType(T.LongType())),
    ])

    def fn(key, pdfs, state):
        parts = []
        if state.exists:
            starts, ends, counts = state.get
            parts.append(pd.DataFrame({"s": starts, "e": ends, "c": counts}))
        for pdf in pdfs:
            if len(pdf):
                parts.append(pd.DataFrame({
                    "s": pdf[sk].astype("int64"),
                    "e": pdf[ek].astype("int64"),
                    "c": np.ones(len(pdf), dtype="int64")}))
        if not parts:
            return
        rows = (pd.concat(parts, ignore_index=True)
                .groupby(["s", "e"], sort=True, as_index=False)["c"].sum())
        if not len(rows):
            return
        state.update((
            [int(x) for x in rows["s"]],
            [int(x) for x in rows["e"]],
            [int(x) for x in rows["c"]],
        ))
        isl_s, isl_e, _ = _island_merge_arrays(
            rows["s"].to_numpy("int64"), rows["e"].to_numpy("int64"),
            rows["c"].to_numpy("int64"), min_dist)
        idx = np.searchsorted(isl_s, rows["s"].to_numpy("int64"),
                              side="right") - 1
        yield pd.DataFrame({
            ck: [key[0]] * len(rows),
            sk: rows["s"],
            ek: rows["e"],
            "n_copies": rows["c"],
            "cluster": idx.astype("int64"),
            "cluster_start": isl_s[idx],
            "cluster_end": isl_e[idx],
        })

    from pyspark.sql.streaming.state import GroupStateTimeout

    # null-triple rows dropped, same contract (and reason) as stream_merge
    return (
        stream.filter(F.col(ck).isNotNull() & F.col(sk).isNotNull()
                      & F.col(ek).isNotNull())
        .groupBy(ck)
        .applyInPandasWithState(fn, out_schema, state_schema, "update",
                                GroupStateTimeout.NoTimeout)
    )


def _duration_ms(s: str) -> int:
    n, unit = s.split()
    mult = {"millisecond": 1, "second": 1000, "minute": 60_000, "hour": 3_600_000}
    return int(n) * mult[unit.rstrip("s")]


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


def stream_closest_static(stream: DataFrame, annotations: DataFrame,
                          k: int = 1, suffixes=("", "_ann"),
                          cols1=None, cols2=None,
                          return_distance: bool = True) -> DataFrame:
    """Nearest static annotation(s) for each arriving interval — the
    streaming form of ``closest(stream_df, annotations, k=k)`` ("tag
    each event with its nearest gene, live").

    STATELESS: the annotation table is bounded (the same broadcast-dim
    contract as :func:`stream_overlap_static`); it is collected ONCE at
    plan-construction time into per-chromosome pandas frames captured by
    a ``mapInPandas`` kernel — the SAME vectorized searchsorted kernel
    and row-assembly the batch cogroup path runs
    (``operators/closest.py::_closest_pandas``), so every emitted row is
    byte-identical to the batch operator on a replay of the stream.
    Stateless map ops are append-legal; each micro-batch's rows emit
    immediately.  Chromosomes with no annotation produce the batch
    path's left-join null row.  k-NN against a MUTABLE or unbounded
    right side is not offered as a stream (it would need total
    per-chromosome order); re-plan on annotation refresh instead.

    Delegates to the batch ``closest`` broadcast strategy
    (``operators/closest.py::_closest_broadcast``) — ONE copy of the
    collect/broadcast/mapInPandas machinery; ``mapInPandas`` composes
    with streaming DataFrames unchanged."""
    from ..operators.closest import _closest_broadcast

    return _closest_broadcast(
        stream, annotations, k=k, ignore_overlaps=False,
        ignore_upstream=False, ignore_downstream=False, direction_col=None,
        tie_breaking_col=None, return_input=True,
        return_distance=return_distance, return_overlap=False,
        suffixes=suffixes, cols1=cols1, cols2=cols2,
    )


def stream_count_overlaps_static(stream: DataFrame, annotations: DataFrame,
                                 cols1=None, cols2=None) -> DataFrame:
    """Running per-annotation overlap counts over an interval stream —
    the streaming analog of ``count_overlaps(annotations, stream)``
    ("live coverage of a target panel"). Inner stream-static broadcast
    join, then an incremental streaming aggregation keyed by the
    annotation row; update mode emits each annotation's new running
    ``count`` whenever a batch touches it (state = one long per
    annotation row — bounded by the ANNOTATION table size). Annotations
    untouched by the stream simply never emit (batch left-join zero-fill
    needs the final snapshot; do that join against the sink table)."""
    ck1, sk1, ek1 = _resolve_cols(cols1)
    ck2, sk2, ek2 = _resolve_cols(cols2)
    ann = annotations.select(
        [F.col(c).alias("__a_" + c) for c in annotations.columns])
    cond = (F.col(ck1) == F.col("__a_" + ck2)) & overlap_predicate(
        F.col(sk1), F.col(ek1),
        F.col("__a_" + sk2), F.col("__a_" + ek2),
    )
    joined = stream.join(F.broadcast(ann), cond, "inner")
    return (
        joined.groupBy(*[F.col("__a_" + c).alias(c)
                         for c in annotations.columns])
        .agg(F.count(F.lit(1)).alias("count"))
    )


def stream_coverage_static(stream: DataFrame, annotations: DataFrame,
                           cols1=None, cols2=None) -> DataFrame:
    """Running covered-base-pairs per annotation over an interval stream
    — the streaming analog of ``coverage(annotations, stream)`` WITHOUT
    the merge step: each arriving interval contributes its clipped
    length, so overlapping stream intervals double-count (the exact
    batch equivalent is the sum of per-row clipped lengths, not merged
    coverage — a running merge would need per-chromosome state; use
    ``stream_merge`` + a batch join on the snapshot for merged
    semantics).  Same shape as :func:`stream_count_overlaps_static`:
    broadcast stream-static inner join + incremental sum keyed by the
    annotation row, update mode; untouched annotations never emit."""
    ck1, sk1, ek1 = _resolve_cols(cols1)
    ck2, sk2, ek2 = _resolve_cols(cols2)
    ann = annotations.select(
        [F.col(c).alias("__a_" + c) for c in annotations.columns])
    cond = (F.col(ck1) == F.col("__a_" + ck2)) & overlap_predicate(
        F.col(sk1), F.col(ek1),
        F.col("__a_" + sk2), F.col("__a_" + ek2),
    )
    joined = stream.join(F.broadcast(ann), cond, "inner")
    clipped = (F.least(F.col(ek1), F.col("__a_" + ek2))
               - F.greatest(F.col(sk1), F.col("__a_" + sk2)))
    return (
        joined.groupBy(*[F.col("__a_" + c).alias(c)
                         for c in annotations.columns])
        .agg(F.sum(clipped).alias("covered_bp"))
    )


def stream_drop_exact_duplicates(docs: DataFrame, text_col: str = "text",
                                 ts_col: str | None = None,
                                 watermark: str | None = None) -> DataFrame:
    """Streaming exact deduplication on a content hash — the streaming
    form of ``datapipe.dedup.drop_exact_duplicates`` for continuously
    arriving corpora.

    With ``ts_col`` + ``watermark``, duplicates are dropped within the
    watermark horizon via ``dropDuplicatesWithinWatermark`` — the state
    store holds only hashes younger than the watermark, so state is
    BOUNDED (the 100 TB/endless-stream mode; re-emission of a duplicate
    older than the horizon is the documented trade). Without a watermark
    the dedup is global and exact but state grows with distinct content
    forever — only for finite backfills."""
    hashed = docs.withColumn("__content_hash", F.md5(F.col(text_col)))
    if ts_col is not None and watermark is not None:
        return hashed.withWatermark(ts_col, watermark) \
            .dropDuplicatesWithinWatermark(["__content_hash"]) \
            .drop("__content_hash")
    return hashed.dropDuplicates(["__content_hash"]).drop("__content_hash")


def stream_near_dup_pairs(docs: DataFrame, num_hashes: int = 16,
                          bands: int = 8, n: int = 3,
                          threshold: float = 0.5,
                          text_col: str = "text", id_col: str = "doc_id",
                          hash_fn: str = "xxhash64",
                          max_bucket: int = 1024) -> DataFrame:
    """Streaming MinHash-LSH near-duplicate pairs: each arriving doc is
    checked against every doc already seen in any of its band buckets.

    The signature is the batch ``dedup.minhash_signatures`` projection —
    map-only (``array_min`` over per-seed transforms, no shuffle), hence
    legal on a stream. Banding is a projection + explode. Candidate
    matching is the only stateful stage: ``applyInPandasWithState``
    keyed by ``(band, bucket)``, state = the bucket's (id, signature)
    members; a new doc emits its verified pairs against the existing
    members, then joins the bucket.

    Semantics vs batch ``minhash_lsh_pairs``: same signatures, same
    buckets, same ``n_match >= threshold*num_hashes`` verification; the
    streaming output may emit one pair once per SHARED BAND (the batch
    op's cross-band ``distinct`` has no bounded-state streaming analog)
    — dedup downstream with ``dropDuplicatesWithinWatermark`` if exact
    once-only pairs matter.

    State per bucket is capped at ``max_bucket`` members (oldest
    retained — a hot bucket stops absorbing new members but keeps
    emitting pairs against the cap window; at 100 TB cap + band count
    bound total state by ``bands × max_bucket × corpus-distinct
    buckets``, and a TTL policy would bolt on via state timeouts).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    from ..datapipe.dedup import minhash_signatures

    if num_hashes % bands:
        raise ValueError("num_hashes must be divisible by bands")
    rows_per_band = num_hashes // bands
    need = int(__import__("math").ceil(threshold * num_hashes))

    sig = minhash_signatures(docs, num_hashes=num_hashes, n=n,
                             text_col=text_col, id_col=id_col,
                             hash_fn=hash_fn)
    banded = sig.select(
        id_col, "signature",
        F.explode(F.transform(
            F.sequence(F.lit(0), F.lit(bands - 1)),
            lambda b: F.struct(
                b.alias("band"),
                F.xxhash64(F.concat_ws(",", F.transform(
                    F.slice(F.col("signature"),
                            b * F.lit(rows_per_band) + 1,
                            F.lit(rows_per_band)),
                    lambda x: x.cast("string")))).alias("bucket"),
            ),
        )).alias("bb"),
    ).select(id_col, "signature", "bb.band", "bb.bucket")

    id_t = docs.schema[id_col].dataType.simpleString()
    out_schema = f"id1 {id_t}, id2 {id_t}, n_match int, band int"
    state_schema = f"ids array<{id_t}>, sigs array<array<bigint>>"

    def fn(key, pdfs, state):
        ids, sigs = ([], []) if not state.exists else \
            (list(state.get[0]), [list(s) for s in state.get[1]])
        out = []
        for pdf in pdfs:
            for _, row in pdf.iterrows():
                # pure-Python values: the state pickler rejects numpy scalars
                sig_new = [int(x) for x in row["signature"]]
                nid = row[id_col]
                nid = nid.item() if hasattr(nid, "item") else nid
                for oid, osig in zip(ids, sigs):
                    if oid == nid:
                        continue
                    m = sum(1 for x, y in zip(sig_new, osig) if x == y)
                    if m >= need:
                        a, b = (oid, nid) if oid < nid else (nid, oid)
                        out.append((a, b, m, key[0]))
                if len(ids) < max_bucket:
                    ids.append(nid)
                    sigs.append(sig_new)
        state.update((ids, sigs))
        if out:
            yield pd.DataFrame(out, columns=["id1", "id2", "n_match", "band"])

    return (
        banded.groupBy("band", "bucket")
        .applyInPandasWithState(fn, out_schema, state_schema, "append",
                                GroupStateTimeout.NoTimeout)
    )


def stream_span_contamination(docs: DataFrame, eval_docs: DataFrame,
                              k: int = 25, w: int = 16,
                              text_col: str = "text",
                              id_col: str = "doc_id",
                              hash: str = "md5") -> DataFrame:
    """Benchmark decontamination AT INGEST: tag each arriving document
    with how many of its winnowed span fingerprints appear anywhere in
    a STATIC eval/benchmark corpus (the span-level analog of the batch
    ``ngram_contamination``, legal on an unbounded stream).

    Returns (id, n_spans, n_contaminated, contamination) — append-mode
    friendly: the eval fingerprint set is collected ONCE (hard-bounded
    by ``spark.bioframe.smallInputMaxRows`` — real decontamination
    targets are benchmark-sized, not corpus-sized; over the cap this
    raises rather than silently broadcasting gigabytes) and shipped as
    a broadcast into a stateless Arrow kernel. No shuffle, no state
    store — per-micro-batch cost is exactly the winnow kernel.

    Works identically on a batch frame (mapInPandas is mode-agnostic).
    ``hash="xx64"`` swaps the md5 gram loop for the vectorized 64-bit
    winnow kernel (same knob as the batch span family — the per-batch
    kernel is this op's entire cost, so it's the knob that matters at
    ingest rates); decisions stay hash-consistent, md5 remains the
    oracle default.
    """
    from pyspark.sql import types as T

    from ..datapipe.dedup import _make_winnow_doc, winnow_fingerprints
    from ..operators.ops import (_SMALL_INPUT_MAX_ROWS, _bounded_pdf,
                                 _threshold)

    fps = (winnow_fingerprints(eval_docs, k=k, w=w, text_col=text_col,
                               id_col=id_col, hash=hash)
           .select(F.explode("fingerprints").alias("__h")).distinct())
    cap = _threshold(eval_docs, "smallInputMaxRows", _SMALL_INPUT_MAX_ROWS)
    pdf = _bounded_pdf(fps, cap, probe=False)
    if pdf is None:
        raise ValueError(
            "eval corpus fingerprint set exceeds "
            "spark.bioframe.smallInputMaxRows — span decontamination "
            "broadcasts the target set; shrink the eval corpus or raise "
            "the cap")
    bset = docs.sparkSession.sparkContext.broadcast(set(pdf["__h"]))

    out_schema = T.StructType([
        docs.schema[id_col],
        T.StructField("n_spans", T.LongType()),
        T.StructField("n_contaminated", T.LongType()),
        T.StructField("contamination", T.DoubleType()),
    ])
    sub = docs.select(id_col, text_col)

    def gen(batches):
        import pandas as pd

        winnow = _make_winnow_doc(k, w, hash=hash)
        ev = bset.value
        for pdf_ in batches:
            ids, ns, nc, fr = [], [], [], []
            for did, txt in zip(pdf_[id_col], pdf_[text_col]):
                ids.append(did)
                if txt is None or (isinstance(txt, float) and pd.isna(txt)):
                    ns.append(None); nc.append(None); fr.append(None)
                    continue
                sel = winnow(txt)
                n = len(sel)
                c = sum(1 for h in sel if h in ev)
                ns.append(n); nc.append(c)
                fr.append(round(c / n, 9) if n else None)
            yield pd.DataFrame({id_col: ids, "n_spans": ns,
                                "n_contaminated": nc, "contamination": fr})

    return sub.mapInPandas(gen, out_schema)


def stream_quality_score(docs: DataFrame, weights, *, dim: int | None = None,
                         bias: float | None = None,
                         hash_fn: str = "xxhash64",
                         threshold: float | None = None,
                         text_col: str = "text", id_col: str = "doc_id",
                         score_decimals: int | None = 6) -> DataFrame:
    """Hashed-classifier quality scoring AT INGEST — the model-based
    filter applied where the data arrives, before anything is stored.

    Streaming-legal reformulation of
    :func:`~bioframe_spark.datapipe.classifier.hashed_text_score`: the
    batch plan's explode → broadcast join → per-doc groupBy is a
    STATEFUL aggregation under streaming semantics (a doc_id could
    recur across micro-batches), so here the per-doc sum never leaves
    the row — tokens and feature slots are computed as JVM array
    expressions (the same ``hash_slot`` the trainer used), and ONE
    stateless Arrow kernel indexes the broadcast weight vector
    (``sum(w[slots]) / n + bias``, vectorized concat + reduceat — no
    hashing in Python, no shuffle, no state store). Append-mode safe;
    works identically on a batch frame.

    ``weights``: the ``dim + 1`` vector from ``train_quality_classifier``
    (bias folded in), or a (slot, weight) DataFrame / mapping with
    explicit ``dim``/``bias``. ``threshold`` adds a ``keep`` flag
    (score ≥ threshold; null score → null keep — no evidence is not a
    removal signal). Scores are bit-identical to the batch op
    (equivalence-tested live in tests/test_round8.py)."""
    import numpy as np

    from ..datapipe.classifier import hash_slot
    from ..datapipe.ranking import _doc_tokens

    if isinstance(weights, np.ndarray):
        if dim is not None and dim != len(weights) - 1:
            raise ValueError(f"dim={dim} disagrees with weight vector "
                             f"length {len(weights)} (dim + 1 expected)")
        dim = len(weights) - 1
        bias = float(weights[-1]) if bias is None else float(bias)
        wv = np.asarray(weights[:-1], dtype="float64")
    else:
        if dim is None:
            raise ValueError("dim is required with non-vector weights")
        bias = float(bias or 0.0)
        wv = np.zeros(int(dim), dtype="float64")
        if isinstance(weights, DataFrame):
            from ..datapipe.classifier import _collect_weight_rows
            items = _collect_weight_rows(weights, int(dim))
        else:
            items = [(int(s), float(v)) for s, v in weights.items()]
        # out-of-range slots are SKIPPED, matching the batch op's
        # broadcast-join semantics exactly (a slot the hash can never
        # produce simply never matches there); a negative slot must not
        # silently write from the array end
        for s, v in items:
            if 0 <= s < int(dim):
                wv[s] = v
    bw = docs.sparkSession.sparkContext.broadcast(wv)

    toks = _doc_tokens(text_col)
    slots = F.transform(toks, lambda t: hash_slot(t, int(dim), hash_fn))
    sub = docs.select(
        F.col(id_col),
        F.when(F.col(text_col).isNotNull(), slots).alias("__slots"))

    @F.pandas_udf("double")
    def _mean_w(sl: pd.Series) -> pd.Series:
        w = bw.value
        nulls = sl.isna()
        lens = np.fromiter(
            (0 if n else len(a) for n, a in zip(nulls, sl)),
            dtype="int64", count=len(sl))
        out = np.zeros(len(sl), dtype="float64")
        nz = lens > 0
        if nz.any():
            flat = np.concatenate(
                [np.asarray(a, dtype="int64") for n, a in zip(nulls, sl)
                 if not n and len(a)])
            offs = np.concatenate(([0], np.cumsum(lens[lens > 0])[:-1]))
            sums = np.add.reduceat(w[flat], offs)
            out[nz] = sums / lens[nz]
        res = pd.Series(out)
        res[nulls.to_numpy()] = None
        return res

    score = F.lit(bias) + _mean_w(F.col("__slots"))
    score = F.when(F.col("__slots").isNull(),
                   F.lit(None).cast("double")).otherwise(score)
    if score_decimals is not None:
        score = F.round(score, score_decimals)
    out = sub.select(id_col, score.alias("score"))
    if threshold is not None:
        out = out.withColumn("keep", F.col("score") >= F.lit(float(threshold)))
    return out
