"""Live Structured Streaming smoke: the streaming ops run as actual
streams (rate source → transform → memory sink), not just batch plans."""

import time

from pyspark.sql import functions as F

from bioframe_spark.streaming import stream_ops


def test_stream_binnify_counts_live(spark):
    # rate source → synthesize intervals → binnify counts → memory sink
    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", "500").load()
        .select(
            F.concat(F.lit("chr"), (F.col("value") % 2).cast("string")).alias("chrom"),
            ((F.col("value") * 7) % 1000).cast("long").alias("start"),
            (((F.col("value") * 7) % 1000) + 5).cast("long").alias("end"),
        )
    )
    out = stream_ops.stream_binnify_counts(stream, bin_size=100)
    q = (
        out.writeStream.format("memory").queryName("binnify_live")
        .outputMode("complete").trigger(processingTime="1 second").start()
    )
    try:
        deadline = time.time() + 30
        n = 0
        while time.time() < deadline:
            n = spark.sql("select count(*) c from binnify_live").collect()[0]["c"]
            if n > 0:
                break
            time.sleep(1)
        assert n > 0, "stream produced no aggregated bins within 30s"
        row = spark.sql(
            "select * from binnify_live where chrom = 'chr0' limit 1"
        ).collect()
        assert row and row[0]["n"] >= 1
    finally:
        q.stop()


def test_stream_event_windows_live(spark):
    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", "200").load()
        .select(
            F.col("timestamp").alias("ts"),
            (F.col("value") % 10).cast("double").alias("value"),
            F.concat(F.lit("t"), (F.col("value") % 3).cast("string")).alias("event_type"),
        )
    )
    out = stream_ops.stream_event_windows(
        stream, ts_col="ts", window="5 seconds", watermark="10 seconds",
        keys=["event_type"],
    )
    q = (
        out.writeStream.format("memory").queryName("events_live")
        .outputMode("append").trigger(processingTime="1 second").start()
    )
    try:
        deadline = time.time() + 45
        n = 0
        while time.time() < deadline:
            n = spark.sql("select count(*) c from events_live").collect()[0]["c"]
            if n > 0:
                break
            time.sleep(1)
        # append mode only emits after the watermark passes; just assert the
        # stream ran without error and (usually) emitted finalized windows
        assert q.isActive
    finally:
        q.stop()


def test_stream_sessionize_live(spark):
    # rate source: user_id = value % 3, events every 5ms per user; with a
    # tiny gap the sessions close continually and get emitted
    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", "100").load()
        .select(
            F.col("timestamp").alias("ts"),
            (F.col("value") % 3).cast("long").alias("user_id"),
        )
    )
    out = stream_ops.stream_sessionize(
        stream, gap="2 seconds", watermark="4 seconds"
    )
    q = (
        out.writeStream.format("memory").queryName("sessions_live")
        .outputMode("append").trigger(processingTime="1 second").start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            if not q.isActive:
                raise AssertionError(f"stream died: {q.exception()}")
            n = spark.sql("select count(*) c from sessions_live").collect()[0]["c"]
            if n > 0:
                break
            time.sleep(2)
        # rate source emits continuously with no 2s gaps, so sessions only
        # close via the final watermark — just require the query to be
        # healthy and state updates to have occurred
        assert q.isActive
        prog = q.lastProgress
        assert prog is not None
    finally:
        q.stop()


def test_stream_drop_exact_duplicates_live(spark):
    # rate source emitting a REPEATING text cycle (value % 5) — the
    # deduped stream must emit each distinct text once, not per arrival
    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", "200").load()
        .select(
            F.col("timestamp").alias("ts"),
            F.concat(F.lit("doc text "), (F.col("value") % 5).cast("string"))
            .alias("text"),
        )
    )
    out = stream_ops.stream_drop_exact_duplicates(
        stream, ts_col="ts", watermark="1 minute"
    )
    q = (
        out.writeStream.format("memory").queryName("dedup_live")
        .outputMode("append").trigger(processingTime="1 second").start()
    )
    try:
        deadline = time.time() + 30
        n = 0
        while time.time() < deadline:
            n = spark.sql("select count(*) c from dedup_live").collect()[0]["c"]
            if n >= 5:
                break
            time.sleep(1)
        texts = [r["text"] for r in spark.sql("select text from dedup_live").collect()]
        assert sorted(texts) == [f"doc text {i}" for i in range(5)], texts
    finally:
        q.stop()


def test_stream_text_pipeline_live(spark):
    """Text quality features + language-ID are pure projections, so they
    run unchanged under Structured Streaming — prove it live."""
    from bioframe_spark.datapipe import text as T

    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", "100").load()
        .select(
            F.col("value").alias("doc_id"),
            F.when(F.col("value") % 2 == 0,
                   F.lit("the cat and the dog sat on the mat"))
            .otherwise(F.lit("der hund und die katze auf dem tisch"))
            .alias("text"),
        )
    )
    out = T.language_id(T.quality_features(stream)).select(
        "doc_id", "n_tokens", "lang_pred")
    q = (
        out.writeStream.format("memory").queryName("textpipe_live")
        .outputMode("append").trigger(processingTime="1 second").start()
    )
    try:
        deadline = time.time() + 30
        langs = set()
        while time.time() < deadline:
            langs = {r["lang_pred"] for r in
                     spark.sql("select distinct lang_pred from textpipe_live").collect()}
            if {"en", "de"} <= langs:
                break
            time.sleep(1)
        assert {"en", "de"} <= langs, langs
    finally:
        q.stop()


def test_stream_near_dup_pairs_live(spark):
    """Streaming minhash-LSH: rate source where value%3 picks one of 3
    fixed texts → every same-text pair is an exact near-dup; pairs must
    flow out of the stateful bucket stage."""
    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", "100").load()
        .select(
            F.col("value").alias("doc_id"),
            F.concat(
                F.lit("the quick brown fox jumps over the lazy dog variant "),
                (F.col("value") % 3).cast("string"),
            ).alias("text"),
        )
    )
    out = stream_ops.stream_near_dup_pairs(
        stream, num_hashes=16, bands=4, threshold=0.9)
    q = (
        out.writeStream.format("memory").queryName("neardup_live")
        .outputMode("append").trigger(processingTime="1 second").start()
    )
    try:
        deadline = time.time() + 40
        rows = []
        while time.time() < deadline:
            rows = spark.sql(
                "select * from neardup_live limit 5").collect()
            if rows:
                break
            time.sleep(1)
        assert rows, "no near-dup pairs within 40s"
        for r in rows:
            assert r["id1"] < r["id2"]
            assert r["id1"] % 3 == r["id2"] % 3  # same variant text
            assert r["n_match"] >= 15
    finally:
        q.stop()


def test_stream_sampling_split_live(spark):
    # the deterministic sampling family is map-only (no shuffle, no
    # state), therefore stream-legal as-is: hash-sample + train/val tag
    # a live stream and verify determinism (same key -> same verdicts a
    # batch run produces)
    from bioframe_spark.datapipe.sampling import (
        deterministic_sample, train_val_split)

    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", "300").load()
        .select((F.col("value") % 1000).alias("doc_id"))
    )
    out = train_val_split(
        deterministic_sample(stream, fraction=0.5, key_col="doc_id"),
        val_fraction=0.2, key_col="doc_id")
    q = (
        out.writeStream.format("memory").queryName("sampling_live")
        .outputMode("append").trigger(processingTime="1 second").start()
    )
    try:
        deadline = time.time() + 30
        rows = []
        while time.time() < deadline:
            rows = spark.sql(
                "select distinct doc_id, split from sampling_live").collect()
            if len(rows) >= 100:
                break
            time.sleep(1)
        assert len(rows) >= 100, "stream produced too few sampled rows"
        got = {r["doc_id"]: r["split"] for r in rows}
        # batch replay over the same key domain must agree exactly
        batch = spark.range(1000).select(F.col("id").alias("doc_id"))
        want_df = train_val_split(
            deterministic_sample(batch, fraction=0.5, key_col="doc_id"),
            val_fraction=0.2, key_col="doc_id")
        want = {r["doc_id"]: r["split"] for r in want_df.collect()}
        for k, v in got.items():
            assert want.get(k) == v, (k, v, want.get(k))
    finally:
        q.stop()


def test_stream_merge_live(spark, tmp_path):
    """Deterministic live run: file source, one micro-batch per file
    (maxFilesPerTrigger=1, availableNow), foreachBatch capturing the
    latest island snapshot per chrom. The final snapshot must equal the
    batch bf.merge of EVERY injected row — the update-mode state
    carries islands across triggers and re-merges exactly."""
    import bioframe_spark as bf

    src = tmp_path / "iv_stream"
    src.mkdir()
    batch1 = [("chr1", 0, 50), ("chr1", 40, 90), ("chr2", 10, 20),
              ("chr1", 300, 300), ("chr1", 300, 300)]
    batch2 = [("chr1", 85, 120), ("chr1", 200, 210), ("chr2", 15, 35),
              ("chr1", 290, 310)]
    schema = "chrom string, start long, end long"
    spark.createDataFrame(batch1, schema).coalesce(1).write.parquet(
        str(src / "f1"))
    spark.createDataFrame(batch2, schema).coalesce(1).write.parquet(
        str(src / "f2"))

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", "1")
              .parquet(str(src / "*")))
    out = stream_ops.stream_merge(stream, min_dist=0)

    snap = {}
    batches = []

    def capture(bdf, bid):
        pdf = bdf.toPandas()
        batches.append(bid)
        for chrom, grp in pdf.groupby("chrom"):
            snap[chrom] = sorted(
                (int(s), int(e), int(n))
                for s, e, n in zip(grp["start"], grp["end"],
                                   grp["n_intervals"]))

    q = (out.writeStream.foreachBatch(capture).outputMode("update")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    got = sorted((c, s, e, n) for c, isl in snap.items()
                 for s, e, n in isl)
    want_df = bf.merge(
        spark.createDataFrame(batch1 + batch2, schema), min_dist=0)
    want = sorted((r["chrom"], r["start"], r["end"], r["n_intervals"])
                  for r in want_df.collect())
    assert got == want
    # the duplicate point rows stayed separate islands (min_dist=0 fuses
    # coincident points: 300,300 x2 + the covering 290-310 -> one island)
    assert ("chr1", 290, 310, 3) in got


def test_stream_merge_min_dist_none_points(spark, tmp_path):
    """min_dist=None across triggers: coincident points arriving in
    DIFFERENT batches must remain separate islands, matching batch."""
    import bioframe_spark as bf

    src = tmp_path / "iv_stream2"
    src.mkdir()
    schema = "chrom string, start long, end long"
    b1 = [("chr1", 5, 5), ("chr1", 0, 3)]
    b2 = [("chr1", 5, 5), ("chr1", 3, 5)]
    spark.createDataFrame(b1, schema).coalesce(1).write.parquet(str(src / "f1"))
    spark.createDataFrame(b2, schema).coalesce(1).write.parquet(str(src / "f2"))
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", "1").parquet(str(src / "*")))
    snap = {}

    def capture(bdf, bid):
        pdf = bdf.toPandas()
        for chrom, grp in pdf.groupby("chrom"):
            snap[chrom] = sorted(
                (int(s), int(e), int(n))
                for s, e, n in zip(grp["start"], grp["end"],
                                   grp["n_intervals"]))

    q = (stream_ops.stream_merge(stream, min_dist=None)
         .writeStream.foreachBatch(capture).outputMode("update")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = sorted((c, s, e, n) for c, isl in snap.items() for s, e, n in isl)
    want_df = bf.merge(spark.createDataFrame(b1 + b2, schema), min_dist=None)
    want = sorted((r["chrom"], r["start"], r["end"], r["n_intervals"])
                  for r in want_df.collect())
    assert got == want


def test_stream_count_overlaps_static_live(spark, tmp_path):
    """Running per-annotation counts: final update-mode emission per
    annotation equals batch count_overlaps of everything streamed."""
    import bioframe_spark as bf

    src = tmp_path / "cnt_stream"
    src.mkdir()
    schema = "chrom string, start long, end long"
    b1 = [("chr1", 0, 10), ("chr1", 5, 25), ("chr2", 0, 100)]
    b2 = [("chr1", 20, 30), ("chr1", 8, 9), ("chr3", 0, 5)]
    spark.createDataFrame(b1, schema).coalesce(1).write.parquet(str(src / "f1"))
    spark.createDataFrame(b2, schema).coalesce(1).write.parquet(str(src / "f2"))
    ann = spark.createDataFrame(
        [("chr1", 0, 15), ("chr1", 22, 40), ("chr2", 50, 60),
         ("chr2", 500, 600)], schema)

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", "1").parquet(str(src / "*")))
    out = stream_ops.stream_count_overlaps_static(stream, ann)

    latest = {}

    def capture(bdf, bid):
        for r in bdf.collect():
            latest[(r["chrom"], r["start"], r["end"])] = r["count"]

    q = (out.writeStream.foreachBatch(capture).outputMode("update")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    want_df = bf.count_overlaps(ann, spark.createDataFrame(b1 + b2, schema))
    want = {(r["chrom"], r["start"], r["end"]): r["count"]
            for r in want_df.collect() if r["count"] > 0}
    assert latest == want
    # untouched annotation rows never emit
    assert ("chr2", 500, 600) not in latest


def test_stream_closest_static_live(spark, tmp_path):
    """Stateless nearest-annotation tagging: streamed rows (append per
    micro-batch) are row-identical to batch closest on the replayed
    stream — including null rows for chroms with no annotation and the
    (distance, start2, end2) tie rule the batch kernel applies."""
    import bioframe_spark as bf

    src = tmp_path / "closest_stream"
    src.mkdir()
    schema = "chrom string, start long, end long"
    b1 = [("chr1", 0, 10), ("chr1", 50, 60), ("chr3", 0, 5)]
    b2 = [("chr1", 12, 13), ("chr2", 7, 9), ("chr1", 50, 60)]
    spark.createDataFrame(b1, schema).coalesce(1).write.parquet(str(src / "f1"))
    spark.createDataFrame(b2, schema).coalesce(1).write.parquet(str(src / "f2"))
    ann = spark.createDataFrame(
        [("chr1", 11, 12), ("chr1", 12, 20), ("chr1", 100, 110),
         ("chr2", 0, 1)], schema)

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", "1").parquet(str(src / "*")))
    out = stream_ops.stream_closest_static(stream, ann, k=2)

    rows = []
    q = (out.writeStream
         .foreachBatch(lambda bdf, bid: rows.extend(
             tuple(r) for r in bdf.collect()))
         .outputMode("append").trigger(availableNow=True).start())
    assert q.awaitTermination(120), "stream did not finish"
    q.stop()

    want_df = bf.closest(spark.createDataFrame(b1 + b2, schema), ann, k=2,
                         suffixes=("", "_ann"))
    want = sorted(tuple(r) for r in want_df.collect())
    assert sorted(rows) == want


def test_stream_coverage_static_live(spark, tmp_path):
    """Running covered-bp per annotation: final update-mode emission
    equals the batch sum of per-row clipped lengths (documented
    double-count semantics — NOT merged coverage)."""
    src = tmp_path / "cov_stream"
    src.mkdir()
    schema = "chrom string, start long, end long"
    b1 = [("chr1", 0, 10), ("chr1", 5, 25), ("chr2", 0, 100)]
    b2 = [("chr1", 20, 30), ("chr1", 8, 9), ("chr3", 0, 5)]
    spark.createDataFrame(b1, schema).coalesce(1).write.parquet(str(src / "f1"))
    spark.createDataFrame(b2, schema).coalesce(1).write.parquet(str(src / "f2"))
    ann = spark.createDataFrame(
        [("chr1", 0, 15), ("chr1", 22, 40), ("chr2", 50, 60),
         ("chr2", 500, 600)], schema)

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", "1").parquet(str(src / "*")))
    out = stream_ops.stream_coverage_static(stream, ann)

    latest = {}
    q = (out.writeStream
         .foreachBatch(lambda bdf, bid: latest.update(
             {(r["chrom"], r["start"], r["end"]): r["covered_bp"]
              for r in bdf.collect()}))
         .outputMode("update").trigger(availableNow=True).start())
    assert q.awaitTermination(120), "stream did not finish"
    q.stop()

    # batch equivalent: per-row clipped lengths summed per annotation
    want = {}
    for (ac, as_, ae) in [("chr1", 0, 15), ("chr1", 22, 40),
                          ("chr2", 50, 60), ("chr2", 500, 600)]:
        tot = 0
        for (sc, ss, se) in b1 + b2:
            if sc == ac and ss < ae and as_ < se:
                tot += min(ae, se) - max(as_, ss)
        if tot:
            want[(ac, as_, ae)] = tot
    assert latest == want


def test_stream_gopher_filter_live(spark):
    """The Gopher quality filter (repetition signals + token features) is
    map-only, so it runs unchanged under Structured Streaming; stream
    verdicts must match the batch computation on the same texts."""
    from bioframe_spark.datapipe import text as T

    good = ("the cat sat and the dog ran for the hill in the sun "
            "it was that kind of day and all of them were happy "
            "more and more words keep this document long enough here "
            "extra filler tokens stretch the body to the bar now")
    bad = "too short"
    texts = F.when(F.col("value") % 2 == 0, F.lit(good)).otherwise(F.lit(bad))

    batch = spark.createDataFrame([(0, good), (1, bad)],
                                  "doc_id long, text string")
    want = {r["doc_id"] % 2: r["keep"] for r in
            T.gopher_quality_filter(batch, min_words=30).collect()}
    assert want == {0: True, 1: False}

    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", "100").load()
        .select(F.col("value").alias("doc_id"), texts.alias("text"))
    )
    out = T.gopher_quality_filter(stream, min_words=30).select("doc_id", "keep")
    q = (
        out.writeStream.format("memory").queryName("gopher_live")
        .outputMode("append").trigger(processingTime="1 second").start()
    )
    try:
        deadline = time.time() + 30
        got = {}
        while time.time() < deadline:
            got = {r["doc_id"] % 2: r["keep"] for r in
                   spark.sql("select doc_id, keep from gopher_live").collect()}
            if len(got) == 2:
                break
            time.sleep(1)
        assert got == want, got
    finally:
        q.stop()


def test_stream_complement_live(spark, tmp_path):
    """Live gaps snapshot: the final per-chrom snapshot must equal the
    batch bf.complement of every injected row against the same view;
    a chromosome driven to FULL coverage must overwrite its snapshot
    with the zero-width sentinel (no stale gaps)."""
    import bioframe_spark as bf
    from pyspark.sql import functions as F

    view = {"chr1": 400, "chr2": 100, "chrU": 50}
    src = tmp_path / "iv_stream_c"
    src.mkdir()
    batch1 = [("chr1", 0, 50), ("chr1", 100, 150), ("chr2", 0, 60),
              ("chrX", 0, 10)]          # chrX not in view: ignored
    batch2 = [("chr1", 40, 110), ("chr2", 50, 100)]  # chr2 fully covered
    schema = "chrom string, start long, end long"
    spark.createDataFrame(batch1, schema).coalesce(1).write.parquet(
        str(src / "f1"))
    spark.createDataFrame(batch2, schema).coalesce(1).write.parquet(
        str(src / "f2"))

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", "1")
              .parquet(str(src / "*")))
    out = stream_ops.stream_complement(stream, view)

    snap = {}

    def capture(bdf, bid):
        pdf = bdf.toPandas()
        for chrom, grp in pdf.groupby("chrom"):
            snap[chrom] = sorted(
                (int(s), int(e)) for s, e in zip(grp["start"], grp["end"])
                if s < e)  # zero-width sentinel clears the snapshot

    q = (out.writeStream.foreachBatch(capture).outputMode("update")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    got = sorted((c, s, e) for c, gaps in snap.items() for s, e in gaps)
    view_df = spark.createDataFrame(list(view.items()),
                                    "chrom string, length long")
    want_df = bf.complement(
        spark.createDataFrame(batch1 + batch2, schema),
        view_df={k: v for k, v in view.items()})
    # batch complement also emits full-view gaps for UNTOUCHED chroms
    # (chrU); the stream's contract is touched-chroms-only
    want = sorted((r["chrom"], r["start"], r["end"])
                  for r in want_df.collect() if r["chrom"] in snap)
    assert got == want
    assert snap["chr2"] == []          # fully covered -> snapshot cleared
    assert "chrX" not in snap and "chrU" not in snap


def test_stream_span_contamination_live(spark, tmp_path):
    # file stream of docs tagged against a static eval corpus; snapshot
    # must equal the batch run of the same operator
    import pandas as pd

    shared = "the quick brown fox jumps over the lazy dog"
    rows = [(1, "AA " + shared + " BB"), (2, "clean text with nothing shared here"),
            (3, shared), (4, None), (5, "xy")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    ev = spark.createDataFrame([(100, "zz " + shared + " qq")],
                               "doc_id long, text string")
    src = str(tmp_path / "docs_stream")
    for i, r in enumerate(rows):
        spark.createDataFrame([r], "doc_id long, text string") \
            .coalesce(1).write.mode("overwrite").parquet(f"{src}/f{i}")
    stream = (spark.readStream.schema("doc_id long, text string")
              .option("maxFilesPerTrigger", "1").parquet(src + "/*"))
    out = stream_ops.stream_span_contamination(stream, ev, k=10, w=4)
    got = []
    q = (out.writeStream
         .foreachBatch(lambda bdf, _b: got.extend(
             map(tuple, bdf.toPandas().itertuples(index=False))))
         .outputMode("append").trigger(availableNow=True).start())
    assert q.awaitTermination(120)
    q.stop()
    snap = {t[0]: t[1:] for t in got}
    batch = {r["doc_id"]: (r["n_spans"], r["n_contaminated"], r["contamination"])
             for r in stream_ops.stream_span_contamination(
                 docs, ev, k=10, w=4).collect()}
    norm = {k: tuple(None if pd.isna(x) else x for x in v)
            for k, v in snap.items()}
    assert norm == batch
    # semantic spot checks: the shared-run docs are contaminated, the
    # clean doc is 0, null/short are null-signaled
    assert batch[1][1] > 0 and batch[3][2] == 1.0
    assert batch[2][1] == 0
    assert batch[4] == (None, None, None)
    assert batch[5][0] == 0 and batch[5][2] is None
