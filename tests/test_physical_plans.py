"""Physical-plan assertions: the optimizations SCALING.md claims must be
visible in `.explain()` output — pushdown, pruning, broadcast, binning."""

import bioframe_spark as bf
from bioframe_spark.sources.fileops import to_parquet_partitioned
from helpers import ivals

from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_select_pushdown_partitioned(spark, tmp_path):
    d = ivals(spark, [(f"chr{i % 3}", j * 10, j * 10 + 5)
                      for i in range(3) for j in range(50)])
    path = str(tmp_path / "part_ivals")
    to_parquet_partitioned(d, path)
    df = spark.read.parquet(path)
    q = bf.select(df, "chr1:100-200").select("start", "end")
    plan = _plan(q)
    assert "PushedFilters: [" in plan and "LessThan(start,200)" in plan
    assert "PartitionFilters" in plan and "chr1" in plan
    # column pruning: only the projected+filter columns are read
    assert "ReadSchema: struct<start:bigint,end:bigint>" in plan


def test_overlap_small_side_broadcasts(spark, tmp_path):
    # plain path with a tiny parquet side (known stats) → Catalyst plans
    # a broadcast-hash join statically, not SMJ
    big = ivals(spark, [("chr1", i, i + 5) for i in range(0, 2000, 10)])
    small = ivals(spark, [("chr1", 100, 200)])
    bp, sp = str(tmp_path / "big"), str(tmp_path / "small")
    big.write.parquet(bp)
    small.write.parquet(sp)
    q = bf.overlap(spark.read.parquet(bp), spark.read.parquet(sp),
                   how="inner", strategy="plain")
    assert "BroadcastHashJoin" in _plan(q)
    assert "SortMergeJoin" not in _plan(q)


def test_binned_join_is_equi_on_chrom_bin(spark):
    a = ivals(spark, [("chr1", i, i + 5) for i in range(0, 500, 10)])
    b = ivals(spark, [("chr1", i, i + 7) for i in range(0, 500, 20)])
    q = bf.overlap(a, b, how="inner", strategy="binned", bin_size=50)
    plan = _plan(q)
    # join keys include the bin column → not a chrom-only join
    assert "__bin" in plan


def test_merge_partial_aggregation(spark):
    # the island-spans aggregation lives on the RANGED construction; the
    # auto path on a local frame now routes through the border-merge
    # windows (r6 adaptive post-fuse switch), which have no aggregate at
    # all — pin the two-stage (partial + final) hash aggregation on the
    # path that owns it
    d = ivals(spark, [("chr1", i, i + 5) for i in range(0, 300, 7)])
    plan = _plan(bf.merge(d, min_dist=0, premerge=False, range_width=50))
    assert plan.count("HashAggregate") >= 2
    # and the auto path on this unknown-stats local frame takes the
    # premerge + adaptive-classic route: window border merge, no agg
    assert "HashAggregate" not in _plan(bf.merge(d, min_dist=0))


def test_plain_overlap_no_probe_repartition_when_well_split(spark, tmp_path, monkeypatch):
    """A well-partitioned probe must NOT pay a round-robin shuffle before a
    broadcast join; an under-partitioned (single-file) probe must."""
    big = ivals(spark, [("chr1", i, i + 5) for i in range(0, 5000, 10)])
    small = ivals(spark, [("chr1", 100, 200)])
    bp, sp = str(tmp_path / "big2"), str(tmp_path / "small2")
    par = spark.sparkContext.defaultParallelism
    big.repartition(par * 2).write.parquet(bp)
    small.write.parquet(sp)
    q = bf.overlap(spark.read.parquet(bp), spark.read.parquet(sp),
                   how="inner", strategy="plain")
    plan = _plan(q)
    assert "BroadcastHashJoin" in plan
    assert "RoundRobinPartitioning" not in plan

    # under-partitioned probe: force "big" classification for the tiny
    # single-file table so the spread kicks in
    from bioframe_spark.operators import ops as _ops
    monkeypatch.setattr(_ops, "_BROADCAST_BYTES", 1)
    big.coalesce(1).write.parquet(str(tmp_path / "big1"))
    q1 = bf.overlap(spark.read.parquet(str(tmp_path / "big1")),
                    spark.read.parquet(sp), how="inner", strategy="plain")
    assert "RoundRobinPartitioning" in _plan(q1)


def test_binned_overlap_parallelism_guard_with_aqe(spark):
    """The binned probe exchange is REPARTITION_BY_NUM (exempt from AQE
    coalescing) so high-fanout/small-bytes inputs keep their task count."""
    a = ivals(spark, [("chr1", i, i + 5) for i in range(0, 500, 10)])
    b = ivals(spark, [("chr1", i, i + 7) for i in range(0, 500, 20)])
    q = bf.overlap(a, b, how="inner", strategy="binned", bin_size=50)
    par = spark.sparkContext.defaultParallelism
    plan = _plan(q)
    assert f"REPARTITION_BY_NUM" in plan or "RepartitionByExpression" in _optimized(q)
    # the explicit numPartitions survives into the exchange
    assert str(par * 2) in plan


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Two tables bucketed by chrom into the same bucket count must join
    without ANY Exchange in the physical plan — the co-located layout
    write_bucketed exists to produce."""
    from pyspark.sql import functions as F

    from bioframe_spark.sources.fileops import write_bucketed

    a = ivals(spark, [("chr%d" % (i % 3), i * 10, i * 10 + 5)
                      for i in range(60)])
    b = ivals(spark, [("chr%d" % (i % 3), i * 7, i * 7 + 4)
                      for i in range(60)])
    write_bucketed(a, "bucketed_a", num_buckets=4,
                   path=str(tmp_path / "a"))
    write_bucketed(b, "bucketed_b", num_buckets=4,
                   path=str(tmp_path / "b"))
    # force the big-table join regime (tiny test tables would otherwise
    # broadcast, and the planner disables bucketed scans for broadcasts)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        ta = spark.table("bucketed_a")
        tb = spark.table("bucketed_b").select(
            F.col("chrom").alias("chrom2"),
            F.col("start").alias("start2"), F.col("end").alias("end2"))
        joined = ta.join(
            tb,
            (ta["chrom"] == tb["chrom2"])
            & (ta["start"] < tb["end2"]) & (tb["start2"] < ta["end"]),
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "Bucketed: true" in plan, plan
        assert joined.count() > 0
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS bucketed_a")
        spark.sql("DROP TABLE IF EXISTS bucketed_b")


def test_prebinned_bucketed_overlap_no_exchange(spark, tmp_path):
    """The recurring-binned-join layout: with_bin tables persisted
    bucketBy(chrom, bin) + sortBy(start, end) must feed
    overlap_prebinned with ZERO Exchange — the explode AND the shuffle
    of the keystone binned join paid once at write time — and the pair
    set must equal overlap(strategy='binned', how='inner')."""
    from pyspark.sql import functions as F

    import bioframe_spark as bf
    from bioframe_spark.sources.fileops import write_bucketed

    a = ivals(spark, [("chr%d" % (i % 3), i * 10, i * 10 + 25)
                      for i in range(80)])
    b = ivals(spark, [("chr%d" % (i % 3), i * 7, i * 7 + 4)
                      for i in range(80)])
    BIN = 64
    write_bucketed(bf.with_bin(a, BIN), "prebinned_a", num_buckets=4,
                   bucket_cols=("chrom", "bin"),
                   path=str(tmp_path / "a"))
    write_bucketed(bf.with_bin(b, BIN), "prebinned_b", num_buckets=4,
                   bucket_cols=("chrom", "bin"),
                   path=str(tmp_path / "b"))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bf.overlap_prebinned(spark.table("prebinned_a"),
                                      spark.table("prebinned_b"),
                                      suffixes=("", "_b"))
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "Bucketed: true" in plan, plan
        got = sorted((r["chrom"], r["start"], r["start_b"])
                     for r in joined.collect())
        want_df = bf.overlap(a, b, how="inner", suffixes=("", "_b"),
                             strategy="binned", bin_size=BIN)
        want = sorted((r["chrom"], r["start"], r["start_b"])
                      for r in want_df.collect())
        assert got == want and len(got) > 0
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS prebinned_a")
        spark.sql("DROP TABLE IF EXISTS prebinned_b")


# --- datapipe plan shapes -------------------------------------------------

def _docs(spark, n=200):
    rows = [(i, f"alpha beta gamma delta {i % 7} epsilon zeta") for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_deterministic_sample_is_map_only(spark, tmp_path):
    # hash sampling must be a pure filter over the scan: no Exchange, no
    # aggregation — the property that makes it retry/repartition-stable
    # AND zero-shuffle at 100 TB
    from bioframe_spark.datapipe.sampling import deterministic_sample
    p = str(tmp_path / "docs")
    _docs(spark).write.parquet(p)
    q = deterministic_sample(spark.read.parquet(p), fraction=0.25, key_col="doc_id")
    plan = _plan(q)
    assert "Exchange" not in plan
    assert "HashAggregate" not in plan


def test_train_val_split_is_map_only(spark, tmp_path):
    from bioframe_spark.datapipe.sampling import train_val_split
    p = str(tmp_path / "docs2")
    _docs(spark).write.parquet(p)
    tagged = train_val_split(spark.read.parquet(p), val_fraction=0.1,
                             key_col="doc_id")
    assert "Exchange" not in _plan(tagged)
    assert "Exchange" not in _plan(tagged.filter("split = 'val'"))


def test_exact_dedup_single_shuffle(spark, tmp_path):
    # one Exchange (the digest groupBy) with map-side partial aggregation
    from bioframe_spark.datapipe.dedup import exact_duplicates
    p = str(tmp_path / "docs3")
    _docs(spark).write.parquet(p)
    plan = _plan(exact_duplicates(spark.read.parquet(p)))
    assert plan.count("Exchange") == 1
    assert plan.count("HashAggregate") >= 2  # partial + final


def test_minhash_signatures_no_shuffle(spark, tmp_path):
    # signatures are per-row array transforms — no explode, no groupBy;
    # the only allowed Exchange is the spread-guard round-robin when the
    # scan arrives underpartitioned (single-row-group files), which is
    # RoundRobinPartitioning, never a hash/range shuffle
    from bioframe_spark.datapipe.dedup import minhash_signatures
    p = str(tmp_path / "docs4")
    _docs(spark).write.parquet(p)
    plan = _plan(minhash_signatures(spark.read.parquet(p), num_hashes=8))
    assert "hashpartitioning" not in plan.lower()
    assert "rangepartitioning" not in plan.lower()
    assert "HashAggregate" not in plan


def test_minhash_filter_not_pushed_below_spread(spark, tmp_path):
    # regression: the no-shingle row filter used to be phrased on the
    # derived hash array, and Catalyst pushed that deterministic
    # predicate below the spread repartition — evaluating the whole
    # shingle+hash tree in the single-task scan stage. The row filter
    # must stay cheap (raw token count) below the exchange; everything
    # hash-like must sit above it.
    from bioframe_spark.datapipe.dedup import minhash_signatures
    p = str(tmp_path / "docs_spread")
    _docs(spark).coalesce(1).write.parquet(p)
    plan = _plan(minhash_signatures(spark.read.parquet(p), num_hashes=8,
                                    hash_fn="md5"))
    import re
    m = re.search(r"Exchange RoundRobinPartitioning", plan)
    assert m, "spread repartition missing for a 1-partition scan"
    below = plan[m.start():]  # printed subtree under the exchange
    for needle in ("md5", "xxhash64", "array_min"):
        assert needle not in below, (
            f"hash expression {needle!r} below the spread exchange")


def test_ivf_index_probe_is_partition_pruned(spark, tmp_path):
    # The persisted IVF index: posting lists are cent_id parquet
    # partitions; a probe joins the (broadcast) assigned-query side on
    # the partition column, so Spark's dynamic partition pruning must
    # drop unprobed posting lists AT THE SCAN — that is the scan-bytes
    # ~n_probe/n_centroids claim. Results must be bit-identical to the
    # direct ivf_topk with the same parameters.
    from bioframe_spark.datapipe import similarity

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qs = emb.filter(F.col("vec_id") < 6)
    path = str(tmp_path / "ivf_index")
    similarity.build_ivf_index(emb, path, n_centroids=8, train_iters=1)
    indexed = similarity.ivf_topk_indexed(qs, path, k=3, n_probe=2)
    assert "dynamicpruning" in _plan(indexed).lower()
    direct = similarity.ivf_topk(emb.filter(F.col("vec_id") < 6), emb,
                                 k=3, n_centroids=8, n_probe=2,
                                 train_iters=1)
    assert sorted(map(tuple, indexed.collect())) == \
        sorted(map(tuple, direct.collect()))


def test_redact_is_map_only(spark, tmp_path):
    # the PII scrub is a chain of regexp projections — zero Exchange
    from bioframe_spark.datapipe import text as tx
    p = str(tmp_path / "docs_redact")
    _docs(spark).write.parquet(p)
    plan = _plan(tx.redact_pii(tx.redaction_counts(spark.read.parquet(p))))
    assert "Exchange" not in plan


def test_boilerplate_anti_join_broadcasts(spark, tmp_path):
    # the repeated-line set is small by construction: the scrub join
    # back must be a broadcast LEFT ANTI, never a shuffled one
    import re
    from bioframe_spark.datapipe import text as tx
    p = str(tmp_path / "docs_boiler")
    _docs(spark).write.parquet(p)
    plan = _plan(tx.remove_boilerplate_lines(spark.read.parquet(p)))
    assert re.search(r"BroadcastHashJoin.*LeftAnti", plan)
    assert not re.search(r"SortMergeJoin.*LeftAnti", plan)


def test_dup_spans_single_kernel_two_exchanges(spark, tmp_path):
    # the §12-r06c contract: ONE Python kernel stage (pre-exploded
    # emission), window on the fingerprint + per-doc rollup = exactly
    # two Exchanges, no join, no InMemoryRelation (nothing to cache)
    from bioframe_spark.datapipe import dedup as ddp

    p = str(tmp_path / "docs")
    _docs(spark).write.parquet(p)
    plan = _plan(ddp.duplicate_spans(spark.read.parquet(p), k=10, w=4))
    assert plan.count("MapInPandas") + plan.count("mapInPandas") == 1, plan
    # two hash exchanges (fingerprint window + per-doc rollup); at most
    # one additional round-robin from the under-split-scan spread
    assert plan.count("Exchange hashpartitioning") == 2, plan
    assert plan.count("Exchange roundrobin") <= 1, plan
    for op in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
               "InMemoryRelation"):
        assert op not in plan, plan


def test_bm25_broadcast_term_stats(spark, tmp_path):
    # term document-frequencies re-enter via broadcast; the matching-row
    # explode is bounded by the query vocabulary (array filtered BEFORE
    # the generator)
    from bioframe_spark.datapipe import ranking as rk

    p = str(tmp_path / "docs_bm")
    _docs(spark).write.parquet(p)
    q = rk.bm25_scores(spark.read.parquet(p), "alpha zeta")
    plan = _plan(q)
    assert "BroadcastHashJoin" in plan, plan
    opt = _optimized(q)
    # the generator input is the FILTERED array, not the raw token split
    assert "explode" in opt and "array_contains" in opt, opt


def test_vocab_topk_is_take_ordered(spark, tmp_path):
    # top-n must compile to TakeOrderedAndProject (per-partition heaps),
    # never a global Sort of the vocabulary
    from bioframe_spark.datapipe import ranking as rk

    p = str(tmp_path / "docs_v")
    _docs(spark).write.parquet(p)
    plan = _plan(rk.vocab_topk(spark.read.parquet(p), n=5))
    assert "TakeOrderedAndProject" in plan, plan
    assert "Sort " not in plan.replace("TakeOrderedAndProject", ""), plan
