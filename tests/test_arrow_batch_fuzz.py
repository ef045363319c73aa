"""Adversarial Arrow batching for the broadcast-kernel family (r5 #10).

The coverage/count_overlaps kernels group each Arrow batch by chrom
internally, and the closest/cluster kernels group per-batch pandas
frames — batch INDEPENDENCE is the correctness claim: any slicing of
df1's rows into batches must give byte-identical results. Pin it by
forcing pathological batch boundaries via
``spark.sql.execution.arrow.maxRecordsPerBatch`` = 1..3 on inputs shaped
to interleave chromosomes across batch edges.
"""

import pytest
from pyspark.sql import functions as F

import bioframe_spark as bf

from helpers import ivals, rows


SHAPES = {
    # every row a different chrom: each tiny batch sees k distinct groups
    "interleave": [(f"chr{i % 3}", i * 7, i * 7 + 10) for i in range(40)],
    # one chromosome only: batches split a single group repeatedly
    "one-chrom": [("chr1", i * 5, i * 5 + 12) for i in range(40)],
    # duplicates + touching + contained + null coords
    "degenerate": [("chr1", 0, 10), ("chr1", 0, 10), ("chr1", 10, 20),
                   ("chr1", 3, 4), ("chr2", 0, 1), ("chr2", 0, 0),
                   (None, 1, 2), ("chr1", None, None)] * 3,
}

ANN = [("chr0", 0, 100), ("chr1", 5, 40), ("chr1", 60, 80),
       ("chr2", 0, 1), ("chr2", 0, 0)]


@pytest.fixture()
def tiny_batches(spark):
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    yield lambda n: spark.conf.set(
        "spark.sql.execution.arrow.maxRecordsPerBatch", str(n))
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)


@pytest.mark.parametrize("shape", list(SHAPES))
@pytest.mark.parametrize("batch", [1, 2, 3])
def test_coverage_count_kernels_batch_independent(spark, tiny_batches,
                                                  shape, batch):
    d1 = ivals(spark, SHAPES[shape])
    d2 = ivals(spark, ANN)
    # reference rows from the join formulations at default batching
    exp_cov = rows(bf.coverage(d1, d2, strategy="binned"))
    exp_cnt = rows(bf.count_overlaps(d1, d2, strategy="plain"))
    tiny_batches(batch)
    assert rows(bf.coverage(d1, d2)) == exp_cov
    assert rows(bf.count_overlaps(d1, d2)) == exp_cnt


@pytest.mark.parametrize("shape", list(SHAPES))
@pytest.mark.parametrize("batch", [1, 3])
def test_closest_broadcast_batch_independent(spark, tiny_batches,
                                             shape, batch):
    d1 = ivals(spark, SHAPES[shape])
    d2 = ivals(spark, ANN)
    exp = rows(bf.closest(d1, d2, suffixes=("", "_x"), strategy="cogroup"))
    tiny_batches(batch)
    got = rows(bf.closest(d1, d2, suffixes=("", "_x"), strategy="broadcast"))
    assert got == exp


@pytest.mark.parametrize("batch", [1, 3])
def test_cluster_premerge_batch_independent(spark, tiny_batches, batch):
    """_premerge_local collapses islands PER BATCH — 1-row batches mean
    no local collapse at all; the global pass must still produce the
    classic ids/spans."""
    data = (SHAPES["interleave"] + SHAPES["one-chrom"]
            + [("chr1", None, None), (None, 0, 5)])
    d = ivals(spark, data)
    exp = rows(bf.cluster(d, min_dist=0, premerge=False, range_width=None))
    tiny_batches(batch)
    assert rows(bf.cluster(d, min_dist=0, premerge=True)) == exp
    assert rows(bf.merge(d, min_dist=0, premerge=True)) == rows(
        bf.merge(d, min_dist=0, premerge=False, range_width=None))


def test_kernels_empty_df1(spark, tiny_batches):
    d1 = ivals(spark, []).filter(F.lit(False))
    d2 = ivals(spark, ANN)
    tiny_batches(1)
    assert bf.coverage(d1, d2).count() == 0
    assert bf.count_overlaps(d1, d2).count() == 0
    assert bf.closest(d1, d2, strategy="broadcast").count() == 0


@pytest.mark.parametrize("batch", [1, 2, 3])
def test_winnow_kernel_batch_independent(spark, tiny_batches, batch):
    # the winnow kernel is per-row by construction — pin it anyway: any
    # batch slicing must reproduce the expression path bit-for-bit
    from bioframe_spark.datapipe import dedup as ddp

    docs = spark.createDataFrame(
        [(1, "aaaaabbbbbcccccdddddeeeee"),
         (2, "aaaaabbbbbcccccdddddeeeee"),
         (3, "xx aaaaabbbbbcccccdddddeeeee yy"),
         (4, None), (5, "tiny"), (6, "exactly-k-chars-doc!!")],
        "doc_id long, text string")
    exp = sorted(map(tuple, ddp._winnow_fingerprints_expr(docs, k=10, w=4)
                     .select("doc_id", F.explode("fingerprints")).collect()))
    tiny_batches(batch)
    got = sorted(map(tuple, ddp.winnow_fingerprints(docs, k=10, w=4)
                     .select("doc_id", F.explode("fingerprints")).collect()))
    assert got == exp
    stats = {r["doc_id"]: (r["n_spans"], r["n_dup_spans"])
             for r in ddp.duplicate_spans(docs, k=10, w=4).collect()}
    assert stats[4] == (None, None) and stats[5] == (0, 0)
    assert stats[1][1] > 0 and stats[2][1] > 0
