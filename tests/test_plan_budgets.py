"""Shuffle budgets: each headline operator's physical plan must not
exceed its known Exchange count. A new Exchange in one of these plans
is a shuffle regression (an extra pass over the data at 100 TB) that
row-level correctness tests cannot see. Budgets are upper bounds —
tightening a plan won't fail them.
"""

import re

import pytest

import bioframe_spark as bf
from bioframe_spark.datapipe import dedup, sampling, text
from helpers import ivals


def n_exchanges(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    # count SHUFFLE exchanges only: BroadcastExchange ships a small
    # build side, ReusedExchange shares a prior shuffle — neither adds
    # a pass over the big data
    return len(re.findall(r"\bExchange (hash|range|RoundRobin|Single)",
                          plan))


@pytest.fixture(scope="module")
def frames(spark, tmp_path_factory):
    # parquet-backed so Catalyst has real (small) stats: raw
    # createDataFrame frames are LogicalRDDs with UNKNOWN size, and
    # unknown deliberately routes to the ranged/binned scale paths —
    # these budgets pin the default small-input plans
    root = tmp_path_factory.mktemp("budget_frames")
    a = ivals(spark, [("chr1", i, i + 6) for i in range(0, 600, 10)]
              + [("chr2", i, i + 4) for i in range(0, 300, 7)])
    b = ivals(spark, [("chr1", i, i + 9) for i in range(0, 600, 25)])
    docs = spark.createDataFrame(
        [(i, f"tok{i % 9} alpha beta gamma delta {i % 5} end") for i in range(300)],
        "doc_id long, text string")
    out = []
    for name, df in (("a", a), ("b", b), ("docs", docs)):
        p = str(root / name)
        df.write.parquet(p)
        out.append(spark.read.parquet(p))
    return tuple(out)


def test_overlap_budgets(spark, frames):
    a, b, _ = frames
    # binned: explode both sides + shuffle to the merge join = bounded
    assert n_exchanges(bf.overlap(a, b, how="inner", strategy="binned",
                                  bin_size=64)) <= 3
    # plain with a broadcastable side: at most the spread repartition
    assert n_exchanges(bf.overlap(a, b, how="inner", strategy="plain")) <= 1
    # outer variants, default window path: the bin join must execute
    # ONCE — one extra window exchange per outer side, never a
    # re-executed join
    left = bf.overlap(a, b, how="left", strategy="binned", bin_size=64)
    assert n_exchanges(left) <= 4
    assert _scans(left) <= 3
    outer = bf.overlap(a, b, how="outer", strategy="binned", bin_size=64)
    assert n_exchanges(outer) <= 5
    assert _scans(outer) <= 4


def test_overlap_outer_anti_path_budgets(spark, frames):
    # the skew-safe semi/anti reconstruction pays two extra column-pruned
    # input passes (the semi's exchanges don't canonicalize equal to the
    # pair join's — different pruned schemas — so no ReusedExchange) but
    # must NEVER re-execute the fanout pair join: budget = pair join
    # (2 ex / 2 scans) + semi (2 ex / 2 scans, narrow) + anti (1-2 ex,
    # 1 scan) per outer side
    a, b, _ = frames
    spark.conf.set("spark.bioframe.outerPath", "anti")
    try:
        left = bf.overlap(a, b, how="left", strategy="binned", bin_size=64)
        assert n_exchanges(left) <= 6
        assert _scans(left) <= 5
        outer = bf.overlap(a, b, how="outer", strategy="binned", bin_size=64)
        assert n_exchanges(outer) <= 9
        assert _scans(outer) <= 8
    finally:
        spark.conf.unset("spark.bioframe.outerPath")


def _scans(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("FileScan parquet")


def test_window_family_budgets(spark, frames):
    a, b, _ = frames
    assert n_exchanges(bf.merge(a, min_dist=0)) <= 2        # distinct + window
    # broadcast kernels: df2 under the broadcast bound -> map-only over
    # df1 (ZERO shuffles, one scan; df1 may be arbitrarily large)
    assert n_exchanges(bf.coverage(a, a)) == 0
    assert _scans(bf.coverage(a, a)) <= 1
    assert n_exchanges(bf.count_overlaps(a, a)) == 0
    assert _scans(bf.count_overlaps(a, a)) <= 1
    from pyspark.sql import functions as _F
    a_str = a.withColumn("strand", _F.lit("+"))
    assert n_exchanges(bf.count_overlaps(a_str, a_str, on=["strand"])) == 0
    # closest against a broadcast-bound annotation side: map-only too
    assert n_exchanges(bf.closest(a, b)) == 0
    assert _scans(bf.closest(a, b)) <= 1
    # forced join formulations keep their historical budgets
    assert n_exchanges(bf.coverage(a, a, strategy="plain")) <= 3
    assert n_exchanges(bf.count_overlaps(a, a, strategy="plain")) <= 3
    # cluster repeats the islands subtree once per consumer (exchange
    # reuse does NOT fire across these branches, verified empirically) —
    # its budget ratchets the consumer count: islands join-back + the
    # tiny counts aggregate, spans via window, null numbering from
    # counts. 9 shuffles / 5 scans as of the round-3 plan cuts.
    cl = bf.cluster(a, min_dist=0)
    assert n_exchanges(cl) <= 10
    plan = cl._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan parquet") <= 6


def test_datapipe_budgets(spark, frames):
    _, _, docs = frames
    assert n_exchanges(dedup.exact_duplicates(docs)) <= 2   # spread + groupBy
    assert n_exchanges(
        sampling.deterministic_sample(docs, 0.5, key_col="doc_id")) == 0
    assert n_exchanges(text.quality_features(docs)) == 0
    assert n_exchanges(
        dedup.minhash_signatures(docs, num_hashes=8)) <= 1  # spread only
    # banded LSH end-to-end: spread + bucket join pair + final distinct
    assert n_exchanges(dedup.minhash_lsh_pairs(
        docs, num_hashes=8, bands=4, threshold=0.5)) <= 5


def _final_plan(df) -> str:
    """EXECUTED plan, final section only — AQE's toString appends an
    '== Initial Plan ==' copy that double-counts every operator."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.split("== Initial Plan ==")[0]


def test_span_dup_pairs_single_kernel_pass(spark, frames):
    """The winnow kernel must execute ONCE per query. The first
    formulation fed it to the df-cutoff aggregate, a semi-join, and
    both self-join sides — 4 MapInPandas executions of the op's
    dominant cost (the md5 gram loop). The single-consumer rewrite
    (pre-exploded emission -> one exchange on the fingerprint -> window
    cutoff -> self-join whose second side is a ReusedExchange) pays the
    kernel exactly once; the replay is shuffle files, not Python."""
    _, _, docs = frames
    p = dedup.span_dup_pairs(docs, k=10, w=4)
    p.collect()  # materialize THIS df so AQE finalizes ITS plan
    plan = _final_plan(p)
    assert "isFinalPlan=true" in plan, plan
    assert plan.count("MapInPandas") == 1, plan
    assert plan.count("ReusedExchange") >= 1, plan


def test_span_removal_two_kernel_passes(spark, frames):
    """remove_duplicate_spans runs exactly TWO Python stages — the
    position kernel (once: the window formulation folds the distinct-
    doc count and keeper into the one fingerprint exchange) and the cut
    kernel. The aggregate+join formulation executed the position kernel
    under both the agg and the join probe side (caught by
    tools/plan_audit.py)."""
    _, _, docs = frames
    out = dedup.remove_duplicate_spans(docs, k=10, w=4)
    out.collect()
    plan = _final_plan(out)
    assert "isFinalPlan=true" in plan, plan
    assert plan.count("MapInPandas") == 2, plan


def test_ann_lsh_single_bucket_kernel_per_side(spark):
    """The LSH bucket kernel runs ONCE per join side. Without the
    non-nullable coalesce the inner join pushes isnotnull(bucket) below
    the projection and the extraction pass evaluates the kernel twice
    per side (4 ArrowEvalPython in the executed plan — r8 plan-audit
    catch); the sentinel makes that filter constant-fold away."""
    import numpy as np

    from bioframe_spark.datapipe import similarity

    rng = np.random.default_rng(2)
    emb = spark.createDataFrame(
        [(i, rng.normal(size=8).tolist()) for i in range(60)],
        "vec_id long, embedding array<double>")
    out = similarity.lsh_bucketed_topk(
        emb.filter("vec_id < 5"), emb, k=3, n_planes=4, dim=8)
    out.collect()
    plan = _final_plan(out)
    assert plan.count("ArrowEvalPython") == 2, plan
