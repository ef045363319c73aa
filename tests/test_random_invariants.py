"""Randomized differential/invariant tests (FIXTURES.md §2 generator).

Cross-operator consistency on seeded random intervals — the role the
pyranges cross-check plays in the reference test suite
(tests/test_ops.py:11-50, commented out there; live here).
"""

import numpy as np
import pytest

import bioframe_spark as bf
from bioframe_spark.core import checks

from pyspark.sql import functions as F


def random_intervals(spark, n, n_chroms=3, max_coord=1000, max_length=30, seed=0):
    rng = np.random.default_rng(seed)
    chroms = [f"chr{i}" for i in rng.integers(0, n_chroms, n)]
    starts = rng.integers(0, max_coord, n)
    lengths = rng.integers(1, max_length, n)
    rows = [
        (c, int(s), int(s + l))
        for c, s, l in zip(chroms, starts, lengths)
    ]
    return spark.createDataFrame(rows, "chrom string, start long, end long")


@pytest.fixture(scope="module")
def rand1(spark):
    return random_intervals(spark, 300, seed=1).cache()


@pytest.fixture(scope="module")
def rand2(spark):
    return random_intervals(spark, 200, seed=2).cache()


def test_merge_idempotent(rand1):
    m1 = bf.merge(rand1, min_dist=0).select("chrom", "start", "end")
    m2 = bf.merge(m1, min_dist=0).select("chrom", "start", "end")
    assert sorted(map(tuple, m1.collect())) == sorted(map(tuple, m2.collect()))
    assert not checks.is_overlapping(m1)


def test_merge_preserves_total_count(rand1):
    total = bf.merge(rand1, min_dist=0).agg(F.sum("n_intervals")).collect()[0][0]
    assert total == rand1.count()


def test_complement_of_complement_is_merge(spark, rand1):
    view = {f"chr{i}": 1100 for i in range(3)}
    comp = bf.complement(rand1, view_df=view)
    comp2 = bf.complement(comp.select("chrom", "start", "end"), view_df=view)
    merged = bf.merge(rand1, min_dist=0)
    # complement∘complement = merge clipped to the view (min_dist=0 fuses
    # abutting intervals in both paths)
    got = sorted((r["chrom"], r["start"], min(r["end"], 1100)) for r in merged.collect())
    want = sorted((r["chrom"], r["start"], r["end"]) for r in comp2.collect())
    assert got == want


def test_coverage_equals_overlap_span_sum(rand1, rand2):
    cov = bf.coverage(rand1, rand2)
    total_cov = cov.agg(F.sum("coverage")).collect()[0][0]
    merged2 = bf.merge(rand2, min_dist=0).select("chrom", "start", "end")
    ov = bf.overlap(rand1, merged2, how="inner", return_overlap=True)
    total_ov = ov.agg(
        F.sum(F.col("overlap_end") - F.col("overlap_start"))
    ).collect()[0][0]
    assert total_cov == total_ov


def test_count_overlaps_equals_join_count(rand1, rand2):
    total = bf.count_overlaps(rand1, rand2).agg(F.sum("count")).collect()[0][0]
    pairs = bf.overlap(rand1, rand2, how="inner").count()
    assert total == pairs


def test_setdiff_plus_semijoin_partition(rand1, rand2):
    n_diff = bf.setdiff(rand1, rand2).count()
    n_hit = bf.count_overlaps(rand1, rand2).filter("count > 0").count()
    assert n_diff + n_hit == rand1.count()


def test_subtract_then_coverage_zero(rand1, rand2):
    sub = bf.subtract(rand1, rand2)
    cov = bf.coverage(sub, rand2)
    assert cov.agg(F.sum("coverage")).collect()[0][0] == 0


def test_binned_matches_plain_random(rand1, rand2):
    p = bf.overlap(rand1, rand2, how="outer", strategy="plain")
    b = bf.overlap(rand1, rand2, how="outer", strategy="binned", bin_size=64)
    key = lambda df: sorted(
        tuple((v is None, v) for v in row) for row in map(tuple, df.collect())
    )
    assert key(p) == key(b)


def test_pileup_total_mass(rand1):
    # sum(depth * seg_len) == total interval length
    seg = bf.pileup(rand1)
    mass = seg.agg(F.sum(F.col("depth") * (F.col("end") - F.col("start")))).collect()[0][0]
    total = rand1.agg(F.sum(F.col("end") - F.col("start"))).collect()[0][0]
    assert mass == total


def test_closest_distance_lower_bound(rand1, rand2):
    out = bf.closest(rand1, rand2, k=1).filter("chrom_ is not null")
    bad = out.filter(
        "distance != greatest(0, greatest(start, start_) - least(end, end_))"
    ).count()
    assert bad == 0

@pytest.mark.parametrize("min_dist", [None, 0, 5])
@pytest.mark.parametrize("width", [16, 100, 10_000])
def test_ranged_merge_matches_classic(spark, rand1, min_dist, width):
    classic = bf.merge(rand1, min_dist=min_dist)
    ranged = bf.merge(rand1, min_dist=min_dist, range_width=width)
    key = lambda df: sorted(map(tuple, df.collect()))
    assert key(classic) == key(ranged)


def test_ranged_merge_duplicates_and_long_spans(spark):
    # a long interval covering several ranges must bridge islands across
    # range boundaries; duplicates must count correctly
    rows_ = [("chr1", 0, 5), ("chr1", 0, 5), ("chr1", 40, 45),
             ("chr1", 2, 95), ("chr1", 60, 70), ("chr1", 200, 210)]
    d = spark.createDataFrame(rows_, "chrom string, start long, end long")
    classic = bf.merge(d, min_dist=0)
    ranged = bf.merge(d, min_dist=0, range_width=10)
    key = lambda df: sorted(map(tuple, df.collect()))
    assert key(classic) == key(ranged)
    assert key(ranged) == sorted([("chr1", 0, 95, 5), ("chr1", 200, 210, 1)])


@pytest.mark.parametrize("width", [16, 100])
def test_ranged_cluster_matches_classic(spark, rand1, width):
    classic = bf.cluster(rand1, min_dist=0)
    ranged = bf.cluster(rand1, min_dist=0, range_width=width)
    key = lambda df: sorted(map(tuple, df.collect()))
    assert key(classic) == key(ranged)


@pytest.mark.parametrize("width", [16, 100, 10_000])
def test_ranged_pileup_matches_classic(spark, rand1, width):
    classic = bf.pileup(rand1)
    ranged = bf.pileup(rand1, range_width=width)
    key = lambda df: sorted(map(tuple, df.collect()))
    assert key(classic) == key(ranged)
    # keep_zero variant too (exercises the cross-range lead stitch on
    # zero-depth runs)
    kc = bf.pileup(rand1, keep_zero=True)
    kr = bf.pileup(rand1, keep_zero=True, range_width=width)
    assert key(kc) == key(kr)


@pytest.mark.parametrize("width", [16, 100, 10_000])
def test_ranged_complement_matches_classic(spark, rand1, width):
    view = {f"chr{i}": 600 for i in range(3)}
    classic = bf.complement(rand1, view_df=view)
    ranged = bf.complement(rand1, view_df=view, range_width=width)
    key = lambda df: sorted(map(tuple, df.collect()))
    assert key(classic) == key(ranged)


def test_ranged_complement_long_spans_and_empty_regions(spark):
    rows_ = [("chr1", 2, 95), ("chr1", 40, 45), ("chr1", 200, 210)]
    d = spark.createDataFrame(rows_, "chrom string, start long, end long")
    view = {"chr1": 300, "chrEmpty": 50}
    classic = bf.complement(d, view_df=view)
    ranged = bf.complement(d, view_df=view, range_width=10)
    key = lambda df: sorted(map(tuple, df.collect()))
    assert key(classic) == key(ranged)
    assert ("chrEmpty", 0, 50, "chrEmpty") in key(ranged)
