"""Golden tests: merge / cluster / complement / trim / assign_view /
expand / select / sort_bedframe."""

import pytest
from helpers import ivals, rows

import bioframe_spark as bf

D1 = [
    ("chr1", 1, 5),
    ("chr1", 3, 8),
    ("chr1", 6, 6),    # point inside [3,8)
    ("chr1", 8, 10),
    ("chr1", 12, 14),
    ("chr2", 4, 10),
]


@pytest.fixture(scope="module")
def d1(spark):
    return ivals(spark, D1)


def test_merge_strict(d1):
    got, _ = rows(bf.merge(d1, min_dist=None))  # cols: chrom, end, n_intervals, start
    assert got == sorted(
        [("chr1", 8, 3, 1), ("chr1", 10, 1, 8), ("chr1", 14, 1, 12), ("chr2", 10, 1, 4)]
    )


def test_merge_dist0(d1):
    got, _ = rows(bf.merge(d1, min_dist=0))
    assert got == sorted([("chr1", 10, 4, 1), ("chr1", 14, 1, 12), ("chr2", 10, 1, 4)])


def test_merge_min_dist(d1):
    got, _ = rows(bf.merge(d1, min_dist=2))
    assert got == sorted([("chr1", 14, 5, 1), ("chr2", 10, 1, 4)])


def test_merge_abutting_points():
    pass  # covered by strict-vs-0 distinction above


def test_merge_null_passthrough(spark):
    d = ivals(spark, [("chr1", 1, 5), (None, None, None), ("chr1", 4, 8)])
    got, _ = rows(bf.merge(d, min_dist=0))
    assert got == [("chr1", 8, 2, 1), (None, None, None, None)]


def test_cluster_ids(d1):
    out = bf.cluster(d1, min_dist=0)
    got = {(r["chrom"], r["start"], r["end"]): (r["cluster"], r["cluster_start"], r["cluster_end"])
           for r in out.collect()}
    # groups ordered (chr1, chr2); islands within group by start
    assert got[("chr1", 1, 5)] == (0, 1, 10)
    assert got[("chr1", 3, 8)] == (0, 1, 10)
    assert got[("chr1", 6, 6)] == (0, 1, 10)
    assert got[("chr1", 8, 10)] == (0, 1, 10)
    assert got[("chr1", 12, 14)] == (1, 12, 14)
    assert got[("chr2", 4, 10)] == (2, 4, 10)


def test_cluster_strict_on_key(spark):
    d = ivals(
        spark,
        [("chr1", 1, 5, "+"), ("chr1", 3, 8, "+"), ("chr1", 4, 6, "-")],
        extra=[("strand", "string")],
    )
    out = bf.cluster(d, min_dist=0, on=["strand"])
    got = {(r["start"], r["strand"]): r["cluster"] for r in out.collect()}
    # groups sorted: (chr1,+) then (chr1,-)
    assert got[(1, "+")] == 0 and got[(3, "+")] == 0 and got[(4, "-")] == 1


def test_complement_default_view(d1):
    out = bf.complement(d1)
    got = sorted(
        (r["chrom"], r["start"], r["end"]) for r in out.collect()
    )
    MAX = (1 << 63) - 1
    assert got == sorted(
        [
            ("chr1", 0, 1),
            ("chr1", 10, 12),
            ("chr1", 14, MAX),
            ("chr2", 0, 4),
            ("chr2", 10, MAX),
        ]
    )


def test_complement_with_view(d1, spark):
    view = {"chr1": 20, "chr2": 12, "chr3": 7}
    out = bf.complement(d1, view_df=view)
    got = sorted((r["chrom"], r["start"], r["end"], r["view_region"]) for r in out.collect())
    assert got == sorted(
        [
            ("chr1", 0, 1, "chr1"),
            ("chr1", 10, 12, "chr1"),
            ("chr1", 14, 20, "chr1"),
            ("chr2", 0, 4, "chr2"),
            ("chr2", 10, 12, "chr2"),
            ("chr3", 0, 7, "chr3"),
        ]
    )


def test_trim_no_view(spark):
    d = ivals(spark, [("chr1", -5, 10), ("chr1", -8, -3)])
    got, _ = rows(bf.trim(d))
    assert got == sorted([("chr1", 10, 0), ("chr1", 0, 0)])


def test_trim_with_view(d1, spark):
    view = [("chr1", 0, 10, "r1"), ("chr1", 10, 20, "r2")]
    out = bf.trim(d1, view_df=bf.make_viewframe(view))
    got = sorted(
        ((r["chrom"], r["start"], r["end"]) for r in out.collect()),
        key=lambda t: tuple((v is None, v) for v in t),
    )
    # chr2 rows & nothing outside; [12,14) assigned r2 stays; all d1 chr1 rows within regions
    assert ("chr1", 12, 14) in got
    assert ("chr1", 8, 10) in got
    assert (None, None, None) in got  # chr2 row has no region


def test_assign_view(d1):
    view = [("chr1", 0, 10, "r1"), ("chr1", 10, 20, "r2")]
    out = bf.assign_view(d1, view)
    got = {(r["chrom"], r["start"], r["end"]): r["view_region"] for r in out.collect()}
    assert got[("chr1", 1, 5)] == "r1"
    assert got[("chr1", 8, 10)] == "r1"
    assert got[("chr1", 12, 14)] == "r2"
    assert got[("chr2", 4, 10)] is None
    out2 = bf.assign_view(d1, view, drop_unassigned=True)
    assert out2.count() == 5


def test_assign_view_largest_overlap(spark):
    d = ivals(spark, [("chr1", 8, 16)])  # 2bp in r1, 6bp in r2
    view = [("chr1", 0, 10, "r1"), ("chr1", 10, 20, "r2")]
    assert bf.assign_view(d, view).collect()[0]["view_region"] == "r2"


def test_expand_pad(spark):
    d = ivals(spark, [("chr1", 10, 20)])
    assert rows(bf.expand(d, pad=5))[0] == [("chr1", 25, 5)]
    assert rows(bf.expand(d, pad=5, side="left"))[0] == [("chr1", 20, 5)]
    # negative pad clamps at midpoint 15
    assert rows(bf.expand(d, pad=-8))[0] == [("chr1", 15, 15)]


def test_expand_scale(spark):
    d = ivals(spark, [("chr1", 10, 20)])
    assert rows(bf.expand(d, scale=2))[0] == [("chr1", 25, 5)]
    assert rows(bf.expand(d, scale=0))[0] == [("chr1", 15, 15)]


def test_select(d1):
    assert bf.select(d1, "chr1").count() == 5
    assert bf.select(d1, "chr1:4-9").count() == 4   # [1,5), [3,8), point(6,6), [8,10)
    assert bf.select(d1, ("chr1", 8, 12)).count() == 1
    # point at query start included
    assert bf.select(d1, "chr1:6-7").count() == 2   # [3,8) and point (6,6)


def test_sort_bedframe(d1):
    out = bf.sort_bedframe(d1)
    data = [(r["chrom"], r["start"], r["end"]) for r in out.collect()]
    assert data == sorted(data)


def test_binnify(spark):
    out = bf.binnify({"chrA": 10, "chrB": 5}, binsize=4)
    got, _ = rows(out)
    assert got == sorted(
        [("chrA", 4, 0), ("chrA", 8, 4), ("chrA", 10, 8), ("chrB", 4, 0), ("chrB", 5, 4)]
    )


def test_pair_by_distance(spark):
    # golden case from reference tests/test_extras.py:209-260
    d = ivals(spark, [("chr1", 1, 3), ("chr1", 6, 8), ("chr1", 9, 11)])

    def got(**kw):
        out = bf.pair_by_distance(d, **kw)
        return sorted((r["start_1"], r["start_2"]) for r in out.collect())

    assert got(min_sep=1, max_sep=4) == [(6, 9)]
    assert got(min_sep=1, max_sep=4, relative_to="endpoints") == [(1, 6)]
    assert got(min_sep=1, max_sep=6) == [(1, 6), (6, 9)]
    assert got(min_sep=1, max_sep=9) == [(1, 6), (1, 9), (6, 9)]
    assert got(min_sep=1, max_sep=9, max_intervening=0) == [(1, 6), (6, 9)]
    assert got(min_sep=1, max_sep=9, min_intervening=1) == [(1, 9)]
    import pytest as _pytest

    with _pytest.raises(ValueError):
        bf.pair_by_distance(d, min_sep=-1, max_sep=9)
    with _pytest.raises(ValueError):
        bf.pair_by_distance(d, min_sep=12, max_sep=9)


def test_mark_and_merge_runs(spark):
    from pyspark.sql import functions as F

    d = ivals(
        spark,
        [("chr1", 0, 5, "a"), ("chr1", 5, 10, "a"), ("chr1", 10, 15, "b"),
         ("chr1", 20, 25, "b"), ("chr2", 0, 5, "a")],
        extra=[("val", "string")],
    )
    marked = bf.mark_runs(d, "val")
    got = {(r["chrom"], r["start"]): r["run"] for r in marked.collect()}
    assert got == {("chr1", 0): 0, ("chr1", 5): 0, ("chr1", 10): 1,
                   ("chr1", 20): 2, ("chr2", 0): 0}
    merged = bf.merge_runs(d, "val", agg={"n": F.count(F.lit(1))})
    got2 = sorted((r["chrom"], r["start"], r["end"], r["val"], r["n"]) for r in merged.collect())
    assert got2 == [("chr1", 0, 10, "a", 2), ("chr1", 10, 15, "b", 1),
                    ("chr1", 20, 25, "b", 1), ("chr2", 0, 5, "a", 1)]


def test_merge_duplicate_point_intervals_strict(spark):
    # Two identical point intervals under min_dist=None are BOTH island
    # borders at the same (start,end) — the border-row lead() pass must
    # order by the pass-1 row number (a strict total order) or the two
    # passes can transpose them. Each must come out a singleton.
    d = ivals(spark, [("chr1", 5, 5), ("chr1", 5, 5), ("chr1", 5, 5)])
    got, _ = rows(bf.merge(d, min_dist=None))
    # canonical column order: (chrom, end, n_intervals, start)
    assert got == [("chr1", 5, 1, 5)] * 3


def test_merge_null_singletons_keep_own_end(spark):
    # invalid rows (any null key) pass through with their OWN coordinates;
    # the group running-max over other null rows' ends must not leak in
    d = ivals(spark, [(None, 0, 100), (None, 50, 60), ("chr1", 1, 5)])
    got, _ = rows(bf.merge(d, min_dist=0))
    # canonical column order: (chrom, end, n_intervals, start)
    assert sorted(got, key=str) == sorted(
        [("chr1", 5, 1, 1), (None, 100, None, 0), (None, 60, None, 50)],
        key=str,
    )


def test_merge_trailing_island_spans_group_max(spark):
    # last island's end comes from the whole-group max, not the last row
    d = ivals(spark, [("chr1", 0, 50), ("chr1", 10, 20), ("chr1", 30, 40)])
    got, _ = rows(bf.merge(d, min_dist=0))
    # canonical column order: (chrom, end, n_intervals, start)
    assert got == [("chr1", 50, 3, 0)]


def test_cluster_duplicate_point_intervals_strict(spark):
    # reference: duplicate point intervals under min_dist=None each get
    # their OWN cluster id (arrops border test start >= running_max)
    d = ivals(spark, [("chr1", 5, 5), ("chr1", 5, 5), ("chr1", 1, 3)])
    out = bf.cluster(d, min_dist=None)
    ids = sorted(r["cluster"] for r in out.collect())
    assert ids == [0, 1, 2]
    assert out.count() == 3
