"""Unit tests: region-string grammar, constructors, null/edge-case rows
through operators (FIXTURES.md edge rows)."""

import pytest
from helpers import ivals, rows

import bioframe_spark as bf
from bioframe_spark.core.stringops import (
    is_complete_ucsc_string,
    parse_region,
    parse_region_string,
    to_humanized_int,
    to_ucsc_string,
)


def test_humanized_ints():
    assert to_humanized_int("10,100,000") == 10_100_000
    assert to_humanized_int("30M") == 30_000_000
    assert to_humanized_int("1.5k") == 1500
    assert to_humanized_int("2G") == 2_000_000_000
    assert to_humanized_int(42) == 42
    with pytest.raises(ValueError):
        to_humanized_int("abc")


def test_parse_region_string():
    assert parse_region_string("chr1") == ("chr1", None, None)
    assert parse_region_string("chr1:5-10") == ("chr1", 5, 10)
    assert parse_region_string("chr5:10,100,000-30M") == ("chr5", 10_100_000, 30_000_000)
    assert parse_region_string("chr1:5-") == ("chr1", 5, None)
    # reference grammar: sequence names may not contain colons
    with pytest.raises(ValueError):
        parse_region_string("weird:name:5-10")
    # reference grammar edges (verified against the reference parser):
    # a hyphen and a start coord are mandatory after ':'; tokens after
    # the end are ignored; inverted ranges PARSE here (only parse_region
    # validates end >= start)
    with pytest.raises(ValueError):
        parse_region_string("chr1:10")
    with pytest.raises(ValueError):
        parse_region_string("chr1:")
    with pytest.raises(ValueError):
        parse_region_string("chr1:-20")
    assert parse_region_string("chr1:10-20-30") == ("chr1", 10, 20)
    assert parse_region_string("chr1:10-5") == ("chr1", 10, 5)
    with pytest.raises(ValueError):
        parse_region("chr1:10-5")


def test_parse_region_with_chromsizes():
    assert parse_region("chr1", {"chr1": 100}) == ("chr1", 0, 100)
    assert parse_region("chr1:10-", {"chr1": 100}) == ("chr1", 10, 100)
    with pytest.raises(ValueError):
        parse_region("chr1:10-200", {"chr1": 100})
    with pytest.raises(ValueError):
        parse_region("chrZ", {"chr1": 100})


def test_ucsc_string_helpers():
    assert to_ucsc_string(("chr1", 5, 10)) == "chr1:5-10"
    assert is_complete_ucsc_string("chr1:5-10")
    assert not is_complete_ucsc_string("chr1")
    assert not is_complete_ucsc_string(123)


def test_from_constructors(spark):
    df = bf.from_dict({"chr1": 100, "chr2": (10, 20)})
    got, _ = rows(df)
    assert got == [("chr1", 100, 0), ("chr2", 20, 10)]
    df2 = bf.from_ucsc_string_list(["chr1:0-10", "chr2:5-9"])
    assert df2.count() == 2
    df3 = bf.from_list([("chr1", 0, 5, "A")])
    assert df3.columns == ["chrom", "start", "end", "name"]


def test_update_default_colnames(spark):
    d = spark.createDataFrame([("chr1", 1, 5)], "c string, s long, e long")
    with bf.update_default_colnames("c", "s", "e"):
        out = bf.expand(d, pad=1)
        assert rows(out)[0] == [("chr1", 6, 0)]
    # restored after context
    with pytest.raises(ValueError):
        bf.expand(d, pad=1)


# ---- null / edge rows through join-shaped ops (FIXTURES.md §1) ----

EDGE = [
    ("chr1", 1, 1),          # point
    ("chr1", 2, 2),          # adjacent point
    ("chr1", 0, 10),
    ("chr1", 10, 20),        # abutting
    (None, None, None),      # all-null row
    ("chrOnly1", 5, 9),      # chrom only in df1
    ("chr1", -100, -50),     # negative coords
    ("chr1", 0, 10),         # duplicate row
]


def test_nulls_through_overlap(spark):
    d1 = ivals(spark, EDGE)
    d2 = ivals(spark, [("chr1", 0, 5), ("chrOnly2", 0, 5)])
    left = bf.overlap(d1, d2, how="left")
    assert left.count() == len(EDGE)  # null + unmatched rows preserved 1:1
    # null row keeps null right side
    nullrow = left.filter("chrom is null").collect()
    assert len(nullrow) == 1 and nullrow[0]["chrom_"] is None
    inner = bf.overlap(d1, d2, how="inner")
    got = sorted((r["start"], r["start_"]) for r in inner.collect())
    assert got == [(0, 0), (0, 0), (1, 0), (2, 0)]  # dup row twice + both points


def test_nulls_through_merge_cluster(spark):
    d = ivals(spark, EDGE)
    m = bf.merge(d, min_dist=None)
    rows_ = {(r["chrom"], r["start"], r["end"]): r["n_intervals"] for r in m.collect()}
    assert rows_[("chr1", 0, 10)] == 4   # 0-10 x2 + points (1,1) and (2,2) inside
    assert (None, None, None) in rows_
    c = bf.cluster(d, min_dist=0)
    assert c.filter("chrom is null").collect()[0]["cluster"] is not None


def test_negative_coords(spark):
    d = ivals(spark, [("chr1", -100, -50), ("chr1", -60, -20)])
    m = bf.merge(d, min_dist=0)
    got, _ = rows(m)
    assert got == [("chr1", -20, 2, -100)]
    t = bf.trim(d)
    got2, _ = rows(t)
    assert got2 == [("chr1", 0, 0), ("chr1", 0, 0)]


def test_closest_tie_breaking_callable(spark):
    d1 = ivals(spark, [("chr1", 10, 11)])
    d2 = ivals(spark, [("chr1", 0, 5, 2.0), ("chr1", 16, 21, 1.0)],
               extra=[("score", "double")])
    out = bf.closest(d1, d2, k=1, tie_breaking_col=lambda pdf: -pdf["score"]).collect()
    assert out[0]["start_"] == 0  # -score: lower means higher score → (0,5) has score 2
