"""A/B parity vs the reference, part 2: derived operators, checks,
string ops, and keyed (on=) variants. Shares the harness with part 1."""

import random

import pandas as pd
import pytest

import bioframe_spark as bfs
from test_reference_parity_ab import (
    assert_match, canon_pandas, canon_spark, load_reference, rand_frame,
    to_spark,
)

VIEW = {"chr1": 100, "chr2": 100, "chr10": 100}


def rand_stranded(rng, n, span=80):
    pdf = rand_frame(rng, n, with_null=False, span=span)
    pdf["strand"] = [rng.choice(["+", "-"]) for _ in range(len(pdf))]
    return pdf


def tiled_valued(rng, n):
    """Non-overlapping tiled intervals with a repeating value column
    (mark_runs/merge_runs input shape)."""
    rows, pos = [], 0
    for _ in range(n):
        w = rng.randrange(1, 8)
        rows.append(("chr1", pos, pos + w, rng.choice(["a", "b"])))
        pos += w + rng.choice([0, 0, 3])
    return pd.DataFrame(rows, columns=["chrom", "start", "end", "val"])


@pytest.mark.parametrize("seed", [11, 12, 13])
def test_ab_keyed_ops(spark, seed):
    ref = load_reference()
    rng = random.Random(seed)
    p1, p2 = rand_stranded(rng, 35), rand_stranded(rng, 20)
    s1, s2 = to_spark(spark, p1), to_spark(spark, p2)
    assert_match(
        ref.overlap(p1, p2, how="inner", on=["strand"], suffixes=("", "_")),
        bfs.overlap(s1, s2, how="inner", on=["strand"], suffixes=("", "_")),
    )
    assert_match(ref.merge(p1, min_dist=0, on=["strand"]),
                 bfs.merge(s1, min_dist=0, on=["strand"]))
    assert_match(ref.cluster(p1, min_dist=0, on=["strand"]),
                 bfs.cluster(s1, min_dist=0, on=["strand"]))
    assert_match(ref.count_overlaps(p1, p2, on=["strand"]),
                 bfs.count_overlaps(s1, s2, on=["strand"]))
    assert_match(ref.setdiff(p1, p2, on=["strand"]),
                 bfs.setdiff(s1, s2, on=["strand"]))


@pytest.mark.parametrize("seed", [21, 22, 23])
def test_ab_derived_ops(spark, seed):
    ref = load_reference()
    rng = random.Random(seed)
    p1 = rand_frame(rng, 30, with_null=False)
    s1 = to_spark(spark, p1)
    assert_match(ref.expand(p1, pad=-4), bfs.expand(s1, pad=-4))
    assert_match(ref.expand(p1, scale=2.0), bfs.expand(s1, scale=2.0))
    assert_match(ref.expand(p1, pad=5, side="left"),
                 bfs.expand(s1, pad=5, side="left"))
    assert_match(ref.binnify(pd.Series(VIEW), binsize=17),
                 bfs.binnify(VIEW, binsize=17))
    assert_match(ref.binnify(pd.Series(VIEW), binsize=17, rel_ids=True),
                 bfs.binnify(VIEW, binsize=17, rel_ids=True))
    mids = {"chr1": 40, "chr2": 50, "chr10": 10}
    assert_match(ref.make_chromarms(pd.Series(VIEW), mids),
                 bfs.make_chromarms(VIEW, mids))
    tv = tiled_valued(rng, 20)
    sv = to_spark(spark, tv)
    assert_match(ref.mark_runs(tv, "val"), bfs.mark_runs(sv, "val"))
    assert_match(ref.merge_runs(tv, "val"), bfs.merge_runs(sv, "val"))
    # pair_by_distance (BEDPE output)
    pp = rand_frame(rng, 15, with_null=False).drop_duplicates(
        ["chrom", "start", "end"]).reset_index(drop=True)
    sp = to_spark(spark, pp)
    assert_match(ref.pair_by_distance(pp, min_sep=1, max_sep=30),
                 bfs.pair_by_distance(sp, min_sep=1, max_sep=30))
    assert_match(
        ref.pair_by_distance(pp, min_sep=1, max_sep=30, max_intervening=1),
        bfs.pair_by_distance(sp, min_sep=1, max_sep=30, max_intervening=1),
    )


@pytest.mark.parametrize("seed", [31, 32])
def test_ab_checks(spark, seed):
    ref = load_reference()
    rng = random.Random(seed)
    p1 = rand_frame(rng, 25, with_null=False)
    s1 = to_spark(spark, p1)
    from bioframe_spark.core import checks

    assert ref.is_overlapping(p1) == checks.is_overlapping(s1)
    assert ref.is_bedframe(p1) == checks.is_bedframe(s1)
    viewdf = pd.DataFrame(
        [("chr1", 0, 100, "r1"), ("chr2", 0, 100, "r2"), ("chr10", 0, 100, "r3")],
        columns=["chrom", "start", "end", "name"],
    )
    sview = to_spark(spark, viewdf)
    assert ref.is_viewframe(viewdf) == checks.is_viewframe(sview)
    assert (ref.is_contained(p1, viewdf)
            == checks.is_contained(s1, sview))
    assert (ref.is_covering(p1, viewdf)
            == checks.is_covering(s1, sview))
    from pyspark.sql import functions as F

    assert (ref.is_cataloged(p1.assign(view_region="r1"), viewdf)
            == checks.is_cataloged(
                s1.withColumn("view_region", F.lit("r1")), sview))


def test_ab_stringops_and_sort(spark):
    ref = load_reference()
    # region-string grammar
    for s in ["chr1:10-20", "chr1:10,000-20,000", "chr1", "chr1:5k-1M",
              "chrX:1000-", "chr1:10-20-30", "chr1:30-10"]:
        assert ref.parse_region_string(s) == bfs.parse_region_string(s), s
    for s in ["chr1:10", "chr1:", "chr1:-20"]:
        with pytest.raises(ValueError):
            ref.parse_region_string(s)
        with pytest.raises(ValueError):
            bfs.parse_region_string(s)
    for s in ["chr1:10-20", "chr1", "chrX:100-"]:
        assert (ref.parse_region(s, {"chr1": 500, "chrX": 900})
                == bfs.parse_region(s, {"chr1": 500, "chrX": 900})), s
    assert ref.to_ucsc_colorstring("red") in ("255,0,0", "0,0,0")
    # sort_bedframe: content AND order (natural chromosome order)
    pdf = pd.DataFrame(
        [("chr10", 5, 9), ("chr2", 1, 4), ("chr1", 7, 8), ("chr1", 2, 3)],
        columns=["chrom", "start", "end"],
    )
    sdf = to_spark(spark, pdf)
    ref_sorted = ref.sort_bedframe(pdf).reset_index(drop=True)
    got = bfs.sort_bedframe(sdf).collect()
    got_rows = [(r["chrom"], r["start"], r["end"]) for r in got]
    assert got_rows == [tuple(r) for r in ref_sorted.values.tolist()]


@pytest.mark.parametrize("seed", [41, 42])
def test_ab_assign_view_and_sort_view(spark, seed):
    ref = load_reference()
    rng = random.Random(seed)
    p1 = rand_frame(rng, 25, with_null=False)
    s1 = to_spark(spark, p1)
    viewdf = pd.DataFrame(
        [("chr1", 0, 50, "rA"), ("chr1", 50, 100, "rB"),
         ("chr2", 0, 100, "rC"), ("chr10", 0, 100, "rD")],
        columns=["chrom", "start", "end", "name"],
    )
    assert_match(ref.assign_view(p1, viewdf),
                 bfs.assign_view(s1, viewdf.values.tolist()))
    assert_match(ref.assign_view(p1, viewdf, drop_unassigned=True),
                 bfs.assign_view(s1, viewdf.values.tolist(),
                                 drop_unassigned=True))


@pytest.mark.parametrize("seed", [51, 52])
def test_ab_select_and_sanitize(spark, seed):
    ref = load_reference()
    rng = random.Random(seed)
    p1 = rand_frame(rng, 30, with_null=False)
    s1 = to_spark(spark, p1)
    for region in ["chr1", "chr1:10-40", "chr2:0-5", ("chr10", 20, 60)]:
        assert_match(ref.select(p1, region), bfs.select(s1, region))
    # sanitize: inverted intervals dropped / flipped. Known reference
    # quirk (construction.py:316-326): 'drop' removes NULL rows too, but
    # ONLY when at least one inverted row exists (the masking branch is
    # gated on `.any()`); this engine always keeps null triples in drop
    # mode — so the drop A/B runs null-free, flip A/B with nulls.
    bad = pd.DataFrame(
        [("chr1", 10, 5), ("chr1", 3, 9), (None, 1, 2)],
        columns=["chrom", "start", "end"],
    )
    sbad = to_spark(spark, bad)
    nn = bad.dropna().reset_index(drop=True)
    assert_match(
        ref.sanitize_bedframe(nn, start_exceed_end_action="drop"),
        bfs.sanitize_bedframe(to_spark(spark, nn),
                              start_exceed_end_action="drop"),
    )
    assert_match(
        ref.sanitize_bedframe(bad, start_exceed_end_action="flip"),
        bfs.sanitize_bedframe(sbad, start_exceed_end_action="flip"),
    )


def test_ab_remaining_checks(spark):
    ref = load_reference()
    from bioframe_spark.core import checks

    # tiling frame: complete, non-overlapping cover of the view
    tiles = pd.DataFrame(
        [("chr1", 0, 50, "r1"), ("chr1", 50, 100, "r1")],
        columns=["chrom", "start", "end", "view_region"],
    )
    viewdf = pd.DataFrame([("chr1", 0, 100, "r1")],
                          columns=["chrom", "start", "end", "name"])
    stiles, sview = to_spark(spark, tiles), to_spark(spark, viewdf)
    assert ref.is_tiling(tiles, viewdf) == checks.is_tiling(stiles, sview) == True  # noqa: E712
    holey = tiles.iloc[:1]
    assert (ref.is_tiling(holey, viewdf)
            == checks.is_tiling(to_spark(spark, holey), sview) == False)  # noqa: E712
    sorted_df = pd.DataFrame(
        [("chr1", 1, 5), ("chr1", 3, 9), ("chr2", 0, 4)],
        columns=["chrom", "start", "end"],
    )
    unsorted_df = sorted_df.iloc[[1, 0, 2]].reset_index(drop=True)
    assert ref.is_sorted(sorted_df) is True
    assert checks.is_sorted(to_spark(spark, sorted_df)) is True
    # NOTE: a Spark DataFrame has no row order, so is_sorted here checks
    # sortability of the FRAME's natural collect order — pin only the
    # sorted case for A/B; the reference's unsorted case is meaningful
    # only for pandas
    assert ref.is_sorted(unsorted_df) is False


def test_ab_read_chromsizes_and_table(spark, tmp_path):
    ref = load_reference()
    from bioframe_spark.sources import fileops

    cs = tmp_path / "test.chrom.sizes"
    cs.write_text(
        "chr2\t1000\nchr10\t800\nchr1\t2000\nchrX\t900\nchrM\t100\n"
        "chr1_gl0001_random\t5\nchrUn_gl0002\t7\n"
    )
    ref_cs = ref.read_chromsizes(str(cs))
    got_cs = fileops.read_chromsizes(str(cs)).collect()
    assert list(ref_cs.index) == [r["chrom"] for r in got_cs]
    assert [int(v) for v in ref_cs.values] == [r["length"] for r in got_cs]
    ref_all = ref.read_chromsizes(str(cs), filter_chroms=False, natsort=False)
    got_all = fileops.read_chromsizes(str(cs), filter_chroms=False,
                                      natsort=False).collect()
    assert set(ref_all.index) == {r["chrom"] for r in got_all}

    bed = tmp_path / "x.bed"
    bed.write_text(
        "chr1\t10\t20\tfeatA\t5\t+\nchr2\t3\t9\tfeatB\t2\t-\n"
    )
    ref_t = ref.read_table(str(bed), schema="bed6")
    got_t = fileops.read_table(str(bed), schema="bed6").toPandas()
    assert list(ref_t.columns) == list(got_t.columns)
    assert ref_t["chrom"].tolist() == got_t["chrom"].tolist()
    assert ref_t["start"].tolist() == [int(x) for x in got_t["start"]]
    assert ref_t["name"].tolist() == got_t["name"].tolist()


def test_ab_to_bed_bytes(spark, tmp_path):
    """Byte-identical BED output vs the reference writer."""
    ref = load_reference()
    import pandas as pd

    from bioframe_spark.sources import bed as bedmod

    pdf = pd.DataFrame(
        [("chr1", 5, 20, "a", 100, "+"),
         ("chr1", 30, 42, "b", 0, "-"),
         ("chr2", 1, 8, "c", 1000, ".")],
        columns=["chrom", "start", "end", "name", "score", "strand"],
    )
    ref_path = tmp_path / "ref.bed"
    ref.to_bed(pdf, str(ref_path))
    sdf = to_spark_mixed(spark, pdf)
    got_path = tmp_path / "got.bed"
    bedmod.to_bed(sdf, str(got_path), single_file=True)
    assert ref_path.read_bytes() == got_path.read_bytes()


def to_spark_mixed(spark, pdf):
    import pandas as pd

    cv = lambda v: None if pd.isna(v) else (int(v) if isinstance(v, (int, float)) and not isinstance(v, str) else v)
    rows = [tuple(cv(r[c]) for c in pdf.columns) for _, r in pdf.iterrows()]
    ddl = ", ".join(
        f"{c} {'string' if pdf[c].dtype == object else 'long'}" for c in pdf.columns
    )
    return spark.createDataFrame(rows, ddl)
