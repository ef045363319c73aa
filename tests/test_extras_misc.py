"""Tests: pileup, make_chromarms, sanitize_bedframe, view-ordered sort,
assembly registry, vis stacking, frac_gene_coverage."""

from helpers import ivals, rows

import bioframe_spark as bf
from bioframe_spark.core.construction import sanitize_bedframe
from bioframe_spark.sources.assembly import assembly_info, fetch_chromsizes
from bioframe_spark.vis import stack_intervals_levels, to_ucsc_colorstring


def test_pileup(spark):
    d = ivals(spark, [("chr1", 0, 10), ("chr1", 5, 15), ("chr1", 20, 25)])
    out = bf.pileup(d)
    got = sorted((r["start"], r["end"], r["depth"]) for r in out.collect())
    assert got == [(0, 5, 1), (5, 10, 2), (10, 15, 1), (20, 25, 1)]


def test_pileup_weighted(spark):
    d = ivals(spark, [("chr1", 0, 10, 3), ("chr1", 5, 15, 2)],
              extra=[("w", "long")])
    out = bf.pileup(d, weight_col="w")
    got = sorted((r["start"], r["end"], r["depth"]) for r in out.collect())
    assert got == [(0, 5, 3), (5, 10, 5), (10, 15, 2)]


def test_make_chromarms(spark):
    arms = bf.make_chromarms({"chr1": 100}, {"chr1": 40})
    got = sorted((r["chrom"], r["start"], r["end"], r["name"]) for r in arms.collect())
    assert got == [("chr1", 0, 40, "chr1_p"), ("chr1", 40, 100, "chr1_q")]


def test_sanitize_bedframe(spark):
    d = spark.createDataFrame(
        [("chr1", 5, 2), ("chr1", None, 3), ("chr2", 1, 4)],
        "chrom string, start long, end long",
    )
    flipped = sanitize_bedframe(d, start_exceed_end_action="flip")
    got, _ = rows(flipped)
    assert ("chr1", 5, 2) in got  # cols sorted: chrom, end, start → (chr1,5,2)=flipped row
    dropped = sanitize_bedframe(d, start_exceed_end_action="drop")
    assert dropped.count() == 2
    # null rule: partial-null row becomes all-null
    nulled = sanitize_bedframe(d).filter("start is null")
    r = nulled.collect()
    assert all(x["chrom"] is None for x in r)


def test_sort_bedframe_view_order(spark):
    d = ivals(spark, [("chr2", 0, 5), ("chr1", 0, 5)])
    view = [("chr2", 0, 100, "r_first"), ("chr1", 0, 100, "r_second")]
    out = bf.sort_bedframe(d, view_df=bf.make_viewframe(view))
    assert [r["chrom"] for r in out.collect()] == ["chr2", "chr1"]
    out2 = bf.sort_bedframe(d)
    assert [r["chrom"] for r in out2.collect()] == ["chr1", "chr2"]


def test_assembly_registry(spark):
    hg38 = assembly_info("hg38")
    assert hg38.chromsizes["chr1"] == 248956422
    assert assembly_info("GRCh38").name == "hg38"
    assert fetch_chromsizes("hg19")["chrM"] == 16571
    vf = hg38.viewframe()
    assert vf.count() == 25
    from bioframe_spark.core import checks

    assert checks.is_viewframe(vf)


def test_stack_levels():
    levels = stack_intervals_levels([0, 5, 2], [4, 9, 7])
    # [0,4) level 0; [2,7) overlaps → level 1; [5,9) fits level 0 (5>=4)
    assert list(levels) == [0, 0, 1]


def test_ucsc_colorstring():
    assert to_ucsc_colorstring((1.0, 0.0, 0.0)) == "255,0,0"


def test_frac_gene_coverage(spark):
    d = ivals(spark, [("chr1", 0, 10)])
    genes = ivals(spark, [("chr1", 5, 8), ("chr1", 9, 20)])
    out = bf.frac_gene_coverage(d, genes).collect()[0]
    assert out["coverage"] == 4 and out["n_genes"] == 2
    assert abs(out["gene_coverage"] - 0.4) < 1e-12


def test_assembly_registry_breadth():
    # full reference assembly set (public UCSC/NCBI facts)
    from bioframe_spark.sources.assembly import assemblies_available

    have = set(assemblies_available())
    assert {"hg19", "hg38", "hs1", "mm9", "mm10", "mm39", "ce10", "ce11",
            "danRer10", "danRer11", "dm3", "dm6", "sacCer3",
            "wuhCor1"} <= have
    assert assembly_info("GRCm39").chromsizes["chr1"] == 195154279
    assert assembly_info("sacCer3").organism == "saccharomyces_cerevisiae"
    # unit overrides: chrEBV is a decoy (excluded by default units),
    # chrMT's revised mitochondrial sequence likewise
    assert "chrEBV" not in assembly_info("hg38").chromsizes
    assert "chrMT" not in assembly_info("hg19").chromsizes
    assert "chrEBV" in assembly_info("hg38", units="all").chromsizes


def test_fetch_centromeres_packaged(spark):
    from bioframe_spark.sources.resources import UCSCClient, fetch_centromeres

    cen = fetch_centromeres("hg38")
    got = {r["chrom"]: (r["start"], r["end"], r["mid"]) for r in cen.collect()}
    # public UCSC hg38 cytoBand facts: chr1 acen bands meet at 123400000
    assert got["chr1"] == (121700000, 125100000, 123400000)
    assert len(got) == 24
    assert UCSCClient("GRCh37").fetch_centromeres().count() == 24
    assert UCSCClient("hs1").fetch_cytoband().count() == 48
