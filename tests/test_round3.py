"""Round-3 additions: injectable-engine indexed readers, chromsizes
pattern groups, digest cut offsets, centromeres-from-cytoband, auto
range_width selection, closest-binned duplicate handling."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

import bioframe_spark as bf
from bioframe_spark.operators import ops, sequence
from bioframe_spark.operators.closest import closest
from bioframe_spark.sources import fileops, resources

from helpers import ivals, rows


# --------------------------------------------------------------------------
# indexed readers: the regions→partitions scaffold runs end-to-end with a
# fake engine; only the pysam/pyBigWig constructors stay library-gated
# --------------------------------------------------------------------------

def test_read_bigwig_fake_engine(spark):
    # engines must be defined inside the test: cloudpickle serializes
    # closures by value, while a test-module-level function would pickle
    # by reference and fail to import on the executor
    def fake_bigwig_engine(path, chrom, start, end):
        s = 0 if start is None else start
        e = (s + 200) if end is None else end
        return pd.DataFrame({
            "chrom": [chrom, chrom],
            "start": [s, s + 100],
            "end": [s + 100, e],
            "value": [1.5, 2.5],
        })

    out = fileops.read_bigwig(
        "/nonexistent.bw", [("chr1", 0, 200), ("chr2", 1000, 1200)],
        engine=fake_bigwig_engine,
    )
    got, cols = rows(out)
    assert cols == ["chrom", "end", "start", "value"]
    assert len(got) == 4
    assert out.rdd.getNumPartitions() == 2  # one region per partition
    vals = sorted(r["value"] for r in out.collect())
    assert vals == [1.5, 1.5, 2.5, 2.5]


def test_read_bigbed_fake_engine(spark):
    def eng(path, chrom, start, end):
        return pd.DataFrame({"chrom": [chrom], "start": [start], "end": [end],
                             "rest": ["name1\t0\t+"]})

    out = fileops.read_bigbed("/x.bb", [("chr1", 5, 50)], engine=eng)
    r = out.collect()[0]
    assert (r["chrom"], r["start"], r["end"], r["rest"]) == ("chr1", 5, 50, "name1\t0\t+")


def test_read_tabix_fake_engine(spark):
    def eng(path, chrom, start, end):
        # positional columns, renamed to the schema by the scaffold
        return pd.DataFrame([(chrom, start, end)])

    out = fileops.read_tabix("/x.gz", [("chr1", 1, 9), ("chr1", 20, 30)],
                             schema="bed3", engine=eng)
    got, cols = rows(out)
    assert cols == ["chrom", "end", "start"]
    assert got == [("chr1", 9, 1), ("chr1", 30, 20)]


def test_read_alignments_fake_engine(spark):
    def eng(path, chrom, start, end):
        return pd.DataFrame.from_records([
            ("r1", 0, chrom, 100, 60, "50M", -1, 0, 0, "A" * 5, "I" * 5, "{}"),
        ])

    out = fileops.read_alignments("/x.bam", [("chr1", 0, 1000)], engine=eng)
    r = out.collect()[0]
    assert r["QNAME"] == "r1" and r["RNAME"] == "chr1" and r["POS"] == 100
    assert len(out.columns) == 12


def test_read_pairix_fake_engine(spark):
    def eng(path, block):
        (c1, s1, e1), (c2, s2, e2) = block
        return pd.DataFrame([(c1, s1, c2, s2)])

    out = fileops.read_pairix(
        "/x.px2",
        [(("chr1", 0, 10), ("chr2", 5, 15)), (("chr3", 1, 2), ("chr3", 3, 4))],
        engine=eng,
    )
    got, cols = rows(out)
    assert cols == ["chrom1", "chrom2", "pos1", "pos2"]
    assert got == [("chr1", "chr2", 0, 5), ("chr3", "chr3", 1, 3)]


def test_default_engines_are_library_gated(spark):
    out = fileops.read_bigwig("/x.bw", [("chr1", 0, 10)])
    with pytest.raises(Exception) as ei:
        out.collect()
    assert "pyBigWig" in str(ei.value)


# --------------------------------------------------------------------------
# read_chromsizes: pattern-group ordering, assembly patterns, as_bed
# --------------------------------------------------------------------------

@pytest.fixture()
def chromsizes_file(tmp_path):
    p = tmp_path / "test.chrom.sizes"
    lines = [
        ("chr2", 100), ("chr10", 50), ("chr1", 200), ("chrX", 30),
        ("chrM", 16000), ("chr1_gl000191_random", 10),
        ("chrUn_gl000211", 9), ("chr6_apd_hap1", 8), ("weird", 7),
    ]
    p.write_text("".join(f"{c}\t{n}\n" for c, n in lines))
    return str(p)


def test_read_chromsizes_group_order(spark, chromsizes_file):
    out = fileops.read_chromsizes(chromsizes_file, chrom_patterns="hg19")
    names = [r["chrom"] for r in out.collect()]
    # group 0 natural-sorted, then sex, then M, then random/un/hap groups
    assert names == [
        "chr1", "chr2", "chr10", "chrX", "chrM",
        "chr1_gl000191_random", "chrUn_gl000211", "chr6_apd_hap1",
    ]


def test_read_chromsizes_default_and_as_bed(spark, chromsizes_file):
    out = fileops.read_chromsizes(chromsizes_file, as_bed=True)
    got = [(r["chrom"], r["start"], r["end"]) for r in out.collect()]
    assert got == [("chr1", 0, 200), ("chr2", 0, 100), ("chr10", 0, 50),
                   ("chrX", 0, 30), ("chrM", 0, 16000)]


def test_read_chromsizes_unknown_assembly(spark, chromsizes_file):
    with pytest.raises(ValueError, match="no chromosome patterns"):
        fileops.read_chromsizes(chromsizes_file, chrom_patterns="nope99")


# --------------------------------------------------------------------------
# digest: enzyme cut offsets (hand-computed golden fragments)
# --------------------------------------------------------------------------

def test_digest_ecori_offset(spark):
    #            0123456789...
    genome = {"chrT": "AAGAATTCAAAAGAATTCAA"}  # sites at 2 and 12
    prov = sequence.dict_fasta_provider(genome)
    out = sequence.digest({"chrT": 20}, prov, "EcoRI")
    got = [(r["start"], r["end"]) for r in out.orderBy("start").collect()]
    # EcoRI = G^AATTC → cuts at 2+1=3 and 12+1=13
    assert got == [(0, 3), (3, 13), (13, 20)]


def test_digest_degenerate_site_hinfi(spark):
    # HinfI = G^ANTC — N matches anything
    genome = {"chrT": "TTGACTCTT"}  # GACTC at 2 → cut at 3
    prov = sequence.dict_fasta_provider(genome)
    out = sequence.digest({"chrT": 9}, prov, "HinfI")
    got = [(r["start"], r["end"]) for r in out.orderBy("start").collect()]
    assert got == [(0, 3), (3, 9)]


def test_digest_raw_site_backcompat(spark):
    genome = {"chrT": "AAGATCAA"}
    prov = sequence.dict_fasta_provider(genome)
    out = sequence.digest({"chrT": 8}, prov, "GATC")  # literal site, offset 0
    got = [(r["start"], r["end"]) for r in out.orderBy("start").collect()]
    assert got == [(0, 2), (2, 8)]


def test_digest_injectable_table(spark):
    genome = {"chrT": "AACCGGAA"}
    prov = sequence.dict_fasta_provider(genome)
    out = sequence.digest({"chrT": 8}, prov, "Fake",
                          enzyme_table={"Fake": ("CCGG", 2)})
    got = [(r["start"], r["end"]) for r in out.orderBy("start").collect()]
    assert got == [(0, 4), (4, 8)]


def test_digest_unknown_enzyme(spark):
    prov = sequence.dict_fasta_provider({"chrT": "AAAA"})
    with pytest.raises(ValueError, match="unknown enzyme"):
        sequence.digest({"chrT": 4}, prov, "NoSuchEnzyme123")


# --------------------------------------------------------------------------
# centromeres from cytoband
# --------------------------------------------------------------------------

def test_centromeres_from_cytoband(spark):
    cyb = spark.createDataFrame(
        [
            ("chr1", 0, 120, "p12", "gpos50"),
            ("chr1", 120, 125, "p11", "acen"),
            ("chr1", 125, 132, "q11", "acen"),
            ("chr1", 132, 200, "q12", "gneg"),
            ("chr2", 0, 50, "p11", "acen"),
            ("chr2", 50, 90, "q11", "acen"),
        ],
        "chrom string, start long, end long, name string, gieStain string",
    )
    out = resources.centromeres_from_cytoband(cyb)
    got = {r["chrom"]: (r["start"], r["end"], r["mid"]) for r in out.collect()}
    assert got == {"chr1": (120, 132, 125), "chr2": (0, 90, 50)}


def test_centromeres_bad_band_count(spark):
    cyb = spark.createDataFrame(
        [("chr1", 0, 10, "p11", "acen")],
        "chrom string, start long, end long, name string, gieStain string",
    )
    with pytest.raises(ValueError, match="acen"):
        resources.centromeres_from_cytoband(cyb)


def test_fetch_centromeres_local_from_file(spark, tmp_path):
    p = tmp_path / "cytoband.txt"
    p.write_text(
        "chr1\t0\t100\tp12\tgneg\n"
        "chr1\t100\t110\tp11\tacen\n"
        "chr1\t110\t125\tq11\tacen\n"
    )
    out = resources.fetch_centromeres("custom", provider="local",
                                      cytoband_path=str(p))
    r = out.collect()[0]
    assert (r["start"], r["end"], r["mid"]) == (100, 125, 110)


# --------------------------------------------------------------------------
# auto range_width selection + ranged pair_by_distance equivalence
# --------------------------------------------------------------------------

TRIPLES = [
    ("chr1", 0, 10), ("chr1", 5, 15), ("chr1", 15, 20), ("chr1", 30, 40),
    ("chr1", 30, 40), ("chr1", 100, 200), ("chr2", 0, 5), ("chr2", 7, 9),
    ("chr2", 8, 30), ("chr2", 45, 50),
]


def test_auto_range_width_forced(spark, monkeypatch):
    """With the size threshold forced to 0, 'auto' picks the ranged
    constructions — outputs must be identical to the classic windows."""
    df = ivals(spark, TRIPLES)
    classic = {
        "merge": rows(bf.merge(df, min_dist=0, range_width=None)),
        "cluster": rows(bf.cluster(df, min_dist=0, range_width=None)),
        "complement": rows(bf.complement(df, range_width=None)),
        "pileup": rows(bf.pileup(df, range_width=None)),
    }
    monkeypatch.setattr(ops, "_RANGED_WINDOW_BYTES", -1)
    assert rows(bf.merge(df, min_dist=0)) == classic["merge"]
    assert rows(bf.cluster(df, min_dist=0)) == classic["cluster"]
    assert rows(bf.complement(df)) == classic["complement"]
    assert rows(bf.pileup(df)) == classic["pileup"]


def test_auto_range_width_multiple_tasks(spark, monkeypatch):
    """Forced-auto on a single-chrom input must produce >1 window range
    (the point of the ranged path: parallelism within a chromosome)."""
    monkeypatch.setattr(ops, "_RANGED_WINDOW_BYTES", -1)
    df = ivals(spark, [("chr1", i * 100, i * 100 + 50) for i in range(200)])
    width = ops._auto_range_width(df, "start", "end", "auto")
    assert width is not None
    span = 199 * 100 + 50
    assert width < span  # more than one range over the chromosome
    got, _ = rows(bf.merge(df, min_dist=0))
    assert len(got) == 200


def test_pair_by_distance_ranged_equivalence(spark):
    df = ivals(spark, TRIPLES)
    classic, _ = rows(bf.pair_by_distance(df, min_sep=1, max_sep=60,
                                          range_width=None))
    ranged, _ = rows(bf.pair_by_distance(df, min_sep=1, max_sep=60,
                                         range_width=13))
    assert classic == ranged and len(classic) > 0


def test_pair_by_distance_ranged_intervening(spark):
    df = ivals(spark, TRIPLES)
    classic, _ = rows(bf.pair_by_distance(df, min_sep=1, max_sep=120,
                                          min_intervening=1, range_width=None))
    ranged, _ = rows(bf.pair_by_distance(df, min_sep=1, max_sep=120,
                                         min_intervening=1, range_width=7))
    assert classic == ranged


# --------------------------------------------------------------------------
# closest binned: duplicate df1 rows keep their multiplicity
# --------------------------------------------------------------------------

def test_closest_binned_duplicate_rows(spark):
    df1 = ivals(spark, [("chr1", 10, 20), ("chr1", 10, 20), ("chr1", 50, 60)])
    df2 = ivals(spark, [("chr1", 30, 40), ("chr1", 100, 110)])
    got = closest(df1, df2, k=1, suffixes=("", "_2"), strategy="binned")
    cog = closest(df1, df2, k=1, suffixes=("", "_2"), strategy="cogroup")
    assert rows(got) == rows(cog)
    assert got.count() == 3  # the duplicate row appears twice


def test_closest_binned_duplicate_rows_k2_left_null(spark):
    df1 = ivals(spark, [("chr1", 10, 20), ("chr1", 10, 20), ("chr3", 5, 6)])
    df2 = ivals(spark, [("chr1", 30, 40), ("chr1", 100, 110)])
    got = closest(df1, df2, k=2, suffixes=("", "_2"), strategy="binned")
    cog = closest(df1, df2, k=2, suffixes=("", "_2"), strategy="cogroup")
    assert rows(got) == rows(cog)


# --------------------------------------------------------------------------
# documented deviations pinned: ensure_int no-op, keep_order semantics
# --------------------------------------------------------------------------

def test_outer_overlap_keeps_long_schema(spark):
    """The reference upcasts int->float64 on outer joins (its ensure_int
    exists to undo that); Spark longs are natively nullable, so the schema
    must stay bigint for every ensure_int value."""
    a = ivals(spark, [("chr1", 0, 10), ("chr9", 50, 60)])
    b = ivals(spark, [("chr1", 5, 12)])
    for ensure_int in (True, False):
        out = bf.overlap(a, b, how="outer", suffixes=("", "_b"),
                         ensure_int=ensure_int)
        dt = dict((f.name, f.dataType.simpleString()) for f in out.schema.fields)
        assert dt["start"] == "bigint" and dt["start_b"] == "bigint"
        # unmatched side arrives as null longs, not NaN floats
        lonely = [r for r in out.collect() if r["chrom"] == "chr9"]
        assert lonely and lonely[0]["start_b"] is None


def test_keep_order_left_overlap(spark):
    df1 = ivals(spark, [("chr2", 5, 9), ("chr1", 100, 200), ("chr1", 0, 10)])
    df2 = ivals(spark, [("chr1", 5, 12)])
    out = bf.overlap(df1, df2, how="left", suffixes=("", "_b"),
                     keep_order=True)
    got = [(r["chrom"], r["start"]) for r in out.collect()]
    # df1's canonical (chrom, start, end) order
    assert got == [("chr1", 0), ("chr1", 100), ("chr2", 5)]
    with pytest.raises(ValueError, match="keep_order"):
        bf.overlap(df1, df2, how="inner", keep_order=True)


# --------------------------------------------------------------------------
# load_fasta: dependency-free engine + record slicing surface
# --------------------------------------------------------------------------

def test_load_fasta_python_engine(tmp_path):
    p = tmp_path / "g.fa"
    p.write_text(">chrA extra words\nACGT\nACGT\n>chrB\nGGGG\n")
    recs = bf.load_fasta(str(p), engine="python")
    assert list(recs) == ["chrA", "chrB"]
    assert recs["chrA"][:] == "ACGTACGT"
    assert recs["chrA"][2:6] == "GTAC"
    assert recs["chrA"][3] == "T"
    assert recs["chrB"].length == 4


def test_load_fasta_gzip_and_multifile(tmp_path):
    import gzip

    p1 = tmp_path / "a.fa.gz"
    with gzip.open(p1, "wt") as fh:
        fh.write(">c1\nAAAA\n")
    p2 = tmp_path / "b.fa"
    p2.write_text(">c2\nCCCC\n>ignored\nTTTT\n")
    recs = bf.load_fasta([str(p1), str(p2)], engine="python")
    # multifile mode: one record per file (reference semantics)
    assert list(recs) == ["c1", "c2"]
    assert recs["c2"][:] == "CCCC"


def test_load_fasta_feeds_digest(spark, tmp_path):
    p = tmp_path / "g.fa"
    p.write_text(">chrT\nAAGAATTCAA\n")
    recs = bf.load_fasta(str(p), engine="python")
    prov = lambda chrom, s, e: recs[chrom][s:e]
    out = sequence.digest({"chrT": 10}, prov, "EcoRI")
    got = [(r["start"], r["end"]) for r in out.orderBy("start").collect()]
    assert got == [(0, 3), (3, 10)]


# --------------------------------------------------------------------------
# ranged mark_runs equivalence
# --------------------------------------------------------------------------

RUN_ROWS = [
    ("chr1", 0, 10, 1), ("chr1", 10, 20, 1), ("chr1", 20, 30, 2),
    ("chr1", 35, 40, 2), ("chr1", 40, 50, 2), ("chr1", 50, 60, 1),
    ("chr2", 0, 5, 7), ("chr2", 5, 9, 7), ("chr2", 9, 12, 8),
]


@pytest.mark.parametrize("width", [7, 13, 25, 1000])
@pytest.mark.parametrize("reset", [True, False])
def test_mark_runs_ranged_equivalence(spark, width, reset):
    df = spark.createDataFrame(RUN_ROWS, "chrom string, start long, end long, val long")
    classic = rows(bf.mark_runs(df, "val", reset_counter=reset, range_width=None))
    ranged = rows(bf.mark_runs(df, "val", reset_counter=reset, range_width=width))
    assert classic == ranged


def test_mark_runs_ranged_allow_overlaps(spark):
    df = spark.createDataFrame(
        [("chr1", 0, 10, 1), ("chr1", 5, 30, 1), ("chr1", 40, 50, 1)],
        "chrom string, start long, end long, val long")
    classic = rows(bf.mark_runs(df, "val", allow_overlaps=True, range_width=None))
    ranged = rows(bf.mark_runs(df, "val", allow_overlaps=True, range_width=9))
    assert classic == ranged


def test_merge_runs_with_ranged_auto(spark, monkeypatch):
    from bioframe_spark.operators import ops as _ops

    df = spark.createDataFrame(RUN_ROWS, "chrom string, start long, end long, val long")
    classic = rows(bf.merge_runs(df, "val", agg={"n": F.count(F.lit(1))}))
    monkeypatch.setattr(_ops, "_RANGED_WINDOW_BYTES", -1)
    forced = rows(bf.merge_runs(df, "val", agg={"n": F.count(F.lit(1))}))
    assert classic == forced


def test_threshold_conf_override(spark):
    """spark.bioframe.* confs override the strategy thresholds."""
    df = ivals(spark, TRIPLES)
    try:
        # force the ranged path for a tiny frame purely via conf
        spark.conf.set("spark.bioframe.rangedWindowBytes", "-1")
        classic = rows(bf.merge(df, min_dist=0, range_width=None))
        auto = rows(bf.merge(df, min_dist=0))
        assert classic == auto
        # and force the classic path even for unknown-size frames (whose
        # plan stats report Long.MaxValue)
        spark.conf.set("spark.bioframe.rangedWindowBytes", str((1 << 63) - 1))
        width = ops._auto_range_width(df, "start", "end", "auto")
        assert width is None
    finally:
        spark.conf.unset("spark.bioframe.rangedWindowBytes")


# --------------------------------------------------------------------------
# parse_region grammar parity (ported reference test_core_stringops cases)
# --------------------------------------------------------------------------

def test_parse_region_reference_cases():
    from bioframe_spark.core.stringops import parse_region

    assert parse_region("chr21") == ("chr21", 0, None)
    assert parse_region("chr21:1000-2000") == ("chr21", 1000, 2000)
    assert parse_region("chr21:1,000-2,000") == ("chr21", 1000, 2000)
    assert parse_region("6") == ("6", 0, None)
    assert parse_region("gb|accession|locus:1000-2000") == (
        "gb|accession|locus", 1000, 2000)
    assert parse_region("name-with-hyphens-") == ("name-with-hyphens-", 0, None)
    assert parse_region("GL000207.1:1000-2000") == ("GL000207.1", 1000, 2000)
    assert parse_region("chr21:1000-") == ("chr21", 1000, None)
    assert parse_region("6:1kb-2kb") == ("6", 1000, 2000)
    assert parse_region("6:1k-2000") == ("6", 1000, 2000)
    assert parse_region("6:1kb-2M") == ("6", 1000, 2000000)
    assert parse_region("6:1Gb-") == ("6", 1000000000, None)
    with pytest.raises(ValueError):
        parse_region("chr1:2,000-1,000")  # reverse selection
    with pytest.raises(ValueError):
        parse_region("chr1::1000-2000")  # more than one colon


def test_sort_bedframe_view_semantics(spark):
    """View-ordered sort: assign-largest-overlap first (no duplication of
    region-spanning intervals), view-row order, unassigned last; an
    explicit df_view_col must be cataloged."""
    view = [("chr1", 0, 50, "B"), ("chr1", 50, 100, "A"), ("chr2", 0, 100, "C")]
    df = ivals(spark, [
        ("chr1", 60, 70),    # region A (2nd view row)
        ("chr1", 10, 20),    # region B (1st view row)
        ("chr1", 40, 60),    # SPANS B|A: larger overlap in B -> B
        ("chr2", 5, 6),      # region C
        ("chr9", 0, 5),      # unassigned -> last
    ])
    out = bf.sort_bedframe(df, view_df=view)
    got = [(r["chrom"], r["start"]) for r in out.collect()]
    assert got == [("chr1", 10), ("chr1", 40), ("chr1", 60), ("chr2", 5), ("chr9", 0)]
    assert out.count() == 5  # spanning interval NOT duplicated

    tagged = df.withColumn("view_region", F.lit("NOPE"))
    with pytest.raises(ValueError, match="cataloged"):
        bf.sort_bedframe(tagged, view_df=view, df_view_col="view_region")


def test_top_level_namespace_parity():
    """Every public reference name a bioframe user calls resolves as
    bf.<name> (drop-in ergonomics); internal kernel module aliases
    (arrops) intentionally excluded."""
    expected = [
        "overlap", "cluster", "merge", "closest", "coverage", "subtract",
        "setdiff", "count_overlaps", "trim", "complement", "sort_bedframe",
        "assign_view", "select", "expand", "binnify", "digest", "frac_gc",
        "frac_mapped", "frac_gene_coverage", "seq_gc", "pair_by_distance",
        "mark_runs", "merge_runs", "make_chromarms", "read_table",
        "read_chromsizes", "read_tabix", "read_pairix", "read_bigwig",
        "read_bigbed", "read_alignments", "read_bam", "to_bed", "to_bigwig",
        "to_bigbed", "load_fasta", "parse_region", "parse_region_string",
        "make_viewframe", "from_any", "from_dict", "from_list", "from_series",
        "from_ucsc_string_list", "sanitize_bedframe", "is_bedframe",
        "is_cataloged", "is_contained", "is_covering", "is_overlapping",
        "is_sorted", "is_tiling", "is_viewframe", "is_chrom_dtype",
        "assembly_info", "assemblies_available", "fetch_chromsizes",
        "fetch_centromeres", "UCSCClient", "SCHEMAS", "plot_intervals",
        "to_ucsc_colorstring", "to_ucsc_string", "is_complete_ucsc_string",
    ]
    missing = [n for n in expected if not hasattr(bf, n)]
    assert not missing, missing


def test_from_series_and_is_chrom_dtype(spark):
    got = [(r["chrom"], r["start"], r["end"])
           for r in bf.from_series({"chr1": 100, "chr2": 50}).collect()]
    assert sorted(got) == [("chr1", 0, 100), ("chr2", 0, 50)]
    from pyspark.sql import types as T
    assert bf.is_chrom_dtype(T.StringType())
    assert not bf.is_chrom_dtype(T.LongType())
