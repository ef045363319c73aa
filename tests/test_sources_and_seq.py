"""Tests: schema registry, read_table/to_bed round-trip, chromsizes,
GTF attributes, sequence ops (dict-provider), digest."""

import os

import pytest
from helpers import ivals, rows

import bioframe_spark as bf
from bioframe_spark.operators import sequence as seq
from bioframe_spark.sources import fileops, schemas


def test_schema_registry():
    assert set(schemas.SCHEMAS) >= {
        "bed3", "bed4", "bed5", "bed6", "bed9", "bed12", "bedGraph", "bedpe",
        "gff", "gtf", "narrowPeak", "broadPeak", "gappedPeak", "jaspar",
        "gap", "centromeres", "cytoband", "sam", "vcf",
    }
    assert schemas.infer_bed_schema(6) == "bed6"
    assert schemas.parse_bed_schema("bed9+3") == (9, 3)
    with pytest.raises(ValueError):
        schemas.parse_bed_schema("bed2")


def test_read_table_and_chromsizes(spark, tmp_path):
    p = tmp_path / "toy.bed"
    p.write_text("chr1\t0\t10\tA\t5\t+\nchr2\t5\t9\tB\t900\t-\n")
    df = fileops.read_table(str(p), schema="bed6")
    got, cols = rows(df)
    assert len(got) == 2 and "strand" in cols
    assert df.schema["start"].dataType.typeName() == "long"

    cs = tmp_path / "toy.chrom.sizes"
    cs.write_text("chr1\t1000\nchr10\t500\nchr2\t800\nchrU_random\t10\n")
    out = fileops.read_chromsizes(str(cs))
    names = [r["chrom"] for r in out.collect()]
    assert names == ["chr1", "chr2", "chr10"]  # filtered + natural sort
    d = fileops.chromsizes_dict(out)
    assert d["chr2"] == 800


def test_to_bed_roundtrip(spark, tmp_path):
    df = ivals(spark, [("chr1", 0, 10), ("chr1", 5, 20), ("chr2", 3, 9)])
    out_dir = str(tmp_path / "out_bed")
    fileops.to_bed(df, out_dir, schema="bed6")
    back = fileops.read_table(out_dir, schema="bed6")
    got, _ = rows(back.select("chrom", "start", "end"))
    want, _ = rows(df)
    assert got == want
    assert back.filter("strand != '.'").count() == 0


def test_validate_bed_rejects(spark):
    bad = ivals(spark, [("chr1", -5, 10)])
    with pytest.raises(ValueError):
        fileops.validate_bed(bad.withColumnRenamed("nope", "nope"))


def test_gtf_attributes(spark):
    df = spark.createDataFrame(
        [("chr1", 'gene_id "g1"; gene_name "X";')], "chrom string, attributes string"
    )
    out = fileops.parse_gtf_attributes(df, keys=["gene_id", "gene_name"])
    r = out.collect()[0]
    assert r["gene_id"] == "g1" and r["gene_name"] == "X"


GENOME = {"chrT": "ACGTNNGGCCAAACGT" * 2}


def test_frac_gc_and_mapped(spark):
    df = ivals(spark, [("chrT", 0, 4), ("chrT", 4, 6), ("chrT", 6, 10)])
    prov = seq.dict_fasta_provider(GENOME)
    out = seq.frac_gc(df, prov)
    got = {r["start"]: r["GC"] for r in out.collect()}
    assert got[0] == 0.5          # ACGT
    assert got[4] is None         # NN, mapped_only → empty
    assert got[6] == 1.0          # GGCC
    m = seq.frac_mapped(df, prov)
    gm = {r["start"]: r["frac_mapped"] for r in m.collect()}
    assert gm[0] == 1.0 and gm[4] == 0.0


def test_seq_gc_scalar():
    assert seq.seq_gc("ACGT") == 0.5
    assert seq.seq_gc("NNNN") is None
    assert seq.seq_gc("NNGG", mapped_only=False) == 0.5


def test_digest(spark):
    prov = seq.dict_fasta_provider({"chrT": "AAGAATTCAAGAATTCAA"})
    out = seq.digest({"chrT": 18}, prov, "GAATTC")
    got = sorted((r["start"], r["end"]) for r in out.collect())
    assert got == [(0, 2), (2, 10), (10, 18)]


def test_add_ucsc_name_column(spark):
    d = ivals(spark, [("chr1", 5, 10)])
    r = bf.add_ucsc_name_column(d).collect()[0]
    assert r["name"] == "chr1:5-10"


def test_resources_no_network(spark):
    from bioframe_spark.sources import resources

    assert resources.fetch_chromsizes("hg38")["chr1"] == 248956422
    client = resources.UCSCClient("hg38")
    assert client.fetch_chromsizes()["chrM"] == 16569
    # ucsc provider needs HTTP; local provider uses packaged acen facts
    # for hg19/hg38/hs1 and needs a cytoband file elsewhere
    with pytest.raises(resources.NetworkDisabled):
        resources.fetch_centromeres("hg38", provider="ucsc")
    assert resources.fetch_centromeres("hg38", provider="local").count() == 24
    with pytest.raises(ValueError, match="cytoband_path"):
        resources.fetch_centromeres("mm39", provider="local")


def test_fetch_gaps_packaged(spark):
    """Offline gap track: derived telomere + centromere subset with the
    reference's kept columns (chrom/start/end/length/type/bridge)."""
    from bioframe_spark.sources import resources

    gaps = resources.UCSCClient("hg38").fetch_gaps()
    assert gaps.columns == ["chrom", "start", "end", "length", "type",
                            "bridge"]
    rows = {(r["chrom"], r["type"]): r for r in gaps.collect()}
    # chr1 telomeres at both ends + its centromere gap
    assert rows[("chr1", "telomere")] is not None
    cen = rows[("chr1", "centromere")]
    assert cen["start"] < cen["end"] and cen["length"] == cen["end"] - cen["start"]
    tel_left = [r for r in gaps.filter("chrom='chr1' and start=0").collect()]
    assert tel_left and tel_left[0]["end"] == 10_000
    # the derived track is a valid bedframe input: every length positive
    assert gaps.filter("length <= 0 or start < 0").count() == 0
    # assemblies without packaged acen bands still get their telomere rows
    assert resources.UCSCClient("dm6").fetch_gaps() \
        .filter("type='centromere'").count() == 0
    # unpackaged assembly raises, with a pointer to path=
    with pytest.raises(resources.NetworkDisabled):
        resources.UCSCClient("xenTro10").fetch_gaps()


def test_fetch_mrna_offline(spark, tmp_path):
    """Offline mRNA: empty typed frame by default (synthetic rows are
    opt-in as of r6), labeled SAMPLE rows with sample=True; path= reads
    a local all_mrna table."""
    from bioframe_spark.sources import resources

    client = resources.UCSCClient("hg38")
    samp = client.fetch_mrna(sample=True)
    assert samp.count() > 0
    assert all(r["qName"].startswith("SAMPLE_mRNA_") for r in samp.collect())
    empty = client.fetch_mrna()
    assert empty.count() == 0
    assert "qName" in empty.columns and "tStart" in empty.columns
    p = tmp_path / "all_mrna.txt"
    row = "\t".join(map(str, [
        585, 95, 5, 0, 0, 0, 0, 0, 0, "+", "NM_000001", 100, 0, 100,
        "chr1", 248956422, 1000, 1100, 1, "100,", "0,", "1000,"]))
    p.write_text(row + "\n")
    got = client.fetch_mrna(path=str(p))
    r = got.collect()[0]
    assert r["qName"] == "NM_000001" and r["tStart"] == 1000


def test_write_bedgraph_golden(spark, tmp_path):
    """Byte-compare the prepped bedGraph against the expected text."""
    df = spark.createDataFrame(
        [("chr2", 10, 20, 1.5), ("chr1", 5, 9, 2.0), ("chr1", 0, 5, 0.5)],
        "chrom string, start long, end long, value double",
    )
    out = str(tmp_path / "bg")
    fileops.write_bedgraph(df, out, {"chr1": 100, "chr2": 100})
    import glob

    part = sorted(glob.glob(out + "/part-*.csv"))[0]
    got = open(part).read()
    assert got == "chr1\t0\t5\t0.5\nchr1\t5\t9\t2.0\nchr2\t10\t20\t1.5\n"
    sizes = open(out + "/chrom.sizes").read()
    assert sizes == "chr1\t100\nchr2\t100\n"


def test_prepare_bedgraph_rejects(spark):
    import pytest

    overlapping = spark.createDataFrame(
        [("chr1", 0, 10, 1.0), ("chr1", 5, 15, 2.0)],
        "chrom string, start long, end long, value double",
    )
    with pytest.raises(ValueError, match="overlap"):
        fileops.prepare_bedgraph(overlapping, {"chr1": 100})
    out_of_bounds = spark.createDataFrame(
        [("chr1", 0, 500, 1.0)], "chrom string, start long, end long, value double",
    )
    with pytest.raises(ValueError, match="bounds"):
        fileops.prepare_bedgraph(out_of_bounds, {"chr1": 100})
    unknown_chrom = spark.createDataFrame(
        [("chrZ", 0, 5, 1.0)], "chrom string, start long, end long, value double",
    )
    with pytest.raises(ValueError, match="bounds"):
        fileops.prepare_bedgraph(unknown_chrom, {"chr1": 100})


def test_to_bigwig_raises_cleanly_without_encoder(spark, tmp_path):
    import pytest

    df = spark.createDataFrame(
        [("chr1", 0, 5, 1.0)], "chrom string, start long, end long, value double",
    )
    with pytest.raises(NotImplementedError, match="prepped bedGraph left at"):
        fileops.to_bigwig(df, {"chr1": 100}, str(tmp_path / "o.bw"))


# --------------------------------------------------------------------------
# portal clients (reference sandbox/clients.py) — injectable transport
# --------------------------------------------------------------------------

def _encode_meta(spark):
    return spark.createDataFrame(
        [("ENCFF001", "hg19", "https://files.example/f1.bed.gz"),
         ("ENCFF002", "GRCh38", "https://files.example/f2.bed.gz"),
         ("ENCFF003", "GRCh38", "https://files.example/f3.bigWig")],
        "`File accession` string, `File assembly` string, "
        "`File download URL` string",
    )


def test_encode_client_fetch_and_cache(spark, tmp_path):
    calls = []

    def transport(url, headers):
        calls.append((url, headers))
        return b"payload:" + url.encode()

    c = bf.EncodeClient(str(tmp_path), "GRCh38",
                        metadata=_encode_meta(spark), transport=transport)
    # catalog filtered to the assembly, still a DataFrame
    assert c.meta.count() == 2
    p = c.fetch("ENCFF002")
    assert open(p, "rb").read() == b"payload:https://files.example/f2.bed.gz"
    assert p.endswith("GRCh38/f2.bed.gz")
    # second fetch is served from the cache — no new transport call
    assert c.fetch("ENCFF002") == p and len(calls) == 1
    # hg19 accession is outside the filtered catalog
    with pytest.raises(KeyError):
        c.fetch("ENCFF001")
    assert c.info_url("ENCSR000AAA").startswith(
        "https://www.encodeproject.org/experiments/")


def test_encode_client_rejects_unknown_assembly(spark, tmp_path):
    with pytest.raises(ValueError):
        bf.EncodeClient(str(tmp_path), "hg38-oops",
                        metadata=_encode_meta(spark))


def test_encode_client_default_transport_raises(spark, tmp_path):
    from bioframe_spark.sources.resources import NetworkDisabled

    c = bf.EncodeClient(str(tmp_path), "GRCh38", metadata=_encode_meta(spark))
    with pytest.raises(NetworkDisabled):
        c.fetch("ENCFF002")


def test_fdn_client_auth_header_and_organism_filter(spark, tmp_path):
    meta = spark.createDataFrame(
        [("4DNF1", "human", "https://files.example/a.pairs.gz"),
         ("4DNF2", "mouse", "https://files.example/b.pairs.gz")],
        "`File Accession` string, Organism string, "
        "`File Download URL` string",
    )
    seen = {}

    def transport(url, headers):
        seen["headers"] = headers
        return b"x"

    c = bf.FDNClient(str(tmp_path), "GRCh38", metadata=meta,
                     key_id="id", key_secret="sec", transport=transport)
    assert c.meta.count() == 1  # GRCh38 -> human-only catalog
    c.fetch("4DNF1")
    import base64
    assert seen["headers"]["Authorization"] == (
        b"Basic " + base64.b64encode(b"id:sec"))
    with pytest.raises(KeyError):
        c.fetch("4DNF2")
