"""Schema registry for genomic tabular formats.

Parity with reference ``io/schemas.py:11-198`` (same field lists, same
format names) but as Spark ``StructType``s with real dtypes, so
``spark.read.csv`` needs no inference pass. BED block lists become proper
``ArrayType`` columns at parse time (``io/bed.py:384-475`` validates them
as comma strings; here ``split``+``transform`` is free).
"""

from __future__ import annotations

from pyspark.sql import types as T

_S = T.StringType()
_L = T.LongType()
_D = T.DoubleType()


def _st(*fields) -> T.StructType:
    return T.StructType([T.StructField(n, t) for n, t in fields])


BED3 = [("chrom", _S), ("start", _L), ("end", _L)]
BED6 = BED3 + [("name", _S), ("score", _L), ("strand", _S)]
BED9 = BED6 + [("thickStart", _L), ("thickEnd", _L), ("itemRgb", _S)]
BED12 = BED9 + [("blockCount", _L), ("blockSizes", _S), ("blockStarts", _S)]

SCHEMAS: dict[str, T.StructType] = {
    "bed3": _st(*BED3),
    "bed4": _st(*BED3, ("name", _S)),
    "bed5": _st(*BED3, ("name", _S), ("score", _L)),
    "bed6": _st(*BED6),
    "bed9": _st(*BED9),
    "bed12": _st(*BED12),
    "bed": _st(*BED6),
    "bedGraph": _st(("chrom", _S), ("start", _L), ("end", _L), ("value", _D)),
    "bedpe": _st(
        ("chrom1", _S), ("start1", _L), ("end1", _L),
        ("chrom2", _S), ("start2", _L), ("end2", _L),
        ("name", _S), ("score", _L), ("strand1", _S), ("strand2", _S),
    ),
    "gff": _st(
        ("chrom", _S), ("source", _S), ("feature", _S), ("start", _L),
        ("end", _L), ("score", _S), ("strand", _S), ("frame", _S),
        ("attributes", _S),
    ),
    "gtf": _st(
        ("chrom", _S), ("source", _S), ("feature", _S), ("start", _L),
        ("end", _L), ("score", _S), ("strand", _S), ("frame", _S),
        ("attributes", _S),
    ),
    "narrowPeak": _st(
        *BED6, ("fc", _D), ("-log10p", _D), ("-log10q", _D), ("relSummit", _L)
    ),
    "broadPeak": _st(*BED6, ("fc", _D), ("-log10p", _D), ("-log10q", _D)),
    "gappedPeak": _st(
        *BED12, ("fc", _D), ("-log10p", _D), ("-log10q", _D)
    ),
    "jaspar": _st(
        ("chrom", _S), ("start", _L), ("end", _L), ("name", _S),
        ("score", _L), ("pval", _L), ("strand", _S),
    ),
    "gap": _st(
        ("bin", _L), ("chrom", _S), ("start", _L), ("end", _L), ("ix", _L),
        ("n", _S), ("length", _L), ("type", _S), ("bridge", _S),
    ),
    "centromeres": _st(("bin", _L), ("chrom", _S), ("start", _L), ("end", _L), ("name", _S)),
    "cytoband": _st(("chrom", _S), ("start", _L), ("end", _L), ("name", _S), ("gieStain", _S)),
    "sam": _st(
        ("QNAME", _S), ("FLAG", _L), ("RNAME", _S), ("POS", _L),
        ("MAPQ", _L), ("CIGAR", _S), ("RNEXT", _S), ("PNEXT", _L),
        ("TLEN", _L), ("SEQ", _S), ("QUAL", _S), ("TAGs", _S),
    ),
    "vcf": _st(
        ("chrom", _S), ("pos", _L), ("id", _S), ("ref", _S), ("alt", _S),
        ("qual", _S), ("filter", _S), ("info", _S),
    ),
    "chromsizes": _st(("chrom", _S), ("length", _L)),
    "pgsnp": _st(
        *BED3, ("name", _S), ("alleleCount", _L), ("alleleFreq", _S),
        ("alleleScores", _S),
    ),
    "bedRnaElements": _st(
        *BED6, ("level", _D), ("signif", _D), ("score2", _L)
    ),
    "all_mrna": _st(
        ("bin", _L), ("matches", _L), ("misMatches", _L), ("repMatches", _L),
        ("nCount", _L), ("qNumInsert", _L), ("qBaseInsert", _L),
        ("tNumInsert", _L), ("tBaseInsert", _L), ("strand", _S),
        ("qName", _S), ("qSize", _L), ("qStart", _L), ("qEnd", _L),
        ("tName", _S), ("tSize", _L), ("tStart", _L), ("tEnd", _L),
        ("blockCount", _L), ("blockSizes", _S), ("qStarts", _S), ("tStarts", _S),
    ),
}


def infer_bed_schema(n_cols: int) -> str:
    """bed{n} name from a column count (reference ``io/bed.py:581-589``)."""
    if not 3 <= n_cols <= 12:
        raise ValueError(f"BED files have 3-12 columns, got {n_cols}")
    return f"bed{n_cols}"


def parse_bed_schema(schema: str) -> tuple[int, int]:
    """'bedN(+M)' → (n standard fields, m extra) (``io/bed.py:592-599``)."""
    import re

    m = re.fullmatch(r"bed(\d+)(?:\+(\d+))?", schema)
    if not m:
        raise ValueError(f"invalid BED schema string: {schema!r}")
    n = int(m.group(1))
    if not 3 <= n <= 12:
        raise ValueError(f"BED files have 3-12 standard columns, got {n}")
    return n, int(m.group(2) or 0)


# Per-assembly chromosome-name capture patterns (reference
# ``io/schemas.py:201-267`` — public UCSC/NCBI naming conventions). Each
# tuple is ordered: ``read_chromsizes`` emits the group matching pattern
# i before the group matching pattern i+1, natural-sorted within a group.
CHROM_NAME_PATTERNS: dict[str, tuple] = {
    "hg19": (
        r"^chr[0-9]+$", r"^chr[XY]$", r"^chrM$",
        r"^chr(?!Un).+_.*_random$", r"^chrUn_.*$", r"^chr(?!Un).+_.*_hap\d+$",
    ),
    "hg38": (
        r"^chr[0-9]+$", r"^chr[XY]$", r"^chrM$", r"^chrEBV$",
        r"^chr(?!Un).+_.*_random$", r"^chrUn_.*$", r"^chr(?!Un).+_.*_alt$",
    ),
    "mm9": (
        r"^chr[0-9]+$", r"^chr[XY]$", r"^chrM$",
        r"^chr(?!Un).+_random$", r"^chrUn_random$",
    ),
    "mm10": (
        r"^chr[0-9]+$", r"^chr[XY]$", r"^chrM$",
        r"^chr(?!Un).+_random$", r"^chrUn_.*$",
    ),
    "mm39": (
        r"^chr[0-9]+$", r"^chr[XY]$", r"^chrM$",
        r"^chr(?!Un).+_random$", r"^chrUn_.*$",
    ),
    "galGal5": (
        r"^chr[0-9]+$", r"^chr[ZW]$", r"^chrM$", r"^chrLGE64$",
        r"^chr(?!Un).+_random$", r"^chrUn_.*$",
    ),
    "dm6": (
        r"^chr[234][LR]*", r"^chr[XY]$", r"^chrM$",
        r"^chr(?!Un).+_random$", r"^chrUn_.*$",
    ),
    "ce11": (r"chr[IV]+$", r"^chrX$", r"^chrM$"),
    "sacCer3": (r"chr[IXV]+$", r"^chrM$"),
}

# UCSC/NCBI sequence-class regexes (reference ``io/schemas.py:270-283``)
UCSC_AUTOSOMES = r"^chr[0-9]+[A-Za-z]*$"
UCSC_SEXCHROMS = r"^chr[XYZW][A-Za-z]*$"
UCSC_NONNUCLEAR = r"^chrM$"
UCSC_UNLOCALIZED = r"^chr(?!Un).+.*_random$"
UCSC_UNPLACED = r"^chrUn_.*$|^chrU[A-Za-z]*$"
UCSC_ALTCHROMS = r"^chr(?!Un).+_.*_hap\d+$|^chr(?!Un).+_.*_alt$"
NCBI_AUTOSOMES = r"^[0-9]+$"
NCBI_SEXCHROMS = r"^[XYZW]$"
NCBI_NONNUCLEAR = r"^MT$|^Pltd$"
