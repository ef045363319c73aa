"""Sequence-dependent operators: GC fraction, mapped fraction, digest.

Reference: ``extras.py:170-354`` (frac_gc, frac_mapped, seq_gc, digest).
These need genome FASTA access; the Spark shape is an Arrow-batched pandas
UDF with a per-executor lazy FASTA handle (the reference's
``load_fasta`` lazy-record pattern, ``io/fileops.py:292-376``).

pysam/Biopython are not in this container, so the fetch layer accepts any
``fasta_provider``: a callable ``(chrom, start, end) -> str`` — tests use
a deterministic in-memory genome; production would pass a pysam-backed
provider (one handle per executor process, cached in a module global).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..core.specs import _resolve_cols

_PROVIDER_CACHE: dict = {}


def dict_fasta_provider(genome: dict[str, str]) -> Callable:
    """In-memory provider for tests / small genomes (broadcast-sized)."""
    def fetch(chrom: str, start: int, end: int) -> str:
        seq = genome.get(chrom, "")
        return seq[max(start, 0):max(end, 0)]

    return fetch


class FastaRecord:
    """Lazy record with the reference's slicing surface
    (``io/fileops.py:292-306``): ``record[start:end]`` / ``record[pos]``
    fetch through the provider."""

    def __init__(self, provider: Callable, name: str, length: int | None = None):
        self._provider = provider
        self.name = name
        self.length = length

    def __getitem__(self, key):
        if isinstance(key, slice):
            start = key.start or 0
            stop = key.stop if key.stop is not None else self.length
            if stop is None:
                stop = 1 << 40  # provider clips to the sequence end
            return self._provider(self.name, start, stop)
        return self._provider(self.name, key, key + 1)


def parse_fasta(path: str) -> dict[str, str]:
    """Dependency-free FASTA parser (plain or gzip text, driver-side —
    for test/small genomes; use the pysam engine for indexed access to
    multi-GB files). Returns name → sequence."""
    import gzip

    opener = gzip.open if path.endswith(".gz") else open
    records: dict[str, str] = {}
    name = None
    parts: list[str] = []
    with opener(path, "rt") as fh:
        for line in fh:
            line = line.strip()
            if not line:
                continue
            if line.startswith(">"):
                if name is not None:
                    records[name] = "".join(parts)
                name = line[1:].split()[0]
                parts = []
            elif name is not None:
                parts.append(line)
        if name is not None:
            records[name] = "".join(parts)
    return records


def load_fasta(filepath_or, engine: str = "auto", **kwargs) -> dict:
    """Lazy FASTA records (reference ``io/fileops.py:309-376``): an
    ordered dict of name → sliceable record.

    ``engine='pysam'`` wraps an indexed ``pysam.FastaFile`` (the path for
    multi-GB genomes); ``engine='python'`` uses the dependency-free text
    parser (plain/.gz, loads sequences in memory); ``'auto'`` prefers
    pysam and falls back to the parser. An iterable of paths loads one
    record per file (reference multifile mode).
    """
    is_multi = not isinstance(filepath_or, str)
    paths = list(filepath_or) if is_multi else [filepath_or]

    if engine in ("auto", "pysam"):
        try:
            import pysam  # noqa: F401
            have_pysam = True
        except ImportError:
            have_pysam = False
            if engine == "pysam":
                raise ImportError("pysam is required for engine='pysam'") from None
        if have_pysam:
            records: dict = {}
            for p in paths:
                prov = pysam_fasta_provider(p)
                import pysam

                ff = pysam.FastaFile(p, **kwargs)
                names = ff.references if not is_multi else ff.references[:1]
                for name in names:
                    records[name] = FastaRecord(
                        prov, name, ff.get_reference_length(name)
                    )
            return records

    if engine not in ("auto", "python"):
        raise ValueError("engine must be 'auto', 'pysam' or 'python'")
    records = {}
    for p in paths:
        seqs = parse_fasta(p)
        items = list(seqs.items())[:1] if is_multi else seqs.items()
        for name, seq in items:
            prov = dict_fasta_provider({name: seq})
            records[name] = FastaRecord(prov, name, len(seq))
    return records


def pysam_fasta_provider(fasta_path: str) -> Callable:
    """Lazy per-executor pysam handle (one per process, cached)."""
    def fetch(chrom: str, start: int, end: int) -> str:
        try:
            import pysam
        except ImportError as e:  # pragma: no cover
            raise ImportError("pysam required for FASTA-backed sequence ops") from e
        handle = _PROVIDER_CACHE.get(fasta_path)
        if handle is None:
            handle = pysam.FastaFile(fasta_path)
            _PROVIDER_CACHE[fasta_path] = handle
        return handle.fetch(chrom, start, end)

    return fetch


def _seq_stats_udf(df, ck, sk, ek, provider, mapped_only, out_col):
    schema = T.StructType(df.schema.fields + [T.StructField(out_col, T.DoubleType())])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vals = []
            for chrom, start, end in zip(pdf[ck], pdf[sk], pdf[ek]):
                if chrom is None or pd.isna(start):
                    vals.append(None)
                    continue
                seq = provider(chrom, int(start), int(end)).upper()
                if out_col == "frac_mapped":
                    n = len(seq)
                    vals.append((n - seq.count("N")) / n if n else None)
                else:
                    if mapped_only:
                        seq = seq.replace("N", "")
                    n = len(seq)
                    gc = seq.count("G") + seq.count("C")
                    vals.append(gc / n if n else None)
            out = pdf.copy()
            out[out_col] = pd.array(vals, dtype="float64")
            yield out

    return df.mapInPandas(run, schema)


def frac_gc(df: DataFrame, fasta_provider: Callable, mapped_only: bool = True,
            cols=None) -> DataFrame:
    """GC fraction per interval (reference ``extras.py:269-354``).

    NaN when no (mapped) bases — matches the reference's NaN-on-empty."""
    ck, sk, ek = _resolve_cols(cols)
    return _seq_stats_udf(df, ck, sk, ek, fasta_provider, mapped_only, "GC")


def frac_mapped(df: DataFrame, fasta_provider: Callable, cols=None) -> DataFrame:
    """Fraction of non-N bases per interval (reference ``extras.py:220-266``)."""
    ck, sk, ek = _resolve_cols(cols)
    return _seq_stats_udf(df, ck, sk, ek, fasta_provider, False, "frac_mapped")


def seq_gc(seq: str, mapped_only: bool = True) -> float | None:
    """Driver-side scalar GC of one sequence (reference ``extras.py:322-354``)."""
    seq = seq.upper()
    if mapped_only:
        seq = seq.replace("N", "")
    if not seq:
        return None
    return (seq.count("G") + seq.count("C")) / len(seq)


# Public restriction-enzyme facts: IUPAC recognition site + 0-based cut
# offset from the site start on the + strand (REBASE conventions, e.g.
# EcoRI = G^AATTC → ("GAATTC", 1)). The reference resolves these through
# Biopython (``extras.py:186-203``); carrying the (site, offset) pairs
# directly keeps digest dependency-free and the table injectable.
RESTRICTION_ENZYMES: dict[str, tuple[str, int]] = {
    "EcoRI": ("GAATTC", 1),
    "BamHI": ("GGATCC", 1),
    "BglII": ("AGATCT", 1),
    "HindIII": ("AAGCTT", 1),
    "DpnII": ("GATC", 0),
    "MboI": ("GATC", 0),
    "Sau3AI": ("GATC", 0),
    "HinfI": ("GANTC", 1),
    "AluI": ("AGCT", 2),
    "HaeIII": ("GGCC", 2),
    "HpaII": ("CCGG", 1),
    "MspI": ("CCGG", 1),
    "NlaIII": ("CATG", 4),
    "NcoI": ("CCATGG", 1),
    "NotI": ("GCGGCCGC", 2),
    "PstI": ("CTGCAG", 5),
    "SacI": ("GAGCTC", 5),
    "XhoI": ("CTCGAG", 1),
    "ClaI": ("ATCGAT", 2),
    "EcoRV": ("GATATC", 3),
}

_IUPAC = {
    "A": "A", "C": "C", "G": "G", "T": "T", "N": ".",
    "R": "[AG]", "Y": "[CT]", "W": "[AT]", "S": "[CG]",
    "M": "[AC]", "K": "[GT]", "B": "[CGT]", "D": "[AGT]",
    "H": "[ACT]", "V": "[ACG]",
}


def _site_regex(site: str) -> str:
    # lookahead so overlapping recognition sites are all found (Biopython
    # reports overlapping sites too)
    body = "".join(_IUPAC.get(ch, ch) for ch in site.upper())
    return f"(?=({body}))"


def digest(chromsizes: dict, fasta_provider: Callable, enzyme: str,
           enzyme_table: dict | None = None, cols=None) -> DataFrame:
    """Restriction fragments (reference ``extras.py:170-217``).

    ``enzyme`` is either a known enzyme name (resolved through
    ``enzyme_table``, default ``RESTRICTION_ENZYMES``: IUPAC site +
    0-based cut offset from the site start — the dependency-free stand-in
    for the reference's Biopython ``Restriction`` lookup) or a raw
    IUPAC site string (cut at the site start, offset 0).

    Fragment boundaries are ``match_start + cut_offset`` clipped to
    (0, length); one chromosome per input row inside ``mapInPandas``,
    fragment intervals out — parallel across chromosomes, and the
    sequence never moves through a shuffle.
    """
    import re

    ck, sk, ek = _resolve_cols(cols)
    from pyspark.sql import SparkSession

    table = enzyme_table if enzyme_table is not None else RESTRICTION_ENZYMES
    if enzyme in table:
        site, offset = table[enzyme]
    else:
        bad = set(enzyme.upper()) - set(_IUPAC)
        if bad:
            raise ValueError(
                f"unknown enzyme {enzyme!r} (not in the enzyme table and not "
                f"an IUPAC site: bad characters {sorted(bad)})"
            )
        site, offset = enzyme, 0
    pattern = _site_regex(site)

    spark = SparkSession.active()
    from ..core.construction import local_df
    chrom_df = local_df(
        [(c, int(n)) for c, n in chromsizes.items()],
        T.StructType.fromDDL("chrom string, length long"),
    )
    schema = T.StructType([
        T.StructField(ck, T.StringType()),
        T.StructField(sk, T.LongType()),
        T.StructField(ek, T.LongType()),
        T.StructField("n_fragment", T.LongType()),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rx = re.compile(pattern)
        for pdf in batches:
            rows = []
            for chrom, length in zip(pdf["chrom"], pdf["length"]):
                length = int(length)
                seq = fasta_provider(chrom, 0, length).upper()
                cuts = sorted(
                    {m.start() + offset for m in rx.finditer(seq)
                     if 0 < m.start() + offset < length}
                )
                bounds = [0, *cuts, length]
                for i in range(len(bounds) - 1):
                    if bounds[i] < bounds[i + 1]:
                        rows.append((chrom, bounds[i], bounds[i + 1], i))
            yield pd.DataFrame(rows, columns=[ck, sk, ek, "n_fragment"])

    return chrom_df.mapInPandas(run, schema)
