"""Readers/writers for genomic tabular formats, Spark-native.

Parity targets: ``read_table`` (reference ``io/fileops.py:42-83``),
``read_chromsizes`` (``:86-160``), ``to_bed`` + validators
(``io/bed.py:127-738``). gzip is handled natively by Spark's text codecs;
the named-schema dispatch mirrors ``SCHEMAS`` (``io/schemas.py:174-198``).

Executor-side indexed formats (tabix/BAM/bigWig) follow the reference's
optional-dependency pattern (``io/fileops.py:14-21``): the partition-level
plumbing is here, the pysam/pybigtools calls are gated behind try-imports
and raise a clear error when the library is absent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .schemas import SCHEMAS, infer_bed_schema
from ..functions.intervals import natsort_key


def _spark() -> SparkSession:
    return SparkSession.active()


def read_table(path: str, schema: str | None = "bed3", sep: str = "\t",
               comment: str = "#", header: bool = False) -> DataFrame:
    """Read a genomic text table with a named schema (no inference pass).

    ``schema`` is a key of ``SCHEMAS`` ('bed6', 'gtf', 'narrowPeak', …) or
    None for inference. Compressed inputs (.gz) decode natively.
    """
    reader = (
        _spark().read.option("sep", sep).option("comment", comment)
        .option("header", str(header).lower())
    )
    if schema is None:
        return reader.option("inferSchema", "true").csv(path)
    if schema not in SCHEMAS:
        raise ValueError(f"unknown schema {schema!r}; have {sorted(SCHEMAS)}")
    return reader.schema(SCHEMAS[schema]).csv(path)


def read_chromsizes(path: str, filter_chroms: bool = True,
                    chrom_patterns: tuple = (r"^chr[0-9]+$", r"^chr[XY]$", r"^chrM$"),
                    natsort: bool = True) -> DataFrame:
    """UCSC chrom.sizes → (chrom, length) with regex filtering + natural
    sort (reference ``io/fileops.py:86-160``)."""
    df = read_table(path, schema="chromsizes")
    if filter_chroms:
        pred = F.lit(False)
        for pat in chrom_patterns:
            pred = pred | F.col("chrom").rlike(pat)
        df = df.filter(pred)
    if natsort:
        df = df.orderBy(natsort_key(F.col("chrom")))
    return df


def chromsizes_dict(df: DataFrame) -> dict:
    """Collect a chromsizes frame to a driver-side {chrom: length} dict."""
    return {r["chrom"]: r["length"] for r in df.collect()}


# --------------------------------------------------------------------------
# BED writer + validator queries (reference io/bed.py)
# --------------------------------------------------------------------------

BED_FIELD_VALIDATORS: dict[str, str] = {
    # column → boolean SQL predicate that must hold on every non-null row
    "chrom": "chrom rlike '^[A-Za-z0-9_]{1,255}$'",
    "start": "start >= 0",
    "end": "end >= 0 AND end >= start",
    "name": "length(name) BETWEEN 1 AND 255",
    "score": "score BETWEEN 0 AND 1000",
    "strand": "strand IN ('+','-','.')",
    "thickStart": "thickStart >= 0",
    "thickEnd": "thickEnd >= 0",
    "itemRgb": "itemRgb = '0' OR itemRgb rlike '^\\\\d{1,3},\\\\d{1,3},\\\\d{1,3}$'",
    "blockCount": "blockCount > 0",
}

BED_FIELD_FILLVALUES = {
    "name": ".",
    "score": "0",
    "strand": ".",
    "thickStart": None,   # filled from start
    "thickEnd": None,     # filled from end
    "itemRgb": "0",
}


def validate_bed(df: DataFrame, raise_errors: bool = True) -> dict[str, int]:
    """Run the per-field validator queries; returns violation counts.

    Mirrors the reference's 12 per-field validators + block structure
    checks (``io/bed.py:127-543``) as aggregate filters — one job, no
    collect of data rows.
    """
    bad: dict[str, int] = {}
    for colname, pred in BED_FIELD_VALIDATORS.items():
        if colname not in df.columns:
            continue
        n = df.filter(F.col(colname).isNotNull()).filter(f"NOT ({pred})").count()
        if n:
            bad[colname] = n
    # block structure: counts match, first block at 0, blocks within interval
    if {"blockCount", "blockSizes", "blockStarts"} <= set(df.columns):
        sizes = F.split(F.regexp_replace("blockSizes", ",$", ""), ",")
        starts = F.split(F.regexp_replace("blockStarts", ",$", ""), ",")
        viol = (
            (F.size(sizes) != F.col("blockCount"))
            | (F.size(starts) != F.col("blockCount"))
            | (F.element_at(starts, 1).cast("long") != 0)
            | (
                F.element_at(starts, -1).cast("long")
                + F.element_at(sizes, -1).cast("long")
                != F.col("end") - F.col("start")
            )
        )
        n = df.filter(F.col("blockCount").isNotNull()).filter(viol).count()
        if n:
            bad["blocks"] = n
    if bad and raise_errors:
        raise ValueError(f"BED validation failed: {bad}")
    return bad


def to_bed(df: DataFrame, path: str | None = None, schema: str = "infer",
           validate: bool = True, sort: bool = True,
           single_file: bool = True, **kwargs) -> DataFrame:
    """Write a BED file — delegates to the full-parity validator suite in
    :mod:`bioframe_spark.sources.bed` (reference ``io/bed.py:685-738``).

    Extra ``kwargs`` (chromsizes, strict_score, replace_na,
    require_sorted) pass through to :func:`bed.to_bed`.
    """
    from . import bed as _bed

    # legacy 'bedN' strings map onto the parity parser's schema names
    return _bed.to_bed(
        df, path, schema=schema or "infer", validate_fields=validate,
        sort=sort, single_file=single_file, **kwargs
    )


# --------------------------------------------------------------------------
# GTF attributes (reference sandbox/gtf_io.py:4-16)
# --------------------------------------------------------------------------

def parse_gtf_attributes(df: DataFrame, attr_col: str = "attributes",
                         keys: list[str] | None = None) -> DataFrame:
    """Parse ``k "v"; k2 "v2";`` GTF attribute strings into columns via
    ``str_to_map`` — pure SQL, no UDF."""
    cleaned = F.regexp_replace(F.col(attr_col), r'"', "")
    m = F.expr(
        f"str_to_map(regexp_replace({attr_col}, '\"', ''), '; *', ' ')"
    )
    out = df.withColumn("__attrs", m)
    for k in keys or []:
        out = out.withColumn(k, F.col("__attrs").getItem(k))
    return out.drop("__attrs") if keys else out.withColumnRenamed("__attrs", "attrs_map")


# --------------------------------------------------------------------------
# executor-side indexed formats (optional deps, reference io/fileops.py)
# --------------------------------------------------------------------------

def read_tabix(path: str, regions: list[tuple]) -> DataFrame:
    """Region-indexed fetch from a bgzip/tabix file: the region list
    parallelizes over executors; each partition opens its own pysam handle
    (reference ``io/fileops.py:163-180``)."""
    try:
        import pysam  # noqa: F401
    except ImportError as e:
        raise ImportError("read_tabix requires pysam (not installed here)") from e
    spark = _spark()

    def fetch(region):
        import pysam

        tb = pysam.TabixFile(path)
        chrom, start, end = region
        return [tuple(row.split("\t")) for row in tb.fetch(chrom, start, end)]

    rdd = spark.sparkContext.parallelize(regions, len(regions)).flatMap(fetch)
    return rdd.toDF()


def read_pairix(path: str, regions2d: list[tuple]) -> DataFrame:
    """2-D block queries from a pairix-indexed pairs file (reference
    ``io/fileops.py:183-235``): the (region1, region2) block list
    parallelizes over executors, pypairix handle per partition."""
    try:
        import pypairix  # noqa: F401
    except ImportError as e:
        raise ImportError("read_pairix requires pypairix (not installed here)") from e
    raise NotImplementedError("pairix partition reader: pypairix absent in this container")


def read_bigbed(path: str, regions: list[tuple]) -> DataFrame:
    """bigBed interval fetch per region (reference ``io/fileops.py:434-486``)."""
    try:
        import pyBigWig  # noqa: F401
    except ImportError as e:
        raise ImportError("read_bigbed requires pyBigWig/pybbi (not installed here)") from e
    raise NotImplementedError("bigBed partition reader: engine absent in this container")


def read_alignments(path: str, chunks: list[tuple]) -> DataFrame:
    """SAM/BAM/CRAM → 12-col frame; (file, region) shards per partition
    (reference ``io/fileops.py:238-289``)."""
    try:
        import pysam  # noqa: F401
    except ImportError as e:
        raise ImportError("read_alignments requires pysam (not installed here)") from e
    raise NotImplementedError("BAM partition reader: pysam absent in this container")


def prepare_bedgraph(df: DataFrame, chromsizes: dict,
                     value_col: str | None = None) -> DataFrame:
    """Spark-side prep for the bigWig sink (reference
    ``io/fileops.py:515-593``): validate bedGraph shape, clamp to known
    chromosomes, verify bounds and non-overlap (``bedGraphToBigWig``
    rejects overlapping input), and return the 4-column frame sorted by
    (chrom, start, end).

    All heavy work (validation scans, the sort) is distributed; only the
    final text write is single-writer by format convention.
    """
    for col in ("chrom", "start", "end"):
        if col not in df.columns:
            raise ValueError(f"A bedGraph-like DataFrame is required, got {df.columns}")
    if len(df.columns) < 4:
        raise ValueError("bedGraph needs chrom, start, end + a value column")
    if value_col is None:
        value_col = df.columns[3]
    bg = df.select("chrom", "start", "end", F.col(value_col).alias(value_col))

    cs = _spark().createDataFrame(
        [(str(c), int(s)) for c, s in chromsizes.items()],
        "__c string, __size long",
    )
    j = bg.join(F.broadcast(cs), bg["chrom"] == F.col("__c"), "left")
    n_bad = j.filter(
        F.col("__size").isNull() | (F.col("start") < 0)
        | (F.col("end") > F.col("__size")) | (F.col("start") >= F.col("end"))
    ).limit(1).count()
    if n_bad:
        raise ValueError("bedGraph rows out of chromsizes bounds or malformed")
    from pyspark.sql import Window as _W

    w = _W.partitionBy("chrom").orderBy("start", "end")
    prev_end = F.lag("end").over(w)
    n_over = (
        bg.withColumn("__pe", prev_end)
        .filter(F.col("__pe").isNotNull() & (F.col("start") < F.col("__pe")))
        .limit(1).count()
    )
    if n_over:
        raise ValueError("bedGraph intervals overlap; merge/pileup them first")
    return bg.orderBy("chrom", "start", "end")


def write_bedgraph(df: DataFrame, path: str, chromsizes: dict,
                   value_col: str | None = None) -> str:
    """Write the prepped bedGraph as one sorted TSV part plus a
    ``chrom.sizes`` sibling — the exact inputs ``bedGraphToBigWig``
    consumes. Returns the bedGraph directory path."""
    bg = prepare_bedgraph(df, chromsizes, value_col)
    bg.coalesce(1).write.mode("overwrite").option("sep", "\t").csv(path)
    import os

    with open(os.path.join(path, "chrom.sizes"), "w") as fh:
        for c, s in chromsizes.items():
            fh.write(f"{c}\t{int(s)}\n")
    return path


def _bedgraph_part(path: str) -> str:
    import glob
    import os

    parts = sorted(glob.glob(os.path.join(path, "part-*.csv"))) or sorted(
        glob.glob(os.path.join(path, "part-*"))
    )
    return parts[0]


def to_bigwig(df: DataFrame, chromsizes: dict, out_path: str,
              value_col: str | None = None, engine: str = "auto",
              path_to_binary: str | None = None) -> None:
    """bedGraph → bigWig sink (reference ``io/fileops.py:515-593``).

    Spark prepares and writes the sorted bedGraph + chrom.sizes
    (:func:`write_bedgraph`, fully distributed up to the final text
    write); the binary encode is the UCSC ``bedGraphToBigWig`` CLI or
    pybigtools on the driver — a single-writer step by format design.
    """
    import shutil
    import subprocess
    import tempfile

    tmp = tempfile.mkdtemp(prefix="bg_prep_")
    bg_dir = write_bedgraph(df, tmp, chromsizes, value_col)
    part, sizes = _bedgraph_part(bg_dir), f"{bg_dir}/chrom.sizes"

    cli = path_to_binary or shutil.which("bedGraphToBigWig")
    if engine in ("auto", "ucsc") and cli:
        subprocess.run([cli, part, sizes, out_path], check=True)
        return
    try:
        import pybigtools
    except ImportError:
        raise NotImplementedError(
            "no bigWig encoder available (need the UCSC bedGraphToBigWig CLI "
            f"or pybigtools); prepped bedGraph left at {part}"
        ) from None
    f = pybigtools.open(out_path, "w")
    with open(part) as fh:
        f.write(
            chroms={c: int(s) for c, s in chromsizes.items()},
            vals=(
                (p[0], int(p[1]), int(p[2]), float(p[3]))
                for p in (line.rstrip("\n").split("\t") for line in fh)
            ),
        )
    f.close()


def to_bigbed(df: DataFrame, chromsizes: dict, out_path: str,
              schema: str = "infer", engine: str = "auto",
              path_to_binary: str | None = None) -> None:
    """BED → bigBed sink (reference ``io/fileops.py:596-669``): full BED
    validation (:mod:`.bed`), chromsizes bounds, sorted single-part text,
    then the UCSC ``bedToBigBed`` CLI on the driver."""
    import os
    import shutil
    import subprocess
    import tempfile

    from . import bed as _bed

    coerced = _bed.to_bed_dataframe(df, schema=schema, chromsizes=chromsizes)
    tmp = tempfile.mkdtemp(prefix="bb_prep_")
    (coerced.orderBy("chrom", "start", "end").coalesce(1)
     .write.mode("overwrite").option("sep", "\t").csv(tmp))
    sizes = os.path.join(tmp, "chrom.sizes")
    with open(sizes, "w") as fh:
        for c, s in chromsizes.items():
            fh.write(f"{c}\t{int(s)}\n")
    part = _bedgraph_part(tmp)

    cli = path_to_binary or shutil.which("bedToBigBed")
    if engine in ("auto", "ucsc") and cli:
        subprocess.run([cli, part, sizes, out_path], check=True)
        return
    raise NotImplementedError(
        "no bigBed encoder available (need the UCSC bedToBigBed CLI); "
        f"prepped sorted BED left at {part}"
    )


def to_parquet_partitioned(df: DataFrame, path: str, by: str = "chrom",
                           sort_within: bool = True, cols=None) -> None:
    """Write an interval table partitioned by chromosome with rows sorted
    within files — the layout that makes ``select(region)`` a
    partition-pruned, row-group-pruned scan (see SCALING.md §5)."""
    from ..core.specs import _resolve_cols

    ck, sk, ek = _resolve_cols(cols)
    out = df
    if sort_within:
        out = out.sortWithinPartitions(ck, sk, ek)
    out.write.mode("overwrite").partitionBy(by).parquet(path)


def read_bigwig(path: str, regions: list[tuple]) -> DataFrame:
    """bigWig value intervals per region (reference ``io/fileops.py:379-432``)."""
    try:
        import pyBigWig  # noqa: F401
    except ImportError as e:
        raise ImportError("read_bigwig requires pyBigWig (not installed here)") from e
    raise NotImplementedError("bigWig partition reader: pyBigWig absent in this container")
