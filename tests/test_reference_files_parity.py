"""File-level A/B parity: both engines read the REFERENCE'S OWN test
data files (reference ``tests/test_data/``, read-only) and must produce
the same frames — the strongest end-to-end check the named-schema
readers can get, since these are the exact files the reference's
``test_fileops.py`` pins its behavior on."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest

from bioframe_spark.sources import fileops
from test_reference_parity_ab import load_reference

DATA = "/root/reference/tests/test_data"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(DATA), reason="reference test_data not available")


@pytest.fixture(scope="module")
def ref():
    return load_reference()


def _match(sdf, pdf, dot_null_cols=()):
    """Order-insensitive frame compare on shared column names.

    ``dot_null_cols``: columns our TYPED schema reads as integers where
    the BED convention writes '.' for missing — the reference's untyped
    pandas read keeps the literal '.', this engine maps it to NULL
    (documented deviation: a typed engine cannot store '.' in a long
    column, and NULL is what '.' means). The compare treats the two as
    equal for those columns."""
    got = sdf.toPandas()
    pdf = pdf.copy()
    for c in dot_null_cols:
        pdf[c] = pdf[c].map(lambda v: None if v == "." else v)
    assert sorted(got.columns) == sorted(pdf.columns), \
        (sorted(got.columns), sorted(pdf.columns))
    cols = sorted(pdf.columns)

    def canon(df):
        c = df[cols].copy()
        for col in cols:
            c[col] = c[col].map(
                lambda v: "<NULL>" if v is None or (isinstance(v, float)
                                                    and np.isnan(v))
                else str(v))
        return c.sort_values(cols, ignore_index=True)

    pd.testing.assert_frame_equal(canon(got), canon(pdf))


@pytest.mark.parametrize("fname,schema,dot_null", [
    ("jaspar.bed", "jaspar", ()),
    ("narrowPeak.bed", "narrowPeak", ()),
    ("bed9.bed", "bed9", ("thickStart", "thickEnd")),
    ("bed12.bed", "bed12", ()),
])
def test_read_table_matches_reference(spark, ref, fname, schema, dot_null):
    path = f"{DATA}/{fname}"
    want = ref.read_table(path, schema=schema)
    got = fileops.read_table(path, schema=schema)
    _match(got, want, dot_null_cols=dot_null)


def test_read_chromsizes_matches_reference(spark, ref):
    path = f"{DATA}/test.chrom.sizes"
    want = ref.read_chromsizes(path)  # pandas Series name->length
    got = {r["chrom"]: r["length"]
           for r in fileops.read_chromsizes(path).collect()}
    assert got == {str(k): int(v) for k, v in want.items()}
    # and the unfiltered view keeps every contig in the file
    raw = {r["chrom"]: r["length"]
           for r in fileops.read_chromsizes(path,
                                            filter_chroms=False).collect()}
    with open(path) as f:
        n_lines = sum(1 for line in f if line.strip())
    assert len(raw) == n_lines


def test_load_fasta_matches_file(spark):
    """The pure-Python FASTA provider reads the reference's test.fa; the
    .fai index (name, length) is the ground truth for record shapes."""
    records = fileops  # noqa: F841  (import guard pattern below)
    from bioframe_spark.operators.sequence import load_fasta

    fa = load_fasta(f"{DATA}/test.fa", engine="python")
    fai = {}
    with open(f"{DATA}/test.fa.fai") as f:
        for line in f:
            name, length = line.split("\t")[:2]
            fai[name] = int(length)
    assert set(fa.keys()) == set(fai.keys())
    for name, length in fai.items():
        seq = fa[name][:]
        seq = seq if isinstance(seq, str) else str(seq)
        assert len(seq) == length


def test_overlap_preserves_coord_dtypes(spark):
    """Reference pins that overlap keeps input coordinate dtypes
    (tests/test_ops.py::test_overlap_preserves_coord_dtypes); here:
    int32 coords stay int32 through every join type and both physical
    strategies (internal arithmetic may widen, output columns may not)."""
    import bioframe_spark as bf

    a = spark.createDataFrame([("chr1", 1, 10)],
                              "chrom string, start int, end int")
    b = spark.createDataFrame([("chr1", 5, 12), ("chr2", 0, 3)],
                              "chrom string, start int, end int")
    want = ("struct<chrom:string,start:int,end:int,"
            "chrom_b:string,start_b:int,end_b:int>")
    for how in ("inner", "left", "right", "outer"):
        for strategy in ("auto", "binned"):
            out = bf.overlap(a, b, how=how, suffixes=("", "_b"),
                             strategy=strategy)
            assert out.schema.simpleString() == want, (how, strategy)
            out.count()  # and the plan executes with the narrow types
