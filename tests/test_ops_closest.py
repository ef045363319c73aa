"""Golden tests for closest (kNN interval join) — semantics pinned to
reference tests/test_ops.py:1168-1493."""

import pytest
from helpers import ivals

import bioframe_spark as bf


@pytest.fixture(scope="module")
def d1(spark):
    return ivals(spark, [("chr1", 10, 20)])


@pytest.fixture(scope="module")
def d2(spark):
    return ivals(spark, [("chr1", 0, 5), ("chr1", 22, 30), ("chr1", 40, 50)])


def test_closest_basic(d1, d2):
    out = bf.closest(d1, d2, k=1)
    r = out.collect()
    assert len(r) == 1
    assert (r[0]["start_"], r[0]["end_"], r[0]["distance"]) == (22, 30, 2)


def test_closest_k(d1, d2):
    out = bf.closest(d1, d2, k=2)
    got = sorted((r["start_"], r["distance"]) for r in out.collect())
    assert got == [(0, 5), (22, 2)]
    out3 = bf.closest(d1, d2, k=3)
    got3 = sorted((r["start_"], r["distance"]) for r in out3.collect())
    assert got3 == [(0, 5), (22, 2), (40, 20)]


def test_closest_overlap_wins(spark, d1):
    d2 = ivals(spark, [("chr1", 15, 25), ("chr1", 21, 22)])
    out = bf.closest(d1, d2, k=1).collect()
    assert (out[0]["start_"], out[0]["distance"]) == (15, 0)


def test_closest_ignore_overlaps(spark, d1):
    d2 = ivals(spark, [("chr1", 15, 25), ("chr1", 26, 30)])
    out = bf.closest(d1, d2, k=1, ignore_overlaps=True).collect()
    assert (out[0]["start_"], out[0]["distance"]) == (26, 6)


def test_closest_ignore_directions(spark, d1):
    d2 = ivals(spark, [("chr1", 0, 5), ("chr1", 22, 30)])
    up = bf.closest(d1, d2, k=1, ignore_downstream=True).collect()
    assert (up[0]["start_"], up[0]["distance"]) == (0, 5)
    dn = bf.closest(d1, d2, k=1, ignore_upstream=True).collect()
    assert (dn[0]["start_"], dn[0]["distance"]) == (22, 2)


def test_closest_direction_col(spark):
    d1 = ivals(spark, [("chr1", 10, 20, "-")], extra=[("strand", "string")])
    d2 = ivals(spark, [("chr1", 0, 5), ("chr1", 22, 30)])
    # on '-' strand, upstream is to the right
    up = bf.closest(d1, d2, k=1, ignore_downstream=True, direction_col="strand").collect()
    assert (up[0]["start_"], up[0]["distance"]) == (22, 2)
    dn = bf.closest(d1, d2, k=1, ignore_upstream=True, direction_col="strand").collect()
    assert (dn[0]["start_"], dn[0]["distance"]) == (0, 5)


def test_closest_no_candidates(spark, d1):
    d2 = ivals(spark, [("chr2", 0, 5)])
    out = bf.closest(d1, d2, k=1).collect()
    assert len(out) == 1
    assert out[0]["start_"] is None and out[0]["distance"] is None


def test_closest_self(spark):
    d = ivals(spark, [("chr1", 0, 5), ("chr1", 6, 10), ("chr1", 20, 30)])
    out = bf.closest(d, k=1)
    got = {r["start"]: (r["start_"], r["distance"]) for r in out.collect()}
    assert got[0] == (6, 1)
    assert got[6] == (0, 1)
    assert got[20] == (6, 10)


def test_closest_tie_breaking(spark):
    d1 = ivals(spark, [("chr1", 10, 11)])
    d2 = ivals(
        spark,
        [("chr1", 0, 5, 2.0), ("chr1", 16, 21, 1.0)],  # both at distance 5
        extra=[("score", "double")],
    )
    # default tie-break: canonical (start2, end2) order → (0,5)
    out = bf.closest(d1, d2, k=1).collect()
    assert out[0]["start_"] == 0
    # tie_breaking_col: lower score wins → (16,21)
    out2 = bf.closest(d1, d2, k=1, tie_breaking_col="score").collect()
    assert out2[0]["start_"] == 16


def test_closest_return_overlap(spark):
    d1 = ivals(spark, [("chr1", 10, 20)])
    d2 = ivals(spark, [("chr1", 15, 25)])
    r = bf.closest(d1, d2, k=1, return_overlap=True).collect()[0]
    assert r["have_overlap"] is True
    assert (r["overlap_start"], r["overlap_end"]) == (15, 20)


def test_closest_multi_chrom(spark):
    d1 = ivals(spark, [("chr1", 10, 20), ("chr2", 10, 20), ("chr3", 0, 5)])
    d2 = ivals(spark, [("chr1", 30, 40), ("chr2", 0, 2)])
    out = bf.closest(d1, d2, k=1)
    got = {r["chrom"]: (r["start_"], r["distance"]) for r in out.collect()}
    assert got["chr1"] == (30, 10)
    assert got["chr2"] == (0, 8)
    assert got["chr3"] == (None, None)


def test_closest_k2_with_ignore_overlaps(spark):
    d1 = ivals(spark, [("chr1", 10, 20)])
    d2 = ivals(spark, [("chr1", 12, 18), ("chr1", 25, 30), ("chr1", 0, 5), ("chr1", 40, 45)])
    out = bf.closest(d1, d2, k=2, ignore_overlaps=True)
    got = sorted((r["start_"], r["distance"]) for r in out.collect())
    assert got == [(0, 5), (25, 5)]


def test_closest_self_k2(spark):
    d = ivals(spark, [("chr1", 0, 5), ("chr1", 10, 15), ("chr1", 30, 35)])
    out = bf.closest(d, k=2)
    got = {}
    for r in out.collect():
        got.setdefault(r["start"], []).append((r["start_"], r["distance"]))
    assert sorted(got[0]) == [(10, 5), (30, 25)]
    assert sorted(got[10]) == [(0, 5), (30, 15)]
    assert sorted(got[30]) == [(0, 25), (10, 15)]


def test_closest_strand_k2_directional(spark):
    d1 = ivals(spark, [("chr1", 50, 60, "-")], extra=[("strand", "string")])
    d2 = ivals(spark, [("chr1", 0, 10), ("chr1", 20, 30), ("chr1", 70, 80), ("chr1", 90, 100)])
    # '-' strand: upstream = right side
    up = bf.closest(d1, d2, k=2, ignore_downstream=True, direction_col="strand")
    got = sorted((r["start_"], r["distance"]) for r in up.collect())
    assert got == [(70, 10), (90, 30)]
    dn = bf.closest(d1, d2, k=2, ignore_upstream=True, direction_col="strand")
    got2 = sorted((r["start_"], r["distance"]) for r in dn.collect())
    assert got2 == [(0, 40), (20, 20)]


def test_closest_fewer_than_k(spark):
    d1 = ivals(spark, [("chr1", 10, 20)])
    d2 = ivals(spark, [("chr1", 30, 40)])
    out = bf.closest(d1, d2, k=5)
    assert out.count() == 1  # only one candidate exists, no padding rows


def test_closest_within_matches_closest(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    mk = lambda n, seed: [(f"chr{i%2}", int(s), int(s) + int(l))
                          for i, (s, l) in enumerate(zip(
                              np.random.default_rng(seed).integers(0, 500, n),
                              np.random.default_rng(seed + 1).integers(1, 20, n)))]
    d1 = ivals(spark, mk(40, 1))
    d2 = ivals(spark, mk(30, 5))
    capped = bf.closest_within(d1, d2, max_dist=100, k=1)
    full = bf.closest(d1, d2, k=1).filter("distance <= 100")
    key = lambda df: sorted(
        (r["chrom"], r["start"], r["end"], r["start_"], r["end_"], r["distance"])
        for r in df.collect()
    )
    assert key(capped) == key(full)


def test_closest_within_cap_excludes(spark):
    d1 = ivals(spark, [("chr1", 0, 5)])
    d2 = ivals(spark, [("chr1", 50, 60)])
    assert bf.closest_within(d1, d2, max_dist=10).count() == 0
    assert bf.closest_within(d1, d2, max_dist=45).count() == 1


# --- self-mode positional-identity regressions -------------------------------
# Self-exclusion in the kernel is positional; Spark's two cogroup shuffles may
# deliver the same rows in DIFFERENT orders, so the kernel must canonicalize
# both frames before excluding (reference passes one shared array instead).

def _kern(pdf1, pdf2, **kw):
    from bioframe_spark.operators.closest import _closest_kernel

    args = dict(sk1="start", ek1="end", sk2="start", ek2="end", k=1,
                ignore_overlaps=False, ignore_upstream=False,
                ignore_downstream=False, direction_col=None,
                tie_breaking_col=None, self_mode=False)
    args.update(kw)
    return _closest_kernel(pdf1, pdf2, **args)


def test_kernel_self_mode_misaligned_arrival_order():
    import pandas as pd

    rows = [("chr1", 0, 10, "a"), ("chr1", 5, 15, "b"), ("chr1", 100, 110, "c")]
    cols = ["chrom", "start", "end", "name"]
    # adversarial: the two cogroup sides arrive in different orders
    pdf1 = pd.DataFrame([rows[1], rows[2], rows[0]], columns=cols)
    pdf2 = pd.DataFrame([rows[2], rows[0], rows[1]], columns=cols)
    i1, i2, dist, p1, p2 = _kern(pdf1, pdf2, self_mode=True, k=1)
    got = {(p1.iloc[a]["name"], p2.iloc[b]["name"], d)
           for a, b, d in zip(i1, i2, dist)}
    assert got == {("a", "b", 0), ("b", "a", 0), ("c", "b", 85)}


def test_kernel_self_mode_exact_duplicates():
    import pandas as pd

    # fully identical rows are interchangeable: each is the other's
    # distance-0 closest (reference self-closest keeps exact dups)
    pdf = pd.DataFrame([("chr1", 0, 5), ("chr1", 0, 5)],
                       columns=["chrom", "start", "end"])
    i1, i2, dist, p1, p2 = _kern(pdf.copy(), pdf.copy(), self_mode=True, k=1)
    assert len(i1) == 2
    assert all(d == 0 for d in dist)
    assert all(b >= 0 for b in i2)


def test_closest_self_shuffled_partitions(spark):
    d = ivals(spark, [("chr1", 5, 15), ("chr1", 100, 110), ("chr1", 0, 10),
                      ("chr2", 3, 4), ("chr2", 50, 60)]).repartition(7)
    out = bf.closest(d, k=1)
    got = sorted((r["chrom"], r["start"], r["start_"], r["distance"])
                 for r in out.collect())
    assert got == [("chr1", 0, 5, 0), ("chr1", 5, 0, 0), ("chr1", 100, 5, 85),
                   ("chr2", 3, 50, 46), ("chr2", 50, 3, 46)]


def test_closest_zero_length_at_start_no_duplicate(spark):
    # a zero-length df2 interval exactly at start1 reaches the candidate set
    # via BOTH the overlap path and the left-neighbor path; the global pair
    # dedup must collapse it even with another candidate sorted in between
    d1 = ivals(spark, [("chr1", 10, 20)])
    d2 = ivals(spark, [("chr1", 10, 10), ("chr1", 12, 18)])
    out = bf.closest(d1, d2, k=3).collect()
    got = sorted((r["start_"], r["end_"], r["distance"]) for r in out)
    assert got == [(10, 10, 0), (12, 18, 0)]


# --- binned (cap-escalation) strategy equivalence ----------------------------

def _canon(df):
    cols = [c for c in ("chrom", "start", "end", "strand",
                        "chrom_", "start_", "end_", "strand_", "distance")
            if c in df.columns]
    return sorted(
        tuple(r[c] for c in cols) for r in df.select(*cols).collect()
    )


def _rand_ivals(spark, n, seed, span=2000, strand=False):
    import numpy as np

    rs = np.random.default_rng(seed).integers(0, span, n)
    rl = np.random.default_rng(seed + 1).integers(1, 30, n)
    rows = [
        (f"chr{i % 3}", int(s), int(s) + int(l))
        + (("+" if i % 2 else "-",) if strand else ())
        for i, (s, l) in enumerate(zip(rs, rl))
    ]
    extra = [("strand", "string")] if strand else None
    return ivals(spark, rows, extra=extra)


def test_closest_binned_matches_cogroup(spark):
    d1 = _rand_ivals(spark, 60, 11)
    d2 = _rand_ivals(spark, 45, 23)
    for k in (1, 3):
        a = bf.closest(d1, d2, k=k, strategy="cogroup")
        b = bf.closest(d1, d2, k=k, strategy="binned")
        assert _canon(a) == _canon(b), f"k={k}"


def test_closest_binned_left_semantics(spark):
    # chr9 exists only in df1: binned must left-complete with a null row
    d1 = ivals(spark, [("chr1", 0, 5), ("chr9", 100, 110)])
    d2 = ivals(spark, [("chr1", 50, 60)])
    a = bf.closest(d1, d2, strategy="cogroup")
    b = bf.closest(d1, d2, strategy="binned")
    assert _canon(a) == _canon(b)
    assert b.filter("chrom = 'chr9' AND chrom_ IS NULL").count() == 1


def test_closest_binned_flags_match(spark):
    d1 = _rand_ivals(spark, 40, 31, strand=True)
    d2 = _rand_ivals(spark, 30, 47)
    for kw in (
        dict(ignore_overlaps=True),
        dict(ignore_upstream=True),
        dict(ignore_downstream=True),
        dict(ignore_upstream=True, direction_col="strand"),
    ):
        a = bf.closest(d1, d2, k=2, strategy="cogroup", **kw)
        b = bf.closest(d1, d2, k=2, strategy="binned", **kw)
        assert _canon(a) == _canon(b), kw


def test_closest_binned_tie_breaking_and_overlap_cols(spark):
    d1 = ivals(spark, [("chr1", 10, 20)])
    d2 = ivals(spark, [("chr1", 30, 40, 5.0), ("chr1", 30, 41, 1.0)],
               extra=[("w", "double")])
    a = bf.closest(d1, d2, tie_breaking_col="w", strategy="binned").first()
    assert a["w_"] == 1.0
    b = bf.closest(d1, d2, return_overlap=True, strategy="binned").first()
    assert b["have_overlap"] is False
    ov = bf.closest(ivals(spark, [("chr1", 25, 35)]), d2,
                    return_overlap=True, strategy="binned").first()
    assert ov["have_overlap"] is True and ov["overlap_start"] == 30


def test_closest_binned_rejects_self_mode(spark):
    import pytest

    d1 = ivals(spark, [("chr1", 0, 5)])
    with pytest.raises(ValueError, match="binned"):
        bf.closest(d1, strategy="binned")


def test_closest_binned_escalation_covers_far_neighbors(spark):
    # neighbor farther than the initial cap (bound//1024 ≥ 1024): forces at
    # least one ladder escalation before completion
    d1 = ivals(spark, [("chr1", 0, 10)])
    d2 = ivals(spark, [("chr1", 3_000_000, 3_000_010)])
    got = bf.closest(d1, d2, strategy="binned").first()
    assert got["distance"] == 3_000_000 - 10
