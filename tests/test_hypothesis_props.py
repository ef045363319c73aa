"""Property-based tests (hypothesis): grammar differential fuzz + operator laws.

Two layers:

1. Pure-Python differential fuzzing of the region-string grammar against
   the reference parser (``core/stringops.py:88-249``) — hypothesis
   generates both well-formed and adversarial strings; for every input,
   both parsers must either raise or agree on the parsed triple.
2. Algebraic laws of the interval operators on hypothesis-generated
   interval sets (low example counts — each example runs Spark jobs):
   merge output is disjoint+sorted and preserves covered bases;
   complement is an exact set complement within the view; the
   count_overlaps total equals the inner-join cardinality.

Shrinking gives minimal counterexamples, which the fixed-seed random
suite (test_random_invariants.py) can't do.
"""

import sys

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from bioframe_spark.core import stringops

from tests.test_reference_parity_ab import load_reference


# ---------------------------------------------------------------------------
# 1. Region-string grammar: differential fuzz vs the reference parser
# ---------------------------------------------------------------------------

# chromosome names: any non-empty text without whitespace/colon, per the
# reference grammar; include hyphens and dots deliberately (rpartition
# on ':' must not be confused by '-' in the name)
_name = st.text(
    alphabet=st.characters(
        codec="ascii", exclude_characters=":\t\n\r\x0b\x0c ",
        min_codepoint=33, max_codepoint=126),
    min_size=1, max_size=12)

_coord = st.integers(min_value=0, max_value=10**12)


def _humanize(n, style):
    if style == "plain":
        return str(n)
    if style == "comma":
        return f"{n:,}"
    for unit, mult in (("K", 10**3), ("Mb", 10**6), ("G", 10**9)):
        if style == unit.lower()[0] and n % mult == 0:
            return f"{n // mult}{unit}"
    return str(n)


_style = st.sampled_from(["plain", "comma", "k", "m", "g"])


@st.composite
def region_strings(draw):
    """Well-formed-ish region strings, with occasional mutations."""
    name = draw(_name)
    form = draw(st.integers(0, 5))
    if form == 0:
        return name  # bare name
    a = draw(_coord)
    b = draw(_coord)
    sa = _humanize(a, draw(_style))
    sb = _humanize(b, draw(_style))
    if form == 1:
        return f"{name}:{sa}-{sb}"
    if form == 2:
        return f"{name}:{sa}-"          # open end
    if form == 3:
        return f"{name}:{sa}"           # missing hyphen → error in both
    if form == 4:
        return f"{name}:-{sb}"          # missing start → error in both
    return f"{name}:{sa}-{sb}-{draw(_coord)}"  # trailing tokens ignored


_adversarial = st.text(
    alphabet=st.sampled_from(list("ch r1:-,0123456789kMGb.:")), max_size=20)


def _run_both(ref, s):
    try:
        mine = stringops.parse_region_string(s)
        mine_err = None
    except (ValueError, TypeError) as e:
        mine, mine_err = None, e
    try:
        theirs = ref.core.stringops.parse_region_string(s)
        theirs_err = None
    except (ValueError, TypeError) as e:
        theirs, theirs_err = None, e
    return mine, mine_err, theirs, theirs_err


@pytest.fixture(scope="module")
def ref():
    return load_reference()


@settings(max_examples=300, deadline=None)
@given(s=region_strings())
def test_grammar_differential_wellformed(ref, s):
    mine, mine_err, theirs, theirs_err = _run_both(ref, s)
    if theirs_err is not None:
        assert mine_err is not None, (
            f"reference raised on {s!r} ({theirs_err}) but we parsed {mine}")
    else:
        assert mine_err is None, (
            f"reference parsed {s!r} -> {theirs} but we raised {mine_err}")
        assert tuple(mine) == tuple(theirs), (s, mine, theirs)


@settings(max_examples=300, deadline=None)
@given(s=_adversarial)
def test_grammar_differential_adversarial(ref, s):
    mine, mine_err, theirs, theirs_err = _run_both(ref, s)
    if theirs_err is not None:
        assert mine_err is not None, (
            f"reference raised on {s!r} ({theirs_err}) but we parsed {mine}")
    else:
        assert mine_err is None and tuple(mine) == tuple(theirs), (
            s, mine, mine_err, theirs)


@settings(max_examples=200, deadline=None)
@given(n=_coord, style=_style)
def test_humanized_roundtrip(n, style):
    assert stringops.to_humanized_int(_humanize(n, style)) == n


@settings(max_examples=200, deadline=None)
@given(name=_name, a=_coord, b=_coord)
def test_parse_roundtrip(name, a, b):
    chrom, start, end = stringops.parse_region_string(f"{name}:{a:,}-{b}")
    assert (chrom, start, end) == (name, a, b)


# ---------------------------------------------------------------------------
# 2. Operator laws on generated interval sets (bounded Spark examples)
# ---------------------------------------------------------------------------

_iv = st.tuples(
    st.sampled_from(["chr1", "chr2"]),
    st.integers(0, 200),
    st.integers(0, 40),
)

_frames = st.lists(_iv, min_size=0, max_size=25).map(
    lambda rows: [(c, s, s + l) for c, s, l in rows])


def _df(spark, rows):
    return spark.createDataFrame(rows, "chrom string, start long, end long")


def _covered(rows):
    """Set of (chrom, base) covered by interval EXTENT (points cover
    nothing — the length-1 point rewrite is an overlap-query semantic,
    not a coverage one: reference complement of a lone point is the full
    view)."""
    out = set()
    for c, s, e in rows:
        for b in range(s, e):
            out.add((c, b))
    return out


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=_frames)
def test_merge_laws(spark, rows):
    if not rows:
        return
    merged = bf_merge_collect(spark, rows)
    # disjoint (strictly: gap >= 1 after min_dist=0 merging) per chrom
    per = {}
    for c, s, e, n in merged:
        per.setdefault(c, []).append((s, e, n))
    for c, ivs in per.items():
        ivs.sort()
        for (s1, e1, _), (s2, e2, _) in zip(ivs, ivs[1:]):
            assert s2 > e1, f"overlapping/adjacent islands {ivs} on {c}"
    # covered bases preserved
    assert _covered([(c, s, e) for c, s, e, _ in merged]) == _covered(rows)
    # multiplicities add up
    assert sum(n for *_, n in merged) == len(rows)


def bf_merge_collect(spark, rows):
    import bioframe_spark as bf
    out = bf.merge(_df(spark, rows), min_dist=0)
    return [(r["chrom"], r["start"], r["end"], r["n_intervals"])
            for r in out.collect()]


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=_frames)
def test_complement_is_exact_complement(spark, rows):
    import bioframe_spark as bf
    if not rows:
        return
    view = [("chr1", 0, 260), ("chr2", 0, 260)]
    vdf = bf.make_viewframe({"chr1": 260, "chr2": 260})
    comp = bf.complement(_df(spark, rows), view_df=vdf)
    comp_rows = [(r["chrom"], r["start"], r["end"]) for r in comp.collect()]
    got = _covered(comp_rows)
    # complement covers exactly view-minus-input extent
    want = _covered(view) - _covered(rows)
    assert got == want


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(a=_frames, b=_frames)
def test_count_overlaps_matches_join_cardinality(spark, a, b):
    import bioframe_spark as bf
    from pyspark.sql import functions as F
    if not a:
        return
    df1, df2 = _df(spark, a), _df(spark, b)
    total = bf.count_overlaps(df1, df2).agg(F.sum("count")).collect()[0][0]
    pairs = bf.overlap(df1, df2, how="inner").count()
    assert total == pairs


# ---------------------------------------------------------------------------
# 3. Hypothesis differential fuzz vs the reference implementation
# ---------------------------------------------------------------------------
# The fixed-seed A/B suite (test_reference_parity_ab*.py) runs broad
# operator matrices; here hypothesis explores the interval-geometry space
# (points, duplicates, nested/adjacent intervals, empty chroms) and
# SHRINKS any divergence to a minimal frame. Example counts are small —
# every example runs reference pandas AND a Spark job.

import pandas as pd

from tests.test_reference_parity_ab import assert_match, to_spark


def _pdf(rows):
    return pd.DataFrame(rows, columns=["chrom", "start", "end"]).astype(
        {"start": "Int64", "end": "Int64"})


_VIEW = {"chr1": 300, "chr2": 300}


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(a=_frames, b=_frames)
def test_differential_join_family(spark, ref, a, b):
    if not a or not b:
        return
    p1, p2 = _pdf(a), _pdf(b)
    s1, s2 = to_spark(spark, p1), to_spark(spark, p2)
    assert_match(ref.overlap(p1, p2, how="inner", suffixes=("", "_")),
                 bfs_overlap(s1, s2, how="inner"))
    assert_match(ref.overlap(p1, p2, how="outer", suffixes=("", "_")),
                 bfs_overlap(s1, s2, how="outer"))
    assert_match(ref.subtract(p1, p2), bfs_op("subtract")(s1, s2))
    assert_match(ref.count_overlaps(p1, p2), bfs_op("count_overlaps")(s1, s2))
    assert_match(ref.coverage(p1, p2), bfs_op("coverage")(s1, s2))


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(a=_frames, b=_frames,
       how=st.sampled_from(["left", "right", "outer"]))
def test_binned_outer_path_equivalence(spark, ref, a, b, how):
    """The two lonely-row reconstructions of the binned outer join — the
    single-pass value window and the semi/anti hit set — must agree with
    each other AND the reference, over geometry that stresses duplicates,
    points, and disjoint chroms (the all-null window-partition case the
    full_outer salt addresses)."""
    import bioframe_spark as bfs
    if not a or not b:
        return
    p1, p2 = _pdf(a), _pdf(b)
    s1, s2 = to_spark(spark, p1), to_spark(spark, p2)
    want = ref.overlap(p1, p2, how=how, suffixes=("", "_"))
    try:
        for path in ("window", "anti"):
            spark.conf.set("spark.bioframe.outerPath", path)
            assert_match(want, bfs.overlap(s1, s2, how=how,
                                           suffixes=("", "_"),
                                           strategy="binned", bin_size=16))
    finally:
        spark.conf.unset("spark.bioframe.outerPath")


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(a=_frames, b=_frames, bin_size=st.sampled_from([4, 16, 64]))
def test_prebinned_matches_overlap_inner(spark, ref, a, b, bin_size):
    """with_bin on a shared grid + overlap_prebinned == reference overlap
    inner: the kept-once pair rule must hold for any geometry (points,
    duplicates, nested, bin-straddling intervals) at any common bin size
    — storage (bucketed or not) cannot change the pairs, so the fuzz
    runs grid+join directly without the saveAsTable write."""
    import bioframe_spark as bfs
    if not a or not b:
        return
    p1, p2 = _pdf(a), _pdf(b)
    s1, s2 = to_spark(spark, p1), to_spark(spark, p2)
    want = ref.overlap(p1, p2, how="inner", suffixes=("", "_"))
    got = bfs.overlap_prebinned(bfs.with_bin(s1, bin_size),
                                bfs.with_bin(s2, bin_size),
                                suffixes=("", "_"))
    assert_match(want, got)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(a=_frames, min_dist=st.sampled_from([None, 0, 3]))
def test_differential_window_family(spark, ref, a, min_dist):
    if not a:
        return
    p1 = _pdf(a)
    s1 = to_spark(spark, p1)
    assert_match(ref.merge(p1, min_dist=min_dist),
                 bfs_op("merge")(s1, min_dist=min_dist))
    assert_match(ref.complement(p1, view_df=_VIEW),
                 bfs_op("complement")(s1, view_df=_VIEW))
    if min_dist is not None:
        assert_match(ref.cluster(p1, min_dist=min_dist),
                     bfs_op("cluster")(s1, min_dist=min_dist))


def bfs_op(name):
    import bioframe_spark as bfs
    return getattr(bfs, name)


def bfs_overlap(s1, s2, how):
    import bioframe_spark as bfs
    return bfs.overlap(s1, s2, how=how, suffixes=("", "_"))


# payload-bearing frames with occasional null interval rows: exercises
# null-triple propagation, payload carry-through, and suffixing under
# shrinkage (the null row is the classic minimal counterexample)
@st.composite
def payload_frames(draw):
    ivs = draw(st.lists(_iv, min_size=1, max_size=15))
    rows = []
    for i, (c, s, l) in enumerate(ivs):
        if draw(st.booleans()) and draw(st.integers(0, 9)) == 0:
            rows.append((None, pd.NA, pd.NA, "."))
        else:
            rows.append((c, s, s + l, draw(st.sampled_from("+-."))))
    return pd.DataFrame(rows, columns=["chrom", "start", "end", "strand"]).astype(
        {"start": "Int64", "end": "Int64"})


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(p1=payload_frames(), p2=payload_frames())
def test_differential_payload_null_frames(spark, ref, p1, p2):
    s1, s2 = to_spark(spark, p1), to_spark(spark, p2)
    assert_match(ref.overlap(p1, p2, how="left", suffixes=("", "_")),
                 bfs_overlap(s1, s2, how="left"))
    assert_match(ref.merge(p1, min_dist=0, on=["strand"]),
                 bfs_op("merge")(s1, min_dist=0, on=["strand"]))
    assert_match(ref.expand(p1, pad=5), bfs_op("expand")(s1, pad=5))
    assert_match(ref.count_overlaps(p1, p2, on=["strand"]),
                 bfs_op("count_overlaps")(s1, s2, on=["strand"]))


# ---------------------------------------------------------------------------
# 4. closest: strategy equivalence + brute-force distance oracle
# ---------------------------------------------------------------------------
# The cogroup kernel (one vectorized task per chromosome) and the binned
# cap-escalation plan (the huge-single-chrom 100 TB path) must return the
# same rows. Coordinate-distinct df2 keeps tie-breaking well-defined
# ((distance, start2, end2) canonical order). A pure-Python brute force
# additionally pins the distance VALUES independent of both plans.

def _distinct_frames():
    return st.lists(
        st.tuples(st.sampled_from(["chr1", "chr2"]),
                  st.integers(0, 300), st.integers(1, 25)),
        min_size=1, max_size=18,
        unique_by=lambda t: (t[0], t[1]),      # distinct starts per draw
    ).map(lambda rows: [(c, s, s + l) for c, s, l in rows])


def _brute_min_dist(a_row, b_rows):
    c, s, e = a_row
    best = None
    for c2, s2, e2 in b_rows:
        if c2 != c:
            continue
        # genomic distance with the length-1 point rewrite on both sides
        s1x, e1x = (s, e) if s != e else (s, e + 1)
        s2x, e2x = (s2, e2) if s2 != e2 else (s2, e2 + 1)
        d = max(0, max(s1x, s2x) - min(e1x, e2x))
        if best is None or d < best:
            best = d
    return best


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(a=_distinct_frames(), b=_distinct_frames(), k=st.sampled_from([1, 2]))
def test_closest_strategy_equivalence(spark, a, b, k):
    import bioframe_spark as bf
    d1, d2 = _df(spark, a), _df(spark, b)
    out = {}
    for strat in ("cogroup", "binned", "broadcast"):
        res = bf.closest(d1, d2, k=k, strategy=strat)
        out[strat] = sorted(
            tuple(None if v is None else v for v in r) for r in res.collect())
    assert out["cogroup"] == out["binned"]
    assert out["cogroup"] == out["broadcast"]
    # distance values vs brute force (k=1: each unique df1 row gets
    # exactly one output row; its distance must be the true minimum)
    if k == 1:
        got = {(r[0], r[1], r[2]): r[-1] for r in out["cogroup"]}
        assert len(got) == len(a)
        for row in a:
            want = _brute_min_dist(row, b)
            assert got[row] == want, (row, got[row], want)


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(a=_distinct_frames(), b=_distinct_frames(),
       k=st.sampled_from([3, 5]),
       ignore=st.sampled_from([(False, False), (True, False), (False, True)]))
def test_closest_k_gt2_ignore_strategy_equivalence(spark, a, b, k, ignore):
    """Directive #10 (r3): the cogroup kernel and the binned
    cap-escalation DF plan must agree for k>2 and the ignore_* variants
    — the cap-escalation logic (first cap k-dependent, escalation on
    unsatisfied probes) is exactly the code k=1/2 doesn't stress."""
    import bioframe_spark as bf
    ig_up, ig_down = ignore
    out = {}
    for strat in ("cogroup", "binned", "broadcast"):
        res = bf.closest(_df(spark, a), _df(spark, b), k=k,
                         ignore_upstream=ig_up, ignore_downstream=ig_down,
                         strategy=strat)
        out[strat] = sorted(
            tuple(None if v is None else v for v in r) for r in res.collect())
    assert out["cogroup"] == out["binned"]
    assert out["cogroup"] == out["broadcast"]


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(a=_frames, b=_frames, pad=st.sampled_from([-3, 2]))
def test_differential_setdiff_trim_expand(spark, ref, a, b, pad):
    if not a or not b:
        return
    p1, p2 = _pdf(a), _pdf(b)
    s1, s2 = to_spark(spark, p1), to_spark(spark, p2)
    assert_match(ref.setdiff(p1, p2), bfs_op("setdiff")(s1, s2))
    # negative pad exercises the start/end inversion clamp in expand
    assert_match(ref.expand(p1, pad=pad), bfs_op("expand")(s1, pad=pad))
    # trim without a view clips negative starts at 0 per chromosome
    shifted1 = ref.expand(p1, pad=-1)
    shifted2 = bfs_op("expand")(s1, pad=-1)
    assert_match(ref.trim(shifted1), bfs_op("trim")(shifted2))


# non-overlapping sorted frames with a value column (mark_runs/merge_runs
# require overlap-free input): built cumulatively from (gap, length, value)
@st.composite
def run_frames(draw):
    rows = []
    for chrom in ("chr1", "chr2"):
        pos = 0
        for gap, ln, val in draw(st.lists(
                st.tuples(st.integers(0, 6), st.integers(1, 8),
                          st.sampled_from("xy")), max_size=12)):
            rows.append((chrom, pos + gap, pos + gap + ln, val))
            pos += gap + ln
    return pd.DataFrame(rows, columns=["chrom", "start", "end", "v"])


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(p=run_frames())
def test_differential_runs(spark, ref, p):
    if p.empty:
        return
    s = to_spark(spark, p.astype({"start": "Int64", "end": "Int64"}))
    assert_match(ref.mark_runs(p, "v"), bfs_op("mark_runs")(s, "v"))
    assert_match(ref.merge_runs(p, "v"), bfs_op("merge_runs")(s, "v"))


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(a=_frames, b=_frames)
def test_subtract_is_extent_difference(spark, a, b):
    import bioframe_spark as bf
    if not a:
        return
    out = [(r["chrom"], r["start"], r["end"])
           for r in bf.subtract(_df(spark, a), _df(spark, b)).collect()]
    assert _covered(out) == _covered(a) - _covered(b)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(a=_frames, b=_frames)
def test_setdiff_is_overlap_complement(spark, a, b):
    import bioframe_spark as bf
    if not a:
        return
    d1, d2 = _df(spark, a), _df(spark, b)
    kept = {tuple(r) for r in bf.setdiff(d1, d2).collect()}
    overlapping = {(r["chrom"], r["start"], r["end"])
                   for r in bf.overlap(d1, d2, how="inner",
                                       suffixes=("", "_"))
                   .select("chrom", "start", "end").collect()}
    # setdiff keeps exactly the df1 rows with no overlap in df2
    for row in set(a):
        assert (row in kept) == (row not in overlapping), row


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(a=_frames, side=st.sampled_from(["both", "left", "right"]),
       scale=st.sampled_from([0.5, 2.0]))
def test_differential_expand_sides_scale(spark, ref, a, side, scale):
    if not a:
        return
    p1 = _pdf(a)
    s1 = to_spark(spark, p1)
    assert_match(ref.expand(p1, pad=4, side=side),
                 bfs_op("expand")(s1, pad=4, side=side))
    assert_match(ref.expand(p1, scale=scale),
                 bfs_op("expand")(s1, scale=scale))


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(a=_frames, seps=st.tuples(st.integers(0, 10), st.integers(11, 60)),
       rel=st.sampled_from(["midpoints", "endpoints"]))
def test_differential_pair_by_distance(spark, ref, a, seps, rel):
    # lo strictly < hi by strategy construction: min_sep >= max_sep is a
    # ValueError in BOTH engines (pinned below), not a comparable frame
    if not a:
        return
    p1 = _pdf(a)
    s1 = to_spark(spark, p1)
    lo, hi = seps
    assert_match(
        ref.pair_by_distance(p1, min_sep=lo, max_sep=hi, relative_to=rel),
        bfs_op("pair_by_distance")(s1, min_sep=lo, max_sep=hi,
                                   relative_to=rel))


def test_pair_by_distance_degenerate_sep_error_parity(spark, ref):
    """min_sep >= max_sep raises in the reference and here alike."""
    import pandas as pd
    import pytest as _pytest

    p1 = pd.DataFrame({"chrom": ["chr1"], "start": [0], "end": [5]})
    s1 = to_spark(spark, p1)
    with _pytest.raises(ValueError, match="min_sep"):
        ref.pair_by_distance(p1, min_sep=10, max_sep=10)
    with _pytest.raises(ValueError, match="min_sep"):
        bfs_op("pair_by_distance")(s1, min_sep=10, max_sep=10)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(a=_frames, q=st.tuples(st.sampled_from(["chr1", "chr2", "chr9"]),
                              st.integers(0, 250), st.integers(0, 60)))
def test_differential_select(spark, ref, a, q):
    if not a:
        return
    chrom, s, l = q
    region = f"{chrom}:{s}-{s + l}"
    p1 = _pdf(a)
    s1 = to_spark(spark, p1)
    assert_match(ref.select(p1, region), bfs_op("select")(s1, region))
    assert_match(ref.select(p1, chrom), bfs_op("select")(s1, chrom))


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=_frames, min_dist=st.sampled_from([0, 3]))
def test_cluster_premerge_equals_classic(spark, rows, min_dist):
    """r5: the map-side premerged cluster construction (local island
    collapse + broadcast searchsorted id assignment) is row-identical —
    ids, spans, column order — to the classic per-chrom window, on
    arbitrary frames including duplicates and empty inputs."""
    import bioframe_spark as bf

    df = _df(spark, rows)

    def canon(out):
        key = lambda t: tuple((v is None, str(type(v)), v) for v in t)
        return sorted([tuple(r) for r in out.collect()], key=key)

    a = bf.cluster(df, min_dist=min_dist, premerge=True)
    b = bf.cluster(df, min_dist=min_dist, premerge=False, range_width=None)
    assert a.columns == b.columns
    assert canon(a) == canon(b)


_I64 = (1 << 63) - 1
# coordinates clustered at BOTH ends of the int64 line: the round-5
# sentinel sweep found four ANSI-overflow crashes (merge borders,
# closest span/pads, expand, pair_by_distance midpoints) that small-
# coordinate strategies can never reach
_extreme_coord = st.one_of(
    st.integers(min_value=0, max_value=500),
    st.integers(min_value=_I64 - 500, max_value=_I64),
)
_extreme_iv = st.tuples(
    st.sampled_from(["chr1", "chr2"]), _extreme_coord,
    st.integers(min_value=0, max_value=300),
)
_extreme_frames = st.lists(_extreme_iv, min_size=1, max_size=12).map(
    lambda rows: [(c, s, min(s + l, _I64)) for c, s, l in rows]
)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=_extreme_frames, min_dist=st.sampled_from([0, 7, None]))
def test_extreme_coordinates_merge_family(spark, rows, min_dist):
    """No path of the merge/cluster family may crash or disagree on
    frames whose coordinates hug INT64_MAX (sentinel ends)."""
    import bioframe_spark as bf

    df = _df(spark, rows)

    def canon(out):
        key = lambda t: tuple((v is None, str(type(v)), v) for v in t)
        return sorted([tuple(r) for r in out.collect()], key=key)

    base = canon(bf.merge(df, min_dist=min_dist, local=False,
                          premerge=False, range_width=None))
    assert canon(bf.merge(df, min_dist=min_dist, local=True)) == base
    assert canon(bf.merge(df, min_dist=min_dist, local=False,
                          premerge=True, range_width=None)) == base
    if min_dist is not None:
        a = canon(bf.cluster(df, min_dist=min_dist, premerge=True))
        b = canon(bf.cluster(df, min_dist=min_dist, premerge=False,
                             range_width=None))
        assert a == b


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(a=_extreme_frames, b=_extreme_frames)
def test_extreme_coordinates_join_family(spark, a, b):
    """overlap strategies agree and closest strategies agree on
    sentinel-hugging coordinates (no ANSI overflow, no lit() failure)."""
    import bioframe_spark as bf

    d1, d2 = _df(spark, a), _df(spark, b)

    def canon(out):
        key = lambda t: tuple((v is None, str(type(v)), v) for v in t)
        return sorted([tuple(r) for r in out.collect()], key=key)

    assert canon(bf.overlap(d1, d2, how="inner", strategy="plain",
                            suffixes=("", "_b"))) == \
        canon(bf.overlap(d1, d2, how="inner", strategy="binned",
                         suffixes=("", "_b")))
    assert canon(bf.closest(d1, d2, strategy="cogroup",
                            suffixes=("", "_b"))) == \
        canon(bf.closest(d1, d2, strategy="binned", suffixes=("", "_b")))


# --------------------------------------------------------------------------
# winnowed span-dedup properties (round 6): the detection guarantee under
# random misalignment + removal bookkeeping invariants
# --------------------------------------------------------------------------

_span_corpus = st.lists(
    st.tuples(
        st.text(alphabet="XYZW", min_size=0, max_size=25),   # prefix
        st.text(alphabet="XYZW", min_size=0, max_size=25),   # suffix
    ),
    min_size=2, max_size=5,
)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(docs=_span_corpus,
       shared=st.text(alphabet="abcd", min_size=10, max_size=30))
def test_winnow_guarantee_and_removal_bookkeeping(spark, docs, shared):
    from pyspark.sql import functions as F
    from bioframe_spark.datapipe import dedup as ddp

    k, w = 6, 5
    # every doc embeds the SAME shared substring of length >= k+w-1 = 10
    # at an arbitrary offset; prefixes/suffixes use a disjoint alphabet
    # so they can never fabricate the shared gram
    rows = [(i, pre + shared + suf) for i, (pre, suf) in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    flagged = {r["doc_id"]: r["n_dup_spans"]
               for r in ddp.duplicate_spans(df, k=k, w=w).collect()}
    # the winnowing theorem: every doc shares >=1 fingerprint
    assert all(v >= 1 for v in flagged.values()), (rows, flagged)

    out = ddp.remove_duplicate_spans(df, k=k, w=w).collect()
    by_id = {r["doc_id"]: r for r in out}
    # bookkeeping: removed chars == length delta, keeper (min id) intact
    for i, (pre, suf) in enumerate(docs):
        orig = pre + shared + suf
        r = by_id[i]
        assert len(orig) - len(r["text"]) == r["n_removed_chars"], rows
    assert by_id[0]["text"] == rows[0][1]
    # non-keepers lose their copy: at least one window sits entirely
    # inside the shared run (len >= k+w-1), its min gram is selected
    # context-independently in EVERY doc, keeper = doc 0 -> cut
    for i in range(1, len(docs)):
        assert shared not in by_id[i]["text"], (rows, out)


# ---------------------------------------------------------------------------
# r9 (VERDICT-r8 #6): adversarial null/edge unicode fuzz over the r8 text
# family — astral-plane codepoints, combining-char-only strings, zero-width
# joiners, control bytes, empty / whitespace-only / null docs, across
# normalize_text, bpe_encode and hashed_text_score.

_ADVERSARIAL_ALPHABET = (
    "ab1 \t\n\x0b\x00\x1f\x7f.É é"          # ascii, controls, accents
    "́̈"                           # combining-only material
    "​‍"                           # zero-width space / joiner
    "\U0001d11e\U0001f600\U0001f3f3"         # astral: G-clef, emoji, flag
    "Ａａ"                           # fullwidth A/a
)

_adv_texts = st.lists(
    st.one_of(st.text(alphabet=_ADVERSARIAL_ALPHABET, max_size=40),
              st.just("́̈́"),           # combining-only
              st.just(""), st.just("   \t\x0b  "),     # zero-token docs
              st.just("x" * 60),       # one long word (heap-encoder path)
              st.none()),
    min_size=1, max_size=6)


def _mirror_normalize(x, *, strip_accents=True):
    """Exact driver-side mirror of normalize_text(lowercase=False):
    the UDF part IS this unicodedata code; the JVM parts are explicit
    ASCII character classes and a space-only trim."""
    import re
    import unicodedata

    if x is None:
        return None
    x = re.sub("[\x00-\x08\x0e-\x1f\x7f]", "", x)
    x = unicodedata.normalize("NFC", x)
    if strip_accents:
        x = "".join(c for c in unicodedata.normalize("NFD", x)
                    if not unicodedata.combining(c))
        x = unicodedata.normalize("NFC", x)
    x = re.sub("[ \t\n\r\f\x0b]+", " ", x)
    return x.strip(" ")


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(texts=_adv_texts)
def test_normalize_adversarial_differential(spark, texts):
    from bioframe_spark.datapipe import text as tx

    df = spark.createDataFrame(list(enumerate(texts)),
                               "doc_id long, text string")
    got = {r["doc_id"]: r["text"]
           for r in tx.normalize_text(df, lowercase=False,
                                      strip_accents=True).collect()}
    want = {i: _mirror_normalize(t) for i, t in enumerate(texts)}
    assert got == want


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(texts=_adv_texts)
def test_normalize_adversarial_idempotent(spark, texts):
    from bioframe_spark.datapipe import text as tx

    df = spark.createDataFrame(list(enumerate(texts)),
                               "doc_id long, text string")
    once = tx.normalize_text(df, lowercase=True, strip_accents=True)
    twice = tx.normalize_text(once, lowercase=True, strip_accents=True)
    a = {r["doc_id"]: r["text"] for r in once.collect()}
    b = {r["doc_id"]: r["text"] for r in twice.collect()}
    assert a == b


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(texts=_adv_texts)
def test_bpe_encode_adversarial_roundtrip(spark, texts):
    """Token concatenation must reconstruct every pre-tokenized word +
    its </w> marker; zero-token docs give ([], 0); null gives (null,
    null). Covers the heap-encoder dispatch (60-char word) and astral /
    combining / zero-width text through Arrow both ways."""
    import re

    from bioframe_spark.datapipe import tokenize
    from bioframe_spark.datapipe.ranking import TOKEN_SPLIT_RE

    split_re = re.compile(TOKEN_SPLIT_RE)
    df = spark.createDataFrame(list(enumerate(texts)),
                               "doc_id long, text string")
    merges = [("x", "x"), ("xx", "xx"), ("a", "b"), ("1", "</w>"),
              ("xxxx", "xxxx"), ("b", "1")]
    out = {r["doc_id"]: (r["tokens"], r["n_tokens"])
           for r in tokenize.bpe_encode(df, merges).collect()}
    for i, t in enumerate(texts):
        toks, n = out[i]
        if t is None:
            assert toks is None and n is None
            continue
        words = [w for w in split_re.split(t.lower()) if w]
        assert "".join(toks) == "".join(
            w + tokenize.END_OF_WORD for w in words), (t, toks)
        assert n == len(toks)
        if not words:
            assert toks == [] and n == 0


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(texts=_adv_texts)
def test_hashed_score_adversarial_edges(spark, texts):
    """null text -> null score; zero-token docs -> score == bias;
    everything else finite — no crash on astral/combining tokens."""
    import math
    import re

    from bioframe_spark.datapipe import classifier as clf
    from bioframe_spark.datapipe.ranking import TOKEN_SPLIT_RE

    split_re = re.compile(TOKEN_SPLIT_RE)
    df = spark.createDataFrame(list(enumerate(texts)),
                               "doc_id long, text string")
    out = {r["doc_id"]: r["score"]
           for r in clf.hashed_text_score(
               df, {3: 0.5, 7: -0.25}, dim=16, bias=0.125).collect()}
    for i, t in enumerate(texts):
        assert i in out
        if t is None:
            assert out[i] is None
            continue
        assert out[i] is not None and math.isfinite(out[i])
        if not [w for w in split_re.split(t.lower()) if w]:
            assert out[i] == 0.125
