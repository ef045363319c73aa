"""Interval-predicate expression builders (the semantic core).

Coordinate semantics (reference ``docs/guide-definitions.rst:6-16``):
0-based half-open ``[start, end)``; points (``start == end``) are legal and
are rewritten to length-1 pseudo-segments inside overlap detection
(reference ``core/arrops.py:271-287``) so a point overlaps a segment that
contains it, while two adjacent points do not overlap.

Everything here returns Spark Column expressions — pure, JVM-side,
whole-stage-codegen friendly. No UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def effective_end(start: Column, end: Column) -> Column:
    """End with the point→length-1 rewrite applied (arrops.py:271-287).

    Saturating: a point AT INT64_MAX keeps INT64_MAX (zero effective
    width — nothing exists beyond the coordinate space to match it);
    a raw ``end + 1`` would raise ARITHMETIC_OVERFLOW under ANSI, and
    the reference's numpy silently wraps negative."""
    return F.when(
        end == start,
        F.coalesce(F.try_add(end, F.lit(1)), end),
    ).otherwise(end)


def overlap_predicate(
    s1: Column, e1: Column, s2: Column, e2: Column, closed: bool = False
) -> Column:
    """True iff intervals [s1,e1) and [s2,e2) overlap (point-aware).

    Half-open: ``s1 < e2' and s2 < e1'`` with point-rewritten ends.
    Closed variant accepts single-point touches (arrops.py:155-161).
    """
    if closed:
        return (s1 <= e2) & (s2 <= e1)
    ee1 = effective_end(s1, e1)
    ee2 = effective_end(s2, e2)
    return (s1 < ee2) & (s2 < ee1)


def overlap_length(s1: Column, e1: Column, s2: Column, e2: Column) -> Column:
    """Length of the intersection span (>=0 only when overlapping)."""
    return F.least(e1, e2) - F.greatest(s1, s2)


def genomic_distance(s1: Column, e1: Column, s2: Column, e2: Column) -> Column:
    """Genomic distance between two intervals: 0 when overlapping/abutting,
    else the gap size (reference ``ops.py:1209-1219``)."""
    return F.greatest(F.lit(0), F.greatest(s1, s2) - F.least(e1, e2))


def region_select_predicate(
    chrom_col: Column, start_col: Column, end_col: Column,
    chrom: str, start: int | None, end: int | None,
) -> Column:
    """Predicate for `select(df, region)` (reference ``ops.py:54-66``).

    chrom match; if start given: half-open overlap with [start, end) plus
    the point-at-query-start clause; missing end → +inf.
    """
    pred = chrom_col == F.lit(chrom)
    if start is None:
        return pred
    ov = end_col > F.lit(start)
    if end is not None:
        ov = ov & (start_col < F.lit(end))
    point = (start_col == end_col) & (start_col == F.lit(start))
    return pred & (ov | point)


def natsort_key(chrom: Column) -> Column:
    """Sort key for natural chromosome ordering ("chr2" < "chr10").

    Splits into (alpha prefix, zero-padded numeric, suffix) — a pure-SQL
    stand-in for the reference's token-based natsort (arrops.py:10-23).
    """
    prefix = F.regexp_extract(chrom, r"^(\D*)", 1)
    num = F.regexp_extract(chrom, r"^\D*(\d+)", 1)
    rest = F.regexp_extract(chrom, r"^\D*\d+(.*)$", 1)
    return F.concat(
        prefix,
        F.when(num == "", F.lit("")).otherwise(F.lpad(num, 12, "0")),
        rest,
    )
