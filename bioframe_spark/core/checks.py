"""Validation predicates as Spark aggregate queries.

Each check mirrors a reference predicate (``core/checks.py``) but is
expressed as a single count-of-violations aggregation — one job, fully
distributed, no collect of data rows. Opt-in (the reference pays
``is_bedframe`` on every operator call; here validation is explicit).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .specs import _resolve_cols, _verify_columns
from ..functions.intervals import overlap_predicate


def _violations(df: DataFrame, pred) -> int:
    """Count rows where *pred* is true (null-safe: null counts as violation
    only if pred evaluates true)."""
    return df.filter(pred).limit(1).count()


def _report(ok: bool, raise_errors: bool, msg: str) -> bool:
    if not ok and raise_errors:
        raise ValueError(msg)
    return ok


def is_bedframe(df: DataFrame, raise_errors: bool = False, cols=None) -> bool:
    """Columns exist; null rule (chrom/start/end null together); start<=end.

    Reference ``core/checks.py:20-87``.
    """
    ck, sk, ek = _resolve_cols(cols)
    try:
        _verify_columns(df, [ck, sk, ek], "is_bedframe")
    except ValueError as e:
        return _report(False, raise_errors, str(e))
    c, s, e = F.col(ck), F.col(sk), F.col(ek)
    nulls = c.isNull() | s.isNull() | e.isNull()
    all_null = c.isNull() & s.isNull() & e.isNull()
    bad_null = nulls & ~all_null
    bad_order = s > e
    n = _violations(df, bad_null | bad_order)
    return _report(n == 0, raise_errors, "invalid bedframe: null-rule or start>end violation")


def is_overlapping(df: DataFrame, cols=None) -> bool:
    """True if any two intervals in *df* overlap (reference ``checks.py:148-180``:
    merged total length < raw total length)."""
    ck, sk, ek = _resolve_cols(cols)
    from ..operators.ops import merge

    raw = df.filter(F.col(ck).isNotNull()).agg(
        F.sum(F.col(ek) - F.col(sk)).alias("t")
    ).collect()[0]["t"]
    merged = merge(df.filter(F.col(ck).isNotNull()), min_dist=None, cols=cols)
    tot = merged.agg(F.sum(F.col(ek) - F.col(sk)).alias("t")).collect()[0]["t"]
    if raw is None:
        return False
    return tot < raw


def is_cataloged(
    df: DataFrame, view_df: DataFrame, raise_errors: bool = False,
    df_view_col: str = "view_region", view_name_col: str = "name",
) -> bool:
    """Every df region label exists in the view (anti-join empty).
    Reference ``checks.py:90-145``."""
    missing = df.join(
        view_df.select(F.col(view_name_col).alias(df_view_col)).distinct(),
        on=df_view_col, how="left_anti",
    )
    n = missing.limit(1).count()
    return _report(n == 0, raise_errors, "df contains regions not in view")


def is_viewframe(df: DataFrame, raise_errors: bool = False, cols=None,
                 view_name_col: str = "name") -> bool:
    """Bedframe + non-null + unique names + non-overlapping intervals.
    Reference ``checks.py:183-252``."""
    ck, sk, ek = _resolve_cols(cols)
    try:
        _verify_columns(df, [ck, sk, ek, view_name_col], "is_viewframe")
    except ValueError as e:
        return _report(False, raise_errors, str(e))
    if not is_bedframe(df, cols=cols):
        return _report(False, raise_errors, "view is not a valid bedframe")
    nulls = _violations(
        df, F.col(ck).isNull() | F.col(sk).isNull() | F.col(ek).isNull()
        | F.col(view_name_col).isNull())
    if nulls:
        return _report(False, raise_errors, "view contains nulls")
    dup = (df.groupBy(view_name_col).count().filter(F.col("count") > 1)
           .limit(1).count())
    if dup:
        return _report(False, raise_errors, "view names not unique")
    if is_overlapping(df, cols=cols):
        return _report(False, raise_errors, "view intervals overlap")
    return True


def is_contained(
    df: DataFrame, view_df: DataFrame, raise_errors: bool = False,
    df_view_col: str | None = None, view_name_col: str = "name", cols=None,
) -> bool:
    """No interval escapes its assigned view region (reference
    ``checks.py:255-342``)."""
    ck, sk, ek = _resolve_cols(cols)
    from ..operators.ops import assign_view

    if df_view_col is None:
        tagged = assign_view(df, view_df, view_name_col=view_name_col, cols=cols)
        df_view_col = "view_region"
    else:
        tagged = df
    v = view_df.select(
        F.col(view_name_col).alias(df_view_col),
        F.col(sk).alias("__vs"), F.col(ek).alias("__ve"),
    )
    joined = tagged.join(F.broadcast(v), on=df_view_col, how="left")
    bad = joined.filter(
        F.col("__vs").isNull()
        | (F.col(sk) < F.col("__vs")) | (F.col(ek) > F.col("__ve"))
    )
    n = bad.limit(1).count()
    return _report(n == 0, raise_errors, "df not contained in view")


def is_covering(df: DataFrame, view_df: DataFrame, view_name_col: str = "name",
                cols=None) -> bool:
    """df covers the whole view (complement is empty).
    Reference ``checks.py:345-391``."""
    from ..operators.ops import complement

    comp = complement(df, view_df=view_df, view_name_col=view_name_col, cols=cols)
    return comp.limit(1).count() == 0


def is_tiling(df: DataFrame, view_df: DataFrame, raise_errors: bool = False,
              view_name_col: str = "name", cols=None) -> bool:
    """Covering ∧ contained ∧ overlap-free (reference ``checks.py:394-471``)."""
    ok = (
        is_covering(df, view_df, view_name_col=view_name_col, cols=cols)
        and is_contained(df, view_df, view_name_col=view_name_col, cols=cols)
        and not is_overlapping(df, cols=cols)
    )
    return _report(ok, raise_errors, "df does not tile view")


def is_sorted(df: DataFrame, cols=None, ordered_cols: list | None = None) -> bool:
    """True if rows are sorted by (chrom, start, end) in the frame's physical
    order (partition index, then within-partition order).

    Fully distributed: each partition streams its Arrow batches once through
    a ``mapInPandas`` summarizer that checks local monotonicity and emits ONE
    row (partition id, locally-sorted flag, first/last key) — the driver
    collects only #partitions rows and verifies the partition boundaries are
    themselves ordered. No data-row collect at any scale.

    Note: Spark DataFrames carry no intrinsic row order unless sorted; this
    check is mainly useful on freshly-read ordered sources.
    Reference ``checks.py:474-540`` (sort-idempotence).
    """
    ck, sk, ek = _resolve_cols(cols)
    keys = list(ordered_cols) if ordered_cols else [ck, sk, ek]
    _verify_columns(df, keys, "is_sorted")
    import pandas as pd
    from pyspark import TaskContext
    from pyspark.sql import types as T

    kdf = df.select(*keys)
    in_fields = kdf.schema.fields
    out_schema = T.StructType(
        [T.StructField("pid", T.IntegerType()), T.StructField("ok", T.BooleanType())]
        + [T.StructField(f"first_{f.name}", f.dataType) for f in in_fields]
        + [T.StructField(f"last_{f.name}", f.dataType) for f in in_fields]
    )

    def _is_monotonic(pdf: "pd.DataFrame") -> bool:
        srt = pdf.sort_values(keys, kind="mergesort", na_position="last")
        return pdf.reset_index(drop=True).equals(srt.reset_index(drop=True))

    def summarize(batches):
        pid = TaskContext.get().partitionId()
        ok, first, last = True, None, None
        for pdf in batches:
            if pdf.empty:
                continue
            if ok and not _is_monotonic(pdf):
                ok = False
            if first is None:
                first = pdf.iloc[[0]]
            elif ok and not _is_monotonic(
                pd.concat([last, pdf.iloc[[0]]], ignore_index=True)
            ):
                ok = False  # out-of-order across a batch boundary
            last = pdf.iloc[[-1]]
        if first is None:
            return  # empty partition contributes nothing
        row = {"pid": pid, "ok": ok}
        for c in keys:
            row[f"first_{c}"] = first.iloc[0][c]
            row[f"last_{c}"] = last.iloc[0][c]
        yield pd.DataFrame([row])

    summ = kdf.mapInPandas(summarize, schema=out_schema).collect()
    if not summ:
        return True
    if not all(r["ok"] for r in summ):
        return False
    # boundary check: first/last keys interleaved in partition order must
    # themselves be sorted (same comparator as the per-partition pass)
    summ.sort(key=lambda r: r["pid"])
    rows = []
    for r in summ:
        rows.append([r[f"first_{c}"] for c in keys])
        rows.append([r[f"last_{c}"] for c in keys])
    bdf = pd.DataFrame(rows, columns=keys)
    return _is_monotonic(bdf)
