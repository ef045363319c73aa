"""BED writing + validation with full reference parity, Spark-native.

Mirrors the reference validator suite (``io/bed.py:127-543``): 12 per-field
validators with the same named properties ("chrom.is_alnum", …), cross-field
rules (thickStart/thickEnd within the interval), and the BED12 block
structure rules (count match, in-range, first-at-start, last-at-end,
sorted, non-overlapping) — plus ``parse_bed_schema`` / ``infer_bed_schema``
/ ``to_bed_dataframe`` (``io/bed.py:592-682``).

Spark-first design: every property compiles to a violation-count column and
ALL properties run in ONE aggregation job (map-side partial aggregation, no
data-row collect). Block rules use higher-order array functions
(transform / zip_with / forall) — JVM-side, codegen-friendly. The only
driver-side data is the per-property counts (a single row).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

UINT64_MAX = (1 << 64) - 1


def _uint64_max_lit() -> Column:
    # 2^64-1 exceeds a Java long, so the predicate literal is a SQL decimal
    return F.expr("CAST('18446744073709551615' AS DECIMAL(20,0))")

BED_FIELD_NAMES = [
    "chrom", "start", "end", "name", "score", "strand",
    "thickStart", "thickEnd", "itemRgb", "blockCount",
    "blockSizes", "blockStarts",
]

# Allowed Spark type classes per field ("kinds" in the reference,
# ``io/bed.py:90-105``): i = integral, f = fractional, s = string.
_INTEGRAL = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
_FRACTIONAL = (T.FloatType, T.DoubleType, T.DecimalType)
_STRING = (T.StringType,)

BED_FIELD_KINDS = {
    "chrom": _STRING,
    "start": _INTEGRAL,
    "end": _INTEGRAL,
    "name": _STRING,
    "score": _INTEGRAL + _FRACTIONAL,
    "strand": _STRING,
    "thickStart": _INTEGRAL,
    "thickEnd": _INTEGRAL,
    "itemRgb": _INTEGRAL + _STRING,
    "blockCount": _INTEGRAL,
    "blockSizes": _STRING,
    "blockStarts": _STRING,
}

BED_FIELD_FILLVALUES = {
    "chrom": "_",
    "start": 0,
    "end": 0,
    "name": ".",
    "score": 0,
    "strand": ".",
    "itemRgb": "0",
}

_INT_LIST = r"^(\d+,)*\d+(,)?$"


def _arr(colname: str) -> Column:
    """Comma list column → array<long> (trailing comma tolerated)."""
    return F.expr(
        f"transform(split(rtrim(',', {colname}), ','), x -> TRY_CAST(x AS LONG))"
    )


def bed_property_violations(fields: list[str],
                            chromsizes: bool = False) -> dict[str, Column]:
    """Per-property violation predicates (row-level booleans), keyed by the
    reference property names. Null field values are skipped by each
    predicate (null handling is reported separately, as in the reference).

    ``chromsizes=True`` adds the ``start.is_lt_chrom`` / ``end.is_le_chrom``
    properties, which expect a ``__chromsize`` column (joined beforehand).
    """
    P: dict[str, Column] = {}

    def _nn(colname, pred):
        return F.col(colname).isNotNull() & pred

    if "chrom" in fields:
        P["chrom.is_alnum"] = _nn("chrom", ~F.col("chrom").rlike(r"^[A-Za-z0-9_]+$"))
        P["chrom.is_len_ok"] = _nn("chrom", ~F.length("chrom").between(1, 255))
    if "start" in fields:
        P["start.is_nonneg"] = _nn("start", F.col("start") < 0)
        P["start.is_le_64"] = _nn(
            "start", F.col("start").cast("decimal(20,0)") > _uint64_max_lit()
        )
        if chromsizes:
            # NOTE the reference compares END here (io/bed.py:176 quirk),
            # and an unknown chrom fails the property (NaN lookup) — both
            # mirrored exactly.
            P["start.is_lt_chrom"] = _nn(
                "start",
                F.col("__chromsize").isNull()
                | (F.col("end") >= F.col("__chromsize")),
            )
    if "end" in fields:
        P["end.is_nonneg"] = _nn("end", F.col("end") < 0)
        P["end.is_le_64"] = _nn(
            "end", F.col("end").cast("decimal(20,0)") > _uint64_max_lit()
        )
        P["end.is_end_ge_start"] = _nn("end", F.col("end") < F.col("start"))
        if chromsizes:
            P["end.is_le_chrom"] = _nn(
                "end",
                F.col("__chromsize").isNull()
                | (F.col("end") > F.col("__chromsize")),
            )
    if "name" in fields:
        P["name.is_len_ok"] = _nn("name", ~F.length("name").between(1, 255))
    if "score" in fields:
        P["score.is_in_range"] = _nn("score", ~F.col("score").between(0, 1000))
    if "strand" in fields:
        P["strand.is_pattern_ok"] = _nn("strand", ~F.col("strand").rlike(r"^[+\-.?]$"))
    if "thickStart" in fields:
        P["thickStart.is_ge_start"] = _nn("thickStart", F.col("thickStart") < F.col("start"))
        P["thickStart.is_le_end"] = _nn("thickStart", F.col("thickStart") > F.col("end"))
    if "thickEnd" in fields:
        P["thickEnd.is_ge_start"] = _nn("thickEnd", F.col("thickEnd") < F.col("start"))
        P["thickEnd.is_le_end"] = _nn("thickEnd", F.col("thickEnd") > F.col("end"))
    if "itemRgb" in fields:
        rgb = F.col("itemRgb").cast("string")
        P["itemRgb.is_pattern_ok"] = _nn(
            "itemRgb", ~(rgb.rlike(r"^(\d{1,3},){2}\d{1,3}$") | (rgb == "0"))
        )
        # in-range check only where the pattern holds (the reference's
        # int() casts would throw on non-numeric tokens)
        rgb_arr = F.expr(
            "transform(split(CAST(itemRgb AS STRING), ','), x -> TRY_CAST(x AS LONG))"
        )
        P["itemRgb.is_in_range"] = _nn(
            "itemRgb",
            rgb.rlike(r"^(\d{1,3},){2}\d{1,3}$|^\d+$")
            & ~F.expr(
                "forall(transform(split(CAST(itemRgb AS STRING), ','),"
                " x -> TRY_CAST(x AS LONG)), v -> v >= 0 AND v <= 255)"
            ),
        ) | _nn("itemRgb", ~rgb.rlike(r"^(\d{1,3},){2}\d{1,3}$|^\d+$"))
    if "blockCount" in fields:
        P["blockCount.is_gt_0"] = _nn("blockCount", F.col("blockCount") <= 0)
    if "blockSizes" in fields:
        P["blockSizes.is_pattern_ok"] = _nn(
            "blockSizes", ~F.col("blockSizes").rlike(_INT_LIST)
        )
        if "blockCount" in fields:
            P["blockSizes.is_n_blocks_ok"] = _nn(
                "blockSizes",
                F.col("blockSizes").rlike(_INT_LIST)
                & (F.size(_arr("blockSizes")) != F.col("blockCount")),
            )
    if "blockStarts" in fields:
        ok_pat = F.col("blockStarts").rlike(_INT_LIST) & F.col("blockSizes").rlike(_INT_LIST)
        starts, sizes = _arr("blockStarts"), _arr("blockSizes")
        P["blockStarts.is_pattern_ok"] = _nn(
            "blockStarts", ~F.col("blockStarts").rlike(_INT_LIST)
        )
        if "blockCount" in fields:
            P["blockStarts.is_n_blocks_ok"] = _nn(
                "blockStarts",
                ok_pat & (F.size(starts) != F.col("blockCount")),
            )
        P["blockStarts.is_in_range"] = _nn(
            "blockStarts",
            ok_pat & ~F.expr(
                "forall(transform(split(rtrim(',', blockStarts), ','),"
                " x -> TRY_CAST(x AS LONG)), v -> v >= 0) ")
            | (ok_pat & F.exists(starts, lambda v: v > F.col("end"))),
        )
        P["blockStarts.is_first_block_start"] = _nn(
            "blockStarts", ok_pat & (F.element_at(starts, 1) != 0)
        )
        P["blockStarts.is_last_block_end"] = _nn(
            "blockStarts",
            ok_pat
            & (F.element_at(starts, -1) + F.element_at(sizes, -1)
               != F.col("end") - F.col("start")),
        )
        P["blockStarts.is_sorted"] = _nn(
            "blockStarts", ok_pat & (F.sort_array(starts) != starts)
        )
        # non-overlap: starts[i] + sizes[i] <= starts[i+1] for each i —
        # pairwise via zip_with over the array and its shifted self
        P["blockStarts.is_no_overlap"] = _nn(
            "blockStarts",
            ok_pat & F.expr(
                "exists(zip_with("
                "  slice(transform(split(rtrim(',', blockStarts), ','), x -> TRY_CAST(x AS LONG)), 1, size(split(rtrim(',', blockStarts), ',')) - 1),"
                "  zip_with("
                "    slice(transform(split(rtrim(',', blockStarts), ','), x -> TRY_CAST(x AS LONG)), 2, size(split(rtrim(',', blockStarts), ',')) - 1),"
                "    slice(transform(split(rtrim(',', blockSizes), ','), x -> TRY_CAST(x AS LONG)), 1, size(split(rtrim(',', blockSizes), ',')) - 1),"
                "    (nxt, sz) -> struct(nxt, sz)),"
                "  (st, p) -> st + p.sz > p.nxt), b -> b)"
            ),
        )
        # NOTE on the lambda above: pairs (starts[i], (starts[i+1], sizes[i]))
        # — violation when starts[i] + sizes[i] > starts[i+1].
    return P


def validate_bed_fields(df: DataFrame, fields: list[str],
                        chromsizes: dict | None = None,
                        strict_score: bool = False):
    """Validate BED fields; returns (dtype_failed, notnull_failed,
    prop_failed) sets, exactly as the reference (``io/bed.py:478-543``).

    One Spark job: all null-counts and property-violation counts aggregate
    in a single pass over the data.
    """
    fields = [c for c in fields if c in df.columns]
    schema_by_name = {f.name: f.dataType for f in df.schema.fields}

    dtype_failed = set()
    for colname in fields:
        allowed = ((T.ByteType, T.ShortType, T.IntegerType, T.LongType)
                   if strict_score and colname == "score"
                   else BED_FIELD_KINDS[colname])
        if not isinstance(schema_by_name[colname], allowed):
            dtype_failed.add(colname)

    checkable = [c for c in fields if c not in dtype_failed
                 and not (c == "score" and not strict_score)]

    d = df
    if chromsizes is not None and {"chrom", "start", "end"} & set(checkable):
        items = list(chromsizes.items()) if isinstance(chromsizes, dict) \
            else list(chromsizes)
        from ..core.construction import local_df
        cs = local_df(
            [(str(c), int(s)) for c, s in items],
            T.StructType.fromDDL("__cs_chrom string, __chromsize long"),
        )
        d = d.join(F.broadcast(cs), d["chrom"] == F.col("__cs_chrom"), "left")

    props = bed_property_violations(checkable, chromsizes=chromsizes is not None)
    aggs = [F.sum(F.when(pred, 1).otherwise(0)).alias(f"p::{name}")
            for name, pred in props.items()]
    aggs += [F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"n::{c}")
             for c in checkable]
    if not aggs:
        return dtype_failed, set(), set()
    row = d.agg(*aggs).collect()[0].asDict()

    notnull_failed = {c for c in checkable if (row[f"n::{c}"] or 0) > 0}
    prop_failed = {name for name in props if (row[f"p::{name}"] or 0) > 0}
    return dtype_failed, notnull_failed, prop_failed


def check_is_sorted(df: DataFrame) -> dict:
    """BED sortedness in the frame's physical order (reference
    ``io/bed.py:546-577``): chrom runs consecutive (any chrom order) and
    (start, end) lexsorted within each chrom run.

    Distributed: one ``mapInPandas`` pass emits a per-partition summary row
    (#chrom runs, local sort flag, boundary rows); the driver stitches
    boundaries and compares total runs to the distinct-chrom count.
    """
    import pandas as pd
    from pyspark import TaskContext

    kdf = df.select(
        F.col("chrom").cast("string"), F.col("start").cast("long"),
        F.col("end").cast("long"),
    )
    out_schema = T.StructType([
        T.StructField("pid", T.IntegerType()),
        T.StructField("n_runs", T.LongType()),
        T.StructField("ok_sorted", T.BooleanType()),
        T.StructField("first_chrom", T.StringType()),
        T.StructField("first_start", T.LongType()),
        T.StructField("first_end", T.LongType()),
        T.StructField("last_chrom", T.StringType()),
        T.StructField("last_start", T.LongType()),
        T.StructField("last_end", T.LongType()),
    ])

    def summarize(batches):
        pid = TaskContext.get().partitionId()
        n_runs, ok, first, last = 0, True, None, None
        for pdf in batches:
            if pdf.empty:
                continue
            ch = pdf["chrom"].to_numpy()
            changes = (ch[1:] != ch[:-1])
            runs_here = 1 + int(changes.sum())
            if last is not None and last["chrom"] == ch[0]:
                runs_here -= 1  # continuation of the previous run
            n_runs += runs_here
            # within-run (start,end) monotonicity, including the stitch row
            work = pdf if last is None else pd.concat(
                [pd.DataFrame([last]), pdf], ignore_index=True
            )
            grp_change = work["chrom"] != work["chrom"].shift()
            prev_s, prev_e = work["start"].shift(), work["end"].shift()
            bad = (~grp_change) & (
                (work["start"] < prev_s)
                | ((work["start"] == prev_s) & (work["end"] < prev_e))
            )
            if bad.any():
                ok = False
            if first is None:
                first = pdf.iloc[0].to_dict()
            last = pdf.iloc[-1].to_dict()
        if first is None:
            return
        yield pd.DataFrame([{
            "pid": pid, "n_runs": n_runs, "ok_sorted": ok,
            "first_chrom": first["chrom"], "first_start": first["start"],
            "first_end": first["end"], "last_chrom": last["chrom"],
            "last_start": last["start"], "last_end": last["end"],
        }])

    summ = sorted(kdf.mapInPandas(summarize, schema=out_schema).collect(),
                  key=lambda r: r["pid"])
    n_distinct = kdf.select("chrom").distinct().count()
    if not summ:
        return {"sorted.is_chrom_consecutive": True,
                "sorted.is_sorted_start_end": True}
    total_runs = sum(r["n_runs"] for r in summ)
    ok_sorted = all(r["ok_sorted"] for r in summ)
    for prev, nxt in zip(summ, summ[1:]):
        if prev["last_chrom"] == nxt["first_chrom"]:
            total_runs -= 1  # run spanning a partition boundary
            if (nxt["first_start"], nxt["first_end"]) < (
                prev["last_start"], prev["last_end"]
            ):
                ok_sorted = False
    return {
        "sorted.is_chrom_consecutive": total_runs == n_distinct,
        "sorted.is_sorted_start_end": ok_sorted,
    }


def infer_bed_schema(df: DataFrame) -> tuple[int, bool]:
    """Largest standard prefix present in the columns → (n, extended)
    (reference ``io/bed.py:580-589``)."""
    for i in [12, 9, 8, 7, 6, 5, 4, 3]:
        if BED_FIELD_NAMES[i - 1] in df.columns:
            n = i
            break
    else:
        raise ValueError("Could not infer a BED schema.")
    extended = len(df.columns) > n
    return n, extended


def parse_bed_schema(schema: str) -> tuple[int, bool]:
    """'bedN[+[m]]' → (n standard fields, extended?) (reference
    ``io/bed.py:592-599``)."""
    match = re.match(r"^bed(3|4|5|6|7|8|9|12)?(\+(\d+)?)?$", schema.lower())
    if not match:
        raise ValueError(f"Invalid BED schema name: {schema}")
    n = int(match.group(1)) if match.group(1) else 6
    extended = match.group(2) is not None
    return n, extended


def to_bed_dataframe(df: DataFrame, schema: str = "infer",
                     validate_fields: bool = True,
                     require_sorted: bool = False,
                     chromsizes: dict | None = None,
                     strict_score: bool = False,
                     replace_na: bool = True) -> DataFrame:
    """Coerce to a standard-column BED frame (reference
    ``io/bed.py:602-682``): fill missing standard fields with the spec's
    uninformative values, validate, order columns (standard prefix +
    custom), raise TypeError/ValueError exactly where the reference does.
    """
    if schema == "infer":
        n, extended = infer_bed_schema(df)
    else:
        n, extended = parse_bed_schema(schema)

    if not {"chrom", "start", "end"} <= set(df.columns):
        raise ValueError(
            "BED dataframe must have at least 3 fields: chrom, start, end."
        )
    if n == 12 and not {"blockCount", "blockSizes", "blockStarts"} <= set(df.columns):
        raise ValueError(
            "Informative blockCount, blockSizes, and blockStarts fields are "
            "mandatory in BED12+ files."
        )

    standard_cols = BED_FIELD_NAMES[:n]
    fill_cols = [c for c in standard_cols if c not in df.columns]
    data_cols = [c for c in standard_cols if c in df.columns]
    custom_cols = [c for c in df.columns if c not in standard_cols] if extended else []

    fields_with_nulls: set = set()
    if validate_fields:
        dtypes_failed, fields_with_nulls, props_failed = validate_bed_fields(
            df, data_cols, chromsizes=chromsizes, strict_score=strict_score
        )
        if dtypes_failed:
            raise TypeError(f"Fields contain invalid dtypes: {dtypes_failed}.")
        if fields_with_nulls and not replace_na:
            raise ValueError(f"Fields contain null values: {fields_with_nulls}.")
        if props_failed:
            raise ValueError(f"Properties that failed validation: {props_failed}.")

    if require_sorted:
        props = check_is_sorted(df)
        failed = [k for k, v in props.items() if not v]
        if failed:
            raise ValueError(f"DataFrame isn't properly sorted: {failed}.")

    out_cols = []
    for colname in standard_cols:
        if colname in fill_cols:
            if colname == "thickStart":
                out_cols.append(F.col("start").alias(colname))
            elif colname == "thickEnd":
                out_cols.append(F.col("end").alias(colname))
            else:
                out_cols.append(F.lit(BED_FIELD_FILLVALUES[colname]).alias(colname))
        elif colname in fields_with_nulls and replace_na:
            out_cols.append(
                F.coalesce(F.col(colname),
                           F.lit(BED_FIELD_FILLVALUES[colname])).alias(colname)
            )
        else:
            out_cols.append(F.col(colname))
    out_cols += [F.col(c) for c in custom_cols]
    return df.select(*out_cols)


def to_bed(df: DataFrame, path: str | None = None, *, schema: str = "infer",
           validate_fields: bool = True, require_sorted: bool = False,
           chromsizes: dict | None = None, strict_score: bool = False,
           replace_na: bool = True, sort: bool = True,
           single_file: bool = True) -> DataFrame:
    """Validate + write a BED file (reference ``io/bed.py:685-738``).

    Returns the coerced frame; writes TSV when ``path`` is given.
    ``single_file=True`` writes exactly the file at *path* (a BED file is
    one ordered text file by convention — the part file is moved into
    place for local paths; scheme-qualified paths keep Spark's directory
    layout); at scale pass False for one part per partition.
    """
    bed = to_bed_dataframe(
        df, schema=schema, validate_fields=validate_fields,
        require_sorted=require_sorted, chromsizes=chromsizes,
        strict_score=strict_score, replace_na=replace_na,
    )
    if path is not None:
        out = bed.orderBy("chrom", "start", "end") if sort else bed
        local = "://" not in path
        if single_file:
            out = out.coalesce(1)
        if single_file and local:
            import glob
            import os
            import shutil

            tmp = path + ".spark-write-tmp"
            out.write.mode("overwrite").option("sep", "\t").csv(tmp)
            parts = sorted(glob.glob(os.path.join(tmp, "part-*")))
            with open(path, "wb") as dst:
                for p in parts:
                    with open(p, "rb") as src:
                        shutil.copyfileobj(src, dst)
            shutil.rmtree(tmp)
        else:
            out.write.mode("overwrite").option("sep", "\t").csv(path)
    return bed
