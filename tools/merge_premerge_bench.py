"""Experiment: can a map-side pre-merge (mapInPandas local island
collapse) or a narrower window exchange push merge() below the 2x bar?

Variants over the bench workload (ivals_a sf0.1, 600k rows, cached):
  A. current bf.merge (border-row single-window path)
  B. premerge (per-Arrow-batch local merge in pandas) + border window
  C. premerge + explicit small repartition before the window
  D. no premerge, explicit small repartition before the window

Run: python tools/merge_premerge_bench.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd  # noqa: E402
from pyspark.sql import functions as F, types as T, Window  # noqa: E402

from bioframe_spark.session import get_spark  # noqa: E402
import bioframe_spark as bf  # noqa: E402
import __spark_entry__ as em  # noqa: E402
from bench import force_count as _force_count  # noqa: E402


def premerge(df, ck, sk, ek, on, min_dist):
    """Per-Arrow-batch local merge: collapse each batch's intervals into
    local islands carrying a count. Null-key rows pass through cnt=1."""
    cols = [ck, sk, ek] + on
    keys = [ck] + on
    fields = [df.schema[c] for c in cols]
    out_schema = T.StructType(fields + [T.StructField("__cnt", T.LongType())])

    def gen(batches):
        for pdf in batches:
            pdf = pdf[cols]
            valid = pdf[ck].notna() & pdf[sk].notna() & pdf[ek].notna()
            for c in on:
                valid &= pdf[c].notna()
            nv = pdf[~valid]
            vd = pdf[valid]
            out = []
            if len(vd):
                vd = vd.sort_values(keys + [sk, ek], kind="mergesort")
                g = vd.groupby(keys, sort=False)
                cm = g[ek].cummax()
                vd = vd.assign(__cm=cm)
                prev = vd.groupby(keys, sort=False)["__cm"].shift()
                if min_dist is None:
                    border = vd[sk] >= prev
                else:
                    border = vd[sk] > prev + min_dist
                border = border | prev.isna()
                isl = border.cumsum()
                agg = vd.groupby(isl, sort=False).agg(
                    **{k: (k, "first") for k in keys},
                    **{sk: (sk, "min"), ek: (ek, "max")},
                    __cnt=(sk, "size"),
                )
                out.append(agg[cols + ["__cnt"]])
            if len(nv):
                out.append(nv.assign(__cnt=1)[cols + ["__cnt"]])
            if out:
                yield pd.concat(out, ignore_index=True)

    return df.mapInPandas(gen, out_schema)


def border_merge_cnt(d, ck, sk, ek, on, min_dist, nparts=None):
    """Border-row merge over pre-merged rows with __cnt (n_intervals =
    cnt-cumsum differences instead of row-number differences)."""
    valid_pred = F.lit(True)
    for c in [ck, sk, ek] + on:
        valid_pred = valid_pred & F.col(c).isNotNull()
    d = d.withColumn("__v", valid_pred)
    if nparts:
        d = d.repartition(nparts, "__v", F.col(ck), *[F.col(c) for c in on])
    w = Window.partitionBy("__v", ck, *on).orderBy(sk, ek)
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    prev_max = F.max(ek).over(w.rowsBetween(Window.unboundedPreceding, -1))
    ce = F.coalesce(
        F.sum("__cnt").over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0))
    d = d.select(
        "__v", ck, sk, ek, *on,
        prev_max.alias("__pm"),
        F.row_number().over(w).alias("__rn"),
        ce.alias("__ce"),
        F.max(ek).over(wfull).alias("__gmax"),
        F.sum("__cnt").over(wfull).alias("__gtot"),
    )
    if min_dist is None:
        border = F.col(sk) >= F.col("__pm")
    else:
        border = F.col(sk) > F.col("__pm") + F.lit(min_dist)
    border = (
        F.when(~F.col("__v"), F.lit(True))
        .when(F.col("__pm").isNull(), F.lit(True))
        .otherwise(border)
    )
    d = d.filter(border)
    w2 = Window.partitionBy("__v", ck, *on).orderBy("__rn")
    return d.select(
        ck, sk,
        F.when(F.col("__v"),
               F.coalesce(F.lead("__pm").over(w2), F.col("__gmax"))
               ).otherwise(F.col(ek)).alias(ek),
        *on,
        F.when(F.col("__v"),
               F.coalesce(F.lead("__ce").over(w2), F.col("__gtot"))
               - F.col("__ce")).cast("long").alias("n_intervals"),
    )


def time_q(label, thunk, reps=5):
    samples = []
    n = 0
    for _ in range(reps):
        t0 = time.time()
        n = _force_count(thunk())
        samples.append(time.time() - t0)
    med = sorted(samples)[len(samples) // 2]
    print(f"{label}: median {med:.3f}s cold {samples[0]:.3f}s rows={n}")
    return med


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("merge-premerge-bench")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    a = em.ivals_a(spark, sf_dir).select("chrom", "start", "end").cache()
    print("rows:", a.count())

    # correctness cross-check first
    ref = bf.merge(a, min_dist=0, range_width=None)
    for nd in (0, None, 10):
        r = bf.merge(a, min_dist=nd, range_width=None)
        b = border_merge_cnt(premerge(a, "chrom", "start", "end", [], nd),
                             "chrom", "start", "end", [], nd)
        d1 = r.exceptAll(b).count()
        d2 = b.exceptAll(r).count()
        print(f"min_dist={nd}: exceptAll {d1}/{d2}", "OK" if d1 == d2 == 0 else "MISMATCH")

    time_q("A current merge          ", lambda: bf.merge(a, min_dist=0))
    time_q("B premerge+border        ", lambda: border_merge_cnt(
        premerge(a, "chrom", "start", "end", [], 0),
        "chrom", "start", "end", [], 0))
    time_q("C premerge+border np=4   ", lambda: border_merge_cnt(
        premerge(a, "chrom", "start", "end", [], 0),
        "chrom", "start", "end", [], 0, nparts=4))
    time_q("D current-style np=8     ", lambda: border_merge_cnt(
        a.withColumn("__cnt", F.lit(1)),
        "chrom", "start", "end", [], 0, nparts=8))
    time_q("E current-style np=32    ", lambda: border_merge_cnt(
        a.withColumn("__cnt", F.lit(1)),
        "chrom", "start", "end", [], 0))
    _ = ref


if __name__ == "__main__":
    main()
