"""Skew-hardening demo: compare physical strategies on a deliberately
skewed genome (90% of intervals on ONE chromosome).

This is the distribution a 100 TB operator actually meets (one huge
contig / hot key), and the reason the binned join and the ranged window
constructions exist. Results recorded in SCALING.md §9.

Usage: python tools/skew_bench.py [sf_dir]   (default /root/testdata/sf0.01)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

import bioframe_spark as bf  # noqa: E402
from bioframe_spark.session import get_spark  # noqa: E402
import __spark_entry__ as em  # noqa: E402
from bench import force_count as _force_count  # noqa: E402


def skewed(df, ck="chrom"):
    """Send ~90% of rows to chr0 (keyed on the row's numeric id columns, so
    the reassignment is deterministic), keep the rest where they are."""
    key = F.abs(F.hash(*[c for c in df.columns if c != ck]))
    return df.withColumn(
        ck, F.when(key % 10 < 9, F.lit("chr0")).otherwise(F.col(ck))
    )


def t(label, fn, results, reps=3):
    samples = []
    n = 0
    for _ in range(reps):
        t0 = time.time()
        n = _force_count(fn())
        samples.append(time.time() - t0)
    med = sorted(samples)[len(samples) // 2]
    results[label] = round(med, 3)
    print(f"# {label}: median {med:.2f}s ({n} rows)", file=sys.stderr)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("skew_bench")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.adaptive.enabled", "false")

    a = skewed(em.ivals_a(spark, sf_dir)).cache()
    b = skewed(em.ivals_b(spark, sf_dir)).cache()
    na, nb = a.count(), b.count()
    print(f"# skewed inputs: a={na} b={nb}, ~90% on chr0", file=sys.stderr)

    r = {}
    # interval join under key skew: chrom-equi plain join (per-chrom
    # cartesian on the hot key) vs binned (hot chrom split over bins)
    t("overlap_plain_skew", lambda: bf.overlap(
        a, b, how="inner", suffixes=("", "_b"), strategy="plain"), r)
    t("overlap_binned_skew", lambda: bf.overlap(
        a, b, how="inner", suffixes=("", "_b"), strategy="binned"), r)

    # hot-VALUE outer join: ONE whole-span interval on the left matches
    # every chr0 right row. The single-pass window path partitions the
    # join output by the full left row value, so all of that interval's
    # pairs funnel through one window task; the semi/anti path has no
    # per-value stage. (auto switches at spark.bioframe.outerHotRows —
    # ~4M estimated hot rows — which small-sf inputs stay under; the
    # explicit conf isolates the two physical paths.)
    a3 = a.select("chrom", "start", "end").cache()
    b3 = b.select("chrom", "start", "end").cache()
    span = a3.agg(F.max("end")).collect()[0][0]
    hot_a = a3.unionByName(
        a3.sparkSession.createDataFrame([("chr0", 0, span)], a3.schema)
    ).cache()
    hot_a.count()
    for path in ("window", "anti"):
        spark.conf.set("spark.bioframe.outerPath", path)
        t(f"overlap_left_hotrow_{path}", lambda: bf.overlap(
            hot_a, b3, how="left", suffixes=("", "_b"), strategy="binned"), r)
    # largely-disjoint full outer: every row lonely. Unsalted r3 windows
    # sent all right-only rows into ONE all-null partition; the salted
    # window and the anti path both stay parallel.
    b_far = b3.withColumn("start", F.col("start") + F.lit(1_000_000_000)) \
              .withColumn("end", F.col("end") + F.lit(1_000_000_000))
    for path in ("window", "anti"):
        spark.conf.set("spark.bioframe.outerPath", path)
        t(f"overlap_outer_disjoint_{path}", lambda: bf.overlap(
            a3, b_far, how="outer", suffixes=("", "_b"), strategy="binned"), r)
    spark.conf.unset("spark.bioframe.outerPath")

    # window-family under skew: classic one-window-partition-per-chrom vs
    # range-partitioned islands / scan-sum vs (merge/cluster) the r5
    # map-side premerge — the hot chromosome is where a per-chrom window
    # serializes, and where the premerge shrink + broadcast-kernel
    # assignment should be immune (map-only over scan partitions)
    t("merge_classic_skew", lambda: bf.merge(
        a3, min_dist=0, range_width=None, premerge=False), r)
    t("merge_ranged_skew", lambda: bf.merge(
        a3, min_dist=0, range_width=20_000, premerge=False), r)
    t("merge_premerge_skew", lambda: bf.merge(
        a3, min_dist=0, premerge=True, range_width=None), r)
    t("cluster_classic_skew", lambda: bf.cluster(
        a3, min_dist=0, range_width=None, premerge=False), r)
    t("cluster_ranged_skew", lambda: bf.cluster(
        a3, min_dist=0, range_width=20_000, premerge=False), r)
    t("cluster_premerge_skew", lambda: bf.cluster(
        a3, min_dist=0, premerge=True), r)
    t("complement_classic_skew", lambda: bf.complement(a3, range_width=None), r)
    t("complement_ranged_skew", lambda: bf.complement(a3, range_width=20_000), r)
    t("pileup_classic_skew", lambda: bf.pileup(a3, range_width=None), r)
    t("pileup_ranged_skew", lambda: bf.pileup(a3, range_width=20_000), r)

    print(json.dumps({"metric": "skew_bench", "sf_dir": sf_dir, "results": r}))


if __name__ == "__main__":
    main()
