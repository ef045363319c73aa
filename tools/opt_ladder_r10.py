"""r10 optimization-round ladder: the restructured operators at 1/4/16x.

Measures exactly the operators rewritten this round — the counts-ride
ngram Jaccard pair miner (default + eager-cutoff paths, plus the
connected-components consumer) and the fused-exchange ranged islands
construction (merge/cluster range_width) — at replicated scale with AQE
on (production default). Run it once on the new code and once with the
old package checked out (`git stash` / `git checkout <old> --
bioframe_spark`) for the committed A/B in OPTIMIZATION_r10.md.

Replication schemes are opt_ladder_r09's: interval copies are
coordinate-shifted (constant density, workload exactly k x); document
copies are copy-tagged with re-suffixed doc_ids (near-dup structure and
the shingle-pair graph stay strictly within-copy, so pair output scales
k x — linear, not quadratic).

Run: python tools/opt_ladder_r10.py [reps] [ks...]
"""
from __future__ import annotations

import os
import sys
import time
from functools import reduce

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

import bioframe_spark as bf  # noqa: E402
from bench import force_count  # noqa: E402
from bioframe_spark.datapipe import dedup as ddp  # noqa: E402
from bioframe_spark.session import get_spark  # noqa: E402

SPAN = 500300


def rep_ivals(df, k):
    if k == 1:
        return df
    return reduce(lambda x, y: x.unionByName(y), [
        df.withColumn("start", F.col("start") + F.lit(i * SPAN))
          .withColumn("end", F.col("end") + F.lit(i * SPAN))
        for i in range(k)
    ])


def rep_docs(df, k):
    if k == 1:
        return df
    return reduce(lambda x, y: x.unionByName(y), [
        df.select(
            (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
            F.concat(F.lit(f"c{i} "), F.col("text")).alias("text"))
        for i in range(k)
    ])


def main():
    only = None
    argv = []
    for a in sys.argv[1:]:
        if a.startswith("--only="):
            only = set(a.split("=", 1)[1].split(","))
        else:
            argv.append(a)
    reps = int(argv[0]) if argv else 3
    ks = [int(x) for x in argv[1:]] or [1, 4, 16]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("opt-ladder-r10")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as em
    docs0 = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text")
    ivals0 = em.ivals_a(spark, sf_dir).select("chrom", "start", "end")

    results = {}
    for k in ks:
        docs = rep_docs(docs0, k).repartition(64).cache()
        nd = docs.count()
        ivals = rep_ivals(ivals0, k).repartition(64).cache()
        ni = ivals.count()
        print(f"k={k}: {nd} docs, {ni} intervals", flush=True)
        cases = {
            "jaccard_pairs": lambda: ddp.ngram_jaccard_pairs(
                docs, n=3, threshold=0.5),
            "jaccard_cutoff": lambda: ddp.ngram_jaccard_pairs(
                docs, n=3, threshold=0.5, max_doc_freq=3),
            "dedup_components": lambda: ddp.connected_components(
                ddp.ngram_jaccard_pairs(docs, n=3, threshold=0.5)).select(
                    F.col("id").alias("doc_id"), "component"),
            "merge_ranged": lambda: bf.merge(
                ivals, min_dist=0, range_width=50_000),
            "cluster_ranged": lambda: bf.cluster(
                ivals, min_dist=0, range_width=50_000, premerge=False),
        }
        def _n_persistent():
            return len(spark.sparkContext._jsc.sc().getRDDStorageInfo())

        for name, thunk in cases.items():
            if only and name not in only:
                continue
            spark.sparkContext.setJobDescription(f"ladder:{name}@{k}x")
            samples, n = [], 0
            for _ in range(reps):
                # PER-REP baseline: a sticky baseline goes stale when
                # localCheckpoint blocks (which clearCache does NOT
                # remove) are later GC'd — the count drops below the
                # baseline and a following case's leaked persist slips
                # under it (observed: pre-r10 merge_ranged reps 2-3 at
                # 0.86 s — cache replays of the leaked islands frame).
                pre_cached = _n_persistent()
                t0 = time.time()
                n = force_count(thunk())
                samples.append(time.time() - t0)
                # fairness vs code that leaks internal persists (the
                # pre-r10 package): a leaked islands/shingle cache hands
                # rep 2+ a CacheManager hit, so the A/B would compare a
                # full plan against a cache replay. Same reset-and-repin
                # discipline as bench.py / scale_ladder.py.
                if _n_persistent() > pre_cached:
                    spark.catalog.clearCache()
                    docs.cache().count()
                    ivals.cache().count()
            med = sorted(samples)[len(samples) // 2]
            results[(name, k)] = (med, n)
            print(f"  {name}@{k}x: median {med:.2f}s "
                  f"reps {[round(s, 2) for s in samples]} ({n} rows)",
                  flush=True)
        docs.unpersist()
        ivals.unpersist()

    print("\n| op | " + " | ".join(f"{k}x" for k in ks) + " |")
    for name in ["jaccard_pairs", "jaccard_cutoff", "dedup_components",
                 "merge_ranged", "cluster_ranged"]:
        row = " | ".join(f"{results[(name, k)][0]:.2f}" for k in ks
                         if (name, k) in results)
        print(f"| {name} | {row} |")


if __name__ == "__main__":
    main()
