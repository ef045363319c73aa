"""r9 optimization-round ladder: the restructured operators at 1/4/16x.

Measures exactly the operators rewritten this round — the ranged islands
construction (merge range_width), the raw-event ranged pileup carry, the
fused per-cluster semantic dedup, and the kept-once simhash/minhash pair
miners — at replicated scale with AQE on (production default). Run it
once on the new code and once with the old package checked out
(`git checkout <old> -- bioframe_spark`) for the committed A/B in
OPTIMIZATION_r09.md.

Interval replication coordinate-shifts copies (constant density/
selectivity, workload exactly k x — same scheme as scale_ladder.py).
Document replication prepends a copy tag and re-suffixes doc_ids
(near-dup structure stays within-copy — datapipe_ladder.py's scheme).
Embedding replication offsets vec_ids and adds a tiny copy-specific
direction tilt so copies are not cross-copy exact duplicates; both code
versions see the identical input, which is all an A/B needs.

Run: python tools/opt_ladder_r09.py [reps] [ks...]
"""
from __future__ import annotations

import math
import os
import sys
import time
from functools import reduce

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as em  # noqa: E402
import bioframe_spark as bf  # noqa: E402
from bench import force_count  # noqa: E402
from bioframe_spark.datapipe import dedup as ddp  # noqa: E402
from bioframe_spark.datapipe import similarity  # noqa: E402
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


def rep_emb(df, k):
    if k == 1:
        return df
    out = []
    for i in range(k):
        tilt = 0.01 * (i + 1)
        out.append(df.select(
            (F.col("vec_id") + F.lit(i * 10_000_000)).alias("vec_id"),
            F.expr(
                f"transform(embedding, (x, j) -> cast(x as double) + "
                f"{tilt} * (j % 3))").alias("embedding")))
    return reduce(lambda x, y: x.unionByName(y), out)


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    ks = [int(x) for x in sys.argv[2:]] or [1, 4, 16]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("opt-ladder-r09")
    spark.sparkContext.setLogLevel("ERROR")

    a0 = em.ivals_a(spark, sf_dir).select("chrom", "start", "end")
    docs0 = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text")
    emb0 = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    def _n_persistent():
        return len(spark.sparkContext._jsc.sc().getRDDStorageInfo())

    results: dict[str, dict[int, float]] = {}
    for k in ks:
        a = rep_ivals(a0, k).cache()
        docs = rep_docs(docs0, k).cache()
        emb = rep_emb(emb0, k).cache()
        pinned = [a, docs, emb]
        print(f"k={k}: ivals {a.count()}, docs {docs.count()}, "
              f"emb {emb.count()}", flush=True)

        # replicate the view with the intervals (copy i's arms shift by
        # i*SPAN like its rows) — constant match density, and the kernel
        # honestly pays its arm-sweep growth (2k arms/chrom at k)
        arms_k = [(c, s + i * SPAN, e + i * SPAN, f"c{i}_{n}")
                  for i in range(k) for (c, s, e, n) in em.arms_view()]
        qs = {
            "assign_view": lambda: bf.assign_view(a, arms_k),
            "merge_ranged": lambda: bf.merge(a, min_dist=0,
                                             range_width=50_000),
            "pileup_ranged": lambda: bf.pileup(a, range_width=50_000),
            "semdedup": lambda: similarity.semantic_dedup(
                emb.select("vec_id",
                           F.transform("embedding",
                                       lambda x: x.cast("double"))
                           .alias("embedding")),
                threshold=0.9, n_centroids=16, train_iters=0),
            "simhash_pairs": lambda: ddp.simhash_dup_pairs(
                docs, max_hamming=12, bits=60, hash_fn="md5"),
            "minhash_lsh": lambda: ddp.minhash_lsh_pairs(
                docs, num_hashes=32, bands=8, threshold=0.5,
                hash_fn="md5"),
        }
        only = os.environ.get("OPT_LADDER_OPS")
        if only:
            qs = {k2: v for k2, v in qs.items() if k2 in only.split(",")}
        for name, thunk in qs.items():
            samples = []
            n = 0
            base_cached = _n_persistent()
            for _ in range(reps):
                t0 = time.time()
                n = force_count(thunk())
                samples.append(time.time() - t0)
                if _n_persistent() > base_cached:
                    spark.catalog.clearCache()
                    for df in pinned:
                        df.cache().count()
                    base_cached = _n_persistent()
            med = sorted(samples)[len(samples) // 2]
            results.setdefault(name, {})[k] = med
            print(f"k={k:2d} {name:14s} median {med:7.2f}s  ({n} rows)",
                  flush=True)
        for df in pinned:
            df.unpersist()
        spark.catalog.clearCache()

    kmin, kmax = min(ks), max(ks)
    if kmax > kmin:
        print("\nexponents log(t_max/t_min)/log(k_max/k_min):")
        for name, by_k in results.items():
            e = math.log(by_k[kmax] / by_k[kmin]) / math.log(kmax / kmin)
            print(f"  {name:14s} exp {e:.2f} "
                  f"({by_k[kmin]:.2f}s -> {by_k[kmax]:.2f}s)")


if __name__ == "__main__":
    main()
