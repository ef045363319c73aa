"""Core-count scaling at a work-dominated scale (VERDICT-r9 #3).

The r9 8-core run at sf0.1 was uninformative: nearly every row is
fixed-overhead dominated, so the 8/32-core ratio read ~1 everywhere.
This runs a representative op set on 4x-REPLICATED sf0.1 inputs (the
scale_ladder coordinate-shift / copy-tag schemes — constant density and
selectivity, 4x the work) so compute dominates and the ratio becomes
meaningful. Run once per core count; the committed SCALING.md section
holds the paired table:

    SPARK_GRAFT_CPUS=32 python tools/core_scaling_r10.py 3 4
    SPARK_GRAFT_CPUS=8  python tools/core_scaling_r10.py 3 4

Expected healthy profile: CPU-bound rows (the binned join family, the
Arrow kernels) cost up to cores_ratio more at 8 cores; rows pinned by
driver-side or lifecycle floors (closest ladder, streaming drives) stay
flat and are diagnosed in SCALING.md, not here.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

import bioframe_spark as bf  # noqa: E402
from bench import force_count  # noqa: E402
from bioframe_spark.datapipe import dedup as ddp  # noqa: E402
from bioframe_spark.datapipe import text as dtext  # noqa: E402
from bioframe_spark.session import get_spark  # noqa: E402
from tools.opt_ladder_r10 import rep_docs, rep_ivals  # noqa: E402


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("core-scaling")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as em
    a = rep_ivals(em.ivals_a(spark, sf_dir).select("chrom", "start", "end"),
                  k).cache()
    b = rep_ivals(em.ivals_b(spark, sf_dir).select("chrom", "start", "end"),
                  k).cache()
    docs = rep_docs(
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text"), k).repartition(64).cache()
    na, nb, nd = a.count(), b.count(), docs.count()
    print(f"cpus={cpus} k={k}: a={na} b={nb} docs={nd}", flush=True)

    cases = {
        # the CPU-bound keystone join family
        "overlap_inner": lambda: bf.overlap(a, b, how="inner"),
        "overlap_left": lambda: bf.overlap(a, b, how="left"),
        "count_overlaps": lambda: bf.count_overlaps(a, b),
        "coverage": lambda: bf.coverage(a, b),
        "subtract": lambda: bf.subtract(a, b),
        # window/aggregation family
        "merge_auto": lambda: bf.merge(a),
        "merge_ranged": lambda: bf.merge(a, min_dist=0, range_width=50_000),
        "pileup": lambda: bf.pileup(a),
        # Arrow-kernel / shuffle datapipe rows
        "jaccard_pairs": lambda: ddp.ngram_jaccard_pairs(
            docs, n=3, threshold=0.5),
        "simhash_pairs": lambda: ddp.simhash_dup_pairs(
            docs, max_hamming=3, hash_fn="xxhash64"),
        "repetition": lambda: dtext.repetition_signals(docs),
    }

    def _n_persistent():
        return len(spark.sparkContext._jsc.sc().getRDDStorageInfo())

    results = {}
    base_cached = _n_persistent()
    for name, thunk in cases.items():
        spark.sparkContext.setJobDescription(f"corescale:{name}@{cpus}c")
        samples, n = [], 0
        for _ in range(reps):
            t0 = time.time()
            n = force_count(thunk())
            samples.append(time.time() - t0)
            if _n_persistent() > base_cached:
                spark.catalog.clearCache()
                a.cache().count()
                b.cache().count()
                docs.cache().count()
                base_cached = _n_persistent()
        med = sorted(samples)[len(samples) // 2]
        results[name] = (med, n)
        print(f"  {name}@{cpus}c: median {med:.2f}s "
              f"reps {[round(s, 2) for s in samples]} ({n} rows)",
              flush=True)

    print(f"\ncpus={cpus} k={k} | " + " | ".join(
        f"{n}={v[0]:.2f}" for n, v in results.items()))


if __name__ == "__main__":
    main()
