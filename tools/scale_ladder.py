"""Scale ladder: how do the headline plans scale with input size?

Replicates the sf0.1 derived interval tables k x (k = 1, 4, 16) by
coordinate-shifting each copy one genome-span right — per-chromosome
density, join selectivity, and output-per-input stay CONSTANT, the
workload grows exactly k x. AQE stays ON (the production default;
the small-sf bench disables it, so this is also the AQE sanity run).

For each operator the interesting number is the scaling exponent
log(t16/t1)/log(16): ~1.0 = linear (what a shuffle-bound distributed
plan should show), <1 = fixed-cost amortization, >>1 = a plan that
would not survive 100 TB.

Run: python tools/scale_ladder.py [reps]
"""
from __future__ import annotations

import math
import os
import sys
import time
from functools import reduce

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bioframe_spark.session import get_spark  # noqa: E402
import bioframe_spark as bf  # noqa: E402
import __spark_entry__ as em  # noqa: E402
from bench import force_count as _force_count  # noqa: E402

SPAN = 500300  # CLEN from the entry module — one genome span per copy


def replicate(df, k: int):
    if k == 1:
        return df
    copies = [
        df.withColumn("start", F.col("start") + F.lit(i * SPAN))
          .withColumn("end", F.col("end") + F.lit(i * SPAN))
        for i in range(k)
    ]
    return reduce(lambda x, y: x.unionByName(y), copies)


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("scale-ladder")
    spark.sparkContext.setLogLevel("ERROR")
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"

    a0 = em.ivals_a(spark, sf_dir).select("chrom", "start", "end")
    b0 = em.ivals_b(spark, sf_dir).select("chrom", "start", "end")

    results: dict[str, dict[int, float]] = {}
    rows_at: dict[int, tuple[int, int]] = {}
    for k in (1, 4, 16):
        a = replicate(a0, k).cache()
        b = replicate(b0, k).cache()
        rows_at[k] = (a.count(), b.count())

        qs = {
            "overlap(auto)": lambda: bf.overlap(a, b, how="inner"),
            # replicated b crosses the broadcast bound at k=16 -> these
            # exercise the JOIN formulations at scale
            "count_overlaps": lambda: bf.count_overlaps(a, b),
            "coverage": lambda: bf.coverage(a, b),
            # fixed small annotation track, growing a: the broadcast
            # kernels' 100 TB shape (must be ~linear, map-only)
            "count_ov(bcast,fix-b)": lambda: bf.count_overlaps(a, b0),
            "coverage(bcast,fix-b)": lambda: bf.coverage(a, b0),
            "merge(auto)": lambda: bf.merge(a),
            "cluster": lambda: bf.cluster(a),
            "complement(auto)": lambda: bf.complement(
                a, view_df={f"chr{i}": k * SPAN for i in range(8)}),
            "closest(auto)": lambda: bf.closest(b, a),
            "pileup(auto)": lambda: bf.pileup(a),
        }
        def _n_persistent():
            return len(spark.sparkContext._jsc.sc().getRDDStorageInfo())

        for name, thunk in qs.items():
            samples = []
            n = 0
            base_cached = _n_persistent()
            for _ in range(reps):
                t0 = time.time()
                n = _force_count(thunk())
                samples.append(time.time() - t0)
                if _n_persistent() > base_cached:
                    # ops with internal persists (closest-binned ladder)
                    # would hand rep 2+ a CacheManager hit — drop and
                    # re-pin the inputs so every rep times the plan
                    spark.catalog.clearCache()
                    a.cache().count()
                    b.cache().count()
                    base_cached = _n_persistent()
            med = sorted(samples)[len(samples) // 2]
            results.setdefault(name, {})[k] = med
            print(f"k={k:2d} {name:18s} median {med:7.2f}s  ({n} rows)",
                  flush=True)
        # pre-binned bucketed layout: the write is the ONE-OFF cost
        # (reported as prebin-write, not part of the join median); the
        # recurring join is what must scale. break-even query count =
        # write / (overlap(auto) - prebinned).
        import tempfile

        from bioframe_spark.sources.fileops import write_prebinned
        loc = tempfile.mkdtemp(prefix=f"ladder_prebin_{k}_")
        t0 = time.time()
        # external-table paths: managed tables collide on their
        # spark-warehouse location across ladder re-runs
        write_prebinned(a, f"ladder_prebin_a_{k}", path=f"{loc}/a")
        write_prebinned(b, f"ladder_prebin_b_{k}", path=f"{loc}/b")
        t_write = time.time() - t0
        results.setdefault("prebin-write(once)", {})[k] = t_write
        print(f"k={k:2d} {'prebin-write(once)':18s} once   {t_write:7.2f}s",
              flush=True)
        pa, pb = spark.table(f"ladder_prebin_a_{k}"), \
            spark.table(f"ladder_prebin_b_{k}")
        samples = []
        for _ in range(reps):
            t0 = time.time()
            n = _force_count(bf.overlap_prebinned(pa, pb, suffixes=("", "_")))
            samples.append(time.time() - t0)
        med = sorted(samples)[len(samples) // 2]
        results.setdefault("overlap_prebinned", {})[k] = med
        print(f"k={k:2d} {'overlap_prebinned':18s} median {med:7.2f}s  "
              f"({n} rows)", flush=True)
        a.unpersist()
        b.unpersist()

    print("\n| op | 1x | 4x | 16x | exponent log16(t16/t1) |")
    print("|---|---|---|---|---|")
    for name, t in results.items():
        exp = math.log(t[16] / t[1]) / math.log(16)
        print(f"| {name} | {t[1]:.2f} | {t[4]:.2f} | {t[16]:.2f} | {exp:.2f} |")
    print(f"\nrows: {rows_at}")


if __name__ == "__main__":
    main()
