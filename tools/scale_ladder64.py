"""64x scale rung for the four headline families (r5 verdict #3).

The §11 ladder tops out at 16x (~9.6M rows); every "the gap widens at
100 TB" extrapolation rests on it. This runs 16x AND 64x (38.4M a-rows)
for the four families whose 100 TB story carries the most weight —
overlap auto/binned, merge premerge, cluster premerge, closest auto —
under the same forced action, and prints the 16->64 exponent
log4(t64/t16) next to the 1->16 exponent so drift is immediate.

Run: python tools/scale_ladder64.py [reps]   (reps default 2; ~20 min)
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
from tools.scale_ladder import SPAN, replicate  # noqa: E402


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("scale-ladder-64")
    spark.sparkContext.setLogLevel("ERROR")
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"

    a0 = em.ivals_a(spark, sf_dir).select("chrom", "start", "end")
    b0 = em.ivals_b(spark, sf_dir).select("chrom", "start", "end")

    results: dict[str, dict[int, float]] = {}
    for k in (1, 16, 64):
        a = replicate(a0, k).cache()
        b = replicate(b0, k).cache()
        na, nb = a.count(), b.count()
        print(f"k={k}: a={na} b={nb}", flush=True)

        qs = {
            "overlap(auto)": lambda: bf.overlap(a, b, how="inner"),
            "merge(auto)": lambda: bf.merge(a),
            "cluster": lambda: bf.cluster(a),
            "closest(auto)": lambda: bf.closest(b, a),
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
                    spark.catalog.clearCache()
                    a.cache().count()
                    b.cache().count()
                    base_cached = _n_persistent()
            med = sorted(samples)[len(samples) // 2]
            results.setdefault(name, {})[k] = med
            print(f"k={k:2d} {name:16s} median {med:8.2f}s  ({n} rows)",
                  flush=True)
        a.unpersist()
        b.unpersist()
        spark.catalog.clearCache()

    print("\n| op | t1 | t16 | t64 | exp 1->16 | exp 16->64 |")
    print("|---|---|---|---|---|---|")
    for name, by_k in results.items():
        e16 = math.log(by_k[16] / by_k[1]) / math.log(16)
        e64 = math.log(by_k[64] / by_k[16]) / math.log(4)
        print(f"| {name} | {by_k[1]:.2f} | {by_k[16]:.2f} | {by_k[64]:.2f} "
              f"| {e16:.2f} | {e64:.2f} |")


if __name__ == "__main__":
    main()
