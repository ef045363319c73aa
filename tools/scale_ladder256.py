"""256x rung: the headline join + merge at ~154M interval rows.

Extends the 64x ladder (tools/scale_ladder64.py) two octaves for the
two families whose 100 TB story carries the most weight — the interval
join and merge — so the "sublinear through 64x" claim gets a
quarter-billion-row data point under the same forced action. Prints
the 64->256 exponent log4(t256/t64) next to the 64x time.

Run: python tools/scale_ladder256.py [reps]   (reps default 2)
"""
from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bioframe_spark.session import get_spark  # noqa: E402
import bioframe_spark as bf  # noqa: E402
import __spark_entry__ as em  # noqa: E402
from bench import force_count as _force_count  # noqa: E402
from tools.scale_ladder import replicate  # noqa: E402


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("scale-ladder-256")
    spark.sparkContext.setLogLevel("ERROR")

    a0 = em.ivals_a(spark, sf_dir).select("chrom", "start", "end")
    b0 = em.ivals_b(spark, sf_dir).select("chrom", "start", "end")

    results: dict[str, dict[int, float]] = {}
    for k in (64, 256):
        a = replicate(a0, k).cache()
        b = replicate(b0, k).cache()
        na, nb = a.count(), b.count()
        print(f"k={k}: a={na} b={nb}", flush=True)

        qs = {
            "overlap(auto)": lambda: bf.overlap(a, b, how="inner"),
            "merge(auto)": lambda: bf.merge(a),
        }

        def _n_persistent():
            return len(spark.sparkContext._jsc.sc().getRDDStorageInfo())

        for name, thunk in qs.items():
            samples, n = [], 0
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
            print(f"k={k:3d} {name:16s} median {med:8.2f}s  ({n} rows)",
                  flush=True)
        a.unpersist()
        b.unpersist()
        spark.catalog.clearCache()

    print("\n| op | t64 | t256 | exp 64->256 |")
    print("|---|---|---|---|")
    for name, by_k in results.items():
        e = math.log(by_k[256] / by_k[64]) / math.log(4)
        print(f"| {name} | {by_k[64]:.2f} | {by_k[256]:.2f} | {e:.2f} |")


if __name__ == "__main__":
    main()
