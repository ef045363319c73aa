"""Re-measure the merge premerge crossover after the buffered fuse (r6).

§8's crossover table (loses at 14 MB, washes 57 MB, wins 1.5x at
230 MB) was measured with the per-Arrow-batch fuse whose shrink the 64x
ladder showed capped at ~1.3x. With 256k-row fuse windows the shrink is
~40x on the same data, so the wash point should move DOWN — this
re-measures the three rungs (classic vs premerge+classic vs
premerge+ranged vs ranged-only) to re-justify spark.bioframe.
premergeBytes.

Run: python tools/premerge_crossover.py [reps]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bioframe_spark as bf  # noqa: E402
import __spark_entry__ as em  # noqa: E402
from bench import force_count as _force_count  # noqa: E402
from bioframe_spark.session import get_spark  # noqa: E402
from tools.scale_ladder import replicate  # noqa: E402


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("premerge-crossover")
    spark.sparkContext.setLogLevel("ERROR")
    a0 = em.ivals_a(spark, sf_dir).select("chrom", "start", "end")

    from bioframe_spark.operators.ops import _plan_size_bytes
    for k in (1, 4, 16):
        a = replicate(a0, k).cache()
        n = a.count()
        mb = _plan_size_bytes(a) / (1 << 20)
        print(f"k={k}: {n} rows, plan {mb:.0f} MB", flush=True)
        qs = {
            "classic": dict(premerge=False, range_width=None),
            "premerge+classic": dict(premerge=True, range_width=None),
            "ranged(50k)": dict(premerge=False, range_width=50_000),
            "premerge+ranged(50k)": dict(premerge=True, range_width=50_000),
        }
        for name, kw in qs.items():
            samples = []
            for _ in range(reps):
                spark.catalog.clearCache()
                a.cache().count()
                t0 = time.time()
                _force_count(bf.merge(a, **kw))
                samples.append(time.time() - t0)
            med = sorted(samples)[len(samples) // 2]
            print(f"k={k:2d} {name:22s} median {med:6.2f}s "
                  f"all {[round(s, 2) for s in samples]}", flush=True)
        a.unpersist()
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
