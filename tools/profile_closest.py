"""Solo profiling harness for the closest family (VERDICT r5 directive #1).

Mimics bench.py's setup (cached derived inputs, AQE off, warm JVM) but
times only the closest rows, printing per-rep wall times so the fixed
costs (stats jobs, probe jobs, per-rung eagerness) can be separated from
the steady-state plan.  Usage:

    python tools/profile_closest.py [query ...]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import force_count  # noqa: E402
from bioframe_spark.session import get_spark  # noqa: E402
import __spark_entry__ as em  # noqa: E402


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("profile-closest")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    pinned = []
    for fn_name in ("ivals_a", "ivals_b", "ivals_s", "ivals_p"):
        cached = getattr(em, fn_name)(spark, sf_dir).cache()
        cached.count()
        pinned.append(cached)
        setattr(em, fn_name, lambda spark, sf_dir, _df=cached: _df)

    def _reset():
        spark.catalog.clearCache()
        for df in pinned:
            df.cache().count()

    qs = em.queries()
    names = sys.argv[1:] or ["closest", "closest_binned", "closest_broadcast",
                             "closest_k2"]
    reps = int(os.environ.get("REPS", "5"))
    for name in names:
        fn = qs[name]
        samples = []
        for _ in range(reps):
            t0 = time.time()
            n = force_count(fn(spark, sf_dir))
            samples.append(time.time() - t0)
            _reset()
        med = sorted(samples)[len(samples) // 2]
        print(f"{name}: median {med:.3f}s min {min(samples):.3f}s "
              f"all {[round(s, 3) for s in samples]} ({n} rows)")


if __name__ == "__main__":
    main()
