"""Binned-join bin-width sensitivity (r5 verdict #7).

The binned overlap join's ``bin_size`` default is auto-derived from the
span and mean interval length, but §9's skew table never varied it — a
100 TB deploy will ask "what bin width do I configure". This sweeps
bin_size over three decades (plus the auto choice) for overlap(binned)
on two shapes at sf0.1:

  uniform — the derived a×b interval tables as-is;
  skewed  — 90% of rows reassigned to chr0 (tools/skew_bench.skewed).

What to expect mechanically: too-small bins explode each interval into
many (row-explosion dominates: rows ~ len/bin per side), too-large bins
degrade the join to per-chromosome all-pairs (candidate pairs ~
n1*n2/bins). The flat region between the two cliffs is what the auto
formula must land in. Results recorded in SCALING.md §9 addendum.

Run: python tools/bin_width_sweep.py [sf_dir] [reps]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

import bioframe_spark as bf  # noqa: E402
from bioframe_spark.session import get_spark  # noqa: E402
import __spark_entry__ as em  # noqa: E402
from bench import force_count as _force_count  # noqa: E402
from tools.skew_bench import skewed  # noqa: E402

WIDTHS = [100, 1_000, 10_000, 100_000, 1_000_000]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("bin-width-sweep")
    spark.sparkContext.setLogLevel("ERROR")

    a0 = em.ivals_a(spark, sf_dir).select("chrom", "start", "end")
    b0 = em.ivals_b(spark, sf_dir).select("chrom", "start", "end")
    shapes = {
        "uniform": (a0.cache(), b0.cache()),
        "skewed": (skewed(a0).cache(), skewed(b0).cache()),
    }
    for name, (a, b) in shapes.items():
        na, nb = a.count(), b.count()
        print(f"shape={name}: a={na} b={nb}", flush=True)
        from bioframe_spark.operators.ops import _bin_stats
        lo, hi, auto_bin = _bin_stats(a, "start", "end", b, "start", "end")[:3]
        print(f"shape={name}: auto bin_size = {auto_bin}", flush=True)
        for width in WIDTHS + [None]:
            label = "auto" if width is None else str(width)
            samples, n = [], 0
            for _ in range(reps):
                t0 = time.time()
                n = _force_count(bf.overlap(
                    a, b, how="inner", strategy="binned", bin_size=width))
                samples.append(time.time() - t0)
            med = sorted(samples)[len(samples) // 2]
            print(f"shape={name} bin={label:>8s} median {med:7.2f}s "
                  f"({n} rows)", flush=True)


if __name__ == "__main__":
    main()
