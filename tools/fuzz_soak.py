"""Time-bounded differential soak vs the reference (join family).

The round-9 session-5 hypothesis run proved the 8-example budget can
still find decade-old edges (the _bin_stats raw-end clip). This tool
runs the same reference-vs-engine comparison with a WIDER generator and
a wall-clock budget instead of an example count:

- zero-length intervals are common (the reference's point-rewrite edges
  live there), duplicates and nulls included;
- frames are randomly shifted by large offsets (1e6/1e9/1e12) so the
  auto bin grid alignment varies per example — the fixed 0-200 window
  of the pytest fuzz pins every example to the same grid;
- subtract runs BOTH its paths per example (small/broadcast path forced
  via spark.bioframe.smallInputBytes=INT64_MAX — local relations have
  unknown plan size and always take the large path otherwise);
- overlap runs both strategies (plain + binned) x (inner, left).

Coordinates stay <= ~1e12 + span: at the INT64 edge the REFERENCE's own
numpy end+1 wraps negative (documented at effective_end), so an edge
differential would flag reference bugs, not ours; the engine's edge
behavior is pinned separately by unit tests.

Usage: python tools/fuzz_soak.py [seconds] [seed]   (default 600 s)
Exit 0 = no mismatch; on mismatch prints the frames + op and exits 1.
"""
from __future__ import annotations

import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import pandas as pd  # noqa: E402

from test_reference_parity_ab import (  # noqa: E402
    assert_match, load_reference, to_spark,
)

IMAX = (1 << 63) - 1


def gen_frame(rng: random.Random, offset: int, span: int) -> pd.DataFrame:
    n = rng.randrange(0, 26)
    lens = [0, 0, 0, 1, 2, 5, 17, 40, span]
    rows = []
    for _ in range(n):
        if rng.random() < 0.08:
            rows.append((None, pd.NA, pd.NA))
            continue
        s = offset + rng.randrange(span)
        rows.append((rng.choice(("chr1", "chr2", "chr10")),
                     s, s + rng.choice(lens)))
    # a point AT the running max end, the session-5 bug shape
    if rows and rng.random() < 0.5:
        ends = [e for _, _, e in rows if not pd.isna(e)]
        if ends:
            m = max(ends)
            rows.append((rng.choice(("chr1", "chr2")), m, m))
    # duplicate a random row a few times
    if rows and rng.random() < 0.4:
        rows.extend([rng.choice(rows)] * rng.randrange(1, 4))
    return pd.DataFrame(rows, columns=["chrom", "start", "end"]).astype(
        {"start": "Int64", "end": "Int64"})


def main():
    budget = float(sys.argv[1]) if len(sys.argv) > 1 else 600.0
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 9
    ref = load_reference()

    import bioframe_spark as bfs
    from bioframe_spark.session import get_spark
    spark = get_spark("fuzz-soak", cpus=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    rng = random.Random(seed)
    t0 = time.time()
    n_ex = 0
    fails = 0
    while time.time() - t0 < budget:
        offset = rng.choice((0, 0, 10**6, 10**9, 10**12))
        span = rng.choice((60, 200, 1000))
        p1, p2 = gen_frame(rng, offset, span), gen_frame(rng, offset, span)
        s1, s2 = to_spark(spark, p1), to_spark(spark, p2)
        checks = []
        if len(p1) and len(p2):
            r_inner = ref.overlap(p1, p2, how="inner", suffixes=("", "_"))
            r_left = ref.overlap(p1, p2, how="left", suffixes=("", "_"))
            for strat in ("plain", "binned"):
                checks.append((f"overlap-inner-{strat}", r_inner,
                               lambda s=strat: bfs.overlap(
                                   s1, s2, how="inner", suffixes=("", "_"),
                                   strategy=s)))
                checks.append((f"overlap-left-{strat}", r_left,
                               lambda s=strat: bfs.overlap(
                                   s1, s2, how="left", suffixes=("", "_"),
                                   strategy=s)))
            r_sub = ref.subtract(p1, p2)
            for small in (True, False):
                def _sub(small=small):
                    bar = str(IMAX if small else 0)
                    spark.conf.set("spark.bioframe.smallInputBytes", bar)
                    try:
                        return bfs.subtract(s1, s2)
                    finally:
                        spark.conf.unset("spark.bioframe.smallInputBytes")
                checks.append(
                    (f"subtract-{'small' if small else 'large'}",
                     r_sub, _sub))
            checks.append(("count_overlaps",
                           ref.count_overlaps(p1, p2, suffixes=("", "_")),
                           lambda: bfs.count_overlaps(
                               s1, s2, suffixes=("", "_"))))
            checks.append(("coverage", ref.coverage(p1, p2),
                           lambda: bfs.coverage(s1, s2)))
        if len(p1):
            d = rng.choice((0, 1, 7))
            checks.append((f"merge-{d}", ref.merge(p1, min_dist=d),
                           lambda d=d: bfs.merge(s1, min_dist=d)))
        # view family on null-free frames (the reference view ops don't
        # define null-row behavior); setdiff is a _bin_stats consumer too
        q1, q2 = p1.dropna(), p2.dropna()
        if len(q1) and len(q2):
            t1, t2 = to_spark(spark, q1), to_spark(spark, q2)
            checks.append(("setdiff", ref.setdiff(q1, q2),
                           lambda: bfs.setdiff(t1, t2)))
            checks.append(("cluster", ref.cluster(q1, min_dist=0),
                           lambda: bfs.cluster(t1, min_dist=0)))
            vlo, vhi = offset, offset + 2 * span + 50
            vpdf = pd.DataFrame(
                [(c, vlo, vhi, c) for c in ("chr1", "chr2", "chr10")],
                columns=["chrom", "start", "end", "name"])
            inside = q1[(q1.start >= vlo) & (q1.end <= vhi)]
            if len(inside):
                ti = to_spark(spark, inside)
                checks.append(
                    ("complement-view",
                     ref.complement(inside, view_df=vpdf),
                     lambda: bfs.complement(
                         ti, view_df=vpdf.values.tolist())))
        for name, want, got_fn in checks:
            try:
                got = got_fn()
                # subtract result of an all-null/empty side etc. — the
                # reference returns float dtypes on empties; assert_match
                # canonicalizes both
                assert_match(want, got)
            except AssertionError as e:
                fails += 1
                print(f"MISMATCH [{name}] seed={seed} example={n_ex}")
                print("p1:\n", p1.to_string())
                print("p2:\n", p2.to_string())
                print(e)
                sys.exit(1)
        n_ex += 1
        if n_ex % 10 == 0:
            print(f"# {n_ex} examples, {time.time()-t0:.0f}s", flush=True)
    print(f"CLEAN: {n_ex} examples in {time.time()-t0:.0f}s "
          f"({len(checks)} checks each at the last example)")


if __name__ == "__main__":
    main()
