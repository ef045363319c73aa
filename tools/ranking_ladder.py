"""Scale ladder for the round-6 lexical ops: dup_spans, bm25, vocab_topk.

Replication reuses the 64x ladder's token-bijection scheme
(tools/datapipe_ladder64.rep_docs_any): every copy suffixes each token,
so per-copy char-gram structure — and therefore the WITHIN-copy
duplicate-span graph — is exactly preserved while no cross-copy
duplicates exist. The dup workload (fingerprints, dup set, per-doc
rollup) scales exactly k x by construction; bm25's matching-term rows
scale k x only through the un-suffixed query terms... which the suffixes
would erase, so bm25/vocab are measured on PLAIN replication (exact
copies): term statistics scale k x, which is the honest worst case for
the tf shuffle (every copy contributes matching rows).

Run: python tools/ranking_ladder.py [reps]   (reps default 3)
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
from bench import force_count as _force_count  # noqa: E402
from bioframe_spark.datapipe import dedup, ranking  # noqa: E402
from tools.datapipe_ladder64 import rep_docs_any  # noqa: E402


def rep_docs_plain(docs, k: int):
    copies = [
        docs.select(
            F.concat(F.col("doc_id").cast("string"), F.lit(f"#c{i}"))
             .alias("doc_id"),
            F.col("text"))
        for i in range(k)
    ]
    return reduce(lambda x, y: x.unionByName(y), copies)


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ranking-ladder")
    spark.sparkContext.setLogLevel("ERROR")
    docs0 = spark.read.parquet(f"{sf_dir}/documents.parquet")

    results: dict[str, dict[int, float]] = {}
    rows_out: dict[str, dict[int, int]] = {}
    for k in (1, 4, 16, 64):
        # NOTE: one replica cached at a time — caching both corpora
        # inflated the 64x dup_spans rung 17.6 -> 38 s (memory-pressure
        # contention between the replicas, not operator cost)
        docs_b = rep_docs_any(docs0, k).cache()   # bijection: dup structure
        nb = docs_b.count()
        print(f"k={k}: {nb} docs per replica", flush=True)

        def measure(name, thunk):
            samples, n = [], 0
            for _ in range(reps):
                out = thunk()
                t0 = time.time()
                n = _force_count(out)
                samples.append(time.time() - t0)
                dedup.release_cache(out)
            med = sorted(samples)[len(samples) // 2]
            results.setdefault(name, {})[k] = med
            rows_out.setdefault(name, {})[k] = n
            print(f"k={k:2d} {name:12s} median {med:8.2f}s  ({n} rows)",
                  flush=True)

        measure("dup_spans", lambda: dedup.duplicate_spans(docs_b))
        measure("span_removal",
                lambda: dedup.remove_duplicate_spans(docs_b))
        docs_b.unpersist()
        docs_p = rep_docs_plain(docs0, k).cache()  # plain: term stats
        docs_p.count()
        measure("bm25", lambda: ranking.bm25_scores(
            docs_p, "merge scan fast value"))
        measure("vocab_topk", lambda: ranking.vocab_topk(docs_p, n=100))
        docs_p.unpersist()

    print("\n| op | t1 | t4 | t16 | t64 | exp 16->64 | rows 1/64 |")
    for name, ts in results.items():
        e = (math.log(ts[64] / ts[16]) / math.log(4)
             if ts.get(16) and ts.get(64) else float("nan"))
        print(f"| {name} | {ts.get(1, 0):.2f} | {ts.get(4, 0):.2f} "
              f"| {ts.get(16, 0):.2f} | {ts.get(64, 0):.2f} | {e:.2f} "
              f"| {rows_out[name].get(1)}/{rows_out[name].get(64)} |")
    spark.stop()


if __name__ == "__main__":
    main()
