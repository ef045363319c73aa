"""64x datapipe rung: the heavy dedup/similarity mechanisms past 16x.

The §12 ladder (tools/datapipe_ladder.py) tops out at 16x (80k docs /
32k vectors). This pushes the five ops whose 100 TB story carries the
most weight to 64x (320k docs, 128k x 64-dim vectors):

  - jaccard(cutoff), minhash-LSH, simhash: banded/blocked bucket joins
    whose pair output scales exactly k x by construction;
  - dedup_components: the CC loop's executor-held state at a 64x pair
    graph;
  - lsh_bucketed_topk: fixed 50-query probe against a growing corpus.

Replication: the 16x ladder's per-copy Caesar rotation caps at 26
bijections; past that, every token gets a per-copy suffix instead
(``regexp_replace(text, '(\\S+)', '$1xNN')``) — still a bijection on
tokens, so within-copy shingle/near-dup structure is exactly preserved
and NO cross-copy duplicates exist at any k. The embedding roll is
distinct for all k <= dim (64).

Run: python tools/datapipe_ladder64.py [reps]   (reps default 2)
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
from bioframe_spark.datapipe import dedup, similarity  # noqa: E402
from tools.datapipe_ladder import rep_emb  # noqa: E402


def rep_docs_any(docs, k: int):
    copies = [
        docs.select(
            F.concat(F.col("doc_id").cast("string"), F.lit(f"#c{i}"))
             .alias("doc_id"),
            F.regexp_replace(F.col("text"), r"(\S+)", rf"$1x{i:02d}")
             .alias("text"),
        )
        for i in range(k)
    ]
    return reduce(lambda x, y: x.unionByName(y), copies)


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("datapipe-ladder-64")
    spark.sparkContext.setLogLevel("ERROR")

    docs0 = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb0 = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    results: dict[str, dict[int, float]] = {}
    pair_counts: dict[str, dict[int, int]] = {}
    for k in (1, 16, 64):
        docs = rep_docs_any(docs0, k).cache()
        emb = rep_emb(emb0, k).cache()
        nd, ne = docs.count(), emb.count()
        print(f"k={k}: {nd} docs, {ne} embeddings", flush=True)

        def cc_pairs():
            # the minhash pair graph feeds CC — the realistic composition
            return dedup.connected_components(
                dedup.minhash_lsh_pairs(docs), strategy="loop")

        qs = {
            # max_doc_freq stays FIXED across rungs: the per-copy
            # document-frequency distribution is constant under the
            # token bijection, so scaling the cutoff with k (as the 16x
            # ladder did) re-admits ever-hotter shingles and measures
            # the loosened blocking, not the operator (first 64x run:
            # exponent 1.30 at cutoff 100*k vs the honest fixed-cutoff
            # number below)
            "jaccard_cutoff": lambda: dedup.ngram_jaccard_pairs(
                docs, threshold=0.4, max_doc_freq=100),
            "minhash_lsh": lambda: dedup.minhash_lsh_pairs(docs),
            "simhash_pairs": lambda: dedup.simhash_dup_pairs(docs),
            "dedup_components(minhash->cc)": cc_pairs,
            "ann_lsh(bucketed,50q)": lambda: similarity.lsh_bucketed_topk(
                emb.limit(50), emb, k=5),
        }
        for name, thunk in qs.items():
            samples = []
            n = 0
            for _ in range(reps):
                spark.catalog.clearCache()
                docs.cache().count()
                emb.cache().count()
                t0 = time.time()
                n = _force_count(thunk())
                samples.append(time.time() - t0)
            med = sorted(samples)[len(samples) // 2]
            results.setdefault(name, {})[k] = med
            pair_counts.setdefault(name, {})[k] = n
            print(f"k={k:2d} {name:28s} median {med:8.2f}s  ({n} rows)",
                  flush=True)
        docs.unpersist()
        emb.unpersist()
        spark.catalog.clearCache()

    print("\n| op | t1 | t16 | t64 | exp 1->16 | exp 16->64 | rows 1/16/64 |")
    print("|---|---|---|---|---|---|---|")
    for name, by_k in results.items():
        e16 = math.log(by_k[16] / by_k[1]) / math.log(16)
        e64 = math.log(by_k[64] / by_k[16]) / math.log(4)
        pc = pair_counts[name]
        print(f"| {name} | {by_k[1]:.2f} | {by_k[16]:.2f} | {by_k[64]:.2f} "
              f"| {e16:.2f} | {e64:.2f} | {pc[1]}/{pc[16]}/{pc[64]} |")


if __name__ == "__main__":
    main()
