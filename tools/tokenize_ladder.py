"""Scale ladder for the round-8 tokenizer family: word_frequencies,
corpus_stats (exact vs approx distinct), bpe_train, bpe_encode.

Replication scheme per op (what the honest worst case is):

- word_frequencies / corpus_stats / bpe_train use the BIJECTION
  replication (tools/datapipe_ladder64.rep_docs_any — every copy
  suffixes each token): the VOCABULARY scales k×, which is the honest
  worst case for the distinct-word shuffle (plain replication keeps the
  aggregate's output constant and measures only the map side).
- bpe_encode uses bijection too: the per-batch word→tokens memo would
  hit ~100% under plain replication (same words everywhere) and the
  rung would measure a dict lookup; suffixed copies give k× distinct
  words — the worst case for the encoder.
- bpe_train's merge loop runs on the min(max_words, |vocab|)-row table:
  the rung demonstrates the CAP binding (driver cost flattens once
  |vocab| > max_words, the corpus pass keeps scaling) — the knob that
  makes the op 100 TB-safe.

Run: python tools/tokenize_ladder.py [reps]   (reps default 3)
"""
from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bioframe_spark.session import get_spark  # noqa: E402
from bench import force_count as _force_count  # noqa: E402
from bioframe_spark.datapipe import tokenize  # noqa: E402
from tools.datapipe_ladder64 import rep_docs_any  # noqa: E402


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("tokenize-ladder")
    spark.sparkContext.setLogLevel("ERROR")
    docs0 = spark.read.parquet(f"{sf_dir}/documents.parquet")

    results: dict[str, dict[int, float]] = {}
    rows_out: dict[str, dict[int, int]] = {}
    for k in (1, 4, 16, 64):
        docs = rep_docs_any(docs0, k).cache()
        nd = docs.count()
        print(f"k={k}: {nd} docs", flush=True)

        def measure(name, thunk, timer="force"):
            samples, n = [], 0
            for _ in range(reps):
                # construction-inclusive timing (§12-r07 lesson 1:
                # bpe_train runs its corpus pass + merge loop eagerly)
                t0 = time.time()
                out = thunk()
                n = _force_count(out)
                samples.append(time.time() - t0)
            med = sorted(samples)[len(samples) // 2]
            results.setdefault(name, {})[k] = med
            rows_out.setdefault(name, {})[k] = n
            print(f"k={k:2d} {name:18s} median {med:8.2f}s  ({n} rows)",
                  flush=True)

        measure("word_freqs",
                lambda: tokenize.word_frequencies(docs, min_freq=2,
                                                  max_words=100))
        measure("corpus_stats",
                lambda: tokenize.corpus_stats(docs))
        measure("corpus_stats_hll",
                lambda: tokenize.corpus_stats(docs, approx=True))
        measure("bpe_train",
                lambda: tokenize.bpe_train(docs, n_merges=40, min_freq=2,
                                           max_words=50_000))
        merges = tokenize.bpe_train(docs0, n_merges=40, min_freq=2,
                                    max_words=50_000)
        measure("bpe_encode",
                lambda: tokenize.bpe_encode(docs, merges)
                .select("doc_id", "n_tokens"))
        # classifier: one training epoch over a k x labeled set (labeled
        # sets are model-sized in practice — the rung prices the epoch
        # machinery: feature pass + margin agg + slot-gradient shuffle)
        from pyspark.sql import functions as F
        from bioframe_spark.datapipe import classifier as _clf
        labeled = docs.withColumn(
            "label", (F.abs(F.xxhash64("doc_id")) % 2).cast("int"))
        def _train_once():
            _clf.train_quality_classifier(labeled, dim=1 << 16,
                                          epochs=1, lr=1.0)
            return spark.range(1)

        measure("clf_epoch", _train_once)
        docs.unpersist()

    print("\n| op | t1 | t4 | t16 | t64 | exp 16->64 | rows 1/64 |")
    for name, ts in results.items():
        e = (math.log(ts[64] / ts[16]) / math.log(4)
             if ts.get(16) and ts.get(64) else float("nan"))
        r = rows_out[name]
        print(f"| {name} | {ts.get(1, float('nan')):.2f} "
              f"| {ts.get(4, float('nan')):.2f} "
              f"| {ts.get(16, float('nan')):.2f} "
              f"| {ts.get(64, float('nan')):.2f} | {e:.2f} "
              f"| {r.get(1)}/{r.get(64)} |")


if __name__ == "__main__":
    main()
