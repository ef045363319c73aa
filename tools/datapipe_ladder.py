"""Datapipe scale ladder: dedup / similarity mechanisms at 1x/4x/16x.

Replication must NOT create cross-copy duplicates (that would multiply
join selectivity instead of holding it constant), so each copy gets a
deterministic per-copy perturbation: a copy-tag token prepended to the
text (shifts every shingle) and doc_ids suffixed per copy. Near-dup
structure then stays WITHIN each copy — output pairs scale exactly k x
for the shingle/minhash family.

Two contrasts this ladder is designed to show honestly:
- minhash-LSH / exact-jaccard-with-cutoff: banded bucket joins, expected
  ~linear — the 100 TB dedup path;
- embedding_dup_pairs: EXACT all-pairs block self-join, O(n^2/blocks)
  candidate work BY CONSTRUCTION — expected quadratic; the scale story
  for embeddings is the LSH/IVF approximate path (lsh_bucketed_topk),
  measured alongside.

Run: python tools/datapipe_ladder.py [reps]
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
from bioframe_spark.datapipe import dedup, packing, similarity, text  # noqa: E402


ALPHA = "abcdefghijklmnopqrstuvwxyz"


def rep_docs(docs, k: int):
    # per-copy Caesar rotation of the letters: EVERY shingle differs
    # across copies (a single prepended tag token would leave the copies
    # ~identical and multiply near-dup pairs k^2-fold), while within-copy
    # shingle structure — and therefore near-dup pairs per copy — is
    # preserved exactly (rotation is a bijection on tokens)
    copies = [
        docs.select(
            F.concat(F.col("doc_id").cast("string"), F.lit(f"#c{i}"))
             .alias("doc_id"),
            F.translate(F.col("text"), ALPHA, ALPHA[i:] + ALPHA[:i])
             .alias("text"),
        )
        for i in range(k)
    ]
    return reduce(lambda x, y: x.unionByName(y), copies)


def rep_emb(emb, k: int, dim: int = 64):
    # per-copy circular roll of the components: within-copy dot products
    # and norms are EXACTLY preserved (same permutation on both sides),
    # cross-copy cosines decorrelate — pair counts scale k x
    copies = [
        emb.select(
            F.concat(F.col("vec_id").cast("string"), F.lit(f"#c{i}"))
             .alias("vec_id"),
            (F.col("embedding") if i == 0 else F.concat(
                F.slice(F.col("embedding"), i + 1, dim - i),
                F.slice(F.col("embedding"), 1, i),
            )).alias("embedding"),
        )
        for i in range(k)
    ]
    return reduce(lambda x, y: x.unionByName(y), copies)


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("datapipe-ladder")
    spark.sparkContext.setLogLevel("ERROR")

    docs0 = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb0 = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    results: dict[str, dict[int, float]] = {}
    for k in (1, 4, 16):
        docs = rep_docs(docs0, k).cache()
        emb = rep_emb(emb0, k).cache()
        nd, ne = docs.count(), emb.count()
        print(f"k={k}: {nd} docs, {ne} embeddings", flush=True)

        qs = {
            "exact_dedup": lambda: dedup.exact_duplicates(docs),
            "jaccard_cutoff": lambda: dedup.ngram_jaccard_pairs(
                docs, threshold=0.4, max_doc_freq=100 * k),
            "minhash_lsh": lambda: dedup.minhash_lsh_pairs(docs),
            "simhash_pairs": lambda: dedup.simhash_dup_pairs(docs),
            "quality_feats": lambda: text.quality_features(docs),
            "redact": lambda: text.redact_pii(docs),
            "repetition": lambda: text.repetition_signals(docs),
            "chunk_docs": lambda: packing.chunk_documents(docs, 20, 5),
            # pack_sequences shards on id % num_shards (numeric id
            # contract); the ladder's replicated ids are strings, so
            # remap deterministically first
            "pack_seqs": lambda: packing.pack_sequences(
                docs.withColumn("doc_id", F.xxhash64("doc_id")), 80),
            "gopher_filter": lambda: text.gopher_quality_filter(docs),
            # corpus-level first-occurrence line dedup: a shared header
            # keeps one hot line whose keeper aggregate must stay
            # map-side combinable as k grows
            "dedup_lines": lambda: text.dedup_lines(
                docs.withColumn(
                    "text",
                    F.concat(F.lit("SHARED-HEADER\n"), F.col("text")))),
            # eval set held constant while the corpus grows k x — the
            # realistic decontamination shape (corpus-side distinct
            # shingles dominate)
            "contamination": lambda: dedup.ngram_contamination(
                docs, docs0.filter(F.col("doc_id") % 50 == 0), n=5),
            # shared boilerplate: a header per copy-group (constant
            # distinct-line set as k grows — the realistic shape)
            "boilerplate": lambda: text.remove_boilerplate_lines(
                docs.withColumn(
                    "text",
                    F.concat(F.lit("SHARED-HEADER\n"), F.col("text")))),
            "embedding_exact(all-pairs)": lambda: similarity.embedding_dup_pairs(
                emb, threshold=0.98),
            "ann_lsh(bucketed)": lambda: similarity.lsh_bucketed_topk(
                emb.limit(50), emb, k=5),
        }
        for name, thunk in qs.items():
            samples = []
            n = 0
            for _ in range(reps):
                spark.catalog.clearCache()
                docs.cache().count(); emb.cache().count()
                t0 = time.time()
                n = _force_count(thunk())
                samples.append(time.time() - t0)
            med = sorted(samples)[len(samples) // 2]
            results.setdefault(name, {})[k] = med
            print(f"k={k:2d} {name:26s} median {med:7.2f}s ({n} rows)",
                  flush=True)
        docs.unpersist(); emb.unpersist()

    print("\n| op | 1x | 4x | 16x | exponent log16(t16/t1) |")
    print("|---|---|---|---|---|")
    for name, t in results.items():
        exp = math.log(t[16] / t[1]) / math.log(16)
        print(f"| {name} | {t[1]:.2f} | {t[4]:.2f} | {t[16]:.2f} | {exp:.2f} |")


if __name__ == "__main__":
    main()
