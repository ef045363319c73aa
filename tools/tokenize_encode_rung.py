"""§12-r09 rung: price ``bpe_encode`` at real-tokenizer merge-table
sizes (the r8 rung used 40 merges; a production tokenizer is 8k-100k).

The sf0.1 ``documents`` table cannot support this rung: its text is
drawn from a 31-word vocabulary, so BPE training exhausts every
mergeable pair after ~107 merges (measured; ``bpe_train`` returns 107
rows for any requested n_merges >= 107). The rung therefore runs on a
SEEDED synthetic corpus with a wide vocabulary (60k distinct words,
Zipf-ish frequencies, words 3-24 chars over a 26-letter alphabet) —
the same corpus family the trainer-side measurement used. Scale is
held FIXED while n_merges varies, so the ladder isolates the
merge-table-size term VERDICT-r8 #5 asks about.

Measurements:

1. **Merge-count ladder**: encode wall time at n_merges ∈
   {1k, 8k, 32k} (tables trained on the same corpus, min_freq=1,
   max_words=200k). The rescan encoder is O(L · applied merges) per
   word; applied merges per word is bounded by L-1 regardless of table
   size, so the DESIGN claim is flat per-word cost in table size —
   this measures it. Done-criterion: exponent <= 1 in table size.

2. **Word-length ladder** (driver-side, no Spark): single-word encode
   cost, rescan form vs heap form, at an 8k-pair rank table — the
   worst case the alnum-run pre-tokenizer admits (a base64 blob / DNA
   run is ONE "word").

Run: python tools/tokenize_encode_rung.py [reps]   (default 3)
"""
from __future__ import annotations

import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bioframe_spark.session import get_spark  # noqa: E402
from bench import force_count as _force_count  # noqa: E402
from bioframe_spark.datapipe import tokenize  # noqa: E402

N_VOCAB = 60_000
N_DOCS = 20_000
WORDS_PER_DOC = 60
SEED = 90917


def _synth_corpus(spark):
    """Seeded wide-vocab corpus: 60k distinct words, Zipf-ish draw,
    20k docs x 60 words. Deterministic; built as ONE driver list (a few
    tens of MB) then parallelized — this is a measurement fixture, not
    a scale path."""
    rng = random.Random(SEED)
    vocab = []
    seen = set()
    while len(vocab) < N_VOCAB:
        w = "".join(rng.choice("abcdefghijklmnopqrstuvwxyz")
                    for _ in range(rng.randint(3, 24)))
        if w not in seen:
            seen.add(w)
            vocab.append(w)
    # Zipf-ish: word i drawn with weight ~ 1/(i+1)
    cum = []
    tot = 0.0
    for i in range(N_VOCAB):
        tot += 1.0 / (i + 1)
        cum.append(tot)
    import bisect

    def draw():
        return vocab[bisect.bisect_left(cum, rng.random() * tot)]

    rows = [(i, " ".join(draw() for _ in range(WORDS_PER_DOC)))
            for i in range(N_DOCS)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def merge_ladder(spark, reps):
    docs = _synth_corpus(spark).cache()
    n_docs = docs.count()
    n_words = N_DOCS * WORDS_PER_DOC
    print(f"synthetic corpus: {n_docs} docs / {n_words} word tokens / "
          f"{N_VOCAB} vocab (seed {SEED})")
    print("| n_merges | trained | train s | encode med s | us/word |")
    rows = []
    for n_merges in (1024, 8192, 32768):
        t0 = time.time()
        merges = tokenize.bpe_train(docs, n_merges=n_merges, min_freq=1,
                                    max_words=200_000)
        pair_rows = merges.collect()
        t_train = time.time() - t0
        samples = []
        for _ in range(reps):
            t0 = time.time()
            out = tokenize.bpe_encode(docs, [
                (r["left"], r["right"]) for r in pair_rows])
            _force_count(out.select("doc_id", "n_tokens"))
            samples.append(time.time() - t0)
        med = sorted(samples)[len(samples) // 2]
        rows.append((n_merges, len(pair_rows), med))
        print(f"| {n_merges} | {len(pair_rows)} | {t_train:.1f} "
              f"| {med:.2f} | {med / n_words * 1e6:.2f} |", flush=True)
    docs.unpersist()
    if len(rows) >= 2 and rows[0][2] > 0:
        import math
        (m0, _, t0_), (m1, _, t1_) = rows[0], rows[-1]
        exp = math.log(max(t1_, 1e-9) / t0_) / math.log(m1 / m0)
        print(f"exponent in n_merges ({m0} -> {m1}): {exp:.2f}")


def word_length_ladder():
    """Rescan vs heap single-word encode at an 8k-pair adversarial-ish
    rank table (binary alphabet => every adjacent pair mergeable)."""
    from bioframe_spark.datapipe.tokenize import (
        END_OF_WORD, _bpe_merge_loop, _encode_word_heap)
    from bioframe_spark.datapipe.tokenize import _merge_word  # noqa: F401

    rng = random.Random(SEED + 1)
    corpus = ["".join(rng.choice("ab") for _ in range(rng.randint(2, 40)))
              for _ in range(20_000)]
    words = [tuple(w) + (END_OF_WORD,) for w in corpus]
    merges = _bpe_merge_loop(words, [rng.randint(1, 9) for _ in corpus],
                             8192)
    ranks = {p: i for i, p in enumerate(merges)}
    print(f"\nword-length ladder (rank table = {len(ranks)} pairs):")
    print("| word len | rescan ms | heap ms | equal |")

    def rescan(word):
        syms = list(word) + [END_OF_WORD]
        while len(syms) > 1:
            best_rank, best_pair = None, None
            for p in zip(syms, syms[1:]):
                r = ranks.get(p)
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_pair = r, p
            if best_pair is None:
                break
            syms = list(_merge_word(tuple(syms), *best_pair))
        return syms

    for L in (1_000, 4_000, 16_000, 64_000):
        word = "".join(rng.choice("ab") for _ in range(L))
        t0 = time.time()
        a = rescan(word)
        t_rescan = time.time() - t0
        t0 = time.time()
        b = _encode_word_heap(list(word) + [END_OF_WORD], ranks)
        t_heap = time.time() - t0
        print(f"| {L} | {t_rescan * 1e3:.0f} | {t_heap * 1e3:.0f} "
              f"| {a == b} |", flush=True)


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark("tokenize-encode-rung")
    spark.sparkContext.setLogLevel("ERROR")
    merge_ladder(spark, reps)
    spark.stop()
    word_length_ladder()


if __name__ == "__main__":
    main()
