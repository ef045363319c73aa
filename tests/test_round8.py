"""Round-8 additions: cache-handle lifecycle (GC finalizer backstop),
the explicit ``coarse=`` assignment contract, and score_buckets'
single-execution / approx-threshold knobs (the four r7 ADVICE items)."""
import gc
import logging
import time

import numpy as np
import pytest
from pyspark.sql import functions as F

from bioframe_spark.datapipe import dedup, ranking, similarity


def _n_cached(spark):
    return len(spark.sparkContext._jsc.sc().getRDDStorageInfo())


def _wait_cached(spark, n, timeout=10.0):
    """unpersist(blocking=False) drops blocks asynchronously — poll."""
    t0 = time.time()
    while time.time() - t0 < timeout:
        if _n_cached(spark) <= n:
            return True
        time.sleep(0.1)
    return _n_cached(spark) <= n


def _docs(spark):
    base = "the quick brown fox jumps over the lazy dog again and again "
    return spark.createDataFrame(
        [(i, base * 3 + f"tail {i % 2}") for i in range(8)],
        "doc_id long, text string")


def test_ride_cache_finalizer_releases_on_gc(spark):
    """A harness that materializes a cache-carrying result and drops the
    reference (the oracle gate's loop shape) must not leak a CacheManager
    entry for the session lifetime: the weakref finalizer unpersists the
    handles when the result object is collected (ADVICE r7 #1)."""
    spark.catalog.clearCache()
    base = _n_cached(spark)
    out = dedup.duplicate_spans(_docs(spark), k=5, w=4, strategy="join")
    handles = out._bioframe_cache
    out.count()
    assert _n_cached(spark) > base, "join strategy should persist its emission"
    del out
    gc.collect()
    assert _wait_cached(spark, base), \
        "GC of the result must unpersist the ridden handles"
    del handles


def test_release_cache_then_gc_is_safe(spark):
    """Explicit release stays the deterministic path; the finalizer
    firing afterwards (double unpersist) must be a no-op."""
    spark.catalog.clearCache()
    base = _n_cached(spark)
    out = ranking.bigram_lm_scores(_docs(spark))
    n = out.count()
    assert n == 8
    assert getattr(out, "_bioframe_cache", None)
    dedup.release_cache(out)
    assert _wait_cached(spark, base)
    del out
    gc.collect()  # finalizer double-fire: must not raise


def _clustered(spark, n_cent=12, per=5, dim=8, seed=3):
    rng = np.random.default_rng(seed)
    cents = rng.normal(size=(n_cent, dim))
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    rows, vid = [], 0
    for c in range(n_cent):
        for j in range(per):
            rows.append((vid, (cents[c] * (1.0 + 0.001 * j)).tolist()))
            vid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_coarse_param_validation(spark):
    emb = _clustered(spark)
    with pytest.raises(ValueError, match="coarse"):
        similarity.semantic_dedup(emb, n_centroids=4, train_iters=0,
                                  coarse="nope").collect()


def test_coarse_false_forbids_router_past_threshold(spark):
    """coarse=False pins the exact kernel even past the session
    threshold — same values as the exact default below it (the ADVICE
    silent-switch fix: crossing 512 centroids no longer changes output
    without an explicit opt-in at the call site)."""
    from test_round7 import _conf

    emb = _clustered(spark)

    def keep_map(coarse, thresh):
        with _conf(spark, spark__bioframe__coarseAssignMinCentroids=thresh):
            out = similarity.semantic_dedup(
                emb, threshold=0.999, n_centroids=12, train_iters=0,
                coarse=coarse)
            return {r["vec_id"]: (r["cent_id"], r["keep"])
                    for r in out.collect()}

    exact_default = keep_map("auto", 10_000)   # below threshold: exact
    pinned_exact = keep_map(False, 4)          # past threshold, forbidden
    assert exact_default == pinned_exact
    # coarse=True forces the router even below the threshold; on
    # well-separated clusters it must agree with exact
    forced = keep_map(True, 10_000)
    assert forced == exact_default


def test_coarse_auto_logs_notice(spark, caplog):
    """auto mode says so out loud when the approximation engages."""
    from test_round7 import _conf

    emb = _clustered(spark)
    with _conf(spark, spark__bioframe__coarseAssignMinCentroids=4):
        with caplog.at_level(logging.WARNING, "bioframe_spark.similarity"):
            similarity.semantic_dedup(
                emb, threshold=0.999, n_centroids=12, train_iters=0).count()
    assert any("coarse" in r.message for r in caplog.records)
    # explicit coarse=True is an opt-in: no notice
    caplog.clear()
    with caplog.at_level(logging.WARNING, "bioframe_spark.similarity"):
        similarity.semantic_dedup(
            emb, threshold=0.999, n_centroids=12, train_iters=0,
            coarse=True).count()
    assert not any("coarse" in r.message for r in caplog.records)


def test_coarse_true_rejects_multiprobe(spark):
    """coarse=True is a top-1 contract at the kernel level; public ops
    only thread it to their top-1 corpus assignment, so both coarse
    modes of ivf_topk stay legal (queries always probe exactly)."""
    emb = _clustered(spark)
    cents = similarity.kmeans_centroids(
        emb, n_centroids=4, n_iter=0).withColumn(
        "cvec", F.transform(F.col("cvec"),
                            lambda x: F.round(x * similarity.QUANT)
                            .cast("long")))
    cent_rows = cents.orderBy("cent_id").collect()
    with pytest.raises(ValueError, match="top-1"):
        similarity._centroid_assign(
            emb, cent_rows, cents.schema["cent_id"].dataType,
            "vec_id", "embedding", "query_id", "qv", "qn", 2, coarse=True)
    # both coarse modes of the public op work (corpus coarse / exact)
    similarity.ivf_topk(emb.limit(3), emb, k=2, n_centroids=4,
                        n_probe=2, train_iters=0, coarse=True).count()
    similarity.ivf_topk(emb.limit(3), emb, k=2, n_centroids=4,
                        n_probe=2, train_iters=0, coarse=False).count()


def test_score_buckets_single_execution_and_release(spark):
    """ADVICE r7 #3: the upstream scoring plan must run once. cache=True
    persists the input before the threshold action; the assignment pass
    reads the cache (InMemoryTableScan in the executed plan), and the
    handle follows the release_cache lifecycle."""
    spark.catalog.clearCache()
    base = _n_cached(spark)
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(9)] + [(99, None)],
        "doc_id long, score double")
    out = ranking.score_buckets(df)
    got = {r["doc_id"]: r["bucket"] for r in out.collect()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 1, 4: 1, 5: 1,
                   6: 2, 7: 2, 8: 2, 99: None}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" in plan or "TableCacheQueryStage" in plan
    assert getattr(out, "_bioframe_cache", None)
    dedup.release_cache(out)
    assert _wait_cached(spark, base)
    # cache=False: no handle, identical values
    out2 = ranking.score_buckets(df, cache=False)
    assert not getattr(out2, "_bioframe_cache", None)
    assert {r["doc_id"]: r["bucket"] for r in out2.collect()} == got


def test_score_buckets_approx_thresholds(spark):
    """ADVICE r7 #4: the approx knob for effectively-continuous score
    domains. Sketch thresholds are data values, so boundaries may move
    by the rank error — bucket assignment must stay monotone in score
    and cover every non-null row; at rank-exact accuracy on small
    distinct data the split matches the fraction sizes."""
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(300)], "doc_id long, score double")
    out = ranking.score_buckets(df, fractions=(0.25, 0.5, 0.75),
                                approx=True, cache=False)
    rows = sorted(out.collect(), key=lambda r: r["score"])
    buckets = [r["bucket"] for r in rows]
    assert all(b is not None for b in buckets)
    assert buckets == sorted(buckets), "buckets must be monotone in score"
    from collections import Counter
    c = Counter(buckets)
    assert set(c) == {0, 1, 2, 3}
    for b, n in c.items():
        assert abs(n - 75) <= 2, (b, n)  # rank error <= 1/accuracy


# ---------------------------------------------------------------- BPE family

from bioframe_spark.datapipe import tokenize


def _sennrich_corpus(spark):
    """The paper's worked example as documents: low x5, lower x2,
    newest x6, widest x3 (Sennrich et al. 2016, arXiv:1508.07909)."""
    words = ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    return spark.createDataFrame(
        [(i, w) for i, w in enumerate(words)], "doc_id long, text string")


def test_bpe_train_worked_example(spark):
    """Hand-derived merge sequence under the (freq desc, pair asc) tie
    rule: es(9), est(9), est</w>(9), lo(7), low(7); then the classic
    result — 'lowest' encodes to [low, est</w>]."""
    docs = _sennrich_corpus(spark)
    merges = tokenize.bpe_train(docs, n_merges=5, min_freq=1)
    got = [(r["left"], r["right"])
           for r in merges.orderBy("rank").collect()]
    assert got == [("e", "s"), ("es", "t"), ("est", "</w>"),
                   ("l", "o"), ("lo", "w")]
    probe = spark.createDataFrame([(0, "lowest")], "doc_id long, text string")
    enc = tokenize.bpe_encode(probe, merges).collect()[0]
    assert enc["tokens"] == ["low", "est</w>"]
    assert enc["n_tokens"] == 2


def test_bpe_encode_properties(spark):
    """Lossless reconstruction; token count monotone non-increasing in
    merges; zero merges = chars + end-of-word markers; null text -> null
    tokens/count; output independent of Arrow batch split."""
    texts = ["the cat sat on the mat", "cats eat fish, fish eat bugs!",
             "a aa aaa aaaa", "", None, "Mixed CASE 123 tokens"]
    docs = spark.createDataFrame(list(enumerate(texts)),
                                 "doc_id long, text string")
    merges = tokenize.bpe_train(docs, n_merges=12, min_freq=1)
    import re
    from bioframe_spark.datapipe.ranking import TOKEN_SPLIT_RE

    prev = None
    for k in (0, 3, 12):
        mk = merges.filter(F.col("rank") < k)
        out = {r["doc_id"]: r for r in tokenize.bpe_encode(docs, mk).collect()}
        for i, t in enumerate(texts):
            if t is None:
                assert out[i]["tokens"] is None and out[i]["n_tokens"] is None
                continue
            words = [w for w in re.split(TOKEN_SPLIT_RE, t.lower()) if w]
            joined = "".join(out[i]["tokens"]).replace("</w>", "")
            assert joined == "".join(words), (k, t)
            if k == 0:
                assert out[i]["n_tokens"] == sum(len(w) + 1 for w in words)
            if prev is not None:
                assert out[i]["n_tokens"] <= prev[i]["n_tokens"], (k, t)
        prev = out
    # batch-split independence: 1 partition vs 5 partitions, same result
    one = {r["doc_id"]: (r["tokens"], r["n_tokens"])
           for r in tokenize.bpe_encode(docs.coalesce(1), merges).collect()}
    five = {r["doc_id"]: (r["tokens"], r["n_tokens"])
            for r in tokenize.bpe_encode(docs.repartition(5),
                                         merges).collect()}
    assert one == five


def _naive_bpe(word_freqs: dict, n_merges: int):
    """Independent reference: full pair recount every round (the paper's
    pseudocode, no incremental bookkeeping) — structurally different
    from the module's indexed loop, so agreement is evidence."""
    words = {tuple(w) + ("</w>",): f for w, f in word_freqs.items()}
    merges = []
    for _ in range(n_merges):
        counts = {}
        for syms, f in words.items():
            for p in zip(syms, syms[1:]):
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        new = {}
        for syms, f in words.items():
            new[tokenize._merge_word(syms, *best)] = \
                new.get(tokenize._merge_word(syms, *best), 0) + f
        words = new
    return merges


def test_bpe_train_differential(spark):
    """Incremental trainer == naive full-recount reference on a random
    corpus (fixed seed), merges and encodings both."""
    import random
    rng = random.Random(42)
    vocab = ["ab", "abc", "banana", "bandana", "cabana", "scan", "scans",
             "span", "spans", "plan", "b1", "2b", "aaa", "zz"]
    docs = [(i, " ".join(rng.choices(vocab, k=rng.randint(1, 12))))
            for i in range(60)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = [(r["left"], r["right"]) for r in
           tokenize.bpe_train(df, n_merges=25, min_freq=1)
           .orderBy("rank").collect()]
    # reference word counts from the same tokenization rule
    import re
    from collections import Counter
    from bioframe_spark.datapipe.ranking import TOKEN_SPLIT_RE
    wc = Counter(w for _, t in docs
                 for w in re.split(TOKEN_SPLIT_RE, t.lower()) if w)
    assert got == _naive_bpe(wc, 25)


def test_bpe_train_bounds_and_edges(spark):
    docs = _sennrich_corpus(spark)
    with pytest.raises(ValueError, match="n_merges"):
        tokenize.bpe_train(docs, n_merges=-1)
    # n_merges beyond exhaustion: loop stops when no pair remains
    m = tokenize.bpe_train(docs, n_merges=10_000, min_freq=1)
    assert m.count() < 50
    # empty corpus -> empty merge table, encode passes through
    empty = spark.createDataFrame([], "doc_id long, text string")
    m0 = tokenize.bpe_train(empty, n_merges=5)
    assert m0.count() == 0
    assert tokenize.bpe_encode(empty, m0).count() == 0
    # min_freq floors the table: rare words contribute no merges
    rare = spark.createDataFrame(
        [(0, "zzz"), (1, "qqq qqq qqq")], "doc_id long, text string")
    m1 = {(r["left"], r["right"])
          for r in tokenize.bpe_train(rare, n_merges=3, min_freq=2)
          .collect()}
    assert all("z" not in l and "z" not in r for l, r in m1)


def test_word_frequencies_and_corpus_stats(spark):
    docs = spark.createDataFrame(
        [(0, "a b b c C c"), (1, None), (2, ""), (3, "a.")],
        "doc_id long, text string")
    wf = {r["word"]: r["freq"]
          for r in tokenize.word_frequencies(docs, min_freq=1).collect()}
    assert wf == {"a": 2, "b": 2, "c": 3}
    top = tokenize.word_frequencies(docs, min_freq=2, max_words=1).collect()
    assert [(r["word"], r["freq"]) for r in top] == [("c", 3)]
    st = tokenize.corpus_stats(docs).collect()[0]
    assert (st["n_docs"], st["n_text"], st["n_tokens"],
            st["n_distinct_tokens"]) == (4, 3, 7, 3)
    # avg over non-null docs: (6 + 0 + 1)/3
    assert abs(st["avg_doc_tokens"] - round(7 / 3, 6)) < 1e-12
    ap = tokenize.corpus_stats(docs, approx=True).collect()[0]
    assert ap["n_distinct_tokens"] == 3  # HLL exact at tiny cardinality


# ------------------------------------------------- incremental minhash index

def _dup_docs(spark):
    """Docs with engineered near-dups across the old/new split."""
    base = ("spark shuffles partition data across executors when keys "
            "move between stages and the optimizer plans the exchange")
    alt = base.replace("executors", "workers")
    rows = []
    for i in range(20):
        # ids 0,5,10,15 form the 'new batch' under % 5; give some of
        # them near-dups in the indexed remainder
        rows.append((i, base if i % 3 else alt))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_minhash_index_probe_matches_selfjoin(spark, tmp_path):
    """Probing a corpus against an index of the SAME corpus must equal
    the self-join miner (symmetrized): the persisted path changes the
    physical plan, not the math."""
    docs = _dup_docs(spark)
    path = str(tmp_path / "mh_idx")
    dedup.build_minhash_index(docs, path, num_hashes=16, bands=4)
    probe = dedup.minhash_lsh_probe(docs, path, threshold=0.5)
    sym = {(min(r["id_new"], r["id_indexed"]),
            max(r["id_new"], r["id_indexed"]), r["n_match"])
           for r in probe.collect()}
    pairs = {(r["id1"], r["id2"], r["n_match"])
             for r in dedup.minhash_lsh_pairs(
                 docs, num_hashes=16, bands=4, threshold=0.5).collect()}
    assert sym == pairs and len(pairs) > 0
    # every unordered pair appears in BOTH directions (disjoint id
    # namespaces are the normal case; same-namespace callers see both)
    assert probe.count() == 2 * len(pairs)


def test_minhash_index_incremental_update(spark, tmp_path):
    """The increment loop: build on the old corpus, probe the new batch
    (cross pairs only), append, re-probe (now also sees new-vs-new)."""
    docs = _dup_docs(spark)
    old = docs.filter("doc_id % 5 != 0")
    new = docs.filter("doc_id % 5 = 0")
    path = str(tmp_path / "mh_inc")
    dedup.build_minhash_index(old, path, num_hashes=16, bands=4)
    cross = dedup.minhash_lsh_probe(new, path, threshold=0.5)
    cross_set = {(r["id_new"], r["id_indexed"]) for r in cross.collect()}
    # ground truth from the self-join miner on the union
    all_pairs = {(r["id1"], r["id2"]) for r in dedup.minhash_lsh_pairs(
        docs, num_hashes=16, bands=4, threshold=0.5).collect()}
    want = {(a, b) for a, b in
            {(x, y) for x, y in all_pairs} | {(y, x) for x, y in all_pairs}
            if a % 5 == 0 and b % 5 != 0}
    assert cross_set == want
    dedup.update_minhash_index(new, path)
    again = dedup.minhash_lsh_probe(new, path, threshold=0.5)
    again_set = {(r["id_new"], r["id_indexed"]) for r in again.collect()}
    # same-id trivial matches are excluded; new-vs-new now appears
    assert all(a != b for a, b in again_set)
    assert cross_set <= again_set
    new_new = {(a, b) for a, b in again_set if b % 5 == 0}
    want_nn = {(a, b) for a, b in
               {(x, y) for x, y in all_pairs} | {(y, x) for x, y in all_pairs}
               if a % 5 == 0 and b % 5 == 0}
    assert new_new == want_nn
    # exclude_same_id=False surfaces the trivial full-signature matches
    withself = dedup.minhash_lsh_probe(new, path, threshold=0.5,
                                       exclude_same_id=False)
    selfs = {(r["id_new"], r["id_indexed"], r["n_match"])
             for r in withself.collect() if r["id_new"] == r["id_indexed"]}
    assert selfs == {(i, i, 16) for i in (0, 5, 10, 15)}


def test_minhash_index_param_validation(spark, tmp_path):
    docs = _dup_docs(spark)
    with pytest.raises(ValueError, match="divisible"):
        dedup.build_minhash_index(docs, str(tmp_path / "x"),
                                  num_hashes=10, bands=4)
    # md5 mode round-trips through the stored meta (string buckets)
    path = str(tmp_path / "mh_md5")
    dedup.build_minhash_index(docs, path, num_hashes=16, bands=4,
                              hash_fn="md5")
    p = dedup.minhash_lsh_probe(docs, path, threshold=0.5)
    assert p.count() > 0
    # probe plan broadcasts the (tiny) new side
    plan = p._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_minhash_probe_plan_budget(spark, tmp_path):
    """Probe physical shape: broadcast the (small) new side, ONE scan of
    the stored banded table with no shuffle of it — the only shuffle in
    the plan is the candidate-distinct (ids + n_match, tiny)."""
    docs = _dup_docs(spark)
    path = str(tmp_path / "mh_plan")
    dedup.build_minhash_index(docs, path, num_hashes=16, bands=4)
    p = dedup.minhash_lsh_probe(docs, path, threshold=0.5)
    p.count()
    plan = (p._jdf.queryExecution().executedPlan().toString()
            .split("== Initial Plan ==")[0])
    assert "BroadcastHashJoin" in plan
    assert plan.count("Exchange hashpartitioning") <= 1, plan


# ---------------------------------------------- hashed quality classifier

from bioframe_spark.datapipe import classifier as clf


def _labeled(spark, n=40):
    import random
    rng = random.Random(7)
    good = "clear structured prose careful reasoning data method tested"
    bad = "click buy free offer winner casino jackpot spam links now"
    rows = []
    for i in range(n):
        pos = i % 2 == 0
        src = (good if pos else bad).split()
        rows.append((i, " ".join(rng.choices(src, k=12)), int(pos)))
    return spark.createDataFrame(rows, "doc_id long, text string, label int")


def test_classifier_learns_separable(spark):
    df = _labeled(spark)
    w, hist = clf.train_quality_classifier(
        df, dim=1 << 12, epochs=6, lr=2.0, return_history=True)
    assert all(b < a for a, b in zip(hist, hist[1:])), hist
    assert abs(hist[0] - 0.6931471805599453) < 1e-9  # ln 2 at w=0
    scored = clf.hashed_text_score(df, w, sigmoid=True)
    got = {r["doc_id"]: r["prob"] for r in scored.collect()}
    acc = sum((got[i] > 0.5) == (i % 2 == 0) for i in got) / len(got)
    assert acc == 1.0


def test_classifier_matches_numpy_reference(spark):
    """Full-batch GD is deterministic math: replicate it in numpy on the
    SAME hashed features and compare weights + loss history (float
    summation order differs -> tolerance, not equality)."""
    import math

    import re
    from bioframe_spark.datapipe.ranking import TOKEN_SPLIT_RE

    df = _labeled(spark, n=24)
    dim, epochs, lr = 1 << 10, 5, 1.5
    w, hist = clf.train_quality_classifier(
        df, dim=dim, epochs=epochs, lr=lr, return_history=True)

    rows = df.collect()
    # same slot mapping, computed through the Spark expression itself
    toks = sorted({t for r in rows
                   for t in re.split(TOKEN_SPLIT_RE, r["text"].lower()) if t})
    tok_df = spark.createDataFrame([(t,) for t in toks], "t string")
    slot_map = {r["t"]: r["s"] for r in tok_df.select(
        "t", clf.hash_slot(F.col("t"), dim).alias("s")).collect()}

    wr = np.zeros(dim)
    br = 0.0
    hist_ref = []
    feats = []
    for r in rows:
        ts = [t for t in re.split(TOKEN_SPLIT_RE, r["text"].lower()) if t]
        x = np.zeros(dim)
        for t in ts:
            x[slot_map[t]] += 1.0 / len(ts)
        feats.append((x, float(r["label"])))
    n = len(feats)
    for _ in range(epochs):
        g = np.zeros(dim)
        gb = 0.0
        loss = 0.0
        for x, y in feats:
            z = br + x @ wr
            p = 1.0 / (1.0 + math.exp(-z))
            loss += math.log1p(math.exp(-z)) + (1 - y) * z
            g += (p - y) * x
            gb += p - y
        wr -= lr * g / n
        br -= lr * gb / n
        hist_ref.append(loss / n)
    assert np.allclose(hist, hist_ref, rtol=0, atol=1e-9)
    assert np.allclose(w[:-1], wr, rtol=0, atol=1e-9)
    assert abs(w[-1] - br) < 1e-9


def test_hashed_score_contract(spark):
    df = spark.createDataFrame(
        [(0, "alpha beta alpha"), (1, None), (2, "")],
        "doc_id long, text string")
    dim = 1 << 8
    slot = {r["t"]: r["s"] for r in spark.createDataFrame(
        [("alpha",), ("beta",)], "t string").select(
        "t", clf.hash_slot(F.col("t"), dim).alias("s")).collect()}
    wv = np.zeros(dim + 1)
    wv[slot["alpha"]] = 3.0
    wv[slot["beta"]] = -1.0
    wv[-1] = 0.5  # bias
    got = {r["doc_id"]: r["score"]
           for r in clf.hashed_text_score(df, wv).collect()}
    assert got[0] == round(0.5 + (3.0 + (-1.0) + 3.0) / 3, 6)
    assert got[1] is None
    assert got[2] == 0.5  # zero tokens: bias only
    # dict-weights path needs explicit dim; vector disagreement raises
    with pytest.raises(ValueError, match="dim"):
        clf.hashed_text_score(df, {0: 1.0})
    with pytest.raises(ValueError, match="dim"):
        clf.hashed_text_score(df, wv, dim=dim + 5)
    with pytest.raises(ValueError, match="hash_fn"):
        clf.hash_slot(F.col("t"), 16, "sha9")
    # md5 mode slot matches the documented engine-portable arithmetic
    import hashlib
    s = spark.createDataFrame([("alpha",)], "t string").select(
        clf.hash_slot(F.col("t"), dim, "md5").alias("s")).first()["s"]
    assert s == int(hashlib.md5(b"alpha").hexdigest()[:15], 16) % dim


def test_classifier_input_validation(spark):
    df = _labeled(spark, n=6)
    with pytest.raises(ValueError, match="epochs"):
        clf.train_quality_classifier(df, epochs=0)
    empty = df.filter("label IS NULL")
    with pytest.raises(ValueError, match="no labeled rows"):
        clf.train_quality_classifier(empty, dim=64, epochs=1)


# ----------------------------------------------------------- normalize_text

from bioframe_spark.datapipe import text as tx


def test_normalize_text(spark):
    df = spark.createDataFrame(
        [(0, "  Hello\t\tWorld\x00\x1f  "), (1, "école  CAFÉ"),
         (2, None), (3, ""), (4, "a\x0bb")],
        "doc_id long, text string")
    out = {r["doc_id"]: r["text"]
           for r in tx.normalize_text(df, lowercase=True).collect()}
    assert out[0] == "hello world"
    # NFC composes e + combining acute into é; case preserved sans lower
    assert out[1] == "école café"
    assert out[2] is None and out[3] == ""
    assert out[4] == "a b"  # \x0b is whitespace in BOTH engines' class
    acc = {r["doc_id"]: r["text"]
           for r in tx.normalize_text(df, lowercase=True,
                                      strip_accents=True).collect()}
    assert acc[1] == "ecole cafe"
    # output_col keeps the original column
    kept = tx.normalize_text(df, output_col="clean").collect()
    assert {r["doc_id"]: r["text"] for r in kept}[1] == "école  CAFÉ"
    # pure-JVM plan when the unicode steps are off
    plan = tx.normalize_text(df, nfc=False) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


# ----------------------------------------------------- quality at ingest

def test_stream_quality_score_matches_batch(spark, tmp_path):
    """The streaming-legal reformulation (JVM slot arrays + stateless
    Arrow kernel) must be BIT-identical to the batch broadcast-join op —
    same double chain, batch-frame and live-stream both."""
    from bioframe_spark.streaming import stream_ops

    docs = _labeled(spark, n=30).drop("label")
    rng = np.random.default_rng(11)
    dim = 1 << 10
    wv = np.zeros(dim + 1)
    wv[rng.integers(0, dim, 50)] = rng.normal(size=50)
    wv[-1] = -0.2
    batch = {r["doc_id"]: r["score"]
             for r in clf.hashed_text_score(docs, wv).collect()}
    same = {r["doc_id"]: r["score"]
            for r in stream_ops.stream_quality_score(docs, wv).collect()}
    assert batch == same  # bit-exact, not approximately
    # null text -> null score -> null keep
    edge = spark.createDataFrame([(1, None), (2, "")],
                                 "doc_id long, text string")
    rows = {r["doc_id"]: (r["score"], r["keep"]) for r in
            stream_ops.stream_quality_score(edge, wv,
                                            threshold=0.0).collect()}
    assert rows[1] == (None, None)
    assert rows[2] == (round(float(wv[-1]), 6), False)
    # live: availableNow over 2 chunk files == batch
    src = str(tmp_path / "sq_src")
    docs.filter("doc_id % 2 = 0").coalesce(1).write.parquet(f"{src}/f0")
    docs.filter("doc_id % 2 = 1").coalesce(1).write.parquet(f"{src}/f1")
    stream = (spark.readStream.schema("doc_id long, text string")
              .option("maxFilesPerTrigger", "1").parquet(src + "/*"))
    got = []
    q = (stream_ops.stream_quality_score(stream, wv).writeStream
         .foreachBatch(lambda bdf, _b: got.extend(
             (r["doc_id"], r["score"]) for r in bdf.collect()))
         .outputMode("append").trigger(availableNow=True).start())
    assert q.awaitTermination(120)
    q.stop()
    assert dict(got) == batch
    # weight-shape validation mirrors the batch op
    with pytest.raises(ValueError, match="dim"):
        stream_ops.stream_quality_score(docs, {0: 1.0})


# ------------------------------------------------------------- property fuzz

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_texty = st.lists(
    st.one_of(st.text(alphabet="ab1 \t\n\x0b\x00é.É,-", max_size=30),
              st.text(max_size=20), st.none()),
    min_size=1, max_size=6)


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(texts=_texty)
def test_normalize_idempotent(spark, texts):
    """normalize ∘ normalize == normalize (every step is a projection
    onto its own fixed point: NFC, accent strip, case fold, single
    spaces, no stripped controls)."""
    df = spark.createDataFrame(list(enumerate(texts)),
                               "doc_id long, text string")
    once = tx.normalize_text(df, lowercase=True, strip_accents=True)
    twice = tx.normalize_text(once, lowercase=True, strip_accents=True)
    a = {r["doc_id"]: r["text"] for r in once.collect()}
    b = {r["doc_id"]: r["text"] for r in twice.collect()}
    assert a == b


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(texts=st.lists(st.text(alphabet="abcde 123.,", max_size=50),
                      min_size=1, max_size=5),
       n_merges=st.integers(min_value=0, max_value=15))
def test_bpe_encode_lossless_fuzz(spark, texts, n_merges):
    """Reconstruction invariant under arbitrary corpora and merge
    counts: concatenated tokens minus end-of-word markers == the
    pre-tokenized words, for every doc."""
    import re
    from bioframe_spark.datapipe.ranking import TOKEN_SPLIT_RE

    df = spark.createDataFrame(list(enumerate(texts)),
                               "doc_id long, text string")
    merges = tokenize.bpe_train(df, n_merges=n_merges, min_freq=1)
    out = {r["doc_id"]: r for r in tokenize.bpe_encode(df, merges).collect()}
    for i, t in enumerate(texts):
        words = [w for w in re.split(TOKEN_SPLIT_RE, t.lower()) if w]
        assert "".join(out[i]["tokens"]).replace("</w>", "") == \
            "".join(words), (t, out[i]["tokens"])
        assert out[i]["n_tokens"] == len(out[i]["tokens"])


def test_bpe_save_load_roundtrip(spark, tmp_path):
    """Persisted merge table encodes identically to the in-memory one
    (train once, encode forever — same contract as the other persisted
    layouts)."""
    docs = _sennrich_corpus(spark)
    merges = tokenize.bpe_train(docs, n_merges=5, min_freq=1)
    path = str(tmp_path / "bpe")
    tokenize.save_bpe(merges, path)
    a = {r["doc_id"]: tuple(r["tokens"])
         for r in tokenize.bpe_encode(docs, merges).collect()}
    b = {r["doc_id"]: tuple(r["tokens"])
         for r in tokenize.bpe_encode(docs, path).collect()}
    assert a == b


def test_incremental_dedup_loop(spark, tmp_path):
    """The full increment: cross-index dups dropped, within-batch dups
    resolved to the min-id member, survivors appended so the NEXT
    identical batch is fully rejected. The result is localCheckpointed
    BEFORE the append (its plan reads the very files the append
    rewrites — without the barrier a re-evaluation would match every
    survivor to its own fresh signature and return empty; this test
    re-collects after the append to pin that)."""
    base = ("spark shuffles partition data across executors when keys "
            "move between stages and catalyst plans the exchange ")
    old = spark.createDataFrame(
        [(i, base + f"indexed variant {i}") for i in range(10)],
        "doc_id long, text string")
    path = str(tmp_path / "inc")
    dedup.build_minhash_index(old, path, num_hashes=16, bands=4)
    batch = spark.createDataFrame(
        [(100, base + "indexed variant 3"),          # dup of indexed
         (101, base + "fresh text about parquet"),   # batch-dup pair...
         (102, base + "fresh text about parquet"),   # ...keep min id 101
         (103, "completely unrelated short doc about gardening and soil "
               "quality in raised beds with compost")],
        "doc_id long, text string")
    kept = dedup.incremental_dedup(batch, path, threshold=0.8)
    ids = sorted(r["doc_id"] for r in kept.collect())
    assert ids == [101, 103], ids
    # SECOND action on the same result, after the append: must still
    # read [101, 103], not re-evaluate into self-matches
    assert sorted(r["doc_id"] for r in kept.collect()) == [101, 103]
    # survivors are indexed now: the same batch again is fully rejected
    # (same ids re-submitted = duplicates of their own index entries)
    again = dedup.incremental_dedup(batch, path, threshold=0.8,
                                    update=False)
    assert again.count() == 0


def test_closest_point_at_int64_max(spark):
    """Regression (hypothesis r8 falsifier): a point at INT64_MAX must
    report its true distance, not 0 — the cogroup kernel's neighbor
    rank encoding (dist + 1) and the overlap sweep's point rewrite
    (end + 1) both wrapped at the int64 edge. The binned strategy was
    already correct; all three must agree."""
    import bioframe_spark as bf

    I64 = (1 << 63) - 1
    a = spark.createDataFrame(
        [("chr1", I64, I64), ("chr2", I64 - 260, I64 - 49)],
        "chrom string, start long, end long")
    b = spark.createDataFrame([("chr1", 0, 0), ("chr1", 0, 0)],
                              "chrom string, start long, end long")

    def canon(df):
        return sorted(tuple(r) for r in df.collect())

    cog = canon(bf.closest(a, b, strategy="cogroup", suffixes=("", "_b")))
    binned = canon(bf.closest(a, b, strategy="binned", suffixes=("", "_b")))
    assert cog == binned
    d = [r[-1] for r in cog if r[0] == "chr1" and r[3] is not None]
    assert d == [I64], cog
    # identical points at the edge still OVERLAP (distance 0) — the
    # rank-compressed sweep keeps the point rewrite without ends+1
    p = spark.createDataFrame([("chr1", I64, I64)],
                              "chrom string, start long, end long")
    both = canon(bf.closest(p, p.select("*"), strategy="cogroup",
                            suffixes=("", "_b")))
    assert both[0][-1] == 0, both
    # second falsifier: the BINNED ladder's padded probe window is
    # half-open and its end saturates at INT64_MAX, so a df2 POINT at
    # the edge was unreachable — the nearest neighbor of (I64-500)
    # must be the edge point at distance 500, not the origin points
    a2 = spark.createDataFrame([("chr1", I64 - 500, I64 - 500)],
                               "chrom string, start long, end long")
    b2 = spark.createDataFrame(
        [("chr1", 0, 0), ("chr1", 0, 0), ("chr1", I64, I64)],
        "chrom string, start long, end long")
    for strat in ("cogroup", "binned"):
        got = canon(bf.closest(a2, b2, strategy=strat,
                               suffixes=("", "_b")))
        assert got == [("chr1", I64 - 500, I64 - 500,
                        "chr1", I64, I64, 500)], (strat, got)
