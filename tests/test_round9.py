"""Round-9 regressions: the four r8 ADVICE defects.

1. ``incremental_dedup`` must take EVERY LSH parameter — including the
   shingle size ``n`` — from the stored index meta for its within-batch
   self-mine, not just for the probe.
2. ``ivf_topk`` / ``ivf_topk_indexed`` query-side assignment must stay
   exact (never the coarse two-level router), as the docstring promises.
3. ``stream_quality_score`` weight-table slots outside ``[0, dim)`` are
   skipped (batch broadcast-join semantics), never an IndexError and
   never a silent wrap-around write.
4. Session-memoized gate fixtures must not survive their session: a
   reused CPython ``id()`` (or a different live session) is a memo MISS.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from bioframe_spark.datapipe import classifier as clf
from bioframe_spark.datapipe import dedup, similarity


def test_incremental_dedup_within_batch_uses_stored_n(spark, tmp_path):
    """Index built with n=1 (unigram shingles): a batch pair that is
    bag-of-words-identical but trigram-disjoint must be deduped by the
    within-batch pass. Before the fix the self-mine ran at the default
    n=3 and kept both."""
    old = spark.createDataFrame(
        [(i, f"unrelated indexed corpus entry number {i} about topic {i}")
         for i in range(5)],
        "doc_id long, text string")
    path = str(tmp_path / "mh_n1")
    dedup.build_minhash_index(old, path, num_hashes=16, bands=4, n=1)
    # same word multiset, reversed order: identical unigram shingle set
    # (jaccard 1.0 at n=1) but zero common trigrams (jaccard 0 at n=3)
    batch = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta"),
         (101, "zeta epsilon delta gamma beta alpha")],
        "doc_id long, text string")
    kept = dedup.incremental_dedup(batch, path, threshold=0.9,
                                   update=False)
    assert sorted(r["doc_id"] for r in kept.collect()) == [100]


def test_ivf_query_assignment_never_coarse(spark, tmp_path, monkeypatch):
    """Force the auto-coarse threshold to 2 centroids and forbid the
    router outright (coarse=False): the query side of both ivf_topk and
    ivf_topk_indexed must not touch the coarse kernel. Before the fix
    the query-side n_probe=1 assignment defaulted to auto and engaged
    it."""
    from test_round7 import _conf

    def _boom(*a, **k):  # the coarse kernel must be unreachable
        raise AssertionError("coarse router engaged")

    monkeypatch.setattr(similarity, "_centroid_assign_coarse", _boom)
    rng = np.random.default_rng(3)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in rng.normal(size=8)]) for i in range(40)],
        "vec_id long, embedding array<double>")
    with _conf(spark, spark__bioframe__coarseAssignMinCentroids=2):
        out = similarity.ivf_topk(
            emb.filter("vec_id < 4"), emb, k=3, n_centroids=4,
            n_probe=1, train_iters=0, coarse=False)
        assert out.count() > 0
        path = str(tmp_path / "ivf")
        similarity.build_ivf_index(emb, path, n_centroids=4,
                                   train_iters=0, coarse=False)
        out2 = similarity.ivf_topk_indexed(
            emb.filter("vec_id < 4"), path, k=3, n_probe=1)
        assert out2.count() > 0


def test_stream_quality_out_of_range_slots_skipped(spark):
    """A weight table carrying slots the hash can never produce must
    score identically to the batch op (which silently never joins
    them) — in particular a negative slot must NOT write into the top
    of the dense vector."""
    from bioframe_spark.streaming import stream_ops

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "delta epsilon"), (3, None)],
        "doc_id long, text string")
    dim = 64
    # build the weight table from ACTUAL slots so the in-range part is
    # guaranteed to matter, then append junk slots
    slots = (docs.filter("text is not null")
             .select(F.explode(F.split("text", " ")).alias("t"))
             .select(clf.hash_slot(F.col("t"), dim, "xxhash64")
                     .alias("slot"))
             .distinct().collect())
    items = [(int(r["slot"]), 0.25 + 0.125 * i)
             for i, r in enumerate(slots)]
    junk = items + [(dim, 9.0), (dim + 7, -9.0), (-1, 99.0)]
    wdf_clean = spark.createDataFrame(items, "slot long, weight double")
    wdf_junk = spark.createDataFrame(junk, "slot long, weight double")
    batch = {r["doc_id"]: r["score"] for r in
             clf.hashed_text_score(docs, wdf_clean, dim=dim,
                                   bias=0.1).collect()}
    stream_clean = {r["doc_id"]: r["score"] for r in
                    stream_ops.stream_quality_score(
                        docs, wdf_clean, dim=dim, bias=0.1).collect()}
    stream_junk = {r["doc_id"]: r["score"] for r in
                   stream_ops.stream_quality_score(
                       docs, wdf_junk, dim=dim, bias=0.1).collect()}
    assert batch == stream_clean == stream_junk
    assert batch[3] is None
    # mapping weights get the same guard
    m_junk = dict(junk)
    stream_map = {r["doc_id"]: r["score"] for r in
                  stream_ops.stream_quality_score(
                      docs, m_junk, dim=dim, bias=0.1).collect()}
    assert stream_map == batch


def test_weight_df_bounded_collect(spark):
    """A corpus-sized frame passed as model weights fails loudly."""
    big = spark.range(0, 5000).select(
        F.col("id").alias("slot"), F.lit(1.0).alias("weight"))
    with pytest.raises(ValueError, match="more than dim"):
        clf.hashed_text_score(
            spark.createDataFrame([(1, "a")], "doc_id long, text string"),
            big, dim=16)


def test_session_memo_misses_on_id_reuse():
    """The fixture memo must key on session IDENTITY (weakref), not a
    reusable id(): a different object presenting the same dict key gets
    a rebuild, and a dead referent is a miss."""
    import __spark_entry__ as entry

    class S:  # stand-in session object
        pass

    s1 = S()
    built = []

    def _mk(tag):
        def _b():
            built.append(tag)
            return tag
        return _b

    key = ("t", "/sf")
    assert entry._session_memo(s1, key, _mk("one")) == "one"
    assert entry._session_memo(s1, key, _mk("dup")) == "one"  # hit
    s2 = S()  # new session, same key → rebuild, never a stale handout
    assert entry._session_memo(s2, key, _mk("two")) == "two"
    del s2  # referent gone → miss again
    assert entry._session_memo(S(), key, _mk("three")) == "three"
    assert built == ["one", "two", "three"]
    entry._STREAM_SRC.pop(key, None)
