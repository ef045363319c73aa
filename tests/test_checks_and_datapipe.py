"""Tests: validation predicate queries + datapipe (dedup/similarity/text/
multimodal) + streaming ops in batch mode."""

import pytest
from helpers import ivals

import bioframe_spark as bf
from bioframe_spark.core import checks
from bioframe_spark.datapipe import dedup, multimodal, similarity, text


def test_is_bedframe(spark):
    ok = ivals(spark, [("chr1", 0, 5), (None, None, None)])
    assert checks.is_bedframe(ok)
    bad_order = ivals(spark, [("chr1", 5, 0)])
    assert not checks.is_bedframe(bad_order)
    bad_null = ivals(spark, [("chr1", None, 5)])
    assert not checks.is_bedframe(bad_null)


def test_is_viewframe_and_overlapping(spark):
    view = spark.createDataFrame(
        [("chr1", 0, 10, "r1"), ("chr1", 10, 20, "r2")],
        "chrom string, start long, end long, name string",
    )
    assert checks.is_viewframe(view)
    assert not checks.is_overlapping(view)
    over = ivals(spark, [("chr1", 0, 10), ("chr1", 5, 15)])
    assert checks.is_overlapping(over)


def test_is_covering_contained_tiling(spark):
    view = {"chr1": 20}
    tiles = ivals(spark, [("chr1", 0, 10), ("chr1", 10, 20)])
    assert checks.is_covering(tiles, view)
    assert checks.is_tiling(tiles, bf.make_viewframe(view))
    gappy = ivals(spark, [("chr1", 0, 5)])
    assert not checks.is_covering(gappy, view)
    escaped = ivals(spark, [("chr1", 5, 25)])
    assert not checks.is_contained(escaped, bf.make_viewframe(view))


def test_is_cataloged(spark):
    df = spark.createDataFrame([("chr1", 0, 5, "r1")],
                               "chrom string, start long, end long, view_region string")
    view = spark.createDataFrame([("chr1", 0, 10, "r1")],
                                 "chrom string, start long, end long, name string")
    assert checks.is_cataloged(df, view)
    df2 = df.replace("r1", "zzz")
    assert not checks.is_cataloged(df2, view)


DOCS = [
    (1, "the cat sat on the mat today fine"),
    (2, "the cat sat on the mat today fine"),             # exact dup of 1
    (3, "the cat sat on the mat yesterday fine ok"),      # near dup
    (4, "completely different words entirely here now"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_exact_dedup(docs):
    groups = dedup.exact_duplicates(docs)
    assert groups.count() == 3
    dup = groups.filter("n_copies = 2").collect()[0]
    assert dup["rep_id"] == 1
    kept = dedup.drop_exact_duplicates(docs)
    assert sorted(r["doc_id"] for r in kept.collect()) == [1, 3, 4]


def test_jaccard_pairs(docs):
    pairs = dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.3)
    got = {(r["id1"], r["id2"]) for r in pairs.collect()}
    assert (1, 2) in got       # identical → jaccard 1
    assert (1, 3) in got or (2, 3) in got
    assert (1, 4) not in got


def test_minhash_lsh(docs):
    pairs = dedup.minhash_lsh_pairs(docs, num_hashes=16, bands=8, threshold=0.9)
    got = {(r["id1"], r["id2"]) for r in pairs.collect()}
    assert (1, 2) in got       # exact dups always collide in every band


def test_jaccard_hash_shingles_identical(docs):
    kw = dict(n=3, threshold=0.3, cache=False)
    plain = {tuple(r) for r in
             dedup.ngram_jaccard_pairs(docs, **kw).collect()}
    hashed = {tuple(r) for r in
              dedup.ngram_jaccard_pairs(docs, hash_shingles=True,
                                        **kw).collect()}
    assert plain == hashed and plain


def test_minhash_lsh_rejoin_mode_identical(docs):
    # the narrow-bucket-join + signature-rejoin scale path must return
    # the exact same scored pairs as the carry-signatures default
    kw = dict(num_hashes=16, bands=4, threshold=0.3)
    carry = {tuple(r) for r in
             dedup.minhash_lsh_pairs(docs, **kw).collect()}
    rejoin = {tuple(r) for r in
              dedup.minhash_lsh_pairs(docs, rejoin_signatures=True,
                                      **kw).collect()}
    assert carry == rejoin and carry


def test_simhash(docs):
    sig = dedup.simhash(docs)
    vals = {r["doc_id"]: r["simhash"] for r in sig.collect()}
    assert vals[1] == vals[2]
    pairs = dedup.simhash_dup_pairs(docs, max_hamming=0)
    got = {(r["id1"], r["id2"]) for r in pairs.collect()}
    assert got == {(1, 2)}


def test_text_features(docs):
    out = text.quality_features(docs)
    r = {x["doc_id"]: x for x in out.collect()}
    assert r[1]["n_tokens"] == 8
    assert r[1]["n_stopwords"] == 2      # 'the' twice
    assert r[1]["lang_pred"] == "en"
    assert r[4]["n_stopwords"] == 0 and r[4]["lang_pred"] == "unk"


def test_cosine_topk(spark):
    rows_ = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0]),
        (2, [0.0, 1.0, 0.0]),
        (3, [-1.0, 0.0, 0.0]),
    ]
    emb = spark.createDataFrame(rows_, "vec_id long, embedding array<float>")
    out = similarity.cosine_topk(emb.filter("vec_id = 0"), emb, k=3)
    ranked = [r["neighbor_id"] for r in out.orderBy("rank").collect()]
    assert ranked == [1, 2, 3]


def test_multimodal_features(spark):
    rows_ = [
        (1, "image", bytearray(b"abcdef"), (4, 4, None, "fake")),
        (2, "video", bytearray(b"xyz"), (4, 4, 5000, "fake")),
    ]
    df = spark.createDataFrame(rows_, multimodal.MEDIA_SCHEMA)
    feats = multimodal.extract_features(df)
    got = {r["media_id"]: r for r in feats.collect()}
    assert len(got[1]["feature"]) == 8
    assert got[1]["n_bytes"] == 6
    plan = multimodal.frame_sample_plan(df, every_ms=1000)
    assert plan.count() == 5


def test_stream_ops_batch_semantics(spark):
    # streaming transformations are plan-compatible with batch frames —
    # verify the aggregation logic on a static frame
    from bioframe_spark.streaming import stream_ops

    iv = ivals(spark, [("chr1", 0, 25), ("chr1", 30, 35)])
    out = stream_ops.stream_binnify_counts(iv, bin_size=10)
    got = {(r["chrom"], r["start"]): r["n"] for r in out.collect()}
    assert got == {("chr1", 0): 1, ("chr1", 10): 1, ("chr1", 20): 1, ("chr1", 30): 1}

    ann = ivals(spark, [("chr1", 20, 40)])
    joined = stream_ops.stream_overlap_static(iv, ann)
    assert joined.filter("chrom_ann is not null").count() == 2


def test_ivf_topk(spark):
    rows_ = [(i, [float(i == j) for j in range(4)]) for i in range(4)]
    rows_ += [(10, [0.95, 0.05, 0.0, 0.0])]
    emb = spark.createDataFrame(rows_, "vec_id long, embedding array<float>")
    out = similarity.ivf_topk(emb.filter("vec_id = 0"), emb, k=1,
                              n_centroids=4, n_probe=4)
    assert [r["neighbor_id"] for r in out.collect()] == [10]


def test_select_mask_and_indices(spark):
    from helpers import ivals

    d = ivals(spark, [("chr1", 0, 5), ("chr1", 10, 20), ("chr2", 0, 5)])
    m = bf.select_mask(d, "chr1:0-6")
    got = {(r["chrom"], r["start"]): r["mask"] for r in m.collect()}
    assert got == {("chr1", 0): True, ("chr1", 10): False, ("chr2", 0): False}
    idx = bf.select_indices(d, "chr1:0-6")
    assert [r["index"] for r in idx.collect()] == [0]


def test_sessionize_batch(spark):
    from bioframe_spark.datapipe import events as ev_ops

    rows_ = [(1, 0), (1, 50), (1, 500), (2, 10), (1, 50)]  # dup ts for user 1
    ev = spark.createDataFrame(rows_, "user_id long, ts_ms long")
    out = ev_ops.sessionize_batch(ev, gap_ms=100)
    got = sorted((r["user_id"], r["session_start"], r["session_end"], r["n_events"])
                 for r in out.collect())
    assert got == [(1, 0, 50, 3), (1, 500, 500, 1), (2, 10, 10, 1)]


def test_simhash_blocking_recall_vs_bruteforce(spark):
    """Pigeonhole guarantee: blocked pairs == brute-force pairs at the
    requested max_hamming (recall must be exact, not approximate)."""
    import pyspark.sql.functions as F

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for mh in (2, 6):
        got = {(r["id1"], r["id2"])
               for r in dedup.simhash_dup_pairs(docs, max_hamming=mh).collect()}
        sig = dedup.simhash(docs)
        a = sig.select(F.col("doc_id").alias("id1"), F.col("simhash").alias("h1"))
        b = sig.select(F.col("doc_id").alias("id2"), F.col("simhash").alias("h2"))
        brute = (
            a.crossJoin(b).filter("id1 < id2")
            .withColumn("hamming", F.bit_count(F.col("h1").bitwiseXOR(F.col("h2"))))
            .filter(F.col("hamming") <= mh)
        )
        want = {(r["id1"], r["id2"]) for r in brute.collect()}
        assert got == want, f"max_hamming={mh}: {len(got)} vs {len(want)}"


def test_simhash_max_hamming_bounds():
    import pytest as _pytest

    with _pytest.raises(ValueError):
        dedup.simhash_dup_pairs(None, max_hamming=32)
    with _pytest.raises(ValueError):
        dedup.simhash_dup_pairs(None, max_hamming=-1)


def test_embedding_dup_pairs_matches_bruteforce(spark):
    """Block-pair self-join == local brute force (exact, each pair once)."""
    import numpy as np

    from bioframe_spark.datapipe import similarity

    rng = np.random.default_rng(11)
    n, dim = 400, 16
    base = rng.normal(size=(n, dim))
    # plant near-dups: vectors 0..19 get a tiny-noise twin at id 1000+i
    rows = [(i, [float(x) for x in base[i]]) for i in range(n)]
    rows += [(1000 + i, [float(x) for x in base[i] + rng.normal(scale=0.01, size=dim)])
             for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    for nb in (1, 3, 8):
        got = {(r["id1"], r["id2"]) for r in
               similarity.embedding_dup_pairs(df, threshold=0.95,
                                              num_blocks=nb).collect()}
        # brute force with the same quantized math
        q = np.round(np.stack([np.asarray(v, dtype=np.float64) for _, v in rows])
                     * 1000).astype(np.int64)
        ids = np.array([i for i, _ in rows], dtype=np.int64)
        norms = np.sqrt((q * q).sum(axis=1).astype(np.float64))
        cos = (q @ q.T).astype(np.float64) / (norms[:, None] * norms[None, :])
        ii, jj = np.where((cos >= 0.95) & (ids[:, None] < ids[None, :]))
        want = set(zip(ids[ii].tolist(), ids[jj].tolist()))
        assert got == want, f"num_blocks={nb}: {len(got)} vs {len(want)}"
        assert len(got) >= 20   # the planted twins must all be found


def test_embedding_dup_pairs_is_lazy(spark):
    """No driver-side collect at plan-build time: building the plan against
    a corpus must not trigger a Spark job (the old implementation ran
    toPandas() on the full corpus inside the function call)."""
    from bioframe_spark.datapipe import similarity

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    tracker = spark.sparkContext.statusTracker()
    before = tracker.getJobIdsForGroup(None)
    plan = similarity.embedding_dup_pairs(emb, threshold=0.5)
    after = tracker.getJobIdsForGroup(None)
    assert before == after          # plan construction launched no job
    assert plan.count() >= 0        # and it still executes


def test_is_sorted_distributed(spark):
    # sorted frame across 10 partitions: repartitionByRange preserves a
    # global sort (range partitioner + within-partition sort)
    rows = [("chr%d" % (i // 40 + 1), i % 40 * 10, i % 40 * 10 + 5)
            for i in range(120)]
    df = ivals(spark, sorted(rows)).repartitionByRange(
        10, "chrom", "start", "end"
    ).sortWithinPartitions("chrom", "start", "end")
    assert checks.is_sorted(df)
    # same data hash-shuffled: partition boundaries interleave -> not sorted
    shuffled = df.repartition(10, "start")
    assert not checks.is_sorted(shuffled)
    # in-partition violation
    one = ivals(spark, [("chr1", 5, 6), ("chr1", 0, 1)]).coalesce(1)
    assert not checks.is_sorted(one)
    # empty frame is sorted
    assert checks.is_sorted(ivals(spark, []).limit(0))


def test_select_labels(spark):
    from helpers import ivals

    d = ivals(spark, [("chr1", 0, 5, "a"), ("chr1", 10, 20, "b"),
                      ("chr2", 0, 5, "c")], extra=[("name", "string")])
    lab = bf.select_labels(d, "chr1:0-6", label_col="name")
    assert [r["label"] for r in lab.collect()] == ["a"]
    # default: dense canonical index doubles as the label
    lab2 = bf.select_labels(d, "chr1:0-25")
    assert sorted(r["label"] for r in lab2.collect()) == [0, 1]


def test_language_id_heuristic(spark):
    from bioframe_spark.datapipe import text as T

    rows = [
        (1, "the cat sat on the mat and it was good"),          # en
        (2, "der hund und die katze sind nicht auf dem tisch"),  # de
        (3, "les chats sont dans la maison pour vous"),          # fr
        (4, "los perros del parque corren por las calles"),      # es
        (5, "xyzzy qwerty plugh"),                               # no profile hit
        (6, ""),                                                 # empty
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r["lang_pred"]
           for r in T.language_id(df).select("doc_id", "lang_pred").collect()}
    assert out[1] == "en"
    assert out[2] == "de"
    assert out[3] == "fr"
    assert out[4] == "es"
    assert out[5] == "und"
    assert out[6] == "und"


def test_language_id_tie_breaks_by_profile_order(spark):
    from bioframe_spark.datapipe import text as T

    # "que" is in both the es and pt profiles; es precedes pt in
    # LANG_PROFILES so a pure tie must resolve to es.
    df = spark.createDataFrame([(1, "que que")], ["doc_id", "text"])
    [row] = T.language_id(df).select("lang_pred").collect()
    assert row["lang_pred"] == "es"


def test_ivf_recall_vs_bruteforce(spark):
    """IVF with generous probing must recover most of the exact top-k:
    recall@5 >= 0.6 with n_probe=half the centroids on the sf0.001
    embeddings (and =1.0 when probing every centroid, since scanning all
    inverted lists degenerates to brute force)."""
    from bioframe_spark.datapipe import similarity as sim

    corpus = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = corpus.filter("vec_id < 10")
    exact = sim.cosine_topk(queries, corpus, k=5)
    exact_pairs = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}

    full = sim.ivf_topk(queries, corpus, k=5, n_centroids=8, n_probe=8)
    full_pairs = {(r["query_id"], r["neighbor_id"]) for r in full.collect()}
    assert exact_pairs == full_pairs  # all-probe IVF == brute force

    part = sim.ivf_topk(queries, corpus, k=5, n_centroids=8, n_probe=4)
    part_pairs = {(r["query_id"], r["neighbor_id"]) for r in part.collect()}
    recall = len(part_pairs & exact_pairs) / len(exact_pairs)
    assert recall >= 0.6, recall


def test_jaccard_max_doc_freq_cutoff(spark):
    """The df-cutoff restricts Jaccard to the informative-shingle space:
    identical docs still score 1.0 (their pairs survive); docs whose
    similarity was carried ONLY by corpus-wide hot shingles stop
    pairing."""
    from bioframe_spark.datapipe import dedup as D

    rows = [(i, "the quick brown fox jumps over dog %d" % (i % 3))
            for i in range(9)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    full = {(r["id1"], r["id2"])
            for r in D.ngram_jaccard_pairs(df, n=3, threshold=0.5).collect()}
    cut = {(r["id1"], r["id2"]): r["n_union"]
           for r in D.ngram_jaccard_pairs(df, n=3, threshold=0.5,
                                          max_doc_freq=5).collect()}
    # identical docs (same %3 suffix) pair in BOTH modes; only their one
    # rare shingle survives the cutoff (n_union = 1)
    ident = {(a, b) for a in range(9) for b in range(9)
             if a < b and a % 3 == b % 3}
    assert ident <= full
    assert set(cut) == ident
    assert all(v == 1 for v in cut.values())
    # cross-group pairs shared only hot shingles → gone under the cutoff
    assert all((a, b) in ident or (a, b) not in cut for a, b in full)


def test_multimodal_resize_and_audio_chunks(spark):
    rows_ = [
        (1, "image", b"\x01\x02\x03", (4, 2, None, "png")),
        (2, "audio", b"\xff" * 10, (None, None, 12_500, "wav")),
        (3, "video", b"\x00" * 5, (8, 8, 3_000, "h264")),
    ]
    df = spark.createDataFrame(rows_, multimodal.MEDIA_SCHEMA)
    resized = {r["media_id"]: r for r in
               multimodal.resize_images(df, width=3, height=2).collect()}
    assert len(resized[1]["payload"]) == 6          # image resized to 3*2
    assert resized[1]["meta"]["width"] == 3
    assert resized[2]["payload"] == b"\xff" * 10     # audio untouched
    assert resized[3]["meta"]["width"] == 8          # video meta untouched
    chunks = multimodal.audio_chunk_plan(df, window_ms=5000).collect()
    assert [(c["chunk_idx"], c["chunk_start_ms"], c["chunk_end_ms"])
            for c in sorted(chunks, key=lambda c: c["chunk_idx"])] == [
        (0, 0, 5000), (1, 5000, 10000), (2, 10000, 12500)]


def test_sessionize_native(spark):
    from datetime import datetime

    from bioframe_spark.datapipe import events as ev_ops

    base = datetime(2026, 1, 1, 0, 0, 0)
    rows_ = [(1, base), (1, base.replace(second=10)),
             (1, base.replace(minute=5)), (2, base)]
    ev = spark.createDataFrame(rows_, "user_id long, ts timestamp")
    out = ev_ops.sessionize_native(ev, gap="30 seconds")
    got = sorted((r["user_id"], r["n_events"]) for r in out.collect())
    assert got == [(1, 1), (1, 2), (2, 1)]


def test_embedding_dup_pairs_string_ids(spark):
    """String doc ids work end-to-end (the kernel must not assume int64);
    orientation id1 < id2 uses the string's natural order."""
    from bioframe_spark.datapipe import similarity

    rows = [
        ("doc/a", [1.0, 0.0, 0.0]),
        ("doc/b", [1.0, 0.001, 0.0]),   # near-dup of doc/a
        ("doc/c", [0.0, 1.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id string, embedding array<float>")
    for nb in (1, 4):
        got = [(r["id1"], r["id2"]) for r in similarity.embedding_dup_pairs(
            df, threshold=0.99, num_blocks=nb).collect()]
        assert got == [("doc/a", "doc/b")], got



def test_connected_components_chain(spark):
    """Chain 1-2-3-4-5 (diameter 4 → multiple propagation rounds) plus an
    isolated pair; labels converge to the component minimum."""
    pairs = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (5, 4), (10, 11)], "id1 long, id2 long")
    want = [(1, 1), (2, 1), (3, 1), (4, 1), (5, 1), (10, 10), (11, 10)]
    for strategy in ("auto", "local", "loop"):
        got = sorted((r["id"], r["component"]) for r in
                     dedup.connected_components(
                         pairs, strategy=strategy).collect())
        assert got == want, strategy


def test_connected_components_empty(spark):
    pairs = spark.createDataFrame([], "id1 long, id2 long")
    assert dedup.connected_components(pairs).count() == 0


def test_drop_near_duplicates(spark):
    """One canonical (min-id) doc per component; unclustered docs kept."""
    docs = spark.createDataFrame(
        [(i, f"t{i}") for i in [1, 2, 3, 4, 5, 10, 11, 99]],
        "doc_id long, text string")
    pairs = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (5, 4), (10, 11)], "id1 long, id2 long")
    kept = sorted(r["doc_id"]
                  for r in dedup.drop_near_duplicates(docs, pairs).collect())
    assert kept == [1, 10, 99]
    # empty pair graph → everything survives
    empty = spark.createDataFrame([], "id1 long, id2 long")
    assert dedup.drop_near_duplicates(docs, empty).count() == 8


def test_deterministic_sample_stability(spark):
    """Same keys → same sample regardless of partitioning or row order;
    sampling by a group key keeps groups whole."""
    import pyspark.sql.functions as F

    from bioframe_spark.datapipe import sampling

    rows = [(i, i % 17, f"p{i}") for i in range(500)]
    df = spark.createDataFrame(rows, "event_id long, user_id long, p string")
    s1 = {r["event_id"] for r in
          sampling.deterministic_sample(df, 0.4, key_col="event_id",
                                        seed=1).collect()}
    s2 = {r["event_id"] for r in
          sampling.deterministic_sample(df.repartition(7).orderBy("p"), 0.4,
                                        key_col="event_id", seed=1).collect()}
    assert s1 == s2 and 0 < len(s1) < 500
    # group-stable: every user's events all kept or all dropped
    by_user = sampling.deterministic_sample(df, 0.5, key_col="user_id", seed=2)
    per_user = {r["user_id"]: r["n"] for r in
                by_user.groupBy("user_id").agg(
                    F.count("*").alias("n")).collect()}
    full = {r["user_id"]: r["n"] for r in
            df.groupBy("user_id").agg(F.count("*").alias("n")).collect()}
    assert all(per_user[u] == full[u] for u in per_user)
    # different seed → different sample
    s3 = {r["event_id"] for r in
          sampling.deterministic_sample(df, 0.4, key_col="event_id",
                                        seed=99).collect()}
    assert s1 != s3


def test_stratified_sample_and_split(spark):
    import pyspark.sql.functions as F

    from bioframe_spark.datapipe import sampling

    rows = [(i, "a" if i < 400 else "b", "x") for i in range(600)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = sampling.stratified_sample(df, {"a": 1.0, "b": 0.0},
                                     strata_col="source", key_col="doc_id")
    got = out.groupBy("source").count().collect()
    assert {(r["source"], r["count"]) for r in got} == {("a", 400)}
    # default_fraction covers unknown strata
    none_kept = sampling.stratified_sample(df, {}, strata_col="source",
                                           key_col="doc_id",
                                           default_fraction=0.0)
    assert none_kept.count() == 0
    # split: total partition, val fraction in a loose band, deterministic
    sp = sampling.train_val_split(df, 0.25, key_col="doc_id", seed=4)
    counts = {r["split"]: r["n"] for r in
              sp.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert counts.get("val", 0) + counts.get("train", 0) == 600
    assert 0.15 * 600 < counts["val"] < 0.35 * 600


def test_minhash_signatures_match_explode_groupby(spark):
    """The map-only signature projection (array_min over per-seed
    transforms) is value-identical to the explode+groupBy formulation it
    replaced, for BOTH hash modes — this pins the HOF lambda arity (a
    2-param lambda would silently bind the element index as the seed)."""
    import pyspark.sql.functions as F

    from bioframe_spark.datapipe import dedup

    docs = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, "a b c x y z w"), (3, "q r"),
         (4, "one two three four five")],
        "doc_id long, text string")
    for hash_fn in ("xxhash64", "md5"):
        got = {r["doc_id"]: list(r["signature"])
               for r in dedup.minhash_signatures(
                   docs, num_hashes=8, n=3, hash_fn=hash_fn).collect()}
        # reference formulation: explode shingles, per-seed min aggregates
        sh = dedup.word_shingles(docs, n=3)
        if hash_fn == "md5":
            sh = sh.withColumn("__h", dedup._md5_base31(F.col("shingle")))
            mins = []
            for i in range(8):
                a, b = dedup._uhash_params(i)
                mins.append(F.min((F.col("__h") * F.lit(a) + F.lit(b))
                                  % F.lit(dedup._UHASH_M)).alias(f"h{i}"))
        else:
            mins = [F.min(F.xxhash64(F.col("shingle"), F.lit(i))).alias(f"h{i}")
                    for i in range(8)]
        want = {r["doc_id"]: [r[f"h{i}"] for i in range(8)]
                for r in sh.groupBy("doc_id").agg(*mins).collect()}
        assert got == want, hash_fn
        assert 3 not in got  # "q r" has no 3-shingle → no signature row


def test_simhash_matches_explode_groupby(spark):
    """Map-only simhash == the ±1-vote explode+groupBy formulation it
    replaced, for both hash modes."""
    import pyspark.sql.functions as F

    from bioframe_spark.datapipe import dedup
    from bioframe_spark.datapipe.text import tokens

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").limit(200)
    for hash_fn, bits in (("xxhash64", 64), ("md5", 60)):
        got = {r["doc_id"]: r["simhash"] for r in
               dedup.simhash(docs, bits=bits, hash_fn=hash_fn).collect()}
        tok = docs.select(
            "doc_id",
            F.explode(F.array_distinct(tokens(F.col("text")))).alias("tok"),
        ).withColumn(
            "h",
            F.xxhash64("tok") if hash_fn == "xxhash64"
            else dedup._seeded_hash(F.col("tok"), 0, hash_fn),
        )
        votes = tok.groupBy("doc_id").agg(*[
            F.sum(F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1,
                         1).otherwise(-1)).alias(f"b{i}")
            for i in range(bits)
        ])
        expr = F.lit(0).cast("long")
        for i in range(bits):
            expr = expr + F.when(
                F.col(f"b{i}") > 0,
                F.shiftleft(F.lit(1).cast("long"), i)).otherwise(
                F.lit(0).cast("long"))
        want = {r["doc_id"]: r["s"] for r in
                votes.select("doc_id", expr.alias("s")).collect()}
        assert got == want, hash_fn


def test_curate_corpus(spark):
    """Pipeline composition: quality gate drops short docs, exact dedup
    keeps min-id, near-dups resolve to one canonical doc, every survivor
    gets a split tag."""
    from bioframe_spark.datapipe.pipeline import curate_corpus

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (1, base),                         # canonical
        (2, base),                         # exact dup of 1 → dropped
        (3, base + " extra"),              # near dup of 1 → dropped
        (4, "totally different words here all unique tokens appear once ok"),
        (5, "too short"),                  # fails min_tokens → dropped
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = curate_corpus(docs, min_tokens=5, jaccard_threshold=0.5,
                        val_fraction=0.5, seed=1)
    got = {r["doc_id"]: r["split"] for r in out.collect()}
    assert set(got) == {1, 4}
    assert all(s in ("train", "val") for s in got.values())
