"""Similarity search over embedding columns (``array<float>``).

Baseline: brute-force cosine top-k (broadcast queries × corpus — linear
scan, one shuffle for the top-k window). Scale path: LSH bucketing by
random-hyperplane signs (deterministic, seed-hashed) so the scan touches
only matching buckets.

Determinism note: embeddings are quantized to integers (round(x*Q)) before
dot products, so accumulation order cannot perturb results — the final
cosine is a single correctly-rounded double expression, bit-identical
across engines (this is what makes the DuckDB oracle hash-match).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

QUANT = 1000


def _quantized(col, name):
    # cast to double BEFORE scaling: float*int arithmetic differs across
    # engines at round-half boundaries; double-first is engine-exact
    return F.transform(col, lambda x: F.round(x.cast("double") * QUANT).cast("long")).alias(name)


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0).cast("long"), lambda acc, v: acc + v
    )


def _norm2(a):
    return F.aggregate(a, F.lit(0).cast("long"), lambda acc, v: acc + v * v)


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Plan: broadcast the (small) query set against the corpus — a
    broadcast-nested-loop scan that parallelizes over corpus partitions —
    then per-query top-k via row_number window. Self-pairs excluded.
    Output: query_id, neighbor_id, rank (rank by cosine desc, id asc).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), _quantized(F.col(vec_col), "qv")
    ).withColumn("qn", _norm2(F.col("qv")))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _quantized(F.col(vec_col), "cv")
    ).withColumn("cn", _norm2(F.col("cv")))
    joined = F.broadcast(q).crossJoin(c).filter(F.col("query_id") != F.col("neighbor_id"))
    cos = (
        _dot(F.col("qv"), F.col("cv")).cast("double")
        / (F.sqrt(F.col("qn").cast("double")) * F.sqrt(F.col("cn").cast("double")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        joined.withColumn("cos", cos)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def embedding_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id1 < id2, cosine ≥ threshold).

    Baseline: self cross-join (id1<id2) over quantized vectors — exact, for
    corpora that fit a broadcast. Scale path: run the same predicate inside
    LSH buckets (``lsh_bucketed_topk`` machinery) so candidate generation
    is linear in bucket sizes. Output cosine is rounded to 9 digits (a
    single correctly-rounded double chain over integer sums — engine-exact).
    """
    v = df.select(
        F.col(id_col).alias("id"), _quantized(F.col(vec_col), "v")
    ).withColumn("n2", _norm2(F.col("v")))
    a = v.select(F.col("id").alias("id1"), F.col("v").alias("v1"), F.col("n2").alias("n1"))
    b = v.select(F.col("id").alias("id2"), F.col("v").alias("v2"), F.col("n2").alias("m2"))
    joined = F.broadcast(a).crossJoin(b).filter(F.col("id1") < F.col("id2"))
    cos = (
        _dot(F.col("v1"), F.col("v2")).cast("double")
        / (F.sqrt(F.col("n1").cast("double")) * F.sqrt(F.col("m2").cast("double")))
    )
    return (
        joined.withColumn("cos", cos)
        .filter(F.col("cos") >= threshold)
        .select("id1", "id2", F.round("cos", 9).alias("cos"))
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k via IVF (inverted-file) partitioning.

    Deterministic "training": centroids are the ``n_centroids`` corpus
    vectors with the smallest ids (a stand-in for k-means — the list
    structure, assignment join, and probe fan-out are the real scale
    mechanics; swapping in trained centroids changes recall, not the
    plan). Corpus vectors are assigned to their nearest centroid (one
    broadcast join + window); queries scan only their ``n_probe`` nearest
    centroid lists — at 1000× corpus scale the scan per query drops
    ~n_centroids/n_probe-fold.
    """
    cents = corpus.orderBy(id_col).limit(n_centroids).select(
        F.col(id_col).alias("cent_id"), _quantized(F.col(vec_col), "cvec")
    ).withColumn("cnorm", _norm2(F.col("cvec")))

    def assign(df, out_id, vname, nname, top):
        v = df.select(
            F.col(id_col).alias(out_id), _quantized(F.col(vec_col), vname)
        ).withColumn(nname, _norm2(F.col(vname)))
        j = v.crossJoin(F.broadcast(cents))
        cos = (
            _dot(F.col(vname), F.col("cvec")).cast("double")
            / (F.sqrt(F.col(nname).cast("double")) * F.sqrt(F.col("cnorm").cast("double")))
        )
        w = Window.partitionBy(out_id).orderBy(F.desc("ccos"), F.asc("cent_id"))
        return (
            j.withColumn("ccos", cos)
            .withColumn("crank", F.row_number().over(w))
            .filter(F.col("crank") <= top)
            .select(out_id, vname, nname, "cent_id")
        )

    c = assign(corpus, "neighbor_id", "cv", "cn", 1)
    q = assign(queries, "query_id", "qv", "qn", n_probe)
    joined = q.join(c, "cent_id").filter(F.col("query_id") != F.col("neighbor_id"))
    cos = (
        _dot(F.col("qv"), F.col("cv")).cast("double")
        / (F.sqrt(F.col("qn").cast("double")) * F.sqrt(F.col("cn").cast("double")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        joined.withColumn("cos", cos)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def lsh_bucketed_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    n_planes: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k: random-hyperplane LSH buckets + in-bucket scan.

    Hyperplanes are pseudo-random but deterministic: component j of plane p
    is ``(xxhash64(p, j) % 2001 - 1000)/1000``. A vector's bucket is the
    n_planes-bit sign pattern; queries probe only their own bucket — at
    1000× corpus scale the scan per query drops ~2^n_planes-fold.
    """
    if dim is None:
        first = corpus.select(F.size(vec_col).alias("d")).first()
        dim = first["d"]

    def bucket(vcol):
        bits = []
        for p in range(n_planes):
            comps = F.array(*[
                (F.xxhash64(F.lit(p), F.lit(j)) % 2001 - 1000).cast("double") / 1000.0
                for j in range(dim)
            ])
            proj = F.aggregate(
                F.zip_with(vcol, comps, lambda x, y: x.cast("double") * y),
                F.lit(0.0), lambda acc, v: acc + v,
            )
            bits.append(F.when(proj >= 0, F.shiftleft(F.lit(1), p)).otherwise(F.lit(0)))
        out = F.lit(0)
        for b in bits:
            out = out + b
        return out

    q = queries.select(
        F.col(id_col).alias("query_id"), _quantized(F.col(vec_col), "qv"),
        bucket(F.col(vec_col)).alias("bucket"),
    ).withColumn("qn", _norm2(F.col("qv")))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _quantized(F.col(vec_col), "cv"),
        bucket(F.col(vec_col)).alias("bucket"),
    ).withColumn("cn", _norm2(F.col("cv")))
    joined = q.join(c, "bucket").filter(F.col("query_id") != F.col("neighbor_id"))
    cos = (
        _dot(F.col("qv"), F.col("cv")).cast("double")
        / (F.sqrt(F.col("qn").cast("double")) * F.sqrt(F.col("cn").cast("double")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        joined.withColumn("cos", cos)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )
