"""Sequence preparation for LLM training: context-window chunking and
next-fit sequence packing.

Both ops are deterministic with integer-only decisions so a SQL engine
can reproduce them bit-for-bit (the correctness-gate contract every
datapipe op in this repo honors).

Scale shapes:

- ``chunk_documents`` is MAP-ONLY — a per-row higher-order expression
  (sequence -> transform -> explode). No shuffle, no UDF; a 100 TB
  corpus chunks at scan parallelism.
- ``pack_sequences`` is the inherently-sequential op (a bin's occupancy
  depends on every earlier doc), made parallel the only honest way:
  deterministic sharding (``doc_id % num_shards``), ONE shuffle to
  co-locate each shard, and an exact sequential next-fit inside each
  shard via ``applyInPandas``. Bin ids are (shard, seq) pairs, so
  shards never coordinate — at 1000 executors each shard packs
  independently and the result is reproducible row-for-row regardless
  of cluster size or partitioning (pinned by test).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import tokens


def chunk_documents(docs: DataFrame, chunk_tokens: int, overlap: int = 0,
                    text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Split each document into sliding windows of ``chunk_tokens``
    whitespace tokens with ``overlap`` tokens shared between adjacent
    chunks (the standard context-window preparation step).

    Chunk starts are ``0, s, 2s, ...`` with stride
    ``s = chunk_tokens - overlap``; a chunk is emitted for every start
    < n_tokens that begins at 0 or adds at least one new token, so the
    final (possibly short) tail is kept and no chunk is a suffix-copy
    of its predecessor. Output: id, ``chunk_id`` (0-based), ``text``
    (the chunk), ``n_tokens``. Null-text docs emit no rows.
    """
    if chunk_tokens < 1:
        raise ValueError("chunk_tokens >= 1 required")
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("0 <= overlap < chunk_tokens required")
    stride = chunk_tokens - overlap
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    # number of strides with start < n and (start == 0 or start+overlap < n)
    n_chunks = F.greatest(
        F.lit(1),
        -F.floor((F.lit(overlap) - n) / F.lit(stride)).cast("long"),  # ceil
    )
    chunk = F.explode(
        F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.struct(
                i.cast("long").alias("chunk_id"),
                F.slice(toks, i * stride + 1, chunk_tokens).alias("t"),
            ),
        )
    )
    return (
        docs.filter(F.col(text_col).isNotNull())
        .select(F.col(id_col), chunk.alias("__c"))
        .select(
            id_col,
            F.col("__c.chunk_id").alias("chunk_id"),
            F.concat_ws(" ", F.col("__c.t")).alias(text_col),
            F.size(F.col("__c.t")).cast("long").alias("n_tokens"),
        )
    )


def pack_sequences(docs: DataFrame, max_tokens: int, num_shards: int = 32,
                   text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Assign documents to training sequences by NEXT-FIT packing:
    within a shard (``id % num_shards``), docs are taken in id order and
    appended to the current sequence until the next doc would overflow
    ``max_tokens``, which starts a new sequence. A doc longer than
    ``max_tokens`` gets a sequence of its own (flagged ``oversize`` —
    chunk first with :func:`chunk_documents` if that is not wanted).

    Deterministic and partitioning-independent: the packing order is the
    id order within a deterministic shard, never the physical row order.
    Output: id, ``n_tokens``, ``shard``, ``seq`` (0-based within shard),
    ``seq_pos`` (0-based within sequence), ``oversize``.
    """
    if max_tokens < 1:
        raise ValueError("max_tokens >= 1 required")
    import pandas as pd

    base = (
        docs.filter(F.col(id_col).isNotNull() & F.col(text_col).isNotNull())
        .select(
            F.col(id_col),
            F.size(tokens(F.col(text_col))).cast("long").alias("n_tokens"),
            F.pmod(F.col(id_col), F.lit(num_shards)).cast("int").alias("shard"),
        )
    )

    schema = ("{} long, n_tokens long, shard int, seq long, seq_pos long, "
              "oversize boolean").format(id_col)

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        seqs, pos, run = [], [], 0
        seq = -1
        cur = 0
        for n in pdf["n_tokens"]:
            n = int(n)
            if seq < 0 or run + n > max_tokens:
                seq += 1
                run = 0
                cur = 0
            seqs.append(seq)
            pos.append(cur)
            run += n
            cur += 1
        pdf["seq"] = pd.Series(seqs, dtype="int64")
        pdf["seq_pos"] = pd.Series(pos, dtype="int64")
        pdf["oversize"] = pdf["n_tokens"] > max_tokens
        return pdf

    return base.groupBy("shard").applyInPandas(_pack, schema)
