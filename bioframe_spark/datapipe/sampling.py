"""Deterministic sampling and splits for training-data pipelines.

Every operator here is MAP-ONLY: the keep/split decision is a pure
function of (key, seed), so there is no shuffle, no RNG state to ship,
and the result is reproducible across engines, re-runs, task retries,
and repartitioning — none of which hold for Spark's built-in
``df.sample()`` (per-partition RNG: a retried or re-split task draws a
different sample). At 100 TB that stability is not a nicety: sampling
is the FIRST stage of a mixing pipeline, and everything downstream
(dedup, splits, eval sets) must be able to reproduce it from the seed.

Mechanics: a 60-bit integer from the md5 hex prefix of ``key#seed``
(the engine-portable seeded-hash pattern of ``dedup._seeded_hash``)
is compared against ``floor(fraction * 2^60)`` — pure int64 compare,
no float rounding anywhere, bit-identical in any engine with md5
(DuckDB: ``('0x' || substring(md5(k || '#' || seed), 1, 15))::BIGINT``).

Group-stable sampling falls out for free: pass ``key_col="user_id"``
and every event of a kept user is kept — complete-history sampling,
the shape that avoids train/eval leakage through entity overlap.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HASH_SPACE = 1 << 60


def _key_hash60(col: Column, seed: int) -> Column:
    """Uniform 60-bit int from the md5 hex prefix of ``key#seed``."""
    return F.conv(
        F.substring(F.md5(F.concat(col.cast("string"), F.lit(f"#{seed}"))),
                    1, 15),
        16, 10,
    ).cast("long")


def _threshold(fraction: float) -> int:
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return int(fraction * _HASH_SPACE)


def deterministic_sample(
    df: DataFrame,
    fraction: float,
    key_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Keep rows whose key hashes under ``fraction`` of the hash space.

    Sampling by a GROUP key (user_id, domain, component id) keeps
    groups whole. Map-only: the filter rides the scan, and with parquet
    sources the surviving columns still prune/push down.
    """
    return df.filter(_key_hash60(F.col(key_col), seed)
                     < F.lit(_threshold(fraction)))


def stratified_sample(
    df: DataFrame,
    fractions: dict,
    strata_col: str = "source",
    key_col: str = "doc_id",
    seed: int = 0,
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling — the data-mixing primitive
    (e.g. keep 100% of wiki, 10% of web). ``fractions`` maps stratum
    value → fraction; strata absent from the map get
    ``default_fraction``. Thresholds ship as a literal map: still
    map-only, no join, no shuffle."""
    pairs = []
    for k, frac in sorted(fractions.items()):
        pairs.append(F.lit(k))
        pairs.append(F.lit(_threshold(frac)))
    thr = F.coalesce(
        F.create_map(*pairs)[F.col(strata_col)] if pairs else F.lit(None),
        F.lit(_threshold(default_fraction)),
    )
    return df.filter(_key_hash60(F.col(key_col), seed) < thr)


def train_val_split(
    df: DataFrame,
    val_fraction: float = 0.1,
    key_col: str = "doc_id",
    seed: int = 0,
    split_col: str = "split",
) -> DataFrame:
    """Tag each row 'val' / 'train' by key hash — disjoint by
    construction, stable under retries, and group-stable when keyed by
    an entity id. One projection, no shuffle."""
    is_val = _key_hash60(F.col(key_col), seed) < F.lit(_threshold(val_fraction))
    return df.withColumn(split_col,
                         F.when(is_val, F.lit("val")).otherwise(F.lit("train")))
