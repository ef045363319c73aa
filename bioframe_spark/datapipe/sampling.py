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

from pyspark.sql import Column, DataFrame, Window
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


def cap_per_group(
    df: DataFrame,
    n,
    group_col: str = "domain",
    key_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """At most ``n`` rows per group — deterministic uniform
    without-replacement (keep the n smallest key hashes), the
    RefinedWeb/C4-style per-domain cap that stops one hot site from
    dominating a corpus.

    ``n``: an int (same cap everywhere) or a dict {group value: cap}
    with ints (groups absent from the dict are uncapped).

    Scale shape — skew-safe two-phase top-n: a hot group (one domain =
    30% of the crawl) would serialize a single rank window, so phase 1
    ranks within (group, scan partition) — the salt spreads the hot
    group over its scan parallelism and keeps ≤ n rows per salt, a
    SUPERSET of the global top-n under any partitioning (each of the
    true top-n beats all but ≤ n-1 rows globally, hence ranks ≤ n in
    its own salt) — and phase 2 ranks the pruned (n × #salts bounded)
    survivors per group exactly. Result is independent of the physical
    partitioning; ties beyond the 60-bit hash break on the key itself.

    Rows with a NULL group value form one group like any other (they
    are capped together) — pre-filter them if unparsed domains should
    pass uncapped.
    """
    salt = F.spark_partition_id()
    h = _key_hash60(F.col(key_col), seed)
    if isinstance(n, dict):
        pairs = []
        for k, cap in sorted(n.items()):
            if int(cap) < 0:
                raise ValueError(f"cap must be >= 0, got {cap} for {k!r}")
            pairs.append(F.lit(k))
            pairs.append(F.lit(int(cap)))
        cap_col = F.coalesce(F.create_map(*pairs)[F.col(group_col)],
                             F.lit(None).cast("int"))
        max_cap = max([int(c) for c in n.values()], default=0)
    else:
        if int(n) < 0:
            raise ValueError(f"n must be >= 0, got {n}")
        cap_col = F.lit(int(n))
        max_cap = int(n)
    w1 = Window.partitionBy(F.col(group_col), salt).orderBy(
        h.asc(), F.col(key_col).asc())
    pruned = (
        df.withColumn("__cap", cap_col)
        .withColumn("__rk", F.row_number().over(w1))
        # uncapped groups (__cap null) keep everything; phase-1 prune
        # uses the LARGEST cap as the bound so dict caps stay exact
        .filter(F.col("__cap").isNull() | (F.col("__rk") <= F.lit(max_cap)))
        .drop("__rk")
    )
    w2 = Window.partitionBy(group_col).orderBy(h.asc(), F.col(key_col).asc())
    return (
        pruned.withColumn("__rk", F.row_number().over(w2))
        .filter(F.col("__cap").isNull() | (F.col("__rk") <= F.col("__cap")))
        .drop("__rk", "__cap")
    )


def sample_to_mixture(
    df: DataFrame,
    shares: dict,
    strata_col: str = "source",
    key_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """EXACT-count downsampling to a target mixture: keep
    ``round(share_g * T)`` rows of stratum g, where ``T = min_g
    floor(n_g / share_g)`` is the largest total the data supports
    (the scarcest stratum is kept ~whole; everything else downsampled
    to match its proportion). The per-stratum keep set is the
    smallest-hash top-k — deterministic, reproducible from the seed,
    and exact in COUNT (unlike Bernoulli hash-threshold sampling,
    whose realized mixture wobbles by ±sqrt(n)).

    Strata present in the data but absent from ``shares`` are DROPPED
    (a mixture is a closed recipe). One tiny count aggregate decides
    the caps driver-side; the selection itself is the skew-safe
    :func:`cap_per_group` two-phase top-n.
    """
    tot = sum(shares.values())
    if not shares or abs(tot - 1.0) > 1e-9:
        raise ValueError(f"shares must sum to 1, got {tot}")
    # filter to the recipe's strata BEFORE the collect: the recipe keys
    # bound the driver materialization, the raw group count does not (a
    # high-cardinality strata column would otherwise collect one row per
    # distinct value)
    counts = {
        r["g"]: r["n"]
        for r in df.filter(F.col(strata_col).isin(*list(shares)))
        .groupBy(F.col(strata_col).alias("g"))
        .agg(F.count(F.lit(1)).alias("n")).collect()
    }
    missing = [g for g in shares if shares[g] > 0 and counts.get(g, 0) == 0]
    if missing:
        raise ValueError(f"strata with share > 0 but no rows: {missing}")
    # exact rational arithmetic (r5 ADVICE): float division diverges
    # from exact floor at boundaries (30/0.3 == 99.999... -> 99, while
    # DuckDB's decimal division gives 100), breaking engine
    # reproducibility exactly when a stratum count is a whole multiple
    # of a non-binary-representable share. Fraction(str(s)) parses the
    # share's decimal literal, matching SQL decimal semantics.
    from fractions import Fraction
    total = min(int(Fraction(counts[g]) / Fraction(str(s)))
                for g, s in shares.items() if s > 0)
    # half-UP rounding (not Python's banker's round): matches SQL ROUND
    # so the recipe is reproducible in any engine
    caps = {g: int(Fraction(str(s)) * total + Fraction(1, 2))
            for g, s in shares.items()}
    kept = df.filter(F.col(strata_col).isin(*list(shares)))
    return cap_per_group(kept, caps, group_col=strata_col,
                         key_col=key_col, seed=seed)


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
