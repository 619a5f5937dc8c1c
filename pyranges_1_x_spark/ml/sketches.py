"""Deterministic distributed sketches for corpus statistics.

``approx_count_distinct`` (HyperLogLog++) is the built-in answer for
distinct counts at scale, but its estimate is implementation-defined — no
other engine reproduces it, so it cannot be value-gated and two pipeline
runs on different engines disagree. The K-minimum-values sketch
(Bar-Yossef et al., RANDOM'02) trades that away: the sketch IS the k
smallest distinct hash values, a set-valued statistic any engine computes
identically, and the estimator ``(k-1) * H / h_k`` (hash space ``H``,
k-th smallest ``h_k``) has relative error ~1/sqrt(k-2).

Scale shape: one distinct-projection (map-side combinable), then k-smallest
via two chained row_number windows — first per (group, hash-salt bucket)
so no single task sorts a whole group, then per group over the <=
``k * n_buckets`` bucket survivors. Sort-based windows spill; nothing
holds a group in memory. The sketch merges by construction (k smallest of
a union = k smallest of per-part k-smallest), which is what phase 2 is.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pyranges_1_x_spark.ml.dedup import md5_hash64

#: md5_hash64 yields uniform values in [0, 2^60).
_HASH_SPACE = float(2**60)


def kmv_distinct(
    df: DataFrame,
    group_cols: list[str] | str,
    value_col: str,
    *,
    k: int = 64,
    n_buckets: int = 64,
    hash_fn=md5_hash64,
) -> DataFrame:
    """Per-group distinct-count estimate of ``value_col`` via a KMV sketch.

    Returns ``(group_cols..., est_distinct, exact)``: when a group has fewer
    than ``k`` distinct values the count is exact (``exact=true``);
    otherwise ``est_distinct = floor((k-1) * 2^60 / h_k)``. Deterministic on
    any engine/partitioning — the driver oracle replays it with two
    ROW_NUMBERs.
    """
    if k < 2:
        raise ValueError("k must be >= 2")
    g = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    # Distinct the RAW (group, value) pairs before hashing, so each distinct
    # value is hashed once instead of once per occurrence. The r6 shape
    # hashed first for a narrower distinct shuffle (8-byte hash vs ~20-byte
    # shingle string); the measured check (VERDICT r6 #4) at sf0.1 with
    # ~10x token duplication: hash-first 4.7-5.8s, distinct-first 4.1-4.6s,
    # identical outputs — md5's per-row cost outweighs the extra shuffle
    # width, and the gap widens with the duplication factor. For very wide
    # values a caller can pre-hash into a surrogate column.
    d = (
        df.select(*g, F.col(value_col).alias("__v__"))
        .distinct()
        .select(*g, hash_fn(F.col("__v__")).alias("__h__"))
        .withColumn("__b__", F.pmod(F.col("__h__"), F.lit(n_buckets)))
    )
    w1 = Window.partitionBy(*g, "__b__").orderBy(F.col("__h__").asc())
    local = d.withColumn("__rn__", F.row_number().over(w1)).filter(
        F.col("__rn__") <= k
    )
    w2 = Window.partitionBy(*g).orderBy(F.col("__h__").asc())
    mins = local.withColumn("__rn2__", F.row_number().over(w2)).filter(
        F.col("__rn2__") <= k
    )
    agg = mins.groupBy(*g).agg(
        F.count(F.lit(1)).alias("__n__"), F.max("__h__").alias("__kth__")
    )
    est = F.when(F.col("__n__") < k, F.col("__n__").cast("double")).otherwise(
        F.lit(float(k - 1)) * F.lit(_HASH_SPACE) / F.col("__kth__").cast("double")
    )
    return agg.select(
        *g,
        F.floor(est).cast("long").alias("est_distinct"),
        (F.col("__n__") < k).alias("exact"),
    )
