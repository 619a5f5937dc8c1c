"""Deterministic sampling for training-data mixes.

Spark's ``sample``/``sampleBy`` draw from a partition-order-dependent RNG:
re-running the same pipeline (or the same query on a different cluster
layout) yields a DIFFERENT subset, which breaks reproducible training mixes
and makes incremental re-runs unstable. These operators key every keep/drop
decision on a HASH of a stable row key instead — the same rows survive on
any engine, any partitioning, any day (and DuckDB can replay the exact
arithmetic, so the driver's oracle gates them value-exactly).

Scale shape: a pure scan-time filter — no shuffle, no state, no driver
round-trips; composes with partition pruning and column pruning untouched.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pyranges_1_x_spark.ml.dedup import md5_hash64

_DENOM = 1_000_000


def hash_keep(key: Column, fraction: float, seed: int = 0, hash_fn=md5_hash64) -> Column:
    """Boolean keep-decision: ``hash(key, seed) mod 1e6 < fraction * 1e6``.
    Changing ``seed`` draws an independent subset; fractions are honored in
    expectation with deterministic membership."""
    return F.pmod(hash_fn(key, seed), F.lit(_DENOM)) < F.lit(int(fraction * _DENOM))


def hash_sample(
    df: DataFrame,
    fraction: float,
    key_col: str = "doc_id",
    seed: int = 0,
    hash_fn=md5_hash64,
) -> DataFrame:
    """Deterministic Bernoulli-by-hash sample of ``fraction`` of the rows."""
    return df.filter(hash_keep(F.col(key_col), fraction, seed, hash_fn))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    key_col: str = "doc_id",
    default: float = 0.0,
    seed: int = 0,
    hash_fn=md5_hash64,
) -> DataFrame:
    """Deterministic per-stratum sampling — the "training mix" operator:
    keep a different fraction of each stratum (source, language, quality
    band), decided by row-key hash so the mix is bit-reproducible. Strata
    absent from ``fractions`` fall back to ``default`` (0.0 = drop).

    The strata->threshold table rides along as a literal MAP expression
    (strata counts are small); the plan is a single filtered scan.
    """
    pairs: list[Column] = []
    for s, f in fractions.items():
        pairs += [F.lit(s), F.lit(int(f * _DENOM))]
    thresh = (
        F.coalesce(
            F.create_map(*pairs)[F.col(strata_col)],
            F.lit(int(default * _DENOM)),
        )
        if pairs
        else F.lit(int(default * _DENOM))
    )
    return df.filter(F.pmod(hash_fn(F.col(key_col), seed), F.lit(_DENOM)) < thresh)
