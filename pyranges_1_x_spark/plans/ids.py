"""Deterministic row identity.

``monotonically_increasing_id`` may legally return different values when the
same logical subtree is evaluated in two plan branches, so any operator that
must re-identify a row ACROSS branches (e.g. nearest: candidates from several
sweeps joined back to the input) needs a content-derived id instead.

``with_stable_id`` attaches (hash1, hash2, dup_rank): two independently-seeded
xxhash64 hashes over every column (128 bits — collisions of *distinct* rows are
negligible even at 1e12 rows), plus a row_number within each identical-content
group to keep genuinely duplicated rows distinct. Fully deterministic: same
input multiset -> same id multiset, in every evaluation.

Cost: one shuffle on the hash pair (high cardinality — even partitioning).
Operators that stay single-branch (the binned join family) avoid this cost and
use plan-local mids instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

STABLE_ID_COLS = ["__sid1__", "__sid2__", "__sdr__"]


def with_stable_id(df: DataFrame) -> DataFrame:
    cols = [F.col(c) for c in df.columns]
    h1 = F.xxhash64(*cols, F.lit(1))
    h2 = F.xxhash64(*cols, F.lit(2))
    out = df.withColumn("__sid1__", h1).withColumn("__sid2__", h2)
    w = Window.partitionBy("__sid1__", "__sid2__").orderBy(F.lit(1))
    return out.withColumn("__sdr__", F.row_number().over(w).cast("long"))
