"""Scalable ordered prefix sweep — two-phase cumulative aggregation.

A plain ``Window.partitionBy(Chromosome).orderBy(pos)`` puts a whole
chromosome in ONE task: fine at test scale, serial at 100 TB (a genome has
~25 chromosomes, so at most ~25-way parallelism no matter the cluster). Sums
are associative, so the sweep splits into two phases:

1. bucket the position axis (``floor(pos / bucket_width)``) and run the
   window per (keys, bucket) — parallelism = #buckets, data never leaves the
   partition a hash shuffle gave it;
2. aggregate one summary row per bucket (totals + first position), prefix-sum
   THOSE with a window over the tiny summary relation, and join the bucket
   offsets back (broadcastable — #buckets rows, not #points).

``lead(pos)`` across bucket boundaries is recovered the same way: a local
lead, patched on each bucket's last row with the next bucket's first
position. Empty buckets are skipped naturally (bucket ids come from the data).

Consumers: coverage, coverage_ratio, split, count_overlaps_matrix — every
event-point operator in the engine.

Known trade-off (visible in .explain): the pre-aggregated delta subtree is
evaluated twice — once under the bucket-local windows, once under the bucket
summary. Deliberate: the subtree is a pruned scan + map-side-combined hash
agg (the cheap part of the plan), and forcing reuse would need a persist(),
trading a recompute for a full materialization — the wrong trade at 100 TB.
Callers that already pay for a cache can pass a cached `deltas`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pyranges_1_x_spark.plans.interval_join import floordiv

__all__ = ["prefix_sweep"]


def prefix_sweep(
    deltas: DataFrame,
    keys: list[str],
    pos_col: str,
    delta_cols: list[str],
    cum_cols: list[str],
    *,
    bucket_width: int,
    next_col: str = "__next__",
) -> DataFrame:
    """``deltas`` must have one row per (keys..., pos) — pre-aggregated deltas.

    Returns keys + pos + the running sum of each delta column (ordered by pos
    within keys, inclusive of the current row) as ``cum_cols`` + ``next_col``
    (the next position within keys; null on each group's last point).
    """
    d = deltas.withColumn("__bkt__", floordiv(F.col(pos_col), bucket_width))

    wl = Window.partitionBy(*keys, "__bkt__").orderBy(F.col(pos_col).asc())
    wlc = wl.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    local = d.select(
        *keys,
        pos_col,
        "__bkt__",
        *[F.sum(c).over(wlc).alias(f"__loc{i}__") for i, c in enumerate(delta_cols)],
        F.lead(pos_col).over(wl).alias("__llead__"),
    )

    summary = d.groupBy(*keys, "__bkt__").agg(
        *[F.sum(c).alias(f"__tot{i}__") for i, c in enumerate(delta_cols)],
        F.min(pos_col).alias("__first__"),
    )
    ws = Window.partitionBy(*keys).orderBy(F.col("__bkt__").asc())
    wsp = ws.rowsBetween(Window.unboundedPreceding, -1)
    summary = summary.select(
        *keys,
        "__bkt__",
        *[
            F.coalesce(F.sum(f"__tot{i}__").over(wsp), F.lit(0)).alias(f"__off{i}__")
            for i in range(len(delta_cols))
        ],
        F.lead("__first__").over(ws).alias("__nfirst__"),
    )

    out = local.join(summary, on=[*keys, "__bkt__"])
    return out.select(
        *keys,
        pos_col,
        *[
            (F.col(f"__off{i}__") + F.col(f"__loc{i}__")).alias(cum_cols[i])
            for i in range(len(delta_cols))
        ],
        F.coalesce(F.col("__llead__"), F.col("__nfirst__")).alias(next_col),
    )
