"""Island (overlap-connected-component) planner — shared by merge/cluster/complement/...

The reference funnels merge/cluster through ``ruranges.numpy.merge`` /
``ruranges.numpy.cluster`` (a sorted sweep per group,
``/root/reference/pyranges1/methods/merge.py:29-34``,
``range_frame/range_frame.py:255-260``). On Spark the same sweep is a window
function: sort each (Chromosome[,Strand][,match_by...]) partition by Start and
flag a new island whenever ``Start >= max(End so far) + slack`` — verified
against the reference's cluster_overlaps doctest
(``core/pyranges_main.py:700-745``: slack=0 does NOT merge bookended intervals,
slack=1 does).

Scale posture: the window partitions by the grouping keys only, so one
chromosome = one sort partition. Window state is O(1) (a running max), Spark
external-sorts within partitions, and the downstream groupBy(island) is a
map-side-combinable hash agg — this holds at 100TB as long as a single
(chrom,strand) partition fits on one executor's disk for sorting, which is the
same contract a range-partitioned sort would need. Skewed chromosomes are the
known cost; AQE cannot split a window partition, so extremely hot keys should be
pre-split upstream by adding a coarse ``match_by`` salt when semantics allow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pyranges_1_x_spark.names import END_COL, ISLAND_COL, START_COL

__all__ = ["assign_islands", "island_agg"]


def assign_islands(
    df: DataFrame,
    keys: list[str],
    *,
    slack: int = 0,
    island_col: str = ISLAND_COL,
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Attach a per-group island id (0-based within each key-group).

    Two intervals share an island iff they are transitively connected by
    ``Start < prev_interval_max_End + slack``. ``tiebreak`` columns make the
    sort (and thus island numbering) fully deterministic when (Start, End) ties.
    """
    order = [F.col(START_COL).asc(), F.col(END_COL).asc()] + [
        F.col(c).asc() for c in (tiebreak or [])
    ]
    w = Window.partitionBy(*keys).orderBy(*order)
    prev_max_end = F.max(END_COL).over(w.rowsBetween(Window.unboundedPreceding, -1))
    is_new = F.when(
        prev_max_end.isNull() | (F.col(START_COL) >= prev_max_end + F.lit(slack)),
        F.lit(1),
    ).otherwise(F.lit(0))
    island = (
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)) - 1
    )
    return df.withColumn(island_col, island.cast("long"))


def island_agg(
    df: DataFrame,
    keys: list[str],
    *,
    slack: int = 0,
    count_col: str | None = None,
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Merge overlapping intervals per key-group (the `merge` kernel equivalent).

    Returns one row per island: keys..., Start=min, End=max [, count_col].
    """
    with_islands = assign_islands(df, keys, slack=slack, tiebreak=tiebreak)
    aggs = [
        F.min(START_COL).alias(START_COL),
        F.max(END_COL).alias(END_COL),
    ]
    if count_col is not None:
        aggs.append(F.count(F.lit(1)).alias(count_col))
    out = with_islands.groupBy(*keys, ISLAND_COL).agg(*aggs).drop(ISLAND_COL)
    return out.select(*keys, START_COL, END_COL, *([count_col] if count_col else []))
