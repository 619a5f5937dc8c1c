"""Coverage — the reference's RLE path re-expressed as an event-point prefix sum.

Reference: ``to_rle`` (methods/to_rle.py:15-63): sort boundary points, apply
+value at Start / -value at End, cumulative-sum. Identical here, but the result
is a plain interval DataFrame (Chromosome[,Strand], Start, End, Value) rather
than a special RLE type (SURVEY.md §1.1) — runs partition the covered axis and
carry the depth (or value-weighted depth) over each run.

Scale: groupBy(point) pre-aggregates deltas map-side; the single window cumsum
per (chrom[,strand]) has O(1) state. No collect_list anywhere.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from pyranges_1_x_spark import names as nm
from pyranges_1_x_spark.core import GenomicRanges


def to_coverage(
    self: GenomicRanges,
    *,
    use_strand="auto",
    value_col: str | None = None,
    rpm: bool = False,
    drop_zero: bool = False,
    value_out: str = "Value",
) -> GenomicRanges:
    """Depth-of-coverage runs per (Chromosome[,Strand]).

    ``value_col`` weights each interval (reference value_col); ``rpm``
    normalizes by 1e6/row-count (reference methods/to_rle.py:59-61);
    ``drop_zero`` removes zero-depth runs between islands.
    """
    keys = self.group_keys(use_strand)
    val = F.col(value_col).cast("double") if value_col else F.lit(1).cast("long")
    d = self.df
    starts = d.select(*keys, F.col(nm.START_COL).alias("__pos__"), val.alias("__delta__"))
    ends = d.select(*keys, F.col(nm.END_COL).alias("__pos__"), (-val).alias("__delta__"))
    deltas = starts.unionByName(ends).groupBy(*keys, "__pos__").agg(
        F.sum("__delta__").alias("__delta__")
    )
    w = Window.partitionBy(*keys).orderBy(F.col("__pos__").asc())
    runs = (
        deltas.withColumn(
            "__cum__",
            F.sum("__delta__").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
        )
        .withColumn("__next__", F.lead("__pos__").over(w))
        .filter(F.col("__next__").isNotNull())
    )
    value = F.col("__cum__")
    if rpm:
        n = d.count()
        value = value * F.lit(1_000_000.0 / n)
    out = runs.select(
        *keys,
        F.col("__pos__").alias(nm.START_COL),
        F.col("__next__").alias(nm.END_COL),
        value.alias(value_out),
    )
    if drop_zero:
        out = out.filter(F.col(value_out) != 0)
    return GenomicRanges(out)
