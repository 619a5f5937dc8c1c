"""Synthetic / literal frame constructors.

Reference: ``pr.random`` (core/random.py:14-92 — chromosome picked with
probability proportional to its size, fixed-length intervals, optional
strand), ``pr.from_string`` (readers.py:22-57), ``pr.empty``
(core/empty.py:14-62).

``random`` is fully distributed: ``spark.range(n)`` + ``rand(seed)`` column
arithmetic; the chromosome choice is a driver-built CASE chain over the
cumulative size distribution (chromsizes are inherently small), so no join
and no Python UDF — the generator scales to any n.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyranges_1_x_spark import names as nm
from pyranges_1_x_spark.core import GenomicRanges


def _chromsizes_rows(chromsizes) -> list[tuple[str, int]]:
    if isinstance(chromsizes, dict):
        return list(chromsizes.items())
    if isinstance(chromsizes, DataFrame):
        return [(r[nm.CHROM_COL], r[nm.END_COL]) for r in chromsizes.collect()]
    return [(c, int(s)) for c, s in chromsizes]


def random(
    spark: SparkSession,
    n: int = 1000,
    length: int = 100,
    chromsizes=None,
    seed: int | None = None,
    *,
    strand: bool = True,
) -> GenomicRanges:
    """n random fixed-length intervals; chromosome picked proportional to its
    size (reference core/random.py:61-75). Deterministic for a fixed seed and
    partitioning."""
    if chromsizes is None:
        raise ValueError("chromsizes is required (dict, DataFrame, or [(chrom, size), ...])")
    rows = _chromsizes_rows(chromsizes)
    total = float(sum(s for _, s in rows))

    base = spark.range(n).select(
        F.col("id").alias("__i__"),
        F.rand(seed).alias("__u__"),
        F.rand(seed + 1 if seed is not None else None).alias("__v__"),
        F.rand(seed + 2 if seed is not None else None).alias("__w__"),
    )
    # CASE chain over the cumulative distribution: chrom_k iff u < cum_k/total.
    cum = 0.0
    chrom_expr = F.lit(rows[-1][0])
    size_expr = F.lit(rows[-1][1]).cast("long")
    conds = []
    for c, s in rows[:-1]:
        cum += s
        conds.append((cum / total, c, s))
    for frac, c, s in reversed(conds):
        chrom_expr = F.when(F.col("__u__") < frac, F.lit(c)).otherwise(chrom_expr)
        size_expr = F.when(F.col("__u__") < frac, F.lit(s).cast("long")).otherwise(size_expr)

    start = F.floor(F.col("__v__") * (size_expr - F.lit(length))).cast("long")
    out = base.select(
        chrom_expr.alias(nm.CHROM_COL),
        start.alias(nm.START_COL),
        (start + F.lit(length)).alias(nm.END_COL),
        *(
            [F.when(F.col("__w__") < 0.5, "+").otherwise("-").alias(nm.STRAND_COL)]
            if strand
            else []
        ),
    )
    return GenomicRanges(out)


def from_string(spark: SparkSession, s: str) -> GenomicRanges | DataFrame:
    """Whitespace-table literal -> frame (reference readers.py:22-57)."""
    from io import StringIO

    import pandas as pd

    pdf = pd.read_csv(StringIO(s), sep=r"\s+", index_col=None)
    return GenomicRanges.wrap(spark.createDataFrame(pdf))


def empty(
    spark: SparkSession,
    columns=None,
    *,
    strand: bool = False,
) -> GenomicRanges | DataFrame:
    """Typed empty frame (reference core/empty.py:14-62): location columns as
    long, everything else string."""
    cols = list(columns) if columns is not None else (
        list(nm.GENOME_LOC_COLS_WITH_STRAND) if strand else list(nm.GENOME_LOC_COLS)
    )
    fields = ", ".join(
        f"{c} long" if c in (nm.START_COL, nm.END_COL) else f"{c} string" for c in cols
    )
    return GenomicRanges.wrap(spark.createDataFrame([], fields))
