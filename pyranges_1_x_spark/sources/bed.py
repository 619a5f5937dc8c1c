"""BED reader/writer (reference readers.py:60-146, core/out.py:75-161).

BED is TSV with 3-12 canonical columns, 0-based half-open already. gzip is
handled by Spark's codec inference; headers (track/browser/#) are filtered out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Canonical BED column names (reference readers.py:75-88).
BED_COLS = [
    "Chromosome",
    "Start",
    "End",
    "Name",
    "Score",
    "Strand",
    "ThickStart",
    "ThickEnd",
    "ItemRGB",
    "BlockCount",
    "BlockSizes",
    "BlockStarts",
]
_INT_COLS = {"Start", "End", "ThickStart", "ThickEnd", "BlockCount"}


def read_bed(spark: SparkSession, path: str, nrows: int | None = None):
    from pyranges_1_x_spark.core import GenomicRanges

    raw = spark.read.csv(path, sep="\t", header=False, inferSchema=False)
    ncols = len(raw.columns)
    cols = BED_COLS[:ncols] + [f"Extra{i}" for i in range(max(0, ncols - len(BED_COLS)))]
    df = raw.toDF(*cols)
    # Drop browser/track/comment header lines (reference header sniffing,
    # readers.py:97-110).
    df = df.filter(
        ~F.col("Chromosome").startswith("#")
        & ~F.col("Chromosome").startswith("track")
        & ~F.col("Chromosome").startswith("browser")
    )
    for c in df.columns:
        if c in _INT_COLS:
            df = df.withColumn(c, F.col(c).cast("long"))
    if nrows is not None:
        df = df.limit(nrows)
    return GenomicRanges(df)


def to_bed(df: DataFrame, path: str, *, keep: bool = True) -> None:
    """Write canonical BED ordering; missing canonical columns emit '.'
    (reference core/out.py:75-85)."""
    cols = []
    for c in BED_COLS[:6]:
        cols.append(F.col(c) if c in df.columns else F.lit(".").alias(c))
    extra = [F.col(c) for c in df.columns if c not in BED_COLS] if keep else []
    df.select(*cols, *extra).write.mode("overwrite").csv(path, sep="\t", header=False)
