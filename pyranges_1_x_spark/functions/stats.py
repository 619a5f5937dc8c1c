"""Statistics surface (reference ext/stats.py).

``fdr`` (Benjamini-Hochberg, ext/stats.py:124-171), set metrics ``jaccard`` /
``forbes`` (ext/stats.py:745-797, 687-742), ``relative_distance``
(ext/stats.py:800-864, methods/statistics.py:10-38). ``fisher_exact`` needs
scipy (absent here) -> gated stub. All Spark-side implementations compose the
engine's own merge/intersect operators + window ranks — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pyranges_1_x_spark import names as nm
from pyranges_1_x_spark.core import GenomicRanges


def fdr(df: DataFrame, p_col: str = "PValue", out_col: str = "FDR") -> DataFrame:
    """Benjamini-Hochberg adjusted p-values: p * n / rank, then a running min
    from the largest p downward (the monotonicity enforcement step)."""
    n = F.count(F.lit(1)).over(Window.partitionBy())
    rank = F.row_number().over(Window.orderBy(F.col(p_col).asc(), F.monotonically_increasing_id()))
    raw = F.col(p_col) * n / rank
    d = df.withColumn("__raw__", raw).withColumn("__rk__", rank)
    runmin = F.min("__raw__").over(
        Window.orderBy(F.col("__rk__").desc()).rowsBetween(Window.unboundedPreceding, 0)
    )
    return d.withColumn(out_col, F.least(runmin, F.lit(1.0))).drop("__raw__", "__rk__")


def jaccard_statistic(
    a: GenomicRanges, b: GenomicRanges, *, strand_behavior: str = "ignore"
) -> DataFrame:
    """Genome-wide Jaccard: |intersection| / |union| of the two merged interval
    sets (reference ext/stats.py:745-797). Returns a 1-row DataFrame."""
    inter = a.set_intersect_overlaps(b, strand_behavior=strand_behavior).length_sum()
    union = a.set_union_overlaps(b, strand_behavior=strand_behavior).length_sum()
    i = inter.withColumnRenamed("length", "il")
    u = union.withColumnRenamed("length", "ul")
    return i.crossJoin(u).select(
        (F.col("il") / F.col("ul")).alias("jaccard"),
        F.col("il").alias("intersection_length"),
        F.col("ul").alias("union_length"),
    )


def forbes_statistic(
    a: GenomicRanges, b: GenomicRanges, genome_length: int, *, strand_behavior: str = "ignore"
) -> DataFrame:
    """Forbes coefficient: genome_len * |A∩B| / (|A|*|B|) on merged sets
    (reference ext/stats.py:687-742)."""
    inter = a.set_intersect_overlaps(b, strand_behavior=strand_behavior).length_sum()
    la = a.merge_overlaps(use_strand=False).length_sum().withColumnRenamed("length", "la")
    lb = b.merge_overlaps(use_strand=False).length_sum().withColumnRenamed("length", "lb")
    return (
        inter.withColumnRenamed("length", "il")
        .crossJoin(la)
        .crossJoin(lb)
        .select(
            (F.lit(genome_length) * F.col("il") / (F.col("la") * F.col("lb"))).alias("forbes")
        )
    )


def relative_distance(
    a: GenomicRanges, b: GenomicRanges
) -> DataFrame:
    """Distribution of each A-midpoint's relative position between the two
    surrounding B-midpoints, in [0, 0.5] (reference ext/stats.py:800-864):
    an as-of lookup of the previous/next B midpoint via one sorted sweep."""
    am = a.df.select(
        nm.CHROM_COL, ((F.col(nm.START_COL) + F.col(nm.END_COL)) / 2).alias("__m__")
    ).withColumn("__typ__", F.lit(0))
    bm = b.df.select(
        nm.CHROM_COL, ((F.col(nm.START_COL) + F.col(nm.END_COL)) / 2).alias("__m__")
    ).withColumn("__typ__", F.lit(1))
    allp = am.unionByName(bm)
    wprev = (
        Window.partitionBy(nm.CHROM_COL)
        .orderBy(F.col("__m__").asc(), F.col("__typ__").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wnext = (
        Window.partitionBy(nm.CHROM_COL)
        .orderBy(F.col("__m__").desc(), F.col("__typ__").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    prev_b = F.max(F.when(F.col("__typ__") == 1, F.col("__m__"))).over(wprev)
    next_b = F.min(F.when(F.col("__typ__") == 1, F.col("__m__"))).over(wnext)
    d = (
        allp.withColumn("__prev__", prev_b)
        .withColumn("__next__", next_b)
        .filter((F.col("__typ__") == 0) & F.col("__prev__").isNotNull() & F.col("__next__").isNotNull())
        .filter(F.col("__next__") > F.col("__prev__"))
    )
    rel = (F.col("__m__") - F.col("__prev__")) / (F.col("__next__") - F.col("__prev__"))
    return d.select(F.least(rel, 1 - rel).alias("reldist"))


def fisher_exact(*_args, **_kwargs):
    """Reference ext/stats.py:174-246 uses scipy (not in this container)."""
    raise NotImplementedError(
        "fisher_exact requires scipy; plug a pandas UDF over scipy.stats.fisher_exact "
        "when the dependency is available"
    )
