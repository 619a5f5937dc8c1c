"""GTF / GFF3 reader/writer (reference readers.py:243-449, core/out.py:88-315).

9 fixed TSV columns; the attribute column is exploded into real columns with
`str_to_map` (JVM-side); 1-based inclusive -> 0-based half-open on read
(Start - 1), reversed on write.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

GTF_FIXED = ["Chromosome", "Source", "Feature", "Start", "End", "Score", "Strand", "Frame"]


def _read_9col(spark: SparkSession, path: str) -> DataFrame:
    raw = spark.read.csv(path, sep="\t", header=False, comment="#", inferSchema=False)
    return raw.toDF(*GTF_FIXED, "Attribute")


def read_gtf(spark: SparkSession, path: str, attributes: list[str] | None = None):
    """GTF: attributes are `key "value"; ` pairs. ``attributes=None`` explodes
    every key found in the data (one extra pass to discover keys)."""
    from pyranges_1_x_spark.core import GenomicRanges

    df = _read_9col(spark, path)
    # normalize `key "value"; ` -> map via str_to_map after stripping quotes
    attr_map = F.expr(
        r"""str_to_map(regexp_replace(regexp_replace(Attribute, '"', ''), '; *$', ''), '; *', ' ')"""
    )
    df = df.withColumn("__attrs__", attr_map)
    if attributes is None:
        keys = [
            r[0]
            for r in df.select(F.explode(F.map_keys("__attrs__")).alias("k")).distinct().collect()
        ]
        attributes = sorted(keys)
    for a in attributes:
        df = df.withColumn(a, F.col("__attrs__").getItem(a))
    df = (
        df.drop("Attribute", "__attrs__")
        .withColumn("Start", F.col("Start").cast("long") - 1)
        .withColumn("End", F.col("End").cast("long"))
    )
    return GenomicRanges(df)


def read_gff3(spark: SparkSession, path: str, attributes: list[str] | None = None):
    """GFF3: attributes are `key=value;` pairs."""
    from pyranges_1_x_spark.core import GenomicRanges

    df = _read_9col(spark, path)
    df = df.withColumn("__attrs__", F.expr("str_to_map(Attribute, ';', '=')"))
    if attributes is None:
        keys = [
            r[0]
            for r in df.select(F.explode(F.map_keys("__attrs__")).alias("k")).distinct().collect()
        ]
        attributes = sorted(keys)
    for a in attributes:
        df = df.withColumn(a, F.col("__attrs__").getItem(a))
    df = (
        df.drop("Attribute", "__attrs__")
        .withColumn("Start", F.col("Start").cast("long") - 1)
        .withColumn("End", F.col("End").cast("long"))
    )
    return GenomicRanges(df)


def to_gtf(df: DataFrame, path: str) -> None:
    """Fold non-fixed columns back into the attribute string, 0->1-based."""
    meta = [c for c in df.columns if c not in GTF_FIXED]
    attr = F.concat_ws(
        " ",
        *[
            F.when(
                F.col(c).isNotNull(), F.concat(F.lit(f'{c} "'), F.col(c).cast("string"), F.lit('";'))
            ).otherwise(F.lit(""))
            for c in meta
        ],
    )
    out = df.select(
        F.col("Chromosome"),
        F.coalesce(F.col("Source"), F.lit(".")).alias("Source")
        if "Source" in df.columns
        else F.lit(".").alias("Source"),
        F.coalesce(F.col("Feature"), F.lit(".")).alias("Feature")
        if "Feature" in df.columns
        else F.lit(".").alias("Feature"),
        (F.col("Start") + 1).alias("Start"),
        F.col("End"),
        F.coalesce(F.col("Score").cast("string"), F.lit(".")).alias("Score")
        if "Score" in df.columns
        else F.lit(".").alias("Score"),
        F.coalesce(F.col("Strand"), F.lit(".")).alias("Strand")
        if "Strand" in df.columns
        else F.lit(".").alias("Strand"),
        F.coalesce(F.col("Frame"), F.lit(".")).alias("Frame")
        if "Frame" in df.columns
        else F.lit(".").alias("Frame"),
        attr.alias("Attribute"),
    )
    out.write.mode("overwrite").csv(path, sep="\t", header=False)


def to_gff3(df: DataFrame, path: str) -> None:
    """GFF3 writer: metadata folded as `key=value;` attribute pairs, 0->1-based
    (reference core/out.py:233-315)."""
    meta = [c for c in df.columns if c not in GTF_FIXED]
    attr = F.concat_ws(
        "",
        *[
            F.when(
                F.col(c).isNotNull(),
                F.concat(F.lit(f"{c}="), F.col(c).cast("string"), F.lit(";")),
            ).otherwise(F.lit(""))
            for c in meta
        ],
    )

    def fixed(c, default="."):
        if c in df.columns:
            return F.coalesce(F.col(c).cast("string"), F.lit(default)).alias(c)
        return F.lit(default).alias(c)

    out = df.select(
        F.col("Chromosome"),
        fixed("Source"),
        fixed("Feature"),
        (F.col("Start") + 1).alias("Start"),
        F.col("End"),
        fixed("Score"),
        fixed("Strand"),
        fixed("Frame"),
        attr.alias("Attribute"),
    )
    out.write.mode("overwrite").csv(path, sep="\t", header=False)
