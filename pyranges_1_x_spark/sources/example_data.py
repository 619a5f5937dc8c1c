"""Small example datasets (reference core/example_data.py:73+).

Only the tiny inline literals used throughout the reference's doctests are
reproduced (f1, f2, chromsizes — a few rows each); the larger packaged
datasets (chipseq, aorta, ensembl_gtf, ...) are deliberately NOT bundled —
they are multi-KB data files, and this engine's readers (`sources.bed`,
`sources.gtf`) load any such file the user points them at.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from pyranges_1_x_spark.core import GenomicRanges

_F1 = [
    ("chr1", 3, 6, "interval1", 0, "+"),
    ("chr1", 5, 7, "interval2", 0, "-"),
    ("chr1", 8, 9, "interval3", 0, "+"),
]

_F2 = [
    ("chr1", 1, 2, "a", 0, "+"),
    ("chr1", 6, 7, "b", 0, "-"),
]

#: hg19-like chromosome sizes for the main chromosomes (reference
#: tests/unit/conftest.py:62-103 uses the same shape: name -> length).
_CHROMSIZES = [
    ("chr1", 249250621), ("chr2", 243199373), ("chr3", 198022430),
    ("chr4", 191154276), ("chr5", 180915260), ("chr6", 171115067),
    ("chr7", 159138663), ("chr8", 146364022), ("chr9", 141213431),
    ("chr10", 135534747), ("chr11", 135006516), ("chr12", 133851895),
    ("chr13", 115169878), ("chr14", 107349540), ("chr15", 102531392),
    ("chr16", 90354753), ("chr17", 81195210), ("chr18", 78077248),
    ("chr19", 59128983), ("chr20", 63025520), ("chr21", 48129895),
    ("chr22", 51304566), ("chrX", 155270560), ("chrY", 59373566),
    ("chrM", 16571),
]

_BED_SCHEMA = "Chromosome string, Start long, End long, Name string, Score long, Strand string"


def f1(spark: SparkSession) -> GenomicRanges:
    """The reference's 3-row doctest frame (data/f1.bed)."""
    return GenomicRanges(spark.createDataFrame(_F1, _BED_SCHEMA))


def f2(spark: SparkSession) -> GenomicRanges:
    """The reference's 2-row doctest frame (data/f2.bed)."""
    return GenomicRanges(spark.createDataFrame(_F2, _BED_SCHEMA))


def chromsizes(spark: SparkSession) -> GenomicRanges:
    """hg19-like (Chromosome, Start=0, End=size) frame."""
    rows = [(c, 0, s) for c, s in _CHROMSIZES]
    return GenomicRanges(spark.createDataFrame(rows, "Chromosome string, Start long, End long"))


def chromsizes_dict() -> dict[str, int]:
    return dict(_CHROMSIZES)
