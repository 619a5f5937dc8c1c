"""Binary genomics formats.

BAM decodes NATIVELY (sources/bam_native.py — pure stdlib gzip+struct per
the published SAM/BAM spec; reference uses the optional ``bamread``
extension, readers.py:149-240). Parallel unit is the file; single giant
BAMs should still be converted to parquet once so the columnar scan path
(partition pruning, predicate pushdown, column pruning) applies — this
reader also accepts such parquet conversions.

BigWig remains parquet-converted only (reference gates it on optional
``pyBigWig``, readers.py:452-533): the format needs R-tree/B-tree index
traversal that a one-time streamed conversion sidesteps.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from pyranges_1_x_spark import names as nm
from pyranges_1_x_spark.core import GenomicRanges

#: Columns produced by the reference's BAM reader (readers.py:170-207).
BAM_COLS = ["Chromosome", "Start", "End", "Strand", "Flag"]


def read_bam(
    spark: SparkSession,
    path: str,
    *,
    mapq: int = 0,
    required_flag: int = 0,
    filter_flag: int = 1540,
) -> GenomicRanges:
    """Read a BAM: native stdlib decoding for .bam paths/globs (one task per
    file), or a parquet conversion. Flag/mapq filters mirror the reference's
    semantics (readers.py:149-240)."""
    if not path.endswith((".parquet", "/")):
        from pyranges_1_x_spark.sources.bam_native import read_bam_native

        return GenomicRanges(
            read_bam_native(
                spark, path, mapq=mapq, required_flag=required_flag, filter_flag=filter_flag
            )
        )
    df = spark.read.parquet(path)
    missing = [c for c in nm.GENOME_LOC_COLS if c not in df.columns]
    if missing:
        raise ValueError(f"parquet-converted BAM missing columns {missing}")
    if "MapQ" in df.columns and mapq:
        df = df.filter(F.col("MapQ") >= mapq)
    if "Flag" in df.columns:
        if required_flag:
            df = df.filter(F.col("Flag").bitwiseAND(required_flag) == required_flag)
        if filter_flag:
            df = df.filter(F.col("Flag").bitwiseAND(filter_flag) == 0)
    return GenomicRanges(df)


def read_bigwig(spark: SparkSession, path: str) -> GenomicRanges:
    """Read a bigwig as (Chromosome, Start, End, Value) value runs
    (reference readers.py:452-533): native stdlib decoding for .bw/.bigwig
    (driver walks the R-tree index, executors decompress blocks — see
    sources/bigwig_native.py), or a parquet conversion."""
    if path.endswith((".bw", ".bigwig", ".bigWig")):
        from pyranges_1_x_spark.sources.bigwig_native import read_bigwig_native

        return GenomicRanges(read_bigwig_native(spark, path))
    if not path.endswith((".parquet", "/")):
        raise NotImplementedError(
            "unrecognized bigwig path: pass a .bw/.bigwig file (native decode) "
            "or a parquet conversion with columns [Chromosome, Start, End, Value]"
        )
    df = spark.read.parquet(path)
    missing = [c for c in [*nm.GENOME_LOC_COLS, "Value"] if c not in df.columns]
    if missing:
        raise ValueError(f"parquet-converted bigwig missing columns {missing}")
    return GenomicRanges(df)


def to_bigwig_file(df, path: str, chrom_sizes: dict[str, int]) -> None:
    """Binary bigwig sink for a (Chromosome, Start, End, Value) frame
    (completes the reference's ``to_bigwig`` surface, core/out.py:164-224).

    BigWig is a single indexed file, so the write is inherently single-node —
    the reference's pyBigWig path is too. Rows are collected sorted; for
    genome-scale outputs write parquet instead and convert offline."""
    from pyranges_1_x_spark.sources.bigwig_native import write_bigwig

    ids = {c: i for i, c in enumerate(chrom_sizes)}
    rows = [
        (r[0], int(r[1]), int(r[2]), float(r[3]))
        for r in df.select(nm.CHROM_COL, nm.START_COL, nm.END_COL, "Value").collect()
    ]
    rows.sort(key=lambda r: (ids[r[0]], r[1]))
    write_bigwig(path, rows, chrom_sizes)
