"""Binary genomics formats — gated stubs (documented out of scope for v1).

The reference reads BAM via the optional ``bamread`` dependency
(readers.py:149-240, import-gated at readers.py:212-219) and bigwig via
optional ``pyBigWig`` (readers.py:452-533, gated at readers.py:487-493).
Neither library is available in this environment, and both formats are
single-file binary containers that do not split for distributed scans anyway.

The scale-correct Spark pattern for both is ahead-of-time conversion to
parquet (one-time, streamed), after which the engine's normal scan path
applies — partition pruning, predicate pushdown, column pruning. These
readers accept such parquet-converted fixtures and validate the expected
schema; pointing them at a real .bam/.bw raises with the conversion hint.
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
    """Read a parquet-converted BAM (alignment intervals). Flag/mapq filters
    mirror the reference's semantics (readers.py:149-240)."""
    if not path.endswith((".parquet", "/")):
        raise NotImplementedError(
            "native .bam decoding needs the optional bamread dependency (absent); "
            "convert to parquet with columns "
            f"{BAM_COLS + ['MapQ']} and pass that path"
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
    """Read a parquet-converted bigwig as (Chromosome, Start, End, Value)
    value runs (reference readers.py:452-533)."""
    if not path.endswith((".parquet", "/")):
        raise NotImplementedError(
            "native .bw decoding needs the optional pyBigWig dependency (absent); "
            "convert to parquet with columns [Chromosome, Start, End, Value]"
        )
    df = spark.read.parquet(path)
    missing = [c for c in [*nm.GENOME_LOC_COLS, "Value"] if c not in df.columns]
    if missing:
        raise ValueError(f"parquet-converted bigwig missing columns {missing}")
    return GenomicRanges(df)
