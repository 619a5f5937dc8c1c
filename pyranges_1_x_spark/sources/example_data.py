"""Example datasets (reference core/example_data.py:73+).

The tiny doctest frames (f1, f2, chromsizes) are inline literals; the rest
of the reference's corpus — chipseq, chipseq_background, aorta, aorta2,
ensembl_gtf, ncbi_gff, ncbi_fasta, interpro_hits, rfam_hits — ships as
parquet fixtures under ``pyranges_1_x_spark/data/``, generated through this
engine's own readers by ``scripts/make_example_data.py`` so each fixture
carries exactly the schema ``read_bed``/``read_gtf``/``read_gff3`` would
produce on the same content. ``files()`` mirrors the reference's
``example_data.files`` basename->path dict.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from pyranges_1_x_spark.core import GenomicRanges

_DATA_DIR = Path(__file__).resolve().parent.parent / "data"

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


def files() -> dict[str, Path]:
    """Basename -> path of the packaged parquet fixtures (reference
    ``ExampleData.files``, example_data.py:92-115)."""
    return {p.name: p for p in sorted(_DATA_DIR.glob("*.parquet"))}


def _read_fixture(spark: SparkSession, name: str) -> DataFrame:
    path = _DATA_DIR / f"{name}.parquet"
    if not path.exists():
        raise FileNotFoundError(
            f"packaged fixture {name}.parquet missing; regenerate with "
            "scripts/make_example_data.py"
        )
    return spark.read.parquet(str(path))


def chipseq(spark: SparkSession) -> GenomicRanges:
    """Example ChIP-seq data (reference example_data.py:138)."""
    return GenomicRanges(_read_fixture(spark, "chipseq"))


def chipseq_background(spark: SparkSession) -> GenomicRanges:
    """Example ChIP-seq background data (reference example_data.py:164)."""
    return GenomicRanges(_read_fixture(spark, "chipseq_background"))


def aorta(spark: SparkSession) -> GenomicRanges:
    """Example ChIP-seq data from the epigenomics roadmap
    (reference example_data.py:306)."""
    return GenomicRanges(_read_fixture(spark, "aorta"))


def aorta2(spark: SparkSession) -> GenomicRanges:
    """Example ChIP-seq data from the epigenomics roadmap
    (reference example_data.py:314)."""
    return GenomicRanges(_read_fixture(spark, "aorta2"))


def ensembl_gtf(spark: SparkSession) -> GenomicRanges:
    """Example Ensembl GTF slice, attributes exploded to columns
    (reference example_data.py:211)."""
    return GenomicRanges(_read_fixture(spark, "ensembl_gtf"))


def ncbi_gff(spark: SparkSession) -> GenomicRanges:
    """Example NCBI GFF3 annotation subset (reference example_data.py:322)."""
    return GenomicRanges(_read_fixture(spark, "ncbi_gff"))


def ncbi_fasta(spark: SparkSession) -> DataFrame:
    """Example NCBI assembly subset as a (Chromosome, Sequence) table — this
    engine's sequences-table shape (feeds ``get_sequence``/``extend_orfs``),
    standing in for the reference's pyfaidx.Fasta (example_data.py:330)."""
    return _read_fixture(spark, "ncbi_fasta")


def interpro_hits(spark: SparkSession) -> GenomicRanges:
    """Example InterPro protein hits, Start shifted to 0-based as the
    reference does (example_data.py:235-244)."""
    return GenomicRanges(_read_fixture(spark, "interpro_hits"))


def rfam_hits(spark: SparkSession) -> DataFrame:
    """Example Rfam motif hits as a plain 1-based DataFrame
    (reference example_data.py:247: returns a DataFrame, not a PyRanges)."""
    return _read_fixture(spark, "rfam_hits")
