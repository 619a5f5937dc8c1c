"""pyranges_1_x_spark — a PySpark-native interval analytics engine.

Re-expresses the operator semantics of the reference dataframe library
(pyranges 1.x, surveyed in /root/repo/SURVEY.md) as lazy Spark DataFrame plans:
declarative Catalyst plans for everything, Pandas UDFs only where semantics are
inherently sequential per group.
"""

from pyranges_1_x_spark.core import GenomicRanges
from pyranges_1_x_spark.names import (
    CHROM_COL,
    END_COL,
    GENOME_LOC_COLS,
    GENOME_LOC_COLS_WITH_STRAND,
    START_COL,
    STRAND_COL,
)
from pyranges_1_x_spark.operators.geometry import tile_genome
from pyranges_1_x_spark.operators.multi import count_overlaps_matrix
from pyranges_1_x_spark.sources.synthetic import empty, from_string, random

__all__ = [
    "GenomicRanges",
    "CHROM_COL",
    "START_COL",
    "END_COL",
    "STRAND_COL",
    "GENOME_LOC_COLS",
    "GENOME_LOC_COLS_WITH_STRAND",
    "tile_genome",
    "count_overlaps_matrix",
    "concat",
    "random",
    "from_string",
    "empty",
]

__version__ = "0.1.0"


def concat(grs):
    """Row-concat GenomicRanges (reference pr.concat, methods/concat.py:12-87)."""
    dfs = [g.df if isinstance(g, GenomicRanges) else g for g in grs]
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d, allowMissingColumns=True)
    return GenomicRanges.wrap(out)
