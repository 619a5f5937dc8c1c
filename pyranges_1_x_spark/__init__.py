"""pyranges_1_x_spark — a PySpark-native interval analytics engine.

Re-expresses the operator semantics of the reference dataframe library
(pyranges 1.x, surveyed in /root/repo/SURVEY.md) as lazy Spark DataFrame plans:
declarative Catalyst plans for everything, Pandas UDFs only where semantics are
inherently sequential per group.
"""

from pyranges_1_x_spark.core import GenomicRanges
from pyranges_1_x_spark.range_frame import RangeFrame
from pyranges_1_x_spark.names import (
    CHROM_COL,
    END_COL,
    GENOME_LOC_COLS,
    GENOME_LOC_COLS_WITH_STRAND,
    START_COL,
    STRAND_COL,
)
from pyranges_1_x_spark.functions import seqs, stats  # noqa: F401  (pr.seqs / pr.stats)
from pyranges_1_x_spark.operators import orfs  # noqa: F401  (pr.orfs)
from pyranges_1_x_spark.operators.geometry import tile_genome
from pyranges_1_x_spark.operators.multi import count_overlaps_matrix
from pyranges_1_x_spark.sources import example_data  # noqa: F401  (pr.example_data)
from pyranges_1_x_spark.sources.bed import read_bed
from pyranges_1_x_spark.sources.binary import read_bam, read_bigwig
from pyranges_1_x_spark.sources.gtf import read_gff3, read_gtf
from pyranges_1_x_spark.sources.synthetic import empty, from_string, random

#: Reference display-option manager (``pr.options``,
#: ``pyranges1/core/options.py``) driving the ``tostring`` bounded repr.
from pyranges_1_x_spark.options import options  # noqa: E402,F401

#: Reference AI-assistant priming helper (``pr.assistant``,
#: ``pyranges1/core/assistant.py``) — prompt + docs-blob builder, pure
#: local text (no model endpoint involved; implemented r9).
from pyranges_1_x_spark.assistant import assistant  # noqa: E402,F401

#: r16 cache-lifecycle contract (plans/qcache.py): several operators persist
#: or locally checkpoint a multi-branch intermediate for the duration of ONE
#: query plan; CacheManager holds those entries strongly, so the CALLER must
#: release them once the query's result has been fully consumed. Re-exported
#: here as the public hook (bench.py and the oracle gate call it after every
#: materialization).
from pyranges_1_x_spark.plans.qcache import free_tracked as free_query_caches  # noqa: E402

#: Reference alias (``/root/reference/pyranges1/__init__.py:19``): GFF2 is
#: GTF's syntax, so ``read_gff`` is the GTF reader under the name a GFF
#: user types first.
read_gff = read_gtf

#: Reference namespace name for the N-ary membership-count matrix
#: (``pr.count_overlaps``, core/multioverlap.py) — the method of the same
#: name on GenomicRanges is the binary per-row count.
count_overlaps = count_overlaps_matrix

__all__ = [
    "GenomicRanges",
    "RangeFrame",
    "CHROM_COL",
    "START_COL",
    "END_COL",
    "STRAND_COL",
    "GENOME_LOC_COLS",
    "GENOME_LOC_COLS_WITH_STRAND",
    "tile_genome",
    "count_overlaps_matrix",
    "count_overlaps",
    "concat",
    "random",
    "from_string",
    "empty",
    "read_bed",
    "read_gtf",
    "read_gff",
    "options",
    "assistant",
    "read_gff3",
    "read_bam",
    "read_bigwig",
    "example_data",
    "orfs",
    "seqs",
    "stats",
    "free_query_caches",
]

__version__ = "0.1.0"


def concat(grs):
    """Row-concat GenomicRanges (reference pr.concat, methods/concat.py:12-87)."""
    dfs = [g.df if isinstance(g, GenomicRanges) else g for g in grs]
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d, allowMissingColumns=True)
    return GenomicRanges.wrap(out)
