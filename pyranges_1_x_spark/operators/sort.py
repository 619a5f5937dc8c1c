"""sort_ranges — natural-sort chromosomes, then Start, End.

Reference: pyranges_main.py:2822-2997, methods/sort.py:12-40 (natsorted groups;
chr2 < chr11; 5'-aware descending option for '-' strand).

``natkey`` is a pure Column expression (no UDF): strip a leading "chr", then
zero-pad pure-numeric names so they order numerically and prefix letter names
with '~' (sorts after digits) so letter chromosomes (M, X, Y) come last,
alphabetically — the natsort order for every real chromosome naming scheme.
"""

from __future__ import annotations

from pyspark.sql import Column, Window
from pyspark.sql import functions as F

from pyranges_1_x_spark import names as nm
from pyranges_1_x_spark.core import GenomicRanges


def natkey(col: Column) -> Column:
    stripped = F.regexp_replace(col, "^chr", "")
    is_num = stripped.rlike("^[0-9]+$")
    return F.when(is_num, F.lpad(stripped, 12, "0")).otherwise(
        F.concat(F.lit("~"), stripped)
    )


def sort_ranges(
    self: GenomicRanges,
    *,
    by=None,
    use_strand="auto",
    natsorting: bool = True,
    reverse: bool = False,
    rank_col: str | None = None,
) -> GenomicRanges:
    """Sort by (natsorted Chromosome[, Strand], Start, End[, by...]).

    ``rank_col`` additionally materializes the resulting global position as a
    column (1-based) — Spark DataFrames have no row order once shuffled, so a
    persisted rank is the faithful equivalent of the reference's ordered frame.

    5'-aware sorting (use_strand: '-' rows descending) follows in round 2 with
    the local-coordinate family.
    """
    chrom_key = natkey(F.col(nm.CHROM_COL)) if natsorting else F.col(nm.CHROM_COL)
    keys = [chrom_key, F.col(nm.START_COL), F.col(nm.END_COL)]
    if self.has_strand:
        keys.insert(1, F.col(nm.STRAND_COL))
    for c in [by] if isinstance(by, str) else (by or []):
        keys.append(F.col(c))
    if reverse:
        keys = [k.desc() for k in keys]
    out = self.df.orderBy(*keys)
    if rank_col is not None:
        # A single global window: only for modest results or final presentation —
        # it serializes into one task by design (a total order is inherently serial).
        w = Window.orderBy(*keys)
        out = out.withColumn(rank_col, F.row_number().over(w))
    return GenomicRanges(out)
