"""max_disjoint — maximal non-overlapping subset (greedy by End per group).

Reference: range_frame.py:397-449 (``max_disjoint`` kernel). Greedy interval
scheduling is inherently sequential per group, so this is one of the few places
we drop to ``applyInPandas`` (SURVEY.md §4.3.3): state is a single scalar per
group, groups are (Chromosome[,Strand][,match_by]) — bounded and shuffled once.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from pyranges_1_x_spark import names as nm
from pyranges_1_x_spark.core import GenomicRanges


def max_disjoint_overlaps(
    self: GenomicRanges,
    *,
    use_strand="auto",
    match_by=None,
    slack: int = 0,
) -> GenomicRanges:
    keys = self.group_keys(use_strand, match_by)
    schema = self.df.schema

    def greedy(pdf: pd.DataFrame) -> pd.DataFrame:
        # Tiebreak past (End, Start) with every remaining column so the
        # accepted SET is deterministic when intervals tie exactly — the
        # partition-arrival order (which varies run to run) must never decide
        # which of two tied rows survives. This also makes the operator
        # value-level oracle-able (the DuckDB twin orders the same way).
        tie = [c for c in pdf.columns if c not in (nm.END_COL, nm.START_COL)]
        pdf = pdf.sort_values([nm.END_COL, nm.START_COL, *tie], kind="mergesort")
        keep = []
        last_end = None
        for row_end, row_start in zip(pdf[nm.END_COL].to_numpy(), pdf[nm.START_COL].to_numpy()):
            ok = last_end is None or row_start >= last_end + slack
            keep.append(ok)
            if ok:
                last_end = row_end
        return pdf[pd.Series(keep, index=pdf.index)]

    out = self.df.groupBy(*keys).applyInPandas(greedy, schema=schema)
    return GenomicRanges(out)
