"""N-ary count-overlaps matrix + summary (reference core/multioverlap.py:11-143,
methods/summary.py:17-57)."""

from __future__ import annotations

import pandas as pd

from pyranges_1_x_spark import count_overlaps_matrix
from pyranges_1_x_spark.core import GenomicRanges


def gr(spark, starts, ends, chrom="1"):
    return GenomicRanges(
        spark.createDataFrame(pd.DataFrame({"Chromosome": chrom, "Start": starts, "End": ends}))
    )


def test_count_matrix_golden(spark):
    # Reference pr.count_overlaps doctest shape (core/multioverlap.py):
    # a: [0,4) [2,5); b: [3,7)  => boundary points {0,2,3,4,5,7}
    a = gr(spark, [0, 2], [4, 5])
    b = gr(spark, [3], [7])
    out = count_overlaps_matrix({"n_a": a, "n_b": b}, use_strand=False).df.toPandas()
    out = out.sort_values(["Start", "End"]).reset_index(drop=True)
    assert list(map(tuple, out[["Start", "End", "n_a", "n_b"]].values)) == [
        (0, 2, 1, 0),
        (2, 3, 2, 0),
        (3, 4, 2, 1),
        (4, 5, 1, 1),
        (5, 7, 0, 1),
    ]


def test_count_matrix_with_features(spark):
    a = gr(spark, [0, 10], [5, 20])
    feats = gr(spark, [0, 8], [4, 12])
    out = count_overlaps_matrix({"n_a": a}, features=feats, use_strand=False).df.toPandas()
    out = out.sort_values("Start").reset_index(drop=True)
    assert out.n_a.tolist() == [1, 1]


def test_summary_shapes(spark):
    df = pd.DataFrame(
        {
            "Chromosome": ["1", "1", "1", "1"],
            "Start": [0, 2, 10, 20],
            "End": [4, 6, 15, 30],
            "Strand": ["+", "+", "-", "-"],
        }
    )
    g = GenomicRanges(spark.createDataFrame(df))
    out = g.summary().toPandas()
    allint = out[(out.scope == "all") & (out.metric == "interval_length")].iloc[0]
    assert allint["count"] == 4 and allint["sum"] == 4 + 4 + 5 + 10
    # merged coverage (strand-ignorant): [0,6) [10,15) [20,30) => lengths 6,5,10
    cov = out[(out.scope == "all") & (out.metric == "coverage_run_length")].iloc[0]
    assert cov["count"] == 3 and cov["sum"] == 21
    # per-strand rows exist
    assert set(out.scope) == {"all", "strand +", "strand -"}


def test_summary_single_strand_still_emits_both_strand_rows(spark):
    """r15 optimization pin: the grouped per-strand describe must keep the
    filtered-aggregate contract — a strand with NO rows still emits its
    (count=0, null stats) row (the null-L sentinel mechanism)."""
    df = pd.DataFrame(
        {
            "Chromosome": ["1", "1"],
            "Start": [0, 10],
            "End": [4, 15],
            "Strand": ["+", "+"],
        }
    )
    out = GenomicRanges(spark.createDataFrame(df)).summary().toPandas()
    minus_int = out[(out.scope == "strand -") & (out.metric == "interval_length")]
    assert len(minus_int) == 1
    row = minus_int.iloc[0]
    assert row["count"] == 0 and pd.isna(row["sum"]) and pd.isna(row["mean"])
    plus_cov = out[(out.scope == "strand +") & (out.metric == "coverage_run_length")]
    assert plus_cov.iloc[0]["count"] == 2 and plus_cov.iloc[0]["sum"] == 9
