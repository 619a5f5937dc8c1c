"""Order-insensitive frame equality, copying the reference's discipline
(``/root/reference/tests/helpers.py:4-40``: sort by loc columns, reset index,
compare values)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame

from pyranges_1_x_spark.core import GenomicRanges


def to_pandas(x) -> pd.DataFrame:
    if isinstance(x, GenomicRanges):
        x = x.df
    if isinstance(x, DataFrame):
        x = x.toPandas()
    return x


def assert_df_equal(actual, expected, sort_cols=None):
    a, e = to_pandas(actual), to_pandas(expected)
    assert sorted(a.columns) == sorted(e.columns), f"columns differ: {list(a.columns)} vs {list(e.columns)}"
    cols = sort_cols or list(a.columns)
    a = a.sort_values(cols, kind="mergesort").reset_index(drop=True)[sorted(a.columns)]
    e = e.sort_values(cols, kind="mergesort").reset_index(drop=True)[sorted(e.columns)]
    pd.testing.assert_frame_equal(a, e, check_dtype=False)


def brute_overlap_pairs(a: pd.DataFrame, b: pd.DataFrame, keys, slack=0, contained=False):
    """O(n*m) oracle for interval overlap pairs (reference precedent:
    tests/unit/k_nearest.py brute-force comparisons)."""
    out = []
    for ia, ra in a.iterrows():
        for ib, rb in b.iterrows():
            if any(ra[k] != rb[k] for k in keys):
                continue
            if ra.Start - slack < rb.End and rb.Start < ra.End + slack:
                if contained and not (ra.Start >= rb.Start and ra.End <= rb.End):
                    continue
                out.append((ia, ib))
    return out
