"""Interval metrics and coordinate-combine — pure Column expressions.

Reference: ``compute_interval_metrics`` (methods/interval_metrics.py:16-131,
wrapper pyranges_main.py:5438) operates on a joined frame with Start/End and
Start_b/End_b; every metric is vectorized arithmetic — here each is a Column
expression usable in one projection (whole-stage codegen, zero UDFs).
``combine_interval_columns`` (range_frame.py:159-214).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pyranges_1_x_spark import names as nm

_S, _E = nm.START_COL, nm.END_COL
_SB, _EB = nm.START_COL + nm.JOIN_SUFFIX, nm.END_COL + nm.JOIN_SUFFIX


def _cols(start=None, end=None, start_b=None, end_b=None):
    return (
        F.col(start or _S),
        F.col(end or _E),
        F.col(start_b or _SB),
        F.col(end_b or _EB),
    )


def overlap_length(**kw) -> Column:
    s, e, sb, eb = _cols(**kw)
    return F.greatest(F.least(e, eb) - F.greatest(s, sb), F.lit(0))


def overlap_flag(**kw) -> Column:
    s, e, sb, eb = _cols(**kw)
    return (F.greatest(s, sb) < F.least(e, eb)).cast("int")


def jaccard_overlap(**kw) -> Column:
    """Per-pair Jaccard: overlap / union-span length."""
    s, e, sb, eb = _cols(**kw)
    inter = F.greatest(F.least(e, eb) - F.greatest(s, sb), F.lit(0))
    union = (e - s) + (eb - sb) - inter
    return inter / union


def fraction_overlap(denominator: str = "first", **kw) -> Column:
    """Overlap length / length of {first,second,union} (reference denom modes)."""
    s, e, sb, eb = _cols(**kw)
    inter = F.greatest(F.least(e, eb) - F.greatest(s, sb), F.lit(0))
    if denominator == "first":
        den = e - s
    elif denominator == "second":
        den = eb - sb
    elif denominator == "union":
        den = (e - s) + (eb - sb) - inter
    else:
        raise ValueError("denominator must be first|second|union")
    return inter / den


def distance(**kw) -> Column:
    """0 when overlapping, else gap+1 (touching => 1) — the nearest convention."""
    s, e, sb, eb = _cols(**kw)
    gap = F.greatest(s, sb) - F.least(e, eb)
    return F.when(gap < 0, F.lit(0)).otherwise(gap + 1)


def signed_distance(**kw) -> Column:
    """Negative when other is upstream of self (ends before self starts)."""
    s, e, sb, eb = _cols(**kw)
    gap = F.greatest(s, sb) - F.least(e, eb)
    sign = F.when(eb <= s, F.lit(-1)).otherwise(F.lit(1))
    return F.when(gap < 0, F.lit(0)).otherwise(sign * (gap + 1))


def midpoint_distance(**kw) -> Column:
    s, e, sb, eb = _cols(**kw)
    return F.abs((s + e) - (sb + eb)) / 2.0


def symmetric_coverage(**kw) -> Column:
    """2*overlap / (len1 + len2)."""
    s, e, sb, eb = _cols(**kw)
    inter = F.greatest(F.least(e, eb) - F.greatest(s, sb), F.lit(0))
    return 2.0 * inter / ((e - s) + (eb - sb))


def compute_interval_metrics(df: DataFrame, metrics: list[str], **kw) -> DataFrame:
    """Append named metric columns to a joined frame (reference wrapper)."""
    registry = {
        "overlap_length": overlap_length,
        "overlap_flag": overlap_flag,
        "jaccard": jaccard_overlap,
        "fraction_first": lambda **k: fraction_overlap("first", **k),
        "fraction_second": lambda **k: fraction_overlap("second", **k),
        "fraction_union": lambda **k: fraction_overlap("union", **k),
        "distance": distance,
        "signed_distance": signed_distance,
        "midpoint_distance": midpoint_distance,
        "symmetric_coverage": symmetric_coverage,
    }
    out = df
    for m in metrics:
        out = out.withColumn(m, registry[m](**kw))
    return out


def combine_interval_columns(
    df: DataFrame,
    function="intersect",
    *,
    start: str | None = None,
    end: str | None = None,
    start2: str | None = None,
    end2: str | None = None,
    drop_old_columns: bool = True,
    how: str | None = None,
) -> DataFrame:
    """Replace Start/End with a combination of two interval column pairs
    after a join (reference pyranges_main.py:5572-5604):
    ``function`` in {intersect, union, swap} or a callable taking the four
    coordinate Columns (start1, end1, start2, end2) and returning
    (new_start, new_end) Columns — the Column-expression twin of the
    reference's Series-based CombineIntervalColumnsOperation. ``start``/
    ``end``/``start2``/``end2`` override the column names (defaults
    Start/End/Start_b/End_b); ``drop_old_columns=False`` keeps the second
    pair. ``how`` is this engine's pre-r7 name for ``function``."""
    if how is not None:
        function = how
    s, e, sb, eb = _cols(start, end, start2, end2)
    if callable(function):
        ns, ne = function(s, e, sb, eb)
    elif function == "intersect":
        ns, ne = F.greatest(s, sb), F.least(e, eb)
    elif function == "union":
        ns, ne = F.least(s, sb), F.greatest(e, eb)
    elif function == "swap":
        ns, ne = sb, eb
    else:
        raise ValueError("function must be intersect|union|swap or a callable")
    out = (
        df.withColumn("__ns__", ns)
        .withColumn("__ne__", ne)
        .withColumn(start or _S, F.col("__ns__"))
        .withColumn(end or _E, F.col("__ne__"))
        .drop("__ns__", "__ne__")
    )
    if drop_old_columns:
        out = out.drop(start2 or _SB, end2 or _EB)
    return out
