"""Overlap-family operators — clients of the binned interval-join planner.

Reference surface: ``overlap`` (semi), ``join_overlaps``, ``intersect_overlaps``,
``count_overlaps``, ``complement_overlaps`` (anti) —
``/root/reference/pyranges1/range_frame/range_frame.py:315-607``,
``methods/overlap.py:50-101``, wrappers ``core/pyranges_main.py:769-876,1147,2393,5309``.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pyranges_1_x_spark import names as nm
from pyranges_1_x_spark.core import GenomicRanges
from pyranges_1_x_spark.plans.interval_join import interval_join, interval_pairs, rename_keys

_UNSET = object()


def _ids(gr: GenomicRanges, col: str) -> GenomicRanges:
    if col in gr.df.columns:
        return gr
    return GenomicRanges(gr.df.withColumn(col, F.monotonically_increasing_id()))


def overlap(
    self: GenomicRanges,
    other: GenomicRanges,
    *,
    strand_behavior: str = "auto",
    match_by=None,
    slack: int = 0,
    contained_intervals_only: bool = False,
    multiple: str = "all",
    bin_size: int = nm.DEFAULT_BIN_SIZE,
) -> GenomicRanges:
    """Semi-join: rows of self overlapping at least one interval of other
    (reference range_frame.py:539-607; 'first'/'last' degenerate to the same
    row-set for a semi-join, so `multiple` only matters for duplicates count —
    we follow `multiple='all'` ≡ distinct self rows, like the reference's
    overlap which never duplicates self rows)."""
    del multiple  # semi-join semantics: each self row reported once
    odf, keys = self._binary_prepared(other, strand_behavior, match_by)
    lid = "__ov_lid__"
    left = _ids(self, lid).df
    # Bin-join then dedupe self rows: a left_semi on the binned join would keep
    # one row per (left, bin), so dedupe by row-id instead.
    right, rkeys = rename_keys(
        odf.select(*keys, F.col(nm.START_COL).alias("__rs__"), F.col(nm.END_COL).alias("__re__")),
        keys,
    )
    pairs = interval_pairs(
        left,
        right,
        keys=keys,
        right_keys=rkeys,
        slack=slack,
        contained=contained_intervals_only,
        bin_size=bin_size,
        rstart="__rs__",
        rend="__re__",
    )
    hit_ids = pairs.select(lid).distinct()
    out = left.join(hit_ids, on=lid, how="left_semi").drop(lid)
    return GenomicRanges(out)


def complement_overlaps(
    self: GenomicRanges,
    other: GenomicRanges,
    *,
    strand_behavior: str = "auto",
    match_by=None,
    slack: int = 0,
    bin_size: int = nm.DEFAULT_BIN_SIZE,
) -> GenomicRanges:
    """Anti-join: rows of self overlapping NOTHING in other
    (reference methods/complement_overlaps.py:26-34)."""
    odf, keys = self._binary_prepared(other, strand_behavior, match_by)
    lid = "__ov_lid__"
    left = _ids(self, lid).df
    right, rkeys = rename_keys(
        odf.select(*keys, F.col(nm.START_COL).alias("__rs__"), F.col(nm.END_COL).alias("__re__")),
        keys,
    )
    pairs = interval_pairs(
        left, right, keys=keys, right_keys=rkeys, slack=slack, bin_size=bin_size,
        rstart="__rs__", rend="__re__",
    )
    hit_ids = pairs.select(lid).distinct()
    out = left.join(hit_ids, on=lid, how="left_anti").drop(lid)
    return GenomicRanges(out)


def join_overlaps(
    self: GenomicRanges,
    other: GenomicRanges,
    *,
    strand_behavior: str = "auto",
    join_type: str = "inner",
    match_by=None,
    multiple: str = "all",
    contained_intervals_only: bool = False,
    slack: int = 0,
    suffix: str = nm.JOIN_SUFFIX,
    report_overlap_column: str | None = None,
    bin_size: int = nm.DEFAULT_BIN_SIZE,
    broadcast_other: bool = False,
):
    """Attribute join on overlap (reference range_frame.py:315-395, methods/join.py:13-71).

    Output columns: all of self, then other's non-key columns with Start/End and
    collisions suffixed (no Chromosome_b — keys are dropped from the right side,
    matching the reference's doctest).
    """
    odf, keys = self._binary_prepared(other, strand_behavior, match_by)
    lid, rid = "__jl_id__", "__jr_id__"
    left = _ids(self, lid).df
    right = odf.withColumn(rid, F.monotonically_increasing_id())
    out = interval_join(
        left,
        right,
        keys=keys,
        how=join_type,
        multiple=multiple,
        slack=slack,
        contained=contained_intervals_only,
        suffix=suffix,
        report_overlap_column=report_overlap_column,
        bin_size=bin_size,
        left_id=lid,
        right_id=rid,
        broadcast_right=broadcast_other,
    )
    return GenomicRanges.wrap(out.drop(lid, rid))


def intersect_overlaps(
    self: GenomicRanges,
    other: GenomicRanges,
    *,
    strand_behavior: str = "auto",
    match_by=None,
    multiple: str = "all",
    slack: int = 0,
    bin_size: int = nm.DEFAULT_BIN_SIZE,
) -> GenomicRanges:
    """Join + clip coordinates to the overlapping stretch
    (reference methods/overlap.py:72-101): Start=max(s1,s2), End=min(e1,e2);
    other's metadata columns are NOT reported."""
    odf, keys = self._binary_prepared(other, strand_behavior, match_by)
    lid, rid = "__jl_id__", "__jr_id__"
    left = _ids(self, lid).df
    right = odf.select(*keys, nm.START_COL, nm.END_COL).withColumn(
        rid, F.monotonically_increasing_id()
    )
    joined = interval_join(
        left,
        right,
        keys=keys,
        how="inner",
        multiple=multiple,
        slack=slack,
        bin_size=bin_size,
        left_id=lid,
        right_id=rid,
    )
    sb, eb = nm.START_COL + nm.JOIN_SUFFIX, nm.END_COL + nm.JOIN_SUFFIX
    out = (
        joined.withColumn(nm.START_COL, F.greatest(F.col(nm.START_COL), F.col(sb)))
        .withColumn(nm.END_COL, F.least(F.col(nm.END_COL), F.col(eb)))
        .drop(sb, eb, lid, rid)
    )
    return GenomicRanges(out)


def count_overlaps(
    self: GenomicRanges,
    other: GenomicRanges,
    *,
    strand_behavior: str = "auto",
    match_by=None,
    slack: int = 0,
    count_col: str = "NumberOverlaps",
    bin_size: int = nm.DEFAULT_BIN_SIZE,
) -> GenomicRanges:
    """Append the per-self-row count of overlapping other intervals, zero-filled
    (reference range_frame.py:112-157, wrapper pyranges_main.py:769-876)."""
    odf, keys = self._binary_prepared(other, strand_behavior, match_by)
    lid = "__cnt_lid__"
    left = _ids(self, lid).df
    right, rkeys = rename_keys(
        odf.select(*keys, F.col(nm.START_COL).alias("__rs__"), F.col(nm.END_COL).alias("__re__")),
        keys,
    )
    pairs = interval_pairs(
        left.select(lid, *keys, nm.START_COL, nm.END_COL),
        right,
        keys=keys,
        right_keys=rkeys,
        slack=slack,
        bin_size=bin_size,
        rstart="__rs__",
        rend="__re__",
    )
    counts = pairs.groupBy(lid).agg(F.count(F.lit(1)).alias(count_col))
    out = (
        left.join(counts, on=lid, how="left")
        .withColumn(count_col, F.coalesce(F.col(count_col), F.lit(0)))
        .drop(lid)
    )
    return GenomicRanges(out)
