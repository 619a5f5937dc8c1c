"""Binned interval-join planner — the shared physical strategy for every overlap op.

The reference funnels all overlap-family operators through one Rust kernel
(``ruranges.numpy.overlaps``, called from ``/root/reference/pyranges1/methods/overlap.py:35-46``).
This module is our equivalent: ONE planner that every public overlap operator
(`overlap`, `join_overlaps`, `intersect_overlaps`, `count_overlaps`,
`complement_overlaps`, interval metrics, ...) composes over.

Physical strategy (scale posture)
---------------------------------
A naive ``a JOIN b ON a.chrom = b.chrom AND a.Start < b.End AND b.Start < a.End``
gives Catalyst only one equi-key (chrom, ~25 distinct values in a genome) plus a
range predicate, so it degenerates to a per-chromosome nested loop — O(n*m) per
chromosome and catastrophically skewed (chr1 >> chrM).

Instead we *bin* the coordinate axis: each interval is exploded to the fixed-width
bins it touches, the join becomes an equi-join on ``(keys..., bin)`` with the exact
range predicate re-applied, and duplicate pairs (intervals co-occurring in several
bins) are eliminated with the emit-once trick: keep a pair only in the bin that
contains ``max(start_l, start_r)``. This:

* turns the join into a plain hash/sort-merge equi-join with high key cardinality
  (chrom x bin) — shuffles partition evenly, AQE can split residual skew;
* needs no ``distinct()`` (emit-once is a cheap filter, no extra shuffle);
* costs an explode factor of ``len/bin + 1`` per row (~1 for genomic intervals
  with the default 100kb bin).

All arithmetic is integer-exact (no float floor-division) so it is safe for
arbitrary 64-bit coordinates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pyranges_1_x_spark.names import (
    BIN_COL,
    DEFAULT_BIN_SIZE,
    END_COL,
    JOIN_SUFFIX,
    OVERLAP_ALL,
    OVERLAP_FIRST,
    OVERLAP_LAST,
    START_COL,
    VALID_JOIN_TYPES,
    VALID_OVERLAP_MODES,
)

__all__ = ["interval_join", "interval_pairs", "rename_keys", "add_bins", "floordiv"]


def floordiv(c: Column, w: int) -> Column:
    """Exact integer floor-division of a LongType column (handles negatives)."""
    c = c.cast("long")
    return ((c - F.pmod(c, F.lit(w))) / F.lit(w)).cast("long")


def _bin_of(c: Column, w: int) -> Column:
    return ((c - F.pmod(c, F.lit(w))) / F.lit(w)).cast("long")


def add_bins(
    df: DataFrame,
    start_col: str,
    end_col: str,
    bin_size: int,
    bin_col: str = BIN_COL,
) -> DataFrame:
    """Explode each interval to the bins it touches: ``[floor(s/W), floor((e-1)/W)]``.

    Empty/invalid intervals (End <= Start) land in their start bin only (the
    overlap predicate excludes them downstream anyway); ``greatest`` guards
    against Spark's descending-``sequence`` behavior.
    """
    lo = floordiv(F.col(start_col), bin_size)
    hi = F.greatest(lo, floordiv(F.col(end_col) - 1, bin_size))
    return df.withColumn(bin_col, F.explode(F.sequence(lo, hi)))


def rename_keys(right: DataFrame, keys: list[str], prefix: str = "__rk") -> tuple[DataFrame, list[str]]:
    """Rename the right frame's key columns to internal names so left/right
    column sets stay disjoint through the join."""
    rkeys = []
    out = right
    for i, k in enumerate(keys):
        rk = f"{prefix}{i}__"
        out = out.withColumnRenamed(k, rk)
        rkeys.append(rk)
    return out, rkeys


def interval_pairs(
    left: DataFrame,
    right: DataFrame,
    *,
    keys: list[str],
    right_keys: list[str],
    slack: int = 0,
    contained: bool = False,
    bin_size: int = DEFAULT_BIN_SIZE,
    lstart: str = START_COL,
    lend: str = END_COL,
    rstart: str = START_COL,
    rend: str = END_COL,
    broadcast_right: bool = False,
    keep_right_keys: bool = False,
) -> DataFrame:
    """Inner-join matching interval pairs, exactly once per pair.

    Contract: ``left`` and ``right`` column names must be disjoint (use
    ``rename_keys`` for the right side's grouping keys). Output: all left
    columns + right non-key columns (+ right keys if ``keep_right_keys``).
    ``slack`` widens the LEFT side's intervals before testing (reference
    semantics, range_frame.py:564-567). ``contained`` keeps only left intervals
    fully inside the right interval (unwidened coordinates).
    """
    dup = set(left.columns) & set(right.columns)
    if dup:
        raise ValueError(f"left/right column names must be disjoint; shared: {sorted(dup)}")
    lbin, rbin = "__lbin__", "__rbin__"

    if slack:
        lb = (
            left.withColumn("__ws__", F.col(lstart) - F.lit(slack))
            .withColumn("__we__", F.col(lend) + F.lit(slack))
            .transform(lambda d: add_bins(d, "__ws__", "__we__", bin_size, lbin))
            .drop("__ws__", "__we__")
        )
    else:
        lb = add_bins(left, lstart, lend, bin_size, lbin)
    rb = add_bins(right, rstart, rend, bin_size, rbin)
    if broadcast_right:
        rb = F.broadcast(rb)

    ls, le = F.col(lstart), F.col(lend)
    rs, re_ = F.col(rstart), F.col(rend)
    ws, we = ls - F.lit(slack), le + F.lit(slack)

    cond = F.col(lbin) == F.col(rbin)
    for k, rk in zip(keys, right_keys):
        cond = cond & (F.col(k) == F.col(rk))
    cond = cond & (ws < re_) & (rs < we)
    if contained:
        cond = cond & (ls >= rs) & (le <= re_)
    # Emit-once: keep the pair only in the bin holding max(widened left start, right start).
    cond = cond & (F.col(lbin) == _bin_of(F.greatest(ws, rs), bin_size))

    joined = lb.join(rb, cond, "inner")
    out_cols = list(left.columns) + [c for c in right.columns if c not in right_keys]
    if keep_right_keys:
        out_cols = list(left.columns) + list(right.columns)
    return joined.select(*out_cols)


def interval_join(
    left: DataFrame,
    right: DataFrame,
    *,
    keys: list[str],
    how: str = "inner",
    multiple: str = OVERLAP_ALL,
    slack: int = 0,
    contained: bool = False,
    suffix: str = JOIN_SUFFIX,
    report_overlap_column: str | None = None,
    bin_size: int = DEFAULT_BIN_SIZE,
    left_id: str | None = None,
    right_id: str | None = None,
    broadcast_right: bool = False,
) -> DataFrame:
    """Full interval join with the reference's `join_overlaps` surface.

    Parameters mirror ``RangeFrame.join_overlaps`` (reference range_frame.py:315-395):
    ``how`` in {inner,left,right,outer}; ``multiple`` in {all,first,last} where
    'first' keeps the match with the smallest right Start and 'last' the biggest
    right End (reference range_frame.py:558-562); non-matching rows are
    null-padded — including the key columns of right-only rows, as in the
    reference's outer doctest (right-only rows show Chromosome nan).

    Output columns: all of left; right's Start/End as Start_b/End_b; right's
    other non-key columns, suffixed on collision. Right key columns are dropped.

    ``left_id`` / ``right_id`` name pre-existing unique row-id columns; required
    for how != inner or multiple != all.
    """
    if how not in VALID_JOIN_TYPES:
        raise ValueError(f"how must be one of {VALID_JOIN_TYPES}, got {how!r}")
    if multiple not in VALID_OVERLAP_MODES:
        raise ValueError(f"multiple must be one of {VALID_OVERLAP_MODES}, got {multiple!r}")
    if (how != "inner" or multiple != OVERLAP_ALL) and (left_id is None or right_id is None):
        raise ValueError("left_id/right_id are required for outer joins or multiple != 'all'")

    # Suffix-rename the right side: Start/End always; other collisions with left.
    right_sfx, rkeys = rename_keys(right, keys)
    for c in right.columns:
        if c in keys:
            continue
        if c in (START_COL, END_COL) or c in left.columns:
            right_sfx = right_sfx.withColumnRenamed(c, c + suffix)
    rstart, rend = START_COL + suffix, END_COL + suffix
    rid = (right_id + suffix) if (right_id is not None and right_id in left.columns) else right_id

    pairs = interval_pairs(
        left,
        right_sfx,
        keys=keys,
        right_keys=rkeys,
        slack=slack,
        contained=contained,
        bin_size=bin_size,
        rstart=rstart,
        rend=rend,
        broadcast_right=broadcast_right,
    )

    if multiple != OVERLAP_ALL:
        from pyspark.sql import Window

        if multiple == OVERLAP_FIRST:
            order = [F.col(rstart).asc(), F.col(rend).asc(), F.col(rid).asc()]
        else:  # OVERLAP_LAST: biggest End wins
            order = [F.col(rend).desc(), F.col(rstart).desc(), F.col(rid).asc()]
        w = Window.partitionBy(left_id).orderBy(*order)
        pairs = (
            pairs.withColumn("__rn__", F.row_number().over(w))
            .filter(F.col("__rn__") == 1)
            .drop("__rn__")
        )

    if report_overlap_column is not None:
        pairs = pairs.withColumn(
            report_overlap_column,
            F.least(F.col(END_COL), F.col(rend)) - F.greatest(F.col(START_COL), F.col(rstart)),
        )

    if how == "inner":
        return pairs

    right_nonkey = right_sfx.drop(*rkeys)
    null_right = [F.lit(None).cast(right_nonkey.schema[c].dataType).alias(c) for c in right_nonkey.columns]
    null_left = [F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns]
    extra = (
        [F.lit(None).cast("long").alias(report_overlap_column)]
        if report_overlap_column is not None
        else []
    )
    out = pairs
    if how in ("left", "outer"):
        missed_l = left.join(pairs.select(left_id).distinct(), on=left_id, how="left_anti")
        missed_l = missed_l.select(*[F.col(c) for c in left.columns], *null_right, *extra)
        out = out.unionByName(missed_l)
    if how in ("right", "outer"):
        missed_r = right_nonkey.join(pairs.select(rid).distinct(), on=rid, how="left_anti")
        missed_r = missed_r.select(*null_left, *[F.col(c) for c in right_nonkey.columns], *extra)
        out = out.unionByName(missed_r)
    return out
