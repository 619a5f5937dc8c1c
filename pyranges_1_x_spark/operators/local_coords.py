"""Local-coordinate (transcript-space) operators — all window + arithmetic.

Reference: ``group_cumsum`` (pyranges_main.py:5209-5307), ``slice_ranges``
(pyranges_main.py:2999-3262, methods/slice_ranges.py:19-54), ``five_end`` /
``three_end`` (pyranges_main.py:1041-1132,3848), ``upstream``/``downstream``
(pyranges_main.py:4576-4601,4719-4745), ``calculate_frame`` (ext/orfs.py:42-129).

The shared physical pattern is ONE window per (Chromosome[, group_by...]):
a running sum of interval lengths in 5'->3' order (descending Start on '-')
— O(1) window state, shuffles on the same keys as everything else.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from pyranges_1_x_spark import names as nm
from pyranges_1_x_spark.core import GenomicRanges


def _group_keys(self: GenomicRanges, group_by) -> list[str]:
    keys = [nm.CHROM_COL]
    if group_by:
        keys += [group_by] if isinstance(group_by, str) else list(group_by)
    return keys


def _neg(self: GenomicRanges, use_strand) -> "F.Column":
    stranded = self.has_strand and (use_strand is True or use_strand == "auto")
    return F.col(nm.STRAND_COL) == "-" if stranded else F.lit(False)


def _five_prime_window(keys, neg, tiebreak=None):
    """Window walking each group 5'->3': ascending Start on '+', descending on '-'.
    ``tiebreak`` columns make the walk a total order (needed for deterministic
    results when identical coordinates repeat within a group)."""
    order_key = F.when(neg, -F.col(nm.START_COL)).otherwise(F.col(nm.START_COL))
    order_key2 = F.when(neg, -F.col(nm.END_COL)).otherwise(F.col(nm.END_COL))
    extra = [F.col(c).asc() for c in (tiebreak or [])]
    return Window.partitionBy(*keys).orderBy(order_key.asc(), order_key2.asc(), *extra)


def group_cumsum(
    self: GenomicRanges,
    group_by=None,
    *,
    use_strand="auto",
    cumsum_start_column: str | None = None,
    cumsum_end_column: str | None = None,
    tiebreak=None,
) -> GenomicRanges:
    """Running total of interval lengths before/after each interval, walking
    each (Chromosome[, group_by]) group 5'->3' (doctest-verified against the
    reference's gene_name example). With no explicit output column names,
    Start/End are REPLACED by the local coordinates (reference behavior)."""
    keys = _group_keys(self, group_by)
    neg = _neg(self, use_strand)
    w = _five_prime_window(keys, neg, tiebreak)
    length = F.col(nm.END_COL) - F.col(nm.START_COL)
    cum_end = F.sum(length).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum_start = cum_end - length
    d = self.df
    if cumsum_start_column is None:
        out = d.withColumn("__cs__", cum_start).withColumn("__ce__", cum_end)
        out = (
            out.withColumn(nm.START_COL, F.col("__cs__"))
            .withColumn(nm.END_COL, F.col("__ce__"))
            .drop("__cs__", "__ce__")
        )
    else:
        out = d.withColumn(cumsum_start_column, cum_start).withColumn(
            cumsum_end_column or "CumsumEnd", cum_end
        )
    return GenomicRanges(out)


def slice_ranges(
    self: GenomicRanges,
    start: int = 0,
    end: int | None = None,
    group_by=None,
    *,
    use_strand="auto",
    tiebreak=None,
    count_introns: bool = False,
) -> GenomicRanges:
    """Spliced subsequence [start, end) in transcript-local coordinates;
    negative indices count from the 3' end (reference slice_ranges,
    methods/slice_ranges.py:37-48). Each exon is clipped to the requested
    local window and mapped back to genomic coordinates; exons falling
    entirely outside disappear.

    ``count_introns=True`` (reference pyranges_main.py:3235-3258): local
    coordinates count the UNSPLICED span — the reference composes
    outer_ranges -> slice_ranges -> intersect; since each group's boundary is
    a single interval, that composition collapses to window min/max + per-row
    clip arithmetic here (no join): slice the [group min Start, group max End)
    span in local (strand-aware) coordinates, then intersect each input row
    with its group's sliced span."""
    if count_introns:
        return _slice_unspliced(
            self, start, end, group_by, use_strand=use_strand
        )
    if group_by is None:
        # Reference semantics (methods/slice_ranges.py:35: ``np.arange`` group
        # ids when no ``by``): with NO group_by every ROW is its own
        # transcript — doctest pyranges_main.py:3082 slices [40,60) to
        # [40,45) independently of its chromosome neighbors. A single
        # interval's spliced and unspliced spans coincide, so the row-local
        # unspliced arithmetic implements this exactly (and without any
        # window). The earlier Chromosome-level grouping silently treated
        # all rows of a chromosome as one spliced transcript — caught by
        # tests/test_property_based.py's five_end oracle.
        return _slice_unspliced(self, start, end, None, use_strand=use_strand)
    keys = _group_keys(self, group_by)
    neg = _neg(self, use_strand)
    w = _five_prime_window(keys, neg, tiebreak)
    length = F.col(nm.END_COL) - F.col(nm.START_COL)
    cum_end = F.sum(length).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum_start = cum_end - length
    total = F.sum(length).over(Window.partitionBy(*keys))

    d = (
        self.df.withColumn("__ls__", cum_start)
        .withColumn("__le__", cum_end)
        .withColumn("__tot__", total)
    )
    qs = F.lit(start) if start >= 0 else F.col("__tot__") + F.lit(start)
    if end is None:
        qe = F.col("__tot__")
    elif end >= 0:
        qe = F.lit(end)
    else:
        qe = F.col("__tot__") + F.lit(end)
    qs, qe = F.greatest(qs, F.lit(0)), F.least(qe, F.col("__tot__"))

    # overlap of [__ls__,__le__) with [qs,qe), in local space
    lo = F.greatest(F.col("__ls__"), qs)
    hi = F.least(F.col("__le__"), qe)
    d = d.withColumn("__lo__", lo).withColumn("__hi__", hi).filter(F.col("__lo__") < F.col("__hi__"))

    # map back to genomic coordinates (reflect on '-' strand)
    off_lo = F.col("__lo__") - F.col("__ls__")
    off_hi = F.col("__hi__") - F.col("__ls__")
    new_start = F.when(neg, F.col(nm.END_COL) - off_hi).otherwise(F.col(nm.START_COL) + off_lo)
    new_end = F.when(neg, F.col(nm.END_COL) - off_lo).otherwise(F.col(nm.START_COL) + off_hi)
    out = (
        d.withColumn("__ns__", new_start)
        .withColumn("__ne__", new_end)
        .withColumn(nm.START_COL, F.col("__ns__"))
        .withColumn(nm.END_COL, F.col("__ne__"))
        .drop("__ls__", "__le__", "__tot__", "__lo__", "__hi__", "__ns__", "__ne__")
    )
    return GenomicRanges(out)


def _slice_unspliced(
    self: GenomicRanges,
    start: int,
    end: int | None,
    group_by,
    *,
    use_strand="auto",
) -> GenomicRanges:
    """slice_ranges(count_introns=True): intron-counting (unspliced) slice.

    Without ``group_by`` every row is its own group (the reference's temp
    per-row transcript id, pyranges_main.py:3241-3246), so the group span IS
    the row and the whole thing is row-local arithmetic.
    """
    neg = _neg(self, use_strand)
    if group_by is None:
        gs, ge = F.col(nm.START_COL), F.col(nm.END_COL)
    else:
        keys = _group_keys(self, group_by)
        w = Window.partitionBy(*keys)
        gs, ge = F.min(nm.START_COL).over(w), F.max(nm.END_COL).over(w)

    total = ge - gs
    qs = F.lit(start) if start >= 0 else total + F.lit(start)
    if end is None:
        qe = total
    elif end >= 0:
        qe = F.lit(end)
    else:
        qe = total + F.lit(end)
    qs, qe = F.greatest(qs, F.lit(0)), F.least(qe, total)

    # The sliced group span in genomic coordinates (reflected on '-' strand),
    # then each row intersected with it.
    span_s = F.when(neg, ge - qe).otherwise(gs + qs)
    span_e = F.when(neg, ge - qs).otherwise(gs + qe)
    ns = F.greatest(F.col(nm.START_COL), span_s)
    ne = F.least(F.col(nm.END_COL), span_e)
    out = (
        self.df.withColumn("__ns__", ns)
        .withColumn("__ne__", ne)
        .filter(F.col("__ns__") < F.col("__ne__"))
        .withColumn(nm.START_COL, F.col("__ns__"))
        .withColumn(nm.END_COL, F.col("__ne__"))
        .drop("__ns__", "__ne__")
    )
    return GenomicRanges(out)


def five_end(self: GenomicRanges, group_by=None, *, ext: int = 0, tiebreak=None) -> GenomicRanges:
    """Length-1 (+ext) interval at the 5' end; with ``group_by``, at the 5' end
    of each whole transcript (reference composes slice_ranges(0,1) + extend,
    pyranges_main.py:1128-1131 — we compose identically)."""
    sliced = slice_ranges(self, 0, 1, group_by=group_by, tiebreak=tiebreak)
    if ext:
        return sliced.extend_ranges(ext=ext)
    return sliced


def three_end(self: GenomicRanges, group_by=None, *, ext: int = 0, tiebreak=None) -> GenomicRanges:
    """Length-1 (+ext) interval at the 3' end (slice_ranges(-1, None))."""
    sliced = slice_ranges(self, -1, None, group_by=group_by, tiebreak=tiebreak)
    if ext:
        return sliced.extend_ranges(ext=ext)
    return sliced


def _outermost(self: GenomicRanges, group_by, use_strand):
    """Per-group outer span (min Start / max End) carried onto each row."""
    keys = _group_keys(self, group_by)
    w = Window.partitionBy(*keys)
    return F.min(nm.START_COL).over(w), F.max(nm.END_COL).over(w)


def upstream(
    self: GenomicRanges,
    length: int,
    *,
    gap: int = 0,
    group_by=None,
    use_strand="auto",
) -> GenomicRanges:
    """Flank of ``length`` ending ``gap`` before the (group's) 5' end
    (reference pyranges_main.py:4576-4601); clipped at 0."""
    neg = _neg(self, use_strand)
    d = self.df
    if group_by is not None:
        keys = _group_keys(self, group_by)
        extra = [nm.STRAND_COL] if self.has_strand else []
        d = (
            d.groupBy(*keys, *extra)
            .agg(F.min(nm.START_COL).alias(nm.START_COL), F.max(nm.END_COL).alias(nm.END_COL))
        )
    s = F.when(neg, F.col(nm.END_COL) + gap).otherwise(F.col(nm.START_COL) - gap - length)
    e = F.when(neg, F.col(nm.END_COL) + gap + length).otherwise(F.col(nm.START_COL) - gap)
    out = (
        d.withColumn("__s__", F.greatest(s, F.lit(0)))
        .withColumn("__e__", F.greatest(e, F.lit(0)))
        .withColumn(nm.START_COL, F.col("__s__"))
        .withColumn(nm.END_COL, F.col("__e__"))
        .drop("__s__", "__e__")
        .filter(F.col(nm.START_COL) < F.col(nm.END_COL))
    )
    return GenomicRanges(out)


def downstream(
    self: GenomicRanges,
    length: int,
    *,
    gap: int = 0,
    group_by=None,
    use_strand="auto",
) -> GenomicRanges:
    """Flank of ``length`` starting ``gap`` after the (group's) 3' end."""
    neg = _neg(self, use_strand)
    d = self.df
    if group_by is not None:
        keys = _group_keys(self, group_by)
        extra = [c for c in ([nm.STRAND_COL] if self.has_strand else [])]
        d = (
            d.groupBy(*keys, *extra)
            .agg(F.min(nm.START_COL).alias(nm.START_COL), F.max(nm.END_COL).alias(nm.END_COL))
        )
    s = F.when(neg, F.col(nm.START_COL) - gap - length).otherwise(F.col(nm.END_COL) + gap)
    e = F.when(neg, F.col(nm.START_COL) - gap).otherwise(F.col(nm.END_COL) + gap + length)
    out = (
        d.withColumn("__s__", F.greatest(s, F.lit(0)))
        .withColumn("__e__", F.greatest(e, F.lit(0)))
        .withColumn(nm.START_COL, F.col("__s__"))
        .withColumn(nm.END_COL, F.col("__e__"))
        .drop("__s__", "__e__")
        .filter(F.col(nm.START_COL) < F.col(nm.END_COL))
    )
    return GenomicRanges(out)


def calculate_frame(
    self: GenomicRanges, group_by, *, use_strand="auto", frame_col: str = "Frame", tiebreak=None
) -> GenomicRanges:
    """Codon frame = cumulative length before each interval, mod 3, walking
    5'->3' per transcript (reference ext/orfs.py:42-129)."""
    keys = _group_keys(self, group_by)
    neg = _neg(self, use_strand)
    w = _five_prime_window(keys, neg, tiebreak)
    length = F.col(nm.END_COL) - F.col(nm.START_COL)
    cum_before = (
        F.sum(length).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)) - length
    )
    return GenomicRanges(self.df.withColumn(frame_col, F.pmod(cum_before, F.lit(3))))
