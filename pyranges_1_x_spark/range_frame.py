"""RangeFrame — the interval kernels on bare (Start, End) frames.

Reference: ``pyranges1/range_frame/range_frame.py`` — the exported base
class of PyRanges that requires only Start/End (no Chromosome) and exposes
the kernel surface: merge, count, combine_interval_columns, cluster, join,
max_disjoint, nearest, overlap, sort, subtract, sort_by_position, plus
validation. Grouping is ONLY what the caller passes via ``match_by``.

Spark realization: inject a constant grouping key named ``Chromosome``
(the column GenomicRanges keys on), delegate every operator to the
GenomicRanges implementation, and strip the key from results. A
pre-existing metadata column literally named ``Chromosome`` is shielded by
renaming it around the delegation — in the reference such a column is
plain metadata for RangeFrame ops, and that holds here too.

Scale note (measured, SCALING.md r8): the constant key is NOT a
serialization hazard — the island/join planners parallelize on
(key, bucket), so a single synthetic key still fans out across all
buckets. RangeFrame.merge over a 600k-row frame ran 8.66s vs 9.21s for
the same rows forced onto one chromosome through GenomicRanges and 3.73s
spread over five chromosomes: a bounded ~2.5× single-key premium (the
final boundary stitch), not the ~10–30× a key-serialized plan would show.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyranges_1_x_spark import names as nm
from pyranges_1_x_spark.core import GenomicRanges

_SHIELD = "__rf_user_chromosome__"


class RangeFrame:
    """See module docstring. ``.df`` returns the user's frame unchanged."""

    def __init__(self, df: DataFrame):
        missing = [c for c in (nm.START_COL, nm.END_COL) if c not in df.columns]
        if missing:
            raise ValueError(f"RangeFrame requires columns Start/End; missing {missing}")
        self._df = df

    @property
    def df(self) -> DataFrame:
        return self._df

    def __repr__(self) -> str:
        cols = ", ".join(f"{c}:{t}" for c, t in self._df.dtypes)
        return f"RangeFrame[{cols}] (lazy)"

    def tostring(self, **kw) -> str:
        """Bounded table repr (see core.GenomicRanges.tostring)."""
        from pyranges_1_x_spark.tostring import tostring as _ts

        return _ts(self._df, class_name="RangeFrame", **kw)

    # -- delegation plumbing ------------------------------------------------
    def _lift(self) -> GenomicRanges:
        d = self._df
        if nm.CHROM_COL in d.columns:
            d = d.withColumnRenamed(nm.CHROM_COL, _SHIELD)
        return GenomicRanges(d.withColumn(nm.CHROM_COL, F.lit("*")))

    @staticmethod
    def _lower(res) -> "RangeFrame | DataFrame":
        d = res.df if isinstance(res, GenomicRanges) else res
        d = d.drop(nm.CHROM_COL)
        if _SHIELD in d.columns:
            d = d.withColumnRenamed(_SHIELD, nm.CHROM_COL)
        return RangeFrame(d) if nm.START_COL in d.columns and nm.END_COL in d.columns else d

    def _unary(self, method, *args, **kw):
        return self._lower(getattr(self._lift(), method)(*args, **kw))

    def _binary(self, method, other, *args, **kw):
        o = other if isinstance(other, RangeFrame) else RangeFrame(getattr(other, "df", other))
        return self._lower(
            getattr(self._lift(), method)(o._lift(), *args, strand_behavior="ignore", **kw)
        )

    # -- the RangeFrame surface (reference range_frame.py:78-763) ----------
    def merge_overlaps(self, **kw):
        return self._unary("merge_overlaps", use_strand=False, **kw)

    def cluster_overlaps(self, **kw):
        return self._unary("cluster_overlaps", use_strand=False, **kw)

    def max_disjoint_overlaps(self, **kw):
        return self._unary("max_disjoint_overlaps", use_strand=False, **kw)

    def sort_ranges(self, by=None, **kw):
        kw.setdefault("natsort", False)
        return self._unary("sort_ranges", by, use_strand=False, **kw)

    def sort_by_position(self):
        return self._unary("sort_by_position")

    def combine_interval_columns(self, function="intersect", **kw):
        from pyranges_1_x_spark.functions import metrics as _mx

        return RangeFrame(_mx.combine_interval_columns(self._df, function, **kw))

    def overlap(self, other, **kw):
        return self._binary("overlap", other, **kw)

    def join_overlaps(self, other, **kw):
        return self._binary("join_overlaps", other, **kw)

    def count_overlaps(self, other, **kw):
        return self._binary("count_overlaps", other, **kw)

    def subtract_overlaps(self, other, **kw):
        return self._binary("subtract_overlaps", other, **kw)

    def nearest_ranges(self, other, **kw):
        return self._binary("nearest_ranges", other, **kw)

    def intersect_overlaps(self, other, **kw):
        return self._binary("intersect_overlaps", other, **kw)

    def copy(self) -> "RangeFrame":
        return RangeFrame(self._df)

    def invalid_ranges(self) -> DataFrame:
        """reasons_why_frame_is_invalid equivalent
        (range_frame_validator.py:99-133)."""
        return self._lift().invalid_ranges().drop(nm.CHROM_COL)
