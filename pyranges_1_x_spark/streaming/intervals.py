"""Streaming interval operators (Spark-side extension; no reference analogue).

Two streaming-safe shapes over the engine's binned-interval machinery:

* ``annotate_stream`` — overlap-join a STREAM of intervals against a static
  annotation frame. Stateless (stream-static inner joins need no state
  store), so it runs with any trigger and never grows memory: each
  micro-batch is binned, hash-joined against the static side, and emitted.
* ``windowed_interval_coverage`` — event-time rollup of interval depth per
  (window, Chromosome, bin): a watermarked streaming aggregation whose state
  is bounded by (#windows in watermark horizon) x (#hot bins). The coarse
  ``bin_size`` is the state knob.

Both run identically on a batch DataFrame (watermark skipped), which is how
the correctness tests and the DuckDB oracle exercise the same plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyranges_1_x_spark import names as nm
from pyranges_1_x_spark.core import GenomicRanges
from pyranges_1_x_spark.plans.interval_join import _explode_bins, floordiv, rename_keys


def annotate_stream(
    stream: DataFrame,
    annotation: GenomicRanges,
    *,
    keys: list[str] | None = None,
    suffix: str = nm.JOIN_SUFFIX,
    bin_size: int = nm.DEFAULT_BIN_SIZE,
) -> DataFrame:
    """Inner overlap-join of a (possibly streaming) interval DataFrame against
    a static annotation frame; output = stream columns + suffixed annotation
    columns, one row per overlapping pair.

    Built directly on the binning primitives (not ``interval_join``) because
    streaming plans forbid ``monotonically_increasing_id`` — and a stateless
    pair-emitting join needs no row identity anyway."""
    keys = keys or [nm.CHROM_COL]
    right = annotation.df
    for c in right.columns:
        if c not in keys and (c in (nm.START_COL, nm.END_COL) or c in stream.columns):
            right = right.withColumnRenamed(c, c + suffix)
    right, rkeys = rename_keys(right, keys)
    rstart, rend = nm.START_COL + suffix, nm.END_COL + suffix

    lb = _explode_bins(stream, nm.START_COL, nm.END_COL, bin_size, "__lbin__")
    rb = F.broadcast(_explode_bins(right, rstart, rend, bin_size, "__rbin__"))

    cond = F.col("__lbin__") == F.col("__rbin__")
    for k, rk in zip(keys, rkeys):
        cond = cond & (F.col(k) == F.col(rk))
    ls, le = F.col(nm.START_COL), F.col(nm.END_COL)
    rs, re_ = F.col(rstart), F.col(rend)
    cond = cond & (ls < re_) & (rs < le)
    # emit-once: the pair qualifies only in the bin containing max(ls, rs)
    cond = cond & (F.col("__lbin__") == floordiv(F.greatest(ls, rs), bin_size))

    out_cols = [F.col(c) for c in stream.columns] + [
        F.col(c) for c in right.columns if c not in rkeys
    ]
    return lb.join(rb, cond, "inner").select(*out_cols)


def windowed_interval_coverage(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    window_duration: str = "1 hour",
    bin_size: int = nm.DEFAULT_BIN_SIZE,
    watermark: str = "2 hours",
) -> DataFrame:
    """Per event-time window, per (Chromosome, coordinate bin): how many
    intervals touched the bin. Streaming state is bounded by the watermark."""
    d = events
    if d.isStreaming:
        d = d.withWatermark(ts_col, watermark)
    # exact integer floordiv (r14 review find: the float division this
    # re-implemented loses precision above 2^53 — the precise hole
    # plans/interval_join.floordiv exists to close; annotate_stream eight
    # lines down already used it)
    lo = floordiv(F.col(nm.START_COL), bin_size)
    hi = F.greatest(lo, floordiv(F.col(nm.END_COL) - 1, bin_size))
    binned = d.withColumn("__bin__", F.explode(F.sequence(lo, hi)))
    return (
        binned.groupBy(
            F.window(F.col(ts_col), window_duration).alias("w"),
            F.col(nm.CHROM_COL),
            F.col("__bin__"),
        )
        .agg(F.count(F.lit(1)).alias("n_intervals"))
        .select(
            F.col("w.start").alias("window_start"),
            nm.CHROM_COL,
            (F.col("__bin__") * bin_size).alias(nm.START_COL),
            (F.col("__bin__") * bin_size + bin_size).alias(nm.END_COL),
            "n_intervals",
        )
    )
