"""N-ary operators: count-overlaps matrix and summary statistics.

Reference: ``pr.count_overlaps`` (core/multioverlap.py:11-143) — split all
inputs' boundaries into atomic segments (or use caller-provided ``features``),
then one count column per input; ``summary`` (methods/summary.py:17-57).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pyranges_1_x_spark import names as nm
from pyranges_1_x_spark.core import GenomicRanges


def count_overlaps_matrix(
    grs: dict[str, GenomicRanges],
    *,
    features: GenomicRanges | None = None,
    use_strand="auto",
    bin_size: int | None = None,
) -> GenomicRanges:
    """One row per atomic segment of the union (or per ``features`` row), one
    count column per input name (reference core/multioverlap.py:11-143).

    Without ``features`` this never joins: because the atomic segments are cut
    at every input boundary, "intervals overlapping a segment" equals
    "intervals covering the segment start", so all N count columns come from
    ONE event-point sweep — union of tagged ±1 deltas, one hash aggregation,
    one window computing all N running sums in a single pass. With explicit
    ``features`` (arbitrary, unaligned) it falls back to N binned count joins.
    """
    from pyranges_1_x_spark import concat

    items = list(grs.items())
    if features is not None:
        out = features
        for name, g in items:
            out = out.count_overlaps(
                g, strand_behavior="ignore" if use_strand is False else "auto",
                count_col=name, bin_size=bin_size,
            )
        return out

    allg = concat([g for _, g in items])
    base = allg.remove_strand() if use_strand is False else allg
    keys = base.group_keys(use_strand)

    n = len(items)
    evs = []
    for idx, (_, g) in enumerate(items):
        d = g.remove_strand().df if use_strand is False else g.df
        for pos_col, delta in ((nm.START_COL, 1), (nm.END_COL, -1)):
            evs.append(
                d.select(
                    *keys,
                    F.col(pos_col).alias("__pos__"),
                    *[
                        F.lit(delta if j == idx else 0).alias(f"__d{j}__")
                        for j in range(n)
                    ],
                )
            )
    from pyranges_1_x_spark.plans.sweep import prefix_sweep

    ev = evs[0]
    for e in evs[1:]:
        ev = ev.unionByName(e)
    agg = ev.groupBy(*keys, "__pos__").agg(
        *[F.sum(f"__d{j}__").alias(f"__d{j}__") for j in range(n)]
    )
    cum = prefix_sweep(
        agg, keys, "__pos__", [f"__d{j}__" for j in range(n)], [name for name, _ in items],
        bucket_width=(bin_size or nm.DEFAULT_BIN_SIZE) * 16, next_col="__np__",
    )
    out = cum.filter(F.col("__np__").isNotNull()).select(
        *keys,
        F.col("__pos__").alias(nm.START_COL),
        F.col("__np__").alias(nm.END_COL),
        *[name for name, _ in items],
    )
    return GenomicRanges(out)


def summary(
    self: GenomicRanges, *, use_strand="auto", return_df: bool = False
) -> DataFrame:
    """Distribution stats of interval lengths and merged-coverage lengths,
    overall and per strand (reference methods/summary.py:17-57). Returns a
    small DataFrame: (scope, metric, count, mean, min, q25, median, q75, max,
    sum). ``return_df`` mirrors the reference parameter; in a lazy engine
    the table is returned either way (the reference's return_df=False PRINTS
    eagerly — call ``.show()`` on the result for that), so the flag is
    accepted for API compatibility and otherwise ignored."""
    del return_df

    def describe(df: DataFrame, scope: str, metric: str) -> DataFrame:
        lens = df.select((F.col(nm.END_COL) - F.col(nm.START_COL)).alias("L"))
        return lens.agg(
            F.lit(scope).alias("scope"),
            F.lit(metric).alias("metric"),
            F.count("L").alias("count"),
            F.avg("L").alias("mean"),
            F.min("L").alias("min"),
            F.expr("percentile(L, 0.25)").alias("q25"),
            F.expr("percentile(L, 0.5)").alias("median"),
            F.expr("percentile(L, 0.75)").alias("q75"),
            F.max("L").alias("max"),
            F.sum("L").alias("sum"),
        )

    parts = [describe(self.df, "all", "interval_length")]
    merged_all = self.merge_overlaps(use_strand=False).df
    parts.append(describe(merged_all, "all", "coverage_run_length"))
    if self.has_strand and use_strand in ("auto", True):
        for s in ("+", "-"):
            sub = self.df.filter(F.col(nm.STRAND_COL) == s)
            parts.append(describe(sub, f"strand {s}", "interval_length"))
        merged_s = self.merge_overlaps(use_strand=True).df
        for s in ("+", "-"):
            parts.append(
                describe(merged_s.filter(F.col(nm.STRAND_COL) == s), f"strand {s}", "coverage_run_length")
            )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
