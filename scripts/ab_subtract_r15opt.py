"""Interleaved A/B for the r15 subtract single-pass rewrite.

A = r14 shape: gaps and tails as two filtered branches of the enriched
    join+window relation glued with unionByName — the whole binned join +
    window pipeline evaluated twice (reconstructed here from the same
    internals).
B = r15 shape: one pass, both residual segments emitted per row via
    explode(filter(array(...))) (HEAD code).

One warm session, alternating runs, noop sink. Value-identity asserted first
(sorted multisets, so the union-order difference is irrelevant — the oracle
gate compares sorted rows too).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")


def old_subtract(a, b):
    """The pre-r15 union-of-branches shape, reproduced verbatim."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    import pyranges_1_x_spark.names as nm
    from pyranges_1_x_spark.core import GenomicRanges
    from pyranges_1_x_spark.plans.interval_join import _LID, binned_join, rename_keys
    from pyranges_1_x_spark.plans.islands import island_agg

    self = a
    odf, keys = self._binary_prepared(b, "ignore", None)
    bin_size = self.resolve_bin(None)
    blockers, bkeys = rename_keys(
        island_agg(
            odf.select(*keys, nm.START_COL, nm.END_COL), keys,
            bucket_width=bin_size * 16, adaptive=True,
        )
        .withColumnRenamed(nm.START_COL, "__bs__")
        .withColumnRenamed(nm.END_COL, "__be__")
        .filter(F.col("__be__") > F.col("__bs__")),
        keys,
    )
    joined = binned_join(
        self.df, blockers, keys=keys, right_keys=bkeys, how="left",
        bin_size=bin_size, rstart="__bs__", rend="__be__",
        keep_unmatched_bins=True,
    )
    w = Window.partitionBy(_LID).orderBy(F.col("__bs__").asc_nulls_first())
    prev_end = F.max("__be__").over(w.rowsBetween(Window.unboundedPreceding, -1))
    rn_desc = F.row_number().over(
        Window.partitionBy(_LID).orderBy(F.col("__bs__").desc_nulls_last())
    )
    max_end = F.max("__be__").over(Window.partitionBy(_LID))
    gap_start = F.greatest(F.col(nm.START_COL), F.coalesce(prev_end, F.col(nm.START_COL)))
    gap_end = F.least(F.col(nm.END_COL), F.col("__bs__"))
    tail_start = F.when(
        F.col("__matched__"), F.greatest(F.col(nm.START_COL), max_end)
    ).otherwise(F.col(nm.START_COL))
    enriched = (
        joined.withColumn("__gs__", gap_start)
        .withColumn("__ge__", gap_end)
        .withColumn("__ts__", F.when(rn_desc == 1, tail_start))
    )
    meta = [c for c in self.df.columns if c not in (nm.START_COL, nm.END_COL)]
    gaps = enriched.filter(
        F.col("__matched__") & (F.col("__gs__") < F.col("__ge__"))
    ).select(*meta, F.col("__gs__").alias(nm.START_COL), F.col("__ge__").alias(nm.END_COL))
    tails = enriched.filter(
        F.col("__ts__").isNotNull() & (F.col("__ts__") < F.col(nm.END_COL))
    ).select(*meta, F.col("__ts__").alias(nm.START_COL), F.col(nm.END_COL))
    return GenomicRanges(gaps.unionByName(tails).select(*self.df.columns))


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    rounds = int(os.environ.get("AB_ROUNDS", "4"))

    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("ab-subtract-r15opt")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    a = entrymod._gr_a(spark, sf_dir)
    b = entrymod._gr_b(spark, sf_dir)

    def build(variant: str):
        if variant == "A":
            return old_subtract(a, b).df
        return a.subtract_overlaps(b, strand_behavior="ignore").df

    ra = sorted(map(tuple, build("A").collect()))
    rb = sorted(map(tuple, build("B").collect()))
    assert ra == rb, f"value mismatch: {len(ra)} vs {len(rb)}"
    print(f"value-identical: {len(ra)} rows", flush=True)

    def run(variant: str) -> float:
        spark.sparkContext.setJobDescription(f"subtract-{variant}")
        t0 = time.time()
        build(variant).write.format("noop").mode("overwrite").save()
        return time.time() - t0

    run("A"); run("B")  # warm both shapes
    ta, tb = [], []
    for _ in range(rounds):
        ta.append(run("A"))
        tb.append(run("B"))
    print(f"A (union, double-eval): {['%.2f' % t for t in ta]} min={min(ta):.2f}")
    print(f"B (single-pass explode): {['%.2f' % t for t in tb]} min={min(tb):.2f}")
    print(f"per-round B/A: {['%.2f' % (y / x) for x, y in zip(ta, tb)]}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
