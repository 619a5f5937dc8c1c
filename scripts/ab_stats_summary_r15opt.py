"""Interleaved A/B for the r15 forbes/jaccard dual-depth sweep and the
summary per-strand grouped describe.

A = r14 shapes, reconstructed from the (unchanged) set-op operators:
    - forbes: set_intersect length + two standalone merges' lengths
      (island_agg of A and of B each evaluated twice).
    - jaccard: set_intersect length + set_union length (same double
      island_agg evaluation).
    - summary: per-strand rows as filtered global aggregates (the strand-
      merged island pipeline evaluated once per strand branch).
B = r15 shapes (HEAD code): one dual-depth prefix sweep for all interval
    totals; one groupBy(Strand) pass with null-L sentinels.

One warm session, alternating runs, noop sink. Value-identity asserted first.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")


def old_jaccard(a, b):
    from pyspark.sql import functions as F

    inter = a.set_intersect_overlaps(b, strand_behavior="ignore").length_sum()
    union = a.set_union_overlaps(b, strand_behavior="ignore").length_sum()
    i = inter.withColumnRenamed("length", "il")
    u = union.withColumnRenamed("length", "ul")
    return i.crossJoin(u).select(
        (F.col("il") / F.col("ul")).alias("jaccard"),
        F.col("il").alias("intersection_length"),
        F.col("ul").alias("union_length"),
    )


def old_forbes(a, b, genome_length):
    from pyspark.sql import functions as F

    inter = a.set_intersect_overlaps(b, strand_behavior="ignore").length_sum()
    la = a.merge_overlaps(use_strand=False).length_sum().withColumnRenamed("length", "la")
    lb = b.merge_overlaps(use_strand=False).length_sum().withColumnRenamed("length", "lb")
    return (
        inter.withColumnRenamed("length", "il")
        .crossJoin(la)
        .crossJoin(lb)
        .select(
            (
                (F.col("il").cast("double") / F.col("la").cast("double"))
                * (F.lit(float(genome_length)) / F.col("lb").cast("double"))
            ).alias("forbes")
        )
    )


def old_summary(g):
    from pyspark.sql import functions as F

    import pyranges_1_x_spark.names as nm

    def describe(df, scope, metric):
        lens = df.select((F.col(nm.END_COL) - F.col(nm.START_COL)).alias("L"))
        return lens.agg(
            F.lit(scope).alias("scope"), F.lit(metric).alias("metric"),
            F.count("L").alias("count"), F.avg("L").alias("mean"),
            F.min("L").alias("min"),
            F.expr("percentile(L, 0.25)").alias("q25"),
            F.expr("percentile(L, 0.5)").alias("median"),
            F.expr("percentile(L, 0.75)").alias("q75"),
            F.max("L").alias("max"), F.sum("L").alias("sum"),
        )

    parts = [describe(g.df, "all", "interval_length")]
    parts.append(describe(g.merge_overlaps(use_strand=False).df, "all", "coverage_run_length"))
    for s in ("+", "-"):
        parts.append(describe(g.df.filter(F.col(nm.STRAND_COL) == s), f"strand {s}", "interval_length"))
    merged_s = g.merge_overlaps(use_strand=True).df
    for s in ("+", "-"):
        parts.append(describe(merged_s.filter(F.col(nm.STRAND_COL) == s), f"strand {s}", "coverage_run_length"))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    rounds = int(os.environ.get("AB_ROUNDS", "4"))

    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod
    from pyranges_1_x_spark.functions.stats import forbes_statistic, jaccard_statistic

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("ab-stats-summary-r15opt")
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
    genome_length = sum(s for _, s in entrymod.CHROMSIZES)

    cases = {
        "forbes": (lambda: old_forbes(a, b, genome_length),
                   lambda: forbes_statistic(a, b, genome_length)),
        "jaccard": (lambda: old_jaccard(a, b),
                    lambda: jaccard_statistic(a, b)),
        "summary": (lambda: old_summary(a),
                    lambda: a.summary(use_strand=True)),
    }

    def canon(df):
        return sorted(tuple(None if v is None else round(v, 9) if isinstance(v, float) else v for v in r) for r in df.collect())

    for name, (fa, fb) in cases.items():
        ra, rb = canon(fa()), canon(fb())
        assert ra == rb, f"{name} value mismatch:\nA={ra}\nB={rb}"
        print(f"{name}: value-identical ({len(ra)} rows)", flush=True)

    def run(fn) -> float:
        t0 = time.time()
        fn().write.format("noop").mode("overwrite").save()
        return time.time() - t0

    for name, (fa, fb) in cases.items():
        run(fa); run(fb)  # warm
        ta, tb = [], []
        for _ in range(rounds):
            spark.sparkContext.setJobDescription(f"{name}-A")
            ta.append(run(fa))
            spark.sparkContext.setJobDescription(f"{name}-B")
            tb.append(run(fb))
        print(f"{name} A: {['%.2f' % t for t in ta]} min={min(ta):.2f}")
        print(f"{name} B: {['%.2f' % t for t in tb]} min={min(tb):.2f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
