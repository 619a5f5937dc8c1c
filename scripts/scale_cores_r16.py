"""r16 core-scaling cells (VERDICT r15 #5): nearest_updown, count_overlaps,
coverage at a COMPUTE-BOUND scale — the sf0.1 fixtures densified 10x
(row_id*16+rep remix, same coordinates, the check_oracle_scaled twin whose
values are already certified) — at a caller-chosen core count.

Usage: python scripts/scale_cores_r16.py <cores> [reps]

sf0.1 itself is overhead-dominated (BENCH_r15_c8: 67/114 queries run as
fast on 8 cores as 32), so it cannot confirm that the r15 shuffle/sort
removals SCALE; at 10x density the pair relation grows ~100x and the
compute term dominates. Methodology: densified frames are MATERIALIZED to
parquet once (so cells time the operator, not the fixture densify), each
query gets one untimed warm-up then min-of-3 noop-sink runs, tracked
caches freed between runs. Mirrors bench.py's conf (shuffle.partitions =
max(cores, 8), AQE on) so the 8-vs-32 ratio is the driver's own knob."""

import os
import sys
import time

sys.path.insert(0, ".")

CORES = int(sys.argv[1]) if len(sys.argv) > 1 else 32
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 10
SPAN = "--span" in sys.argv  # 10x-span replicas (coverage's growth axis)
SF = "/root/testdata/sf0.1"
BASE = f"/tmp/sfprobe_r16_{REPS}x" + ("_span" if SPAN else "")

from pyspark.sql import SparkSession, functions as F  # noqa: E402

import __spark_entry__ as em  # noqa: E402
from pyranges_1_x_spark import free_query_caches  # noqa: E402
from pyranges_1_x_spark.core import GenomicRanges  # noqa: E402

spark = (
    SparkSession.builder.master(f"local[{CORES}]")
    .config("spark.sql.shuffle.partitions", str(max(CORES, 8)))
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.driver.memory", "24g")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
spark.range(1_000_000).join(F.broadcast(spark.range(1000)), on="id").write.format(
    "noop"
).mode("overwrite").save()

orig_a, orig_b = em._gr_a, em._gr_b
ga, gb = orig_a(spark, SF), orig_b(spark, SF)

if not os.path.exists(BASE + "/b10"):
    reps = spark.range(REPS).select(F.col("id").alias("rep"))
    mult = 1 << (REPS - 1).bit_length()
    for name, g in (("a10", ga), ("b10", gb)):
        big = g.df.crossJoin(F.broadcast(reps)).withColumn(
            "row_id", F.col("row_id") * mult + F.col("rep")
        )
        if SPAN:
            # scale_probe's 10x-span: shifted copies — genome REPS x longer
            # at the same density (coverage's distinct-boundary count grows,
            # unlike the density shape where it is invariant).
            off = F.col("rep") * 501_000
            big = big.withColumn("Start", F.col("Start") + off).withColumn(
                "End", F.col("End") + off
            )
        big.drop("rep").write.mode("overwrite").parquet(BASE + f"/{name}")

bins = {"a": ga._bin_size, "b": gb._bin_size}
em._gr_a = lambda s, d: GenomicRanges(s.read.parquet(BASE + "/a10"), bin_size=bins["a"])
em._gr_b = lambda s, d: GenomicRanges(s.read.parquet(BASE + "/b10"), bin_size=bins["b"])

QUERIES = ["nearest_updown", "count_overlaps", "coverage"]


def run(q):
    t0 = time.time()
    em.queries()[q](spark, SF).write.format("noop").mode("overwrite").save()
    wall = time.time() - t0
    free_query_caches()
    return round(wall, 2)


print(f"cores={CORES} reps={REPS} shuffle.partitions={max(CORES, 8)}", flush=True)
for q in QUERIES:
    spark.sparkContext.setJobDescription(f"scale_cores_r16 {q} cores={CORES}")
    warm = run(q)
    samples = [run(q) for _ in range(3)]
    print(f"CELL {q} cores={CORES}: min={min(samples)} samples={samples} warmup={warm}", flush=True)
spark.stop()
