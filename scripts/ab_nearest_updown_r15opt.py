"""Interleaved A/B for the r15 nearest_updown distance-only rewrite.

A = the r14 shape: nearest_ranges(direction='upstream', k=1) + projection.
B = the r15 shape: nearest_distance(direction='upstream') + projection
    (what q_nearest_updown now runs).

Both variants materialize through the noop sink in ONE warm session,
alternating A,B,A,B,... so external load hits both arms equally. Asserts
value-identity (sorted rows) once before timing.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    rounds = int(os.environ.get("AB_ROUNDS", "4"))

    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod
    from pyranges_1_x_spark.core import GenomicRanges
    from pyranges_1_x_spark.operators.nearest import nearest_distance

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("ab-nearest-updown-r15opt")
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
    cols = ["row_id", "Chromosome", "Start", "End", "Strand", "Score", "Distance"]

    def build_a():
        a_s = GenomicRanges(a.df.filter("row_id % 10 = 3"), bin_size=1000)
        out = a_s.nearest_ranges(
            b, direction="upstream", k=1, strand_behavior="ignore", dist_col="Distance"
        )
        return out.df.select(*cols)

    def build_b():
        a_s = GenomicRanges(a.df.filter("row_id % 10 = 3"), bin_size=1000)
        out = nearest_distance(
            a_s, b, direction="upstream", strand_behavior="ignore", dist_col="Distance"
        )
        return out.df.select(*cols)

    ra = sorted(map(tuple, build_a().collect()))
    rb = sorted(map(tuple, build_b().collect()))
    assert ra == rb, f"value mismatch: {len(ra)} vs {len(rb)} rows"
    print(f"value-identical: {len(ra)} rows", flush=True)

    def run(build):
        t0 = time.time()
        build().write.format("noop").mode("overwrite").save()
        return time.time() - t0

    # warm both arms once (untimed)
    run(build_a), run(build_b)
    ta, tb = [], []
    for _ in range(rounds):
        ta.append(run(build_a))
        tb.append(run(build_b))
    print("A nearest_ranges :", [round(x, 2) for x in ta], "min", round(min(ta), 3))
    print("B nearest_distance:", [round(x, 2) for x in tb], "min", round(min(tb), 3))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
