"""r16 bucketed-islands phase-2 materialize A/B (VERDICT r15 #7).

The bucketed assign_islands plan's bucket-tagged input feeds two branches
(phase-2 groupBy summary + phase-1 window) that never canonicalize equal,
so a derived input evaluates twice. A: materialize=False (status quo);
B: materialize=True (tracked persist). Run at the bucketed plan's firing
shape: a 6M-row DERIVED input (10x-density union of both sf0.1 interval
fixtures, i.e. the set_union composition) with the bucketed plan FORCED
(SPARK_GRAFT_ISLAND_SINGLE_WINDOW_BYTES=0 — the shape that fires above
the 256 MB estimate threshold). Values asserted identical first.
"""

import os
import sys
import time

os.environ["SPARK_GRAFT_ISLAND_SINGLE_WINDOW_BYTES"] = "0"
sys.path.insert(0, ".")

from pyspark.sql import SparkSession, functions as F  # noqa: E402

import __spark_entry__ as em  # noqa: E402
from pyranges_1_x_spark import free_query_caches  # noqa: E402
from pyranges_1_x_spark.plans.islands import island_agg  # noqa: E402

SF = "/root/testdata/sf0.1"
BASE = "/tmp/sfprobe_r16_10x"

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.driver.memory", "16g")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
spark.range(1_000_000).join(F.broadcast(spark.range(1000)), on="id").write.format(
    "noop"
).mode("overwrite").save()

if not os.path.exists(BASE + "/b10"):
    raise SystemExit("run scripts/scale_cores_r16.py once first (builds the replicas)")

cols = ["Chromosome", "Start", "End"]
# Derived input: the set_union shape — union of both sides, then islands.
a = spark.read.parquet(BASE + "/a10").select(*cols)
b = spark.read.parquet(BASE + "/b10").select(*cols)
both = a.unionByName(b)


def build(mat):
    return island_agg(both, ["Chromosome"], bucket_width=100_000 * 16, materialize=mat)


va = sorted(map(tuple, build(False).collect()))
free_query_caches()
vb = sorted(map(tuple, build(True).collect()))
free_query_caches()
assert va == vb, f"mismatch {len(va)} vs {len(vb)}"
print(f"value-identical on {len(va)} rows", flush=True)


def run(mat):
    t0 = time.time()
    build(mat).write.format("noop").mode("overwrite").save()
    wl = time.time() - t0
    free_query_caches()
    return round(wl, 3)


run(False); run(True)
ra, rb = [], []
for _ in range(4):
    ra.append(run(False))
    rb.append(run(True))
print("A no-mat :", ra, "min", min(ra))
print("B persist:", rb, "min", min(rb))
spark.stop()
