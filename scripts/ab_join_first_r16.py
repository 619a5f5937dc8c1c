"""r16 join_first A/B (VERDICT r15 #4): the min_by(struct, struct) reduction
plans a SortAggregate (struct agg buffer disqualifies hash aggregation).
Variants at the current shape, interleaved, value-identity asserted:

A: current min_by hash-na aggregate (SortAggregate partial+final)
B: row_number window + rk=1 filter (Spark 3.5+ rewrites to WindowGroupLimit:
   partial top-1 per key BEFORE the exchange, so the shuffle carries <=1 row
   per key per map partition, like A's partial — but the local sort key is
   (_LID, rstart, rend) vs A's (_LID))
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import SparkSession, Window, functions as F  # noqa: E402

import __spark_entry__ as em  # noqa: E402
from pyranges_1_x_spark import free_query_caches  # noqa: E402
from pyranges_1_x_spark.plans.interval_join import binned_join, rename_keys  # noqa: E402
from pyranges_1_x_spark import names as nm  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.driver.memory", "16g")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
spark.range(1_000_000).join(F.broadcast(spark.range(1000)), on="id").write.format(
    "noop"
).mode("overwrite").save()

_LID = "__ij_lid__"


def pair_relation():
    """The binned_join pair relation exactly as join_overlaps(multiple=first)
    sees it (how=inner)."""
    a, b = em._gr_a(spark, SF), em._gr_b(spark, SF)
    keys = [nm.CHROM_COL]
    left = a.df
    right = b.df
    right_sfx, rkeys = rename_keys(right, keys)
    for c in right.columns:
        if c in keys:
            continue
        if c in (nm.START_COL, nm.END_COL) or c in left.columns:
            right_sfx = right_sfx.withColumnRenamed(c, c + "_b")
    return binned_join(
        left, right_sfx, keys=keys, right_keys=rkeys, how="inner",
        bin_size=1000, rstart="Start_b", rend="End_b",
    )


PROJ = ["row_id", "Chromosome", "Start", "End", "Strand", "Score", "Start_b", "End_b"]


def variant_a():
    out = pair_relation()
    matched = out.filter(F.col("__matched__"))
    payload = F.struct(*[F.col(c) for c in out.columns])
    red = matched.groupBy(_LID).agg(
        F.min_by(payload, F.struct(F.col("Start_b"), F.col("End_b"))).alias("__p__")
    )
    return red.select("__p__.*").drop(_LID, "__ij_rid__", "__matched__").select(*PROJ)


def variant_b():
    out = pair_relation()
    matched = out.filter(F.col("__matched__"))
    w = Window.partitionBy(_LID).orderBy(F.col("Start_b").asc(), F.col("End_b").asc())
    red = matched.withColumn("__rk__", F.row_number().over(w)).filter(F.col("__rk__") == 1)
    return red.drop("__rk__", _LID, "__ij_rid__", "__matched__").select(*PROJ)


# value identity — min_by ties: min_by picks ANY row among ties on the order
# struct; the gate projects only coordinate columns, and equal-coordinate
# ties hash equal, so compare the PROJECTED rows.
va = sorted(map(tuple, variant_a().collect()))
vb = sorted(map(tuple, variant_b().collect()))
assert va == vb, f"value mismatch {len(va)} vs {len(vb)}"
print(f"value-identical on {len(va)} projected rows")

for name, v in (("A sortagg", variant_a), ("B wingrplimit", variant_b)):
    print(name, "plan nodes:", end=" ")
    p = v()._sc._jvm if False else None
    import io
    import contextlib

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        v().explain("formatted")
    s = buf.getvalue()
    for node in ("SortAggregate", "HashAggregate", "WindowGroupLimit", "Window", "Exchange", "Sort"):
        print(f"{node}={s.count(') ' + node)}", end=" ")
    print()


def run(v):
    t0 = time.time()
    v().write.format("noop").mode("overwrite").save()
    w = time.time() - t0
    free_query_caches()
    return round(w, 3)


run(variant_a); run(variant_b)
a, b = [], []
for i in range(5):
    a.append(run(variant_a))
    b.append(run(variant_b))
print("A (min_by sortagg):", a, "min", min(a))
print("B (window-group-limit):", b, "min", min(b))
spark.stop()
