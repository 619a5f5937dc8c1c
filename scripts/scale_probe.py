import sys; sys.path.insert(0, ".")
import json, time
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
import importlib.util
spec = importlib.util.spec_from_file_location("e", "/root/repo/__spark_entry__.py")
mod = importlib.util.module_from_spec(spec); spec.loader.exec_module(mod)
spark = (SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "64")
    .config("spark.driver.memory", "24g")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.ui.enabled","false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
sf = "/root/testdata/sf0.1"
import os, shutil
base = "/tmp/sfprobe"
def sink(df): df.write.format("noop").mode("overwrite").save()

# materialize base interval frames once (strip the fixture window cost)
a = mod._gr_a(spark, sf).df
b = mod._gr_b(spark, sf).df
if not os.path.exists(base + "/a1"):
    os.makedirs(base, exist_ok=True)
    a.write.mode("overwrite").parquet(base + "/a1")
    b.write.mode("overwrite").parquet(base + "/b1")
    # span-10x: 10 shifted copies (genome 10x longer, same density)
    shifts = [(i, i * 501_000) for i in range(10)]
    sdf = spark.createDataFrame(shifts, "rep long, off long")
    for (name, src) in (("a", a), ("b", b)):
        big = (src.crossJoin(sdf)
               .withColumn("Start", F.col("Start") + F.col("off"))
               .withColumn("End", F.col("End") + F.col("off"))
               .withColumn("row_id", F.col("row_id") * 16 + F.col("rep"))
               .drop("rep", "off"))
        big.write.mode("overwrite").parquet(base + f"/{name}10span")
    # density-10x: same coordinates, 10x rows
    for (name, src) in (("a", a), ("b", b)):
        big = (src.crossJoin(sdf)
               .withColumn("row_id", F.col("row_id") * 16 + F.col("rep"))
               .drop("rep", "off"))
        big.write.mode("overwrite").parquet(base + f"/{name}10dens")
    docs = spark.read.parquet(sf + "/documents.parquet")
    docs.write.mode("overwrite").parquet(base + "/docs1")
    (docs.crossJoin(sdf.select("rep"))
         .withColumn("doc_id", F.col("doc_id") * 16 + F.col("rep"))
         .withColumn("text", F.concat(F.col("text"), F.lit(" rep"), F.col("rep").cast("string")))
         .drop("rep")).write.mode("overwrite").parquet(base + "/docs10")

# skew-10x (r8, VERDICT #4): density replicas with 90% of rows forced onto
# chr1 — the "chr1 >> chrM" cluster shape SURVEY §4.3.6 claims AQE+buckets
# absorb. Built from the density parquet so row counts match 10x-dens
# exactly; only the key distribution changes.
if not os.path.exists(base + "/a10skew"):
    for name in ("a", "b"):
        d = spark.read.parquet(base + f"/{name}10dens")
        (d.withColumn("Chromosome",
                      F.when(F.col("row_id") % 16 < 9, F.lit("chr1"))
                       .otherwise(F.col("Chromosome")))
          .write.mode("overwrite").parquet(base + f"/{name}10skew"))
    # single-key control for the RangeFrame cell: ALL rows on one chromosome
    (spark.read.parquet(base + "/a10dens")
        .withColumn("Chromosome", F.lit("chr1"))
        .write.mode("overwrite").parquet(base + "/a10onekey"))

from pyranges_1_x_spark.core import GenomicRanges
from pyranges_1_x_spark.ml.dedup import minhash_lsh_candidates
def gr(p): return GenomicRanges(spark.read.parquet(p), bin_size=1000)
def t(fn):
    best = 1e9
    for _ in range(2):
        t0=time.time(); fn(); best=min(best, time.time()-t0)
    return round(best,2)

class _Res(dict):
    # incremental flush: a killed probe still leaves every finished cell
    def __setitem__(self, k, v):
        super().__setitem__(k, v)
        print(f"CELL {k}: {v}", flush=True)
res = _Res()
for scale, asfx, bsfx in (("1x","a1","b1"), ("10x-span","a10span","b10span"), ("10x-dens","a10dens","b10dens")):
    A, B = gr(base+f"/{asfx}"), gr(base+f"/{bsfx}")
    res[f"merge {scale}"] = t(lambda: sink(A.merge_overlaps().df))
    res[f"join_inner {scale}"] = t(lambda: sink(A.join_overlaps(B).df))
    res[f"count_overlaps {scale}"] = t(lambda: sink(A.count_overlaps(B).df))
    res[f"coverage {scale}"] = t(lambda: sink(A.to_coverage().df))
for scale, d in (("1x","docs1"), ("10x","docs10")):
    D = spark.read.parquet(base+f"/{d}")
    res[f"minhash_lsh {scale}"] = t(lambda: sink(minhash_lsh_candidates(D, num_hashes=32, bands=16, k=3)))

# --- r8 additions (VERDICT r7 #4/#8) ---------------------------------------
from pyranges_1_x_spark.operators.nearest import nearest_distance
from pyranges_1_x_spark.range_frame import RangeFrame
from pyranges_1_x_spark.ml.dedup import dedup_clusters

shapes = (("1x","a1","b1"), ("10x-span","a10span","b10span"),
          ("10x-dens","a10dens","b10dens"), ("10x-skew","a10skew","b10skew"))
for scale, asfx, bsfx in shapes:
    A, B = gr(base+f"/{asfx}"), gr(base+f"/{bsfx}")
    res[f"nearest {scale}"] = t(lambda: sink(nearest_distance(A, B, strand_behavior="ignore").df))
    res[f"subtract {scale}"] = t(lambda: sink(A.subtract_overlaps(B).df))
    res[f"group_cumsum {scale}"] = t(lambda: sink(A.group_cumsum(
        group_by="Score", cumsum_start_column="ls", cumsum_end_column="le",
        tiebreak=["row_id"]).df))
    res[f"slice_10_60 {scale}"] = t(lambda: sink(A.slice_ranges(
        10, 60, group_by="Score", tiebreak=["row_id"]).df))
    if scale.endswith("skew"):  # skew cells for the r7 operators too
        res[f"merge {scale}"] = t(lambda: sink(A.merge_overlaps().df))
        res[f"join_inner {scale}"] = t(lambda: sink(A.join_overlaps(B).df))
        res[f"count_overlaps {scale}"] = t(lambda: sink(A.count_overlaps(B).df))
        res[f"coverage {scale}"] = t(lambda: sink(A.to_coverage().df))

# RangeFrame constant-key cell: Chromosome-free merge over the 10x-density
# frame vs the same rows forced onto ONE chromosome through GenomicRanges —
# the bucketed island planner must keep the single synthetic key parallel.
rf = RangeFrame(spark.read.parquet(base + "/a10dens").drop("Chromosome"))
res["rangeframe_merge 10x-dens"] = t(lambda: sink(rf.merge_overlaps().df))
onekey = gr(base + "/a10onekey")
res["merge 10x-onechrom"] = t(lambda: sink(onekey.merge_overlaps().df))

# connected components / dedup_clusters: iterative CC fixed cost x rounds
for scale, d in (("1x","docs1"), ("10x","docs10")):
    D = spark.read.parquet(base+f"/{d}")
    res[f"dedup_clusters {scale}"] = t(lambda: sink(dedup_clusters(D, threshold=0.6)))
print(json.dumps(res, indent=1))
