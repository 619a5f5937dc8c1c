"""Interleaved A/B for the r15 winnow row-local window-min rewrite.

A = r14 shape: posexplode every gram position, Exchange by doc, sort, rows-
    frame Window min, filter, distinct (reconstructed here).
B = r15 shape: per-row array window-min (array_min over a w-slice), only
    selected fingerprints become rows (HEAD code).

One warm session, alternating runs, noop sink. Value-identity asserted first.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")


def old_winnow(df, k: int, window: int, hash_fn):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from pyranges_1_x_spark.ml.text import chunked_gram_hashes

    base = df.select(F.col("doc_id"), F.trim(F.col("text")).alias("__t__"))
    h_arr = chunked_gram_hashes(F.col("__t__"), k, hash_fn)
    d = base.select(F.col("doc_id"), F.posexplode(h_arr).alias("__pos__", "__h__"))
    w = (
        Window.partitionBy("doc_id")
        .orderBy("__pos__")
        .rowsBetween(-(window - 1), Window.currentRow)
    )
    d = d.withColumn("__wm__", F.min("__h__").over(w))
    return (
        d.filter(F.col("__h__") == F.col("__wm__"))
        .select(F.col("doc_id"), F.col("__h__").alias("fp"))
        .distinct()
    )


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    rounds = int(os.environ.get("AB_ROUNDS", "4"))

    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod
    from pyranges_1_x_spark.ml.dedup import md5_hash64
    from pyranges_1_x_spark.ml.text import winnow_fingerprints

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("ab-winnow-r15opt")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    entrymod._load(spark, sf_dir, ["documents"])
    docs = spark.table("documents")

    def build(variant: str):
        if variant == "A":
            return old_winnow(docs, 5, 4, md5_hash64)
        return winnow_fingerprints(docs, k=5, window=4, hash_fn=md5_hash64)

    ra = sorted(map(tuple, build("A").collect()))
    rb = sorted(map(tuple, build("B").collect()))
    assert ra == rb, f"value mismatch: {len(ra)} vs {len(rb)}"
    print(f"value-identical: {len(ra)} rows", flush=True)

    def run(variant: str) -> float:
        spark.sparkContext.setJobDescription(f"winnow-{variant}")
        t0 = time.time()
        build(variant).write.format("noop").mode("overwrite").save()
        return time.time() - t0

    run("A"); run("B")  # warm both shapes
    ta, tb = [], []
    for _ in range(rounds):
        ta.append(run("A"))
        tb.append(run("B"))
    print(f"A (explode+window): {['%.2f' % t for t in ta]} min={min(ta):.2f}")
    print(f"B (row-local min):  {['%.2f' % t for t in tb]} min={min(tb):.2f}")
    print(f"per-round B/A: {['%.2f' % (y / x) for x, y in zip(ta, tb)]}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
