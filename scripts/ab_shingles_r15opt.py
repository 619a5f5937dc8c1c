"""Interleaved A/B for the r15 row-local shingle_rows rewrite.

A = r14 shape, reconstructed: posexplode tokens -> repartition(id) ->
    window leads concat -> count window -> filter -> [global distinct].
B = r15 shape (HEAD code): repartition docs -> unrolled element_at concat
    inside a transform -> array_distinct -> explode.

Both arms are timed through a downstream md5 hash + per-id aggregation (the
consumer shape of minhash/kmv), noop sink, one warm session, alternating
runs. Value-identity asserted first on the full sorted (id, token) multiset,
for distinct=True and distinct=False.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")


def old_shingle_rows(df, text_col, id_col, k, distinct, nparts):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    toks = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("__pos__", "__tok__"),
    ).repartition(nparts, "id")
    w = Window.partitionBy("id").orderBy("__pos__")
    leads = [F.lead("__tok__", i).over(w) for i in range(1, k)]
    full = F.lead("__tok__", k - 1).over(w).isNotNull() if k > 1 else F.lit(True)
    rows = toks.select(
        "id",
        F.concat_ws(" ", F.col("__tok__"), *leads).alias("token"),
        full.alias("__full__"),
        F.col("__pos__"),
        F.count(F.lit(1)).over(Window.partitionBy("id")).alias("__n__"),
    )
    out = rows.filter(
        F.col("__full__") | ((F.col("__n__") < k) & (F.col("__pos__") == 0))
    ).select("id", "token")
    return out.distinct() if distinct else out


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    rounds = int(os.environ.get("AB_ROUNDS", "4"))

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod
    from pyranges_1_x_spark.ml.dedup import md5_hash64, shingle_rows

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("ab-shingles-r15opt")
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
    nparts = spark.sparkContext.defaultParallelism

    def build(variant: str, distinct: bool):
        if variant == "A":
            sh = old_shingle_rows(docs, "text", "doc_id", 3, distinct, nparts)
        else:
            sh = shingle_rows(docs, "text", "doc_id", 3, distinct=distinct)
        # downstream consumer shape: hash every shingle, reduce per doc
        return sh.groupBy("id").agg(
            F.min(md5_hash64(F.col("token"))).alias("h"),
            F.count(F.lit(1)).alias("n"),
        )

    for distinct in (True, False):
        ra = sorted(map(tuple, build("A", distinct).collect()))
        rb = sorted(map(tuple, build("B", distinct).collect()))
        assert ra == rb, f"value mismatch distinct={distinct}: {len(ra)} vs {len(rb)}"
        print(f"value-identical distinct={distinct}: {len(ra)} rows", flush=True)

    def run(variant: str) -> float:
        spark.sparkContext.setJobDescription(f"shingles-{variant}")
        t0 = time.time()
        build(variant, True).write.format("noop").mode("overwrite").save()
        return time.time() - t0

    run("A")  # warm
    run("B")
    ta, tb = [], []
    for _ in range(rounds):
        ta.append(run("A"))
        tb.append(run("B"))
    print(f"A (explode+window): {['%.2f' % t for t in ta]} min={min(ta):.2f}")
    print(f"B (row-local):      {['%.2f' % t for t in tb]} min={min(tb):.2f}")
    print(f"per-round B/A: {['%.2f' % (b / a) for a, b in zip(ta, tb)]}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
