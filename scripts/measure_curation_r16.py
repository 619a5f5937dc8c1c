"""r16 curation_pipeline stage breakdown (VERDICT r15 #3) — warm session,
noop sink, labeled jobs, interleaved repeats. Prints per-stage walls.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import SparkSession, functions as F  # noqa: E402

import __spark_entry__ as em  # noqa: E402
from pyranges_1_x_spark import free_query_caches  # noqa: E402

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

from pyranges_1_x_spark.ml.dedup import strip_repeated_substrings  # noqa: E402
from pyranges_1_x_spark.ml.sampling import pack_training_examples, quota_sample  # noqa: E402
from pyranges_1_x_spark.ml.text import (  # noqa: E402
    filter_corpus,
    lm_bigram_score,
    remove_boilerplate_lines,
    scrub_pii,
)

em._load(spark, SF, ["documents"])
n = spark.table("documents").count()
tb = spark.table("documents").agg(F.sum(F.length("text"))).first()[0]
print(f"documents: {n} rows, {tb/1e6:.1f} MB text")


def docs():
    return spark.table("documents").select(
        "doc_id",
        F.concat(
            F.lit("HOME | ABOUT | CONTACT\n"),
            F.lit("cookie notice v"), (F.col("doc_id") % 7).cast("string"), F.lit("\n"),
            F.col("text"),
            F.lit(" contact u"), F.col("doc_id").cast("string"), F.lit("@example.com\n"),
            F.lit("footer "), (F.col("doc_id") % 3).cast("string"),
        ).alias("text"),
        "source",
    )


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def stage(name, build, reps=3):
    walls = []
    for _ in range(reps):
        t0 = time.time()
        spark.sparkContext.setJobDescription(name)
        noop(build())
        walls.append(round(time.time() - t0, 3))
        free_query_caches()
    print(f"{name:22s} {min(walls):7.3f}  all={walls}")
    return min(walls)


def upto(k):
    d = docs()
    s1 = scrub_pii(d, out_col="text")
    if k == 1:
        return s1
    s2 = remove_boilerplate_lines(s1, out_col="text")
    if k == 2:
        return s2
    s3 = strip_repeated_substrings(s2, out_col="text", min_len=30)
    if k == 3:
        return s3
    s4 = filter_corpus(s3, min_chars=240, min_tokens=40, min_unique_ratio=0.30)
    if k == 4:
        return s4
    raise ValueError(k)


# warm everything once
noop(em.q_curation_pipeline(spark, SF))
free_query_caches()

stage("s1 scrub", lambda: upto(1))
stage("s2 +boilerplate", lambda: upto(2))
stage("s3 +strip", lambda: upto(3))
stage("s4 +filter", lambda: upto(4))
stage("full pipeline", lambda: em.q_curation_pipeline(spark, SF))


def tail_only():
    """LM+quota+pack+joins over an eagerly materialized kept corpus, to
    isolate the tail from the chain."""
    kept = upto(4).filter("keep").localCheckpoint(eager=True)
    t0 = time.time()
    lm = lm_bigram_score(kept).select("doc_id", "n_bigrams", "min_prob", "n_rare")
    quota = quota_sample(kept, "source", 10, seed=7)
    packed = pack_training_examples(quota, budget=512, seed=7)
    out = (
        packed.join(
            quota.select("doc_id", "source", F.md5("text").alias("text_fp")), "doc_id"
        )
        .join(lm, "doc_id")
        .select(
            "doc_id", "source", "text_fp", "n_tokens", "start_offset",
            "first_example", "last_example", "n_bigrams", "min_prob", "n_rare",
        )
    )
    noop(out)
    print(f"{'tail (post-ckpt)':22s} {time.time()-t0:7.3f}")
    from pyranges_1_x_spark.plans.qcache import free_checkpoint

    free_checkpoint(kept)


tail_only()
tail_only()
spark.stop()
