"""r16 A/B: persist strip_repeated_substrings' input (it feeds the spans
branch AND the base join — the prefix_sweep double-evaluation shape) inside
the curation chain. Interleaved, value-identity asserted first.

Variant A: current (strip re-evaluates the boilerplate pipeline twice).
Variant B: persist_tracked(s2) before strip.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import SparkSession, functions as F  # noqa: E402

import __spark_entry__ as em  # noqa: E402
from pyranges_1_x_spark import free_query_caches  # noqa: E402
from pyranges_1_x_spark.plans.qcache import persist_tracked  # noqa: E402

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
from pyranges_1_x_spark.plans.qcache import checkpoint_tracked  # noqa: E402

em._load(spark, SF, ["documents"])


def build(materialize_s2: bool):
    d = spark.table("documents").select(
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
    s1 = scrub_pii(d, out_col="text")
    s2 = remove_boilerplate_lines(s1, out_col="text")
    if materialize_s2:
        s2 = persist_tracked(s2)
    s3 = strip_repeated_substrings(s2, out_col="text", min_len=30)
    s4 = filter_corpus(s3, min_chars=240, min_tokens=40, min_unique_ratio=0.30)
    kept = checkpoint_tracked(s4.filter("keep"), eager=False)
    lm = lm_bigram_score(kept).select("doc_id", "n_bigrams", "min_prob", "n_rare")
    quota = quota_sample(kept, "source", 10, seed=7)
    packed = pack_training_examples(quota, budget=512, seed=7)
    return (
        packed.join(
            quota.select("doc_id", "source", F.md5("text").alias("text_fp")), "doc_id"
        )
        .join(lm, "doc_id")
        .select(
            "doc_id", "source", "text_fp", "n_tokens", "start_offset",
            "first_example", "last_example", "n_bigrams", "min_prob", "n_rare",
        )
    )


# --- value identity first ---
va = sorted(map(tuple, build(False).collect()))
free_query_caches()
vb = sorted(map(tuple, build(True).collect()))
free_query_caches()
assert va == vb, "value mismatch!"
print(f"value-identical on {len(va)} rows")


def run(mat):
    t0 = time.time()
    build(mat).write.format("noop").mode("overwrite").save()
    w = time.time() - t0
    free_query_caches()
    return round(w, 3)


run(False); run(True)  # warm both shapes
a, b = [], []
for i in range(4):
    a.append(run(False))
    b.append(run(True))
print("A (current):", a, "min", min(a))
print("B (persist s2):", b, "min", min(b))
spark.stop()
