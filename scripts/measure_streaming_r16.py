"""r16 streaming quartet stage breakdown (VERDICT r15 #6, guide §1.2):
where does the wall go — the per-invocation parquet STAGING write, the
stream RUN itself (source listing + micro-batch execution + sink write),
or the sink read-back/rollup? Also counts the staged/sink file layout
(§6: tiny-files) and, with --events10, replays the stateful pair at 10x
input density to read state-store overhead vs data.

Usage: python scripts/measure_streaming_r16.py [--events10]
"""

import glob
import os
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import SparkSession, functions as F  # noqa: E402

import __spark_entry__ as em  # noqa: E402
from pyranges_1_x_spark import free_query_caches  # noqa: E402

SF = "/root/testdata/sf0.1"

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


def nfiles(d):
    return len(glob.glob(os.path.join(d, "*.parquet"))) or len(
        [f for f in glob.glob(os.path.join(d, "part-*")) if not f.endswith(".crc")]
    )


def clock(label, fn):
    t0 = time.time()
    out = fn()
    print(f"  {label}: {time.time() - t0:.2f}s", flush=True)
    return out


def breakdown_annotate():
    from pyranges_1_x_spark.streaming.intervals import annotate_stream

    a, b = em._gr_a(spark, SF), em._gr_b(spark, SF)
    tag = em._stream_tag(SF)
    d = os.path.join(tempfile.gettempdir(), f"spark_graft_annot_{tag}")
    print("annotate_stream:", flush=True)
    clock("stage_write", lambda: a.df.write.mode("overwrite").parquet(d))
    print(f"  staged_files: {nfiles(d)}", flush=True)
    stream = spark.readStream.schema(a.df.schema).parquet(d)
    out = annotate_stream(stream, b, bin_size=1000)
    sink = clock("stream_run", lambda: em._run_stream(spark, out, f"annot_sink_{tag}"))
    sd = os.path.join(tempfile.gettempdir(), f"spark_graft_sink_annot_sink_{tag}", "out")
    print(f"  sink_files: {nfiles(sd)}", flush=True)
    clock("sink_count", lambda: sink.write.format("noop").mode("overwrite").save())
    free_query_caches()


def breakdown_streaming_dedup(density=1):
    from pyranges_1_x_spark.streaming.events import streaming_dedup

    ev = em._load_events(spark, SF)
    if density > 1:
        reps = spark.range(density).select(F.col("id").alias("rep"))
        ev = (
            ev.crossJoin(F.broadcast(reps))
            .withColumn("event_id", F.col("event_id") * 16 + F.col("rep"))
            .withColumn("user_id", F.col("user_id") * 16 + F.col("rep"))
            .drop("rep")
        )
    tag = em._stream_tag(SF) + (f"_x{density}" if density > 1 else "")
    d = os.path.join(tempfile.gettempdir(), f"spark_graft_dedup_{tag}")
    print(f"streaming_dedup (density={density}):", flush=True)
    clock("stage_write", lambda: ev.write.mode("overwrite").parquet(d))
    print(f"  staged_files: {nfiles(d)}", flush=True)
    stream = spark.readStream.schema(ev.schema).parquet(d)
    out = streaming_dedup(stream, ["event_type", "user_id"], ts_col="ts", watermark="1 hour")
    sink = clock("stream_run", lambda: em._run_stream(spark, out, f"dedup_sink_{tag}"))
    clock(
        "rollup",
        lambda: sink.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n_users"))
        .write.format("noop")
        .mode("overwrite")
        .save(),
    )
    free_query_caches()


def breakdown_wcov(density=1):
    from pyranges_1_x_spark.streaming.intervals import windowed_interval_coverage

    a = em._gr_a(spark, SF)
    df = a.df
    if density > 1:
        reps = spark.range(density).select(F.col("id").alias("rep"))
        df = (
            df.crossJoin(F.broadcast(reps))
            .withColumn("row_id", F.col("row_id") * 16 + F.col("rep"))
            .drop("rep")
        )
    staged = df.withColumn(
        "ts", F.timestamp_seconds(F.lit(1767225600) + F.col("row_id") % 7200)
    )
    tag = em._stream_tag(SF) + (f"_x{density}" if density > 1 else "")
    d = os.path.join(tempfile.gettempdir(), f"spark_graft_wcov_{tag}")
    print(f"windowed_coverage (density={density}):", flush=True)
    clock("stage_write", lambda: staged.write.mode("overwrite").parquet(d))
    print(f"  staged_files: {nfiles(d)}", flush=True)
    stream = spark.readStream.schema(staged.schema).parquet(d)
    out = windowed_interval_coverage(
        stream, window_duration="1 hour", bin_size=1000, watermark="2 hours"
    )
    name = f"wcov_sink_{tag}_m"

    def run():
        q = (
            out.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        return q

    q = clock("stream_run", run)
    for p in q.recentProgress:
        for so in p.get("stateOperators", []):
            print(
                f"  state: rowsTotal={so.get('numRowsTotal')}"
                f" mem={so.get('memoryUsedBytes')}",
                flush=True,
            )
    free_query_caches()


def breakdown_incdedup():
    from pyranges_1_x_spark.ml.dedup import fingerprint
    from pyranges_1_x_spark.streaming.events import stream_dedup_against_store

    em._load(spark, SF, ["documents"])
    docs = spark.table("documents")
    store = docs.filter("doc_id % 3 <> 0").select(fingerprint(F.col("text")).alias("sig"))
    batch = docs.filter("doc_id % 3 = 0").select(
        "doc_id",
        "text",
        F.timestamp_seconds(F.lit(1700000000) + F.col("doc_id") % 7200).alias("ts"),
    )
    tag = em._stream_tag(SF)
    d = os.path.join(tempfile.gettempdir(), f"spark_graft_incdedup_{tag}")
    print("stream_incremental_dedup:", flush=True)
    clock("stage_write", lambda: batch.write.mode("overwrite").parquet(d))
    print(f"  staged_files: {nfiles(d)}", flush=True)
    stream = spark.readStream.schema(batch.schema).parquet(d)
    out = stream_dedup_against_store(stream, store)
    sink = clock("stream_run", lambda: em._run_stream(spark, out, f"incdedup_sink_{tag}"))
    clock(
        "distinct",
        lambda: sink.select("sig").distinct().write.format("noop").mode("overwrite").save(),
    )
    free_query_caches()


events10 = "--events10" in sys.argv
for rnd in range(2):
    print(f"--- round {rnd} ---", flush=True)
    breakdown_annotate()
    breakdown_streaming_dedup()
    breakdown_wcov()
    breakdown_incdedup()
if events10:
    print("--- 10x density (stateful pair) ---", flush=True)
    breakdown_streaming_dedup(density=10)
    breakdown_wcov(density=10)
spark.stop()
