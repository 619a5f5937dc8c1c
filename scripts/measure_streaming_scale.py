"""Streaming rows for the SCALING grid (VERDICT r9 #6).

The grid covered batch operators only; the bounded-state claim for the
watermarked streaming operators (streaming/events.py, streaming/intervals.py)
was argued from the plan, not measured. This script runs the two
interval-stream gates as REAL availableNow micro-batch streams at 1x and
10x input density (same row_id*16+rep replica construction as
check_oracle_scaled) and records, from each query's recentProgress:

  wall_sec        — start() to completion
  input_rows      — rows processed across batches
  state_rows_max  — max stateOperators numRowsTotal across batches
  state_mem_max   — max stateOperators memoryUsedBytes across batches

Expectation being verified: annotate_stream is STATELESS (no state
operator at any scale); windowed_coverage state is the bounded aggregate
(windows x chromosomes x touched bins) and therefore ~FLAT under 10x input
density (same coordinate span => same bins), while wall scales with input.

Usage: python scripts/measure_streaming_scale.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")


def _metrics(q):
    rows_in, state_rows, state_mem = 0, 0, 0
    for p in q.recentProgress:
        rows_in += int(p.get("numInputRows", 0) or 0)
        for so in p.get("stateOperators", []) or []:
            state_rows = max(state_rows, int(so.get("numRowsTotal", 0) or 0))
            state_mem = max(state_mem, int(so.get("memoryUsedBytes", 0) or 0))
    return rows_in, state_rows, state_mem


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    import __spark_entry__ as em
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from pyranges_1_x_spark.streaming.intervals import (
        annotate_stream,
        windowed_interval_coverage,
    )

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .getOrCreate()
    )

    a, b = em._gr_a(spark, sf_dir), em._gr_b(spark, sf_dir)

    def densify(df, reps):
        if reps == 1:
            return df
        r = spark.range(reps).select(F.col("id").alias("rep"))
        return (
            df.crossJoin(F.broadcast(r))
            .withColumn("row_id", F.col("row_id") * 16 + F.col("rep"))
            .drop("rep")
        )

    results = {}
    for reps in (1, 10):
        staged_dir = os.path.join(tempfile.gettempdir(), f"sg_streamscale_{reps}")
        shutil.rmtree(staged_dir, ignore_errors=True)

        # --- annotate_stream (stateless stream-static join, file sink) ---
        src = os.path.join(staged_dir, "annot_src")
        densify(a.df, reps).write.parquet(src)
        stream = spark.readStream.schema(a.df.schema).parquet(src)
        out = annotate_stream(stream, b, bin_size=1000)
        sink = os.path.join(staged_dir, "annot_out")
        t0 = time.perf_counter()
        q = (
            out.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", os.path.join(staged_dir, "annot_chk"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(600)
        wall = time.perf_counter() - t0
        rows_in, srows, smem = _metrics(q)
        results[f"annotate_x{reps}"] = {
            "wall_sec": round(wall, 2),
            "input_rows": rows_in,
            "out_rows": spark.read.parquet(sink).count(),
            "state_rows_max": srows,
            "state_mem_max_bytes": smem,
        }

        # --- windowed_coverage (watermarked windowed agg, memory sink) ---
        staged = densify(a.df, reps).withColumn(
            "ts", F.timestamp_seconds(F.lit(1767225600) + F.col("row_id") % 7200)
        )
        src2 = os.path.join(staged_dir, "wcov_src")
        staged.write.parquet(src2)
        stream2 = spark.readStream.schema(staged.schema).parquet(src2)
        out2 = windowed_interval_coverage(
            stream2, window_duration="1 hour", bin_size=1000, watermark="2 hours"
        )
        name = f"sg_streamscale_wcov_{reps}"
        t0 = time.perf_counter()
        q2 = (
            out2.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q2.awaitTermination(600)
        wall2 = time.perf_counter() - t0
        rows_in2, srows2, smem2 = _metrics(q2)
        results[f"wcov_x{reps}"] = {
            "wall_sec": round(wall2, 2),
            "input_rows": rows_in2,
            "out_rows": spark.table(name).count(),
            "state_rows_max": srows2,
            "state_mem_max_bytes": smem2,
        }
        shutil.rmtree(staged_dir, ignore_errors=True)

    print(json.dumps({"sf_dir": sf_dir, "results": results}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
