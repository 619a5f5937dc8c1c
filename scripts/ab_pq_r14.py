"""r14 interleaved A/B: pq_topk fold (HOF aggregate, CodegenFallback) vs
unrolled (codegen element_at chains) — VERDICT r13 #3.

Methodology (house rules, memory/bench-measurement-pitfalls): ONE session, no
parallel load, console progress off, alternating A/B/A/B... runs, min-of-N
per arm, and a bit-exactness assertion that both impls produce IDENTICAL
(vec_id, adist, rank) rows before any timing is trusted.

Usage: python scripts/ab_pq_r14.py [sf_dir] [n_rounds]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from pyspark.sql import SparkSession

    import __spark_entry__ as entry
    from pyranges_1_x_spark.ml import similarity as sim

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("ab-pq-r14")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    qs = {"pq_topk": entry.q_pq_topk, "ivfpq_topk": entry.q_ivfpq_topk}

    # --- bit-exactness gate first: identical rows or no timing at all ---
    for name, q in qs.items():
        rows = {}
        for impl in ("fold", "unrolled", "arrow"):
            sim._PQ_IMPL = impl
            rows[impl] = [
                tuple(r) for r in q(spark, sf_dir).orderBy("rank").collect()
            ]
        for impl in ("unrolled", "arrow"):
            assert rows["fold"] == rows[impl], (
                f"{name}: {impl} differs from fold!\nfold={rows['fold']}\n"
                f"{impl}={rows[impl]}"
            )
        print(f"bit-exact OK: {name} ({len(rows['fold'])} rows)", flush=True)

    # --- interleaved timing: A/B alternating within each round ---
    times: dict[tuple[str, str], list[float]] = {}
    for rnd in range(rounds):
        arms = ("fold", "unrolled", "arrow")
        for impl in arms if rnd % 2 == 0 else arms[::-1]:
            sim._PQ_IMPL = impl
            for name, q in qs.items():
                t0 = time.time()
                q(spark, sf_dir).write.format("noop").mode("overwrite").save()
                dt = round(time.time() - t0, 3)
                times.setdefault((name, impl), []).append(dt)
                print(f"round {rnd} {name:12s} {impl:9s} {dt:7.3f}s", flush=True)

    print()
    for name in qs:
        mins = {impl: min(times[(name, impl)]) for impl in ("fold", "unrolled", "arrow")}
        print(f"{name:12s} " + "  ".join(f"{i} min={m:7.3f}s" for i, m in mins.items()))
        for impl in ("fold", "unrolled", "arrow"):
            print(f"  {impl:9s} all={times[(name, impl)]}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
