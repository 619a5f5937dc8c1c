"""Interleaved A/B for the r15 pq/ivfpq single-evaluation ADC fix.

A = r14 shape, reproduced by no-op'ing UserDefinedFunction.asNondeterministic
    while the plan is built: constraint inference pushed isnotnull(adist)
    below the projection and planned TWO ArrowEvalPython nodes — every row
    ADC-scored twice (guide §4.4).
B = r15 shape (HEAD code): nondeterministic UDF, one evaluation.

One warm session, alternating runs, noop sink, value-identity asserted first.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")

QUERIES = ["pq_topk", "ivfpq_topk"]


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    rounds = int(os.environ.get("AB_ROUNDS", "4"))

    from pyspark.sql import SparkSession
    from pyspark.sql.udf import UserDefinedFunction

    import __spark_entry__ as entrymod

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("ab-pq-nondet-r15opt")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    real_nondet = UserDefinedFunction.asNondeterministic

    def build(q: str, variant: str):
        if variant == "A":
            UserDefinedFunction.asNondeterministic = lambda self: self  # type: ignore[method-assign]
        try:
            return entrymod.queries()[q](spark, sf_dir)
        finally:
            UserDefinedFunction.asNondeterministic = real_nondet  # type: ignore[method-assign]

    for q in QUERIES:
        ra = sorted(map(tuple, build(q, "A").collect()))
        rb = sorted(map(tuple, build(q, "B").collect()))
        assert ra == rb, f"value mismatch {q}: {len(ra)} vs {len(rb)}"
        print(f"{q}: value-identical, {len(ra)} rows", flush=True)

    def run(q: str, variant: str) -> float:
        df = build(q, variant)
        spark.sparkContext.setJobDescription(f"{q}-{variant}")
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        return time.time() - t0

    for q in QUERIES:
        run(q, "A")  # warm
        run(q, "B")
        ta, tb = [], []
        for _ in range(rounds):
            ta.append(run(q, "A"))
            tb.append(run(q, "B"))
        print(
            f"{q}: A(double-eval) {['%.2f' % t for t in ta]} min={min(ta):.2f} | "
            f"B(single-eval) {['%.2f' % t for t in tb]} min={min(tb):.2f} | "
            f"per-round B/A {['%.2f' % (b / a) for a, b in zip(ta, tb)]}",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
