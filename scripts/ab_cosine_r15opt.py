"""Interleaved A/B for the r15 cosine_similarity_join fixes.

A = r14 shape, reproduced by no-op'ing UserDefinedFunction.asNondeterministic
    and DataFrame.persist while the plan is built: the signature UDF ran
    TWICE per join side (posexplode's pushed size/isnotnull filter + the
    projection) x two sides, and the exact-cosine verify UDF ran twice per
    candidate pair (pushed threshold filter + projection) — guide §4.4.
B = r15 shape (HEAD code): both UDFs nondeterministic (single evaluation),
    signature relation persisted once for both self-join sides.

One warm session, alternating runs, noop sink, value-identity asserted first.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    rounds = int(os.environ.get("AB_ROUNDS", "4"))

    from pyspark.sql import DataFrame, SparkSession
    from pyspark.sql.udf import UserDefinedFunction

    import __spark_entry__ as entrymod

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("ab-cosine-r15opt")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    real_persist = DataFrame.persist
    real_nondet = UserDefinedFunction.asNondeterministic

    def build(variant: str):
        if variant == "A":
            DataFrame.persist = lambda self, *a, **k: self  # type: ignore[method-assign]
            UserDefinedFunction.asNondeterministic = lambda self: self  # type: ignore[method-assign]
        try:
            return entrymod.queries()["cosine_simjoin"](spark, sf_dir)
        finally:
            DataFrame.persist = real_persist  # type: ignore[method-assign]
            UserDefinedFunction.asNondeterministic = real_nondet  # type: ignore[method-assign]

    ra = sorted(map(tuple, build("A").collect()))
    rb = sorted(map(tuple, build("B").collect()))
    assert ra == rb, f"value mismatch: {len(ra)} vs {len(rb)}"
    print(f"value-identical: {len(ra)} rows", flush=True)

    def run(variant: str) -> float:
        df = build(variant)
        spark.sparkContext.setJobDescription(f"cosine-{variant}")
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        return time.time() - t0

    run("A")  # warm
    run("B")
    ta, tb = [], []
    for _ in range(rounds):
        ta.append(run("A"))
        tb.append(run("B"))
    print(f"A (dup UDFs, no persist): {['%.2f' % t for t in ta]} min={min(ta):.2f}")
    print(f"B (single-eval, persist): {['%.2f' % t for t in tb]} min={min(tb):.2f}")
    print(f"per-round B/A: {['%.2f' % (b / a) for a, b in zip(ta, tb)]}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
