"""Interleaved A/B for the r15 payload-in-GROUP-BY-key aggregation fix.

A = r14 shape: payload rides in ``any_value(struct)`` — a struct-typed
    aggregation buffer cannot hash-aggregate, so Spark plans a SortAggregate
    (two full sorts of the bin-exploded relation). Reproduced by
    monkeypatching ``_split_payload`` to always signal the fallback (which IS the
    r14 code, kept verbatim for map-typed payloads).
B = r15 shape (HEAD code): payload columns ride in the GROUP BY key
    (functionally dependent on the unique row id), HashAggregate with
    map-side combine.

One warm session, alternating runs over the registry queries that hit the
pattern, noop sink, value-identity asserted first.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")

QUERIES = ["count_overlaps", "join_left", "overlap_anti", "join_same_strand"]


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    rounds = int(os.environ.get("AB_ROUNDS", "4"))

    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod
    from pyranges_1_x_spark.operators import overlap as ovmod
    from pyranges_1_x_spark.plans import interval_join as ijmod

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("ab-hashagg-r15opt")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    real = ijmod._split_payload

    def build(q: str, variant: str):
        if variant == "A":
            ijmod._split_payload = lambda fields: (False, [], [])
            ovmod._split_payload = ijmod._split_payload
        try:
            return entrymod.queries()[q](spark, sf_dir)
        finally:
            ijmod._split_payload = real
            ovmod._split_payload = real

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
            f"{q}: A(sortagg) {['%.2f' % t for t in ta]} min={min(ta):.2f} | "
            f"B(hashagg) {['%.2f' % t for t in tb]} min={min(tb):.2f} | "
            f"per-round B/A {['%.2f' % (b / a) for a, b in zip(ta, tb)]}",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
