"""Interleaved A/B for the r15 fdr rank-relation localCheckpoint.

A = r14 shape: the suffix-min sweep's two branches each re-run the whole
    rank pipeline (localCheckpoint disabled via monkeypatch).
B = r15 shape: lazy localCheckpoint of the ranked relation (HEAD code).

One warm session, alternating runs, noop sink. Value-identity asserted first.
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

    import __spark_entry__ as entrymod

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("ab-fdr-r15opt")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    fn = entrymod.queries()["fdr"]
    orig_lc = DataFrame.localCheckpoint

    def build(variant: str):
        if variant == "A":
            DataFrame.localCheckpoint = lambda self, *a, **k: self  # type: ignore[method-assign]
        try:
            return fn(spark, sf_dir)
        finally:
            DataFrame.localCheckpoint = orig_lc  # type: ignore[method-assign]

    ra = sorted(map(tuple, build("A").collect()))
    rb = sorted(map(tuple, build("B").collect()))
    assert ra == rb, f"value mismatch: {len(ra)} vs {len(rb)}"
    print(f"value-identical: {len(ra)} rows", flush=True)

    def run(variant: str) -> float:
        t0 = time.time()
        build(variant).write.format("noop").mode("overwrite").save()
        return time.time() - t0

    run("A"), run("B")
    ta, tb = [], []
    for _ in range(rounds):
        ta.append(run("A"))
        tb.append(run("B"))
    print("A no-checkpoint  :", [round(x, 2) for x in ta], "min", round(min(ta), 3))
    print("B localCheckpoint:", [round(x, 2) for x in tb], "min", round(min(tb), 3))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
