"""Interleaved min-of-6 A/B for the r10 >1.2x bench movers (VERDICT r10 #3).

The three queries whose r10 floors read >1.2x over r9 — nearest
(2.55->3.12s), count_overlaps (1.59->1.93s), dedup_clusters (3.88->4.82s)
— are re-measured with the r9 minhash discipline (SCALING.md: "minhash_lsh
r8 regression: noise verdict"): SIX alternating samples per query in ONE
session, interleaved with an untouched CONTROL query (merge_stranded) so
session-wide drift shows up in the control, not just the subjects. Samples
use bench.py's exact harness: full noop-sink materialization, same session
confs, post-query gc.collect().

Verdict rule: interleaved min at-or-below the r9 floor => host noise /
warm-in tail; min staying >=1.2x over the r9 floor while the control sits
at its own floor => real regression, investigate the plan.

Usage: python scripts/ab_movers_r11.py [sf_dir] [subject ...]
(default sf0.1; default subjects below — pass query names to A/B any set,
e.g. the end-of-round bench movers)
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, ".")

SUBJECTS = ["nearest", "count_overlaps", "dedup_clusters"]
CONTROL = "merge_stranded"
ROUNDS = 6


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    subjects = sys.argv[2:] or SUBJECTS
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    import __spark_entry__ as entrymod
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("ab-movers-r11")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    warm = spark.range(1_000_000).join(F.broadcast(spark.range(1000)), on="id")
    warm.write.format("noop").mode("overwrite").save()

    qs = entrymod.queries()
    names = subjects + [CONTROL]
    samples: dict[str, list[float]] = {n: [] for n in names}
    with open("/proc/loadavg") as fh:
        load_before = fh.read().split()[0]
    for rnd in range(ROUNDS):
        for n in names:
            t0 = time.time()
            qs[n](spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples[n].append(round(time.time() - t0, 3))
            gc.collect()
        print(f"round {rnd + 1}: " + json.dumps({n: samples[n][-1] for n in names}),
              file=sys.stderr)
    with open("/proc/loadavg") as fh:
        load_after = fh.read().split()[0]
    out = {
        "sf_dir": sf_dir,
        "rounds": ROUNDS,
        "loadavg_before": load_before,
        "loadavg_after": load_after,
        "samples": samples,
        "min": {n: min(v) for n, v in samples.items()},
    }
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
