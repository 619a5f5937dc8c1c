"""Interleaved OLD-vs-NEW A/B for the r12 leg-mode nearest rewrite.

The r12 commit "Make upstream/downstream nearest a per-row leg filter"
claims the gated `nearest_updown` floor fell 8.2s -> 5.8s, but the floors
in bench_full_r12.json were committed BEFORE that change and the follow-up
session ran on a rebooted (and measurably slower) host — absolute numbers
from the two sessions are not comparable. This script settles it the way
host drift can't confound: BOTH code versions run interleaved in ONE
session, alternating samples, with an untouched control query.

Mechanics: the pre-change operators/nearest.py is extracted from git
(`git show <base>:...`) and importlib-loaded under a variant module name —
the module uses only absolute imports, so it binds against the same live
package. The old/new `nearest_ranges` functions then drive the exact
q_nearest_updown query shape against the same sf fixtures with bench.py's
noop-sink materialization discipline.

Verdict rule (same as ab_movers_r11): compare interleaved per-variant
minima; the control pins session drift.

Usage: python scripts/ab_nearest_updown_r12.py [sf_dir] [base_commit]
"""

from __future__ import annotations

import gc
import importlib.util
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, ".")

CONTROL = "subtract"
ROUNDS = 6
DEFAULT_BASE = "2c58d66"  # last commit before the leg-mode rewrite


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    base = sys.argv[2] if len(sys.argv) > 2 else DEFAULT_BASE
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    old_src = subprocess.run(
        ["git", "show", f"{base}:pyranges_1_x_spark/operators/nearest.py"],
        check=True,
        capture_output=True,
        text=True,
    ).stdout
    old_path = "/tmp/nearest_old_variant.py"
    with open(old_path, "w") as fh:
        fh.write(old_src)
    spec = importlib.util.spec_from_file_location("nearest_old_variant", old_path)
    old_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(old_mod)

    import __spark_entry__ as em
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from pyranges_1_x_spark.core import GenomicRanges
    from pyranges_1_x_spark.operators import nearest as new_mod

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("ab-nearest-updown-r12")
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

    def updown_with(mod):
        a, b = em._gr_a(spark, sf_dir), em._gr_b(spark, sf_dir)
        a_s = GenomicRanges(a.df.filter("row_id % 10 = 3"), bin_size=1000)
        out = mod.nearest_ranges(
            a_s, b, direction="upstream", k=1, strand_behavior="ignore",
            dist_col="Distance",
        )
        return out.df.select(
            "row_id", "Chromosome", "Start", "End", "Strand", "Score", "Distance"
        )

    control_fn = em.queries()[CONTROL]
    variants = {
        "updown_old": lambda: updown_with(old_mod),
        "updown_new": lambda: updown_with(new_mod),
        CONTROL: lambda: control_fn(spark, sf_dir),
    }

    # Parity first: identical result sets, or the A/B is comparing different
    # queries (sorted-row pandas compare at the gate's own discipline).
    got_old = updown_with(old_mod).toPandas()
    got_new = updown_with(new_mod).toPandas()
    cols = sorted(got_old.columns)
    key = [c for c in cols]
    o = got_old[cols].sort_values(key).reset_index(drop=True)
    n = got_new[cols].sort_values(key).reset_index(drop=True)
    if not o.equals(n):
        print(json.dumps({"error": "old/new results differ", "old_rows": len(o),
                          "new_rows": len(n)}))
        spark.stop()
        return 1

    samples: dict[str, list[float]] = {k: [] for k in variants}
    with open("/proc/loadavg") as fh:
        load_before = fh.read().split()[0]
    for rnd in range(ROUNDS):
        for name, fn in variants.items():
            t0 = time.time()
            fn().write.format("noop").mode("overwrite").save()
            samples[name].append(round(time.time() - t0, 3))
            gc.collect()
        print(f"round {rnd + 1}: " + json.dumps({k: v[-1] for k, v in samples.items()}),
              file=sys.stderr)
    with open("/proc/loadavg") as fh:
        load_after = fh.read().split()[0]
    mins = {k: min(v) for k, v in samples.items()}
    print(json.dumps({
        "sf_dir": sf_dir,
        "base": base,
        "rounds": ROUNDS,
        "parity_rows": len(o),
        "loadavg_before": load_before,
        "loadavg_after": load_after,
        "samples": samples,
        "min": mins,
        "speedup_old_over_new": round(mins["updown_old"] / mins["updown_new"], 3),
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
