"""Audit the physical plans of every queries() entry for scale red flags.

For each query, builds the DataFrame against sf0.001 and inspects the
executed-plan string for the anti-patterns that would not survive a 100 TB
cluster:

- CartesianProduct / BroadcastNestedLoopJoin: an unbinned interval join or a
  missing equi-key (quadratic at scale).
- BatchEvalPython: a row-at-a-time Python UDF in the plan (only Arrow-batched
  ArrowEvalPython / mapInPandas boundaries are sanctioned).
- Window partitioned by low-cardinality keys only: flagged when a Window's
  partition spec is exactly (Chromosome) or (Chromosome, Strand) — the
  #chromosomes parallelism cap the bucketed planners exist to avoid. (Tiny
  summary-relation windows partitioned by keys alone are expected and listed
  so the reader can eyeball that they sit over pre-aggregated inputs.)

Usage: python scripts/plan_audit.py [query ...]
Exit 1 if any HARD flag (cartesian/nested-loop/python-udf) fires.
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")

HARD = ("CartesianProduct", "BroadcastNestedLoopJoin", "BatchEvalPython")
SF = "/root/testdata/sf0.001"


def main() -> int:
    import __spark_entry__ as m
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    only = set(sys.argv[1:])
    hard_hits = []
    for name, fn in m.queries().items():
        if only and name not in only:
            continue
        try:
            plan = fn(spark, SF)._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001
            print(f"{name}: PLAN ERROR {type(e).__name__}: {e}")
            hard_hits.append(name)
            continue
        flags = [h for h in HARD if h in plan]
        # A BroadcastNestedLoopJoin whose sides are keyless (scalar)
        # aggregates is a 1-row x 1-row cross (jaccard/forbes/fdr join their
        # scalar totals back) — constant-size at any scale, not a red flag.
        if "BroadcastNestedLoopJoin" in flags and "HashAggregate(keys=[]" in plan:
            flags.remove("BroadcastNestedLoopJoin")
            status_note = " (scalar-cross ok)"
        else:
            status_note = ""
        # chromosome-only window partitions (excluding bucket-keyed ones)
        narrow = sorted(
            set(
                mme.group(1)
                for mme in re.finditer(r"windowspecdefinition\(([^)]*)\)", plan)
                if "__" not in mme.group(1)  # bucket/summary cols are __*-named
                and mme.group(1).count(",") <= 4
                and "Chromosome" in mme.group(1)
            )
        )
        status = ("FLAG " + ",".join(flags) if flags else "ok") + status_note
        print(f"{name}: {status}" + (f" [narrow-window x{len(narrow)}]" if narrow else ""))
        if flags:
            hard_hits.append(name)
    spark.stop()
    print(f"\nhard flags: {hard_hits if hard_hits else 'none'}")
    return 1 if hard_hits else 0


if __name__ == "__main__":
    raise SystemExit(main())
