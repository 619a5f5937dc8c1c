"""Loop max_disjoint spark-vs-oracle at sf0.01; on mismatch dump both sides.

Temporary diagnostic for the VERDICT r5 #1 flake. Usage:
    python scripts/mdj_flake_hunt.py [n_iters]
Writes /tmp/mdj_fail_{i}_{spark,duck}.parquet on mismatch and prints which
side deviated from the previous iteration's result.
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd

sys.path.insert(0, ".")

import __spark_entry__ as m  # noqa: E402
from scripts.check_oracle import normalize  # noqa: E402


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    sf = "/root/testdata/sf0.01"
    sql = m.oracle_sql()["max_disjoint"]
    ref_spark = ref_duck = None
    bad = 0
    for i in range(n):
        got = m.queries()["max_disjoint"](spark, sf).toPandas()
        con = duckdb.connect()
        for t in ["lineitem", "orders"]:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
        exp = con.execute(sql).df()
        con.close()
        g, e = normalize(got), normalize(exp)
        s_stable = ref_spark is None or g.equals(ref_spark)
        d_stable = ref_duck is None or e.equals(ref_duck)
        match = g.equals(e)
        print(
            f"iter {i}: spark={len(got)} duck={len(exp)} match={match} "
            f"spark_stable={s_stable} duck_stable={d_stable}",
            flush=True,
        )
        if ref_spark is None:
            ref_spark, ref_duck = g, e
        if not match or not s_stable or not d_stable:
            bad += 1
            got.to_parquet(f"/tmp/mdj_fail_{i}_spark.parquet")
            exp.to_parquet(f"/tmp/mdj_fail_{i}_duck.parquet")
            # which rows differ vs the reference run?
            for label, cur, ref in (("spark", g, ref_spark), ("duck", e, ref_duck)):
                if not cur.equals(ref):
                    merged = cur.merge(ref, how="outer", indicator=True)
                    diff = merged[merged["_merge"] != "both"]
                    print(f"  {label} drift vs iter0 ({len(diff)} rows):")
                    print(diff.to_string(max_rows=20))
    spark.stop()
    print(f"{bad} anomalous iterations of {n}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
