"""Python greedy oracle for `max_disjoint` — the sf0.1 certification closer.

The registry's DuckDB oracle for max_disjoint is a rank→rank+1 recursive
CTE whose iteration count equals the max overlap-island size; at sf0.1 that
recursion is serial in a ~2,000-deep island and never finished (killed at
70 min, SCALING.md r10), while the engine side runs in 1.55s. The ORACLE
was the non-scaling side, so r11 swaps it for this script: a per-chromosome
Python greedy (reference precedent: the brute-force oracle in
/root/reference/tests/unit/k_nearest.py, which also checks a kernel with
plain Python instead of SQL).

Equivalence to the SQL oracle (and hence to the sf0.01/sf0.001-certified
semantics): the recursive oracle decomposes per overlap island purely to
parallelize the recursion. Islands are coordinate-disjoint — every End in
island k is <= island k+1's min Start (islands split where the NEXT Start
clears the running max End) — so sorting by (End, Start, row_id) keeps
islands contiguous, and the first interval of each island always satisfies
`Start >= last accepted End` carried over from the previous island. A FLAT
per-chromosome greedy over that order therefore selects row-for-row the
same set as the per-island recursion. O(n log n), no recursion depth.

The fixture is NOT re-derived: the `a` relation is materialized by running
the registry's own `_AB` CTE prefix in DuckDB, so this oracle certifies the
exact frame the SQL oracle would have seen. Comparison reuses
check_oracle's normalize() — rows + schema + dtype-faithful cell values.

Usage: python scripts/oracle_max_disjoint_py.py [sf_dir]   (default sf0.1)
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

from check_oracle import normalize  # noqa: E402


def python_greedy(a: pd.DataFrame) -> pd.DataFrame:
    """Greedy interval scheduling per chromosome in (End, Start, row_id)
    order: accept an interval iff its Start clears the last accepted End."""
    a = a.sort_values(["Chromosome", "End", "Start", "row_id"], kind="mergesort")
    keep_idx = []
    last_chrom = None
    last_end = None
    for idx, chrom, start, end in zip(
        a.index, a["Chromosome"].tolist(), a["Start"].tolist(), a["End"].tolist()
    ):
        if chrom != last_chrom:
            last_chrom, last_end = chrom, None
        if last_end is None or start >= last_end:
            keep_idx.append(idx)
            last_end = end
    return a.loc[keep_idx]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    import __spark_entry__ as entrymod
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in entrymod.TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    t0 = time.time()
    got = entrymod.queries()["max_disjoint"](spark, sf_dir).toPandas()
    t_spark = time.time() - t0
    spark.stop()

    # Materialize the SQL oracle's own fixture relation, then greedy in Python.
    t0 = time.time()
    a = con.execute(
        entrymod._AB
        + ' SELECT row_id, Chromosome, Start, "End", Strand, Score FROM a'
    ).df()
    exp = python_greedy(a)
    t_py = time.time() - t0

    if sorted(got.columns) != sorted(exp.columns):
        print(f"FAIL max_disjoint: columns {sorted(got.columns)} vs {sorted(exp.columns)}")
        return 1
    if len(got) != len(exp):
        print(f"FAIL max_disjoint: rowcount {len(got)} vs {len(exp)}")
        return 1
    g, e = normalize(got), normalize(exp)
    try:
        pd.testing.assert_frame_equal(g, e, check_exact=True)
    except AssertionError as ex:
        print(f"FAIL max_disjoint: values differ: {str(ex)[:400]}")
        return 1
    print(
        f"PASS max_disjoint: rows={len(got)} [spark {t_spark:.1f}s, "
        f"python-greedy oracle {t_py:.1f}s] @ {sf_dir}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
