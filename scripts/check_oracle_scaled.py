"""Correctness at SCALE shapes, not just timing (VERDICT r8 #3).

The driver's oracle gate runs at sf0.01 and SCALING.md's grid is a TIMING
grid — nothing asserted VALUES on the 10x-density replica shapes. This
script closes that: it re-runs the registry's pair-heavy queries with the
fixtures replaced by their 10x-DENSITY replicas (ten copies of every
interval at the SAME coordinates, distinct row_id = row_id*16+rep — the
exact construction scripts/scale_probe.py times), and compares against the
SAME oracle_sql() strings with the shared ``WITH a AS (...), b AS (...)``
prefix swapped for a replicated twin. Both engines derive the replicas from
the same parquet + the same arithmetic, so the value-hash discipline of
check_oracle.py carries over unchanged.

Default queries are the five the r8 verdict named (join_inner,
count_overlaps, subtract, nearest, coverage) + merge_stranded (same binned
planner family). Density multiplies PAIR outputs ~100x, so the default sf
is 0.01: join_inner emits ~4.4M pairs there (vs ~406M at sf0.1 — a frame
compare at that size proves nothing extra and swamps pandas).

``--skew`` additionally moves every REPLICA row (rep > 0) onto chr1 in both
twins, yielding a ~92% single-chromosome relation (rep 0 keeps the original
coordinates, so the un-skewed fixture survives as an exact subset). This is
the VALUE gate behind SCALING.md's skew TIMING rows: the binned planner's
answers under a hot key are compared cell-by-cell against DuckDB, which has
no notion of our bucketing, under the identical chromosome rewrite. Pair
outputs grow ~4x over plain 10x-density (five chromosomes pooled into one),
so run the pair-emitting queries (join_inner, subtract) at sf0.001 and the
bounded-output ones (count_overlaps, nearest, coverage, merge_stranded) at
sf0.01. r12 (VERDICT r11 #7) adds the direction-sensitive operators to the
skew roster: ``nearest_updown`` (strand-aware as-of sweeps) and
``map_to_local`` / ``map_to_global`` (per-transcript joins) — run those at
sf0.001, where the skewed DuckDB twin is still minutes, not hours.

``--reps=N`` (default 10) scales the replica factor: ``--reps=100`` at
sf0.001 is the 100x-DENSITY decade cell (VERDICT r11 #6) — the pair
relation grows ~10,000x over the base fixture while staying
compare-bounded. The row_id remix uses the next power of two >= N
(row_id * 2^ceil(log2 N) + rep), and the int64-headroom guard adjusts with
it; sf0.001 fits 100x (max radix id ~2^54 < 2^63/128), sf0.01 does not —
the guard fails fast with the bound in the message.

Usage: python scripts/check_oracle_scaled.py [--skew] [--reps=N] [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, ".")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from check_oracle import normalize  # noqa: E402  (shared canonicalizer)

DEFAULT_QUERIES = [
    "join_inner",
    "count_overlaps",
    "subtract",
    "nearest",
    "coverage",
    "merge_stranded",
]
#: Direction-sensitive additions to the skew roster (r12, VERDICT r11 #7):
#: as-of sweeps and per-transcript joins whose plans shard differently
#: under a hot chromosome. Run at sf0.001 (their skewed DuckDB twins are
#: per-chromosome quadratic).
SKEW_EXTRA_QUERIES = ["nearest_updown", "map_to_local", "map_to_global"]


SKEW_CHROM = "chr1"  # ~92% of rows land here under --skew (1/5 + all 9 reps)


def main() -> int:
    argv = list(sys.argv[1:])
    skew = "--skew" in argv
    if skew:
        argv.remove("--skew")
    n_reps = 10
    for arg in list(argv):
        if arg.startswith("--reps="):
            n_reps = int(arg.split("=", 1)[1])
            argv.remove(arg)
    if n_reps < 2:
        raise SystemExit("--reps must be >= 2")
    # row_id remix: rep packs into the low bits, so the multiplier is the
    # next power of two >= n_reps and the headroom guard scales with it.
    mult = 1 << (n_reps - 1).bit_length()
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    # --skew with no explicit list runs the full skew roster (r12 review:
    # the extras were documented but not wired, so the documented command
    # silently omitted them). The doc still recommends sf0.001 for the
    # extras' quadratic DuckDB twins; an explicit query list overrides.
    only = argv[1:] or (DEFAULT_QUERIES + SKEW_EXTRA_QUERIES if skew else DEFAULT_QUERIES)

    import __spark_entry__ as em
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from pyranges_1_x_spark.core import GenomicRanges

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .getOrCreate()
    )

    # --- Spark side: swap the fixtures for their densified replicas. The
    # q_ functions only reach the fixtures through em._gr_a/_gr_b, so a
    # wrapper replica keeps every query's own plan untouched.
    orig_a, orig_b = em._gr_a, em._gr_b

    def _assert_headroom(g, side):
        # row_id*mult+rep adds log2(mult) bits on top of the fixture's radix
        # id (4 bits at the default 10x, 7 at 100x — past ~2^59 / ~2^56 the
        # multiply overflows int64). DuckDB errors loudly but non-ANSI Spark
        # WRAPS silently, so fail here with a clear message instead of an
        # engine-dependent one (ADVICE r9).
        hi = g.df.select(F.max("row_id")).first()[0] or 0
        if hi >= 1 << (63 - mult.bit_length() + 1):
            raise SystemExit(
                f"fixture {side}: max(row_id)={hi} >="
                f" 2^{63 - mult.bit_length() + 1}; the {n_reps}x densify"
                f" (row_id*{mult}+rep) would overflow int64 — run at a"
                " smaller sf"
            )

    def _densify(g):
        reps = spark.range(n_reps).select(F.col("id").alias("rep"))
        df = g.df.crossJoin(F.broadcast(reps)).withColumn(
            "row_id", F.col("row_id") * mult + F.col("rep")
        )
        if skew:
            # Replicas (rep > 0) pile onto one chromosome; rep 0 keeps the
            # original relation intact as an exact subset. Same CASE in the
            # DuckDB twin below — both engines see the identical relation.
            df = df.withColumn(
                "Chromosome",
                F.when(F.col("rep") == 0, F.col("Chromosome")).otherwise(
                    F.lit(SKEW_CHROM)
                ),
            )
        df = df.drop("rep")
        return GenomicRanges(df, bin_size=g._bin_size)

    _checked: set = set()

    def _wrap(orig, side):
        def inner(s, d):
            g = orig(s, d)
            if side not in _checked:  # one max() job per side, not per query
                _assert_headroom(g, side)
                _checked.add(side)
            return _densify(g)

        return inner

    em._gr_a = _wrap(orig_a, "a")
    em._gr_b = _wrap(orig_b, "b")

    # --- DuckDB side: same replication, same SQL text discipline. The
    # oracle strings embed em._AB verbatim (asserted below), so swapping the
    # prefix replicates a/b without touching any query's own SQL.
    chrom_sql = (
        f"CASE WHEN rep = 0 THEN Chromosome ELSE '{SKEW_CHROM}' END"
        if skew
        else "Chromosome"
    )
    ab_scaled = (
        f"WITH a0 AS ({em._A_SQL}), b0 AS ({em._B_SQL}),"
        f" reps AS (SELECT * FROM generate_series(0, {n_reps - 1}) t(rep)),"
        f' a AS (SELECT row_id * {mult} + rep AS row_id, {chrom_sql} AS Chromosome, Start,'
        ' "End", Strand, Score FROM a0, reps),'
        f' b AS (SELECT row_id * {mult} + rep AS row_id, {chrom_sql} AS Chromosome, Start,'
        ' "End", Strand, Score FROM b0, reps)'
    )

    con = duckdb.connect()
    for t in em.TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = em.queries(), em.oracle_sql()
    failures = []
    for name in only:
        if em._AB not in oracles[name]:
            print(f"FAIL {name}: oracle does not embed the shared a/b CTE prefix")
            failures.append(name)
            continue
        t0 = time.time()
        try:
            got = qs[name](spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
            failures.append(name)
            continue
        t_spark = time.time() - t0
        spark.catalog.clearCache()
        t0 = time.time()
        try:
            exp = con.execute(oracles[name].replace(em._AB, ab_scaled)).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error {type(e).__name__}: {e}")
            failures.append(name)
            continue
        t_duck = time.time() - t0
        if sorted(got.columns) != sorted(exp.columns):
            print(f"FAIL {name}: columns {sorted(got.columns)} vs {sorted(exp.columns)}")
            failures.append(name)
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rowcount {len(got)} vs {len(exp)}")
            failures.append(name)
            continue
        g, e = normalize(got), normalize(exp)
        try:
            pd.testing.assert_frame_equal(g, e, check_exact=True)
            print(
                f"PASS {name} @{n_reps}x-density{'+skew' if skew else ''}: rows={len(got)}"
                f" [spark {t_spark:.1f}s, duckdb {t_duck:.1f}s]"
            )
        except AssertionError as ex:
            print(f"FAIL {name}: values differ: {str(ex)[:400]}")
            failures.append(name)

    spark.stop()
    if failures:
        print(f"\n{len(failures)} FAILURES: {failures}")
        return 1
    print(f"\nALL PASS ({n_reps}x-density{'+skew' if skew else ''})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
