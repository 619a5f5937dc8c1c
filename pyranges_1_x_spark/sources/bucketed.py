"""Bucketed-table persistence: co-located storage for repeated interval work.

A 100 TB corpus that is interval-joined / merged / aggregated repeatedly
should not re-shuffle on every query. Spark bucketed tables persist a hash
partitioning into the table layout: ``bucketBy(N, Chromosome)`` +
``sortBy(Start)`` writes each chromosome's rows into a fixed bucket file
set, pre-sorted by coordinate. Measured co-location contract (both cases
asserted in tests):

- AGGREGATIONS: ``hash(Chromosome)`` satisfies any clustered-distribution
  requirement whose keys CONTAIN Chromosome, so every downstream
  ``groupBy(Chromosome, ...)`` — island aggregations, bucketed sweeps,
  per-chromosome summaries — reads shuffle-free.
- JOINS: two same-bucketed tables join exchange-free ONLY on the exact
  bucket key (join on Chromosome: 0 exchanges; join on (Chromosome,
  Score): both sides still shuffle — Spark requires matching partitioning
  for joins, not subset). Bucket on the full equi-key you join by.

The bin-keyed interval equi-join (``plans/interval_join.py``) still
shuffles its exploded bin relation — bin ids are synthesized per query, so
no storage layout can pre-partition them; what bucketing removes is the
*input-side* exchange feeding that explode and every chromosome-keyed
aggregation around it.

Verified empirically in ``tests/test_io_and_ratio.py``: the aggregation
plan over a bucketed table contains no Exchange operator.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

if TYPE_CHECKING:
    from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    buckets: int = 32,
    bucket_cols: tuple[str, ...] = ("Chromosome",),
    sort_cols: tuple[str, ...] = ("Start", "End"),
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed+sorted Spark table (parquet under the
    session warehouse). ``buckets`` should be sized so one bucket of the
    largest stratum fits an executor's memory at the target scale.

    With the default in-memory catalog, a managed table written by a
    PREVIOUS session leaves its warehouse directory behind while the new
    session's catalog has no entry for it — ``mode='overwrite'`` then
    fails with LOCATION_ALREADY_EXISTS on the orphan. Overwrite therefore
    clears both the catalog entry and the orphan location first (Hadoop
    FS API, so any filesystem works)."""
    spark = df.sparkSession
    if mode == "overwrite":
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        if "." not in table:  # unqualified -> default db at the warehouse root
            wh = spark.conf.get("spark.sql.warehouse.dir")
            jvm = spark._jvm
            loc = jvm.org.apache.hadoop.fs.Path(f"{wh}/{table.lower()}")
            fs = loc.getFileSystem(spark._jsc.hadoopConfiguration())
            if fs.exists(loc):
                fs.delete(loc, True)
    (
        df.write.format("parquet")
        .mode(mode)
        .bucketBy(buckets, *bucket_cols)
        .sortBy(*sort_cols)
        .saveAsTable(table)
    )


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back; the bucket spec rides in the catalog, so
    downstream plans see the storage partitioning automatically."""
    return spark.table(table)
