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

import re
from typing import TYPE_CHECKING

if TYPE_CHECKING:
    from pyspark.sql import DataFrame, SparkSession

_IDENT = re.compile(r"[A-Za-z0-9_]+\Z")


def _resolve(spark: SparkSession, table: str) -> tuple[str, str]:
    """Split ``table`` into (database, name), qualifying unqualified names
    with the session's CURRENT database (not a hard-coded ``default``), and
    validate each part so the name can be safely embedded in SQL."""
    if "." in table:
        db, _, name = table.rpartition(".")
    else:
        db, name = spark.catalog.currentDatabase(), table
    for part in (db, name):
        if not _IDENT.match(part):
            raise ValueError(
                f"table identifier part {part!r} is not [A-Za-z0-9_]+; "
                "refusing to embed it in SQL"
            )
    return db, name


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

    Overwrite discipline (ADVICE r10): dropping the old table before the
    lazy write executes is only safe when ``df`` does NOT read from it —
    otherwise the source data would be destroyed before Spark could raise
    its usual cannot-overwrite-a-read-table error. We detect self-reads in
    the analyzed plan and fail fast, keeping the old table intact. The
    filesystem delete (needed because the default in-memory catalog can
    leave a LOCATION_ALREADY_EXISTS orphan directory behind from a
    previous session) runs ONLY when the catalog has no entry for the
    table — a true orphan — and resolves the directory through the
    catalog's database location rather than string-building from the
    warehouse root, so a non-``default`` current database never deletes
    an unrelated ``default.<name>`` table's data."""
    spark = df.sparkSession
    db, name = _resolve(spark, table)
    qualified = f"`{db}`.`{name}`"
    if mode == "overwrite":
        if spark.catalog.tableExists(f"{db}.{name}"):
            plan = df._jdf.queryExecution().analyzed().toString()
            if re.search(
                rf"\b{re.escape(db)}\.{re.escape(name.lower())}\b", plan, re.I
            ):
                raise ValueError(
                    f"write_bucketed(mode='overwrite'): input DataFrame reads "
                    f"from target table {db}.{name}; materialize it first "
                    "(write to a different table, or persist+checkpoint)"
                )
            spark.sql(f"DROP TABLE IF EXISTS {qualified}")
        else:
            # True orphan: no catalog entry, but a stale managed-table
            # directory may survive from a previous session. Resolve the
            # database's location via the catalog and clear only that dir.
            dbloc = spark.catalog.getDatabase(db).locationUri
            jvm = spark._jvm
            loc = jvm.org.apache.hadoop.fs.Path(f"{dbloc}/{name.lower()}")
            fs = loc.getFileSystem(spark._jsc.hadoopConfiguration())
            if fs.exists(loc):
                fs.delete(loc, True)
    (
        df.write.format("parquet")
        .mode(mode)
        .bucketBy(buckets, *bucket_cols)
        .sortBy(*sort_cols)
        .saveAsTable(qualified)
    )


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back; the bucket spec rides in the catalog, so
    downstream plans see the storage partitioning automatically."""
    return spark.table(table)
