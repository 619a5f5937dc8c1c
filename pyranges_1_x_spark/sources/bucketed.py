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


def _validate_parts(table: str) -> list[str]:
    """Split a 1-3 part table identifier and validate each part so the name
    can be safely embedded in SQL (backtick-quoted)."""
    parts = table.split(".")
    if not 1 <= len(parts) <= 3:
        raise ValueError(f"table identifier {table!r} has {len(parts)} parts")
    for part in parts:
        if not _IDENT.match(part):
            raise ValueError(
                f"table identifier part {part!r} is not [A-Za-z0-9_]+; "
                "refusing to embed it in SQL"
            )
    return parts


def _uri_parts(uri: str) -> tuple[str, str, str]:
    """(scheme, host-sans-port, normalized path) of a storage URI for the
    self-read compare. Local spellings ('file:/x', 'file:///x',
    'file://localhost/x' and bare '/x') all normalize to ('file', '',
    '/x'). Keeping the scheme+host distinguishes equal paths on different
    buckets/filesystems (s3a://bucketA/wh/t vs s3a://bucketB/wh/t — ADVICE
    r11: a path-only compare false-positived the guard and blocked a
    legitimate overwrite), while dropping the PORT keeps the guard
    fail-SAFE when one side spells the default port and the other omits
    it ('hdfs://nn/wh/t' in the catalog vs fully-qualified
    'hdfs://nn:8020/wh/t/part-0' from inputFiles — r12 review: an exact
    authority match would have let that self-read destroy its source).
    Nameservice aliases that resolve to the same host under a different
    NAME remain undetectable from strings alone; the guard is one layer,
    Spark's own cannot-overwrite-a-read-table check is the other."""
    from urllib.parse import urlparse

    p = urlparse(uri)
    path = re.sub("/+", "/", p.path or uri).rstrip("/")
    scheme = (p.scheme or "file").lower()
    host = p.netloc.lower().rsplit(":", 1)[0] if p.netloc else ""
    if scheme == "file" and host == "localhost":
        host = ""
    return scheme, host, path


def _table_location(spark: SparkSession, qualified: str) -> str | None:
    """The table's physical location via DESCRIBE EXTENDED (catalog truth,
    not string-building)."""
    try:
        for row in spark.sql(f"DESCRIBE TABLE EXTENDED {qualified}").collect():
            if row[0] == "Location":
                return row[1]
    except Exception:  # pragma: no cover - catalog quirks
        return None
    return None


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

    Overwrite discipline (ADVICE r10, hardened r11): dropping the old
    table before the lazy write executes is only safe when ``df`` does NOT
    read from it — otherwise the source data would be destroyed before
    Spark could raise its usual cannot-overwrite-a-read-table error.
    Self-reads are detected PHYSICALLY: any file in ``df.inputFiles()``
    under the target table's catalog-resolved location fails fast — which
    also catches ``spark.read.parquet(<the table's directory>)`` path
    reads that no name-based plan inspection would see, and cannot
    false-positive on string literals in the plan. The filesystem delete
    (needed because the default in-memory catalog can leave a
    LOCATION_ALREADY_EXISTS orphan directory behind from a previous
    session) runs ONLY when the catalog has no entry for the table — a
    true orphan — and resolves the directory through the catalog's
    database location rather than string-building from the warehouse
    root, so a non-``default`` current database never deletes an
    unrelated ``default.<name>`` table's data."""
    spark = df.sparkSession
    parts = _validate_parts(table)
    qualified = ".".join(f"`{p}`" for p in parts)
    if mode == "overwrite":
        if spark.catalog.tableExists(table):
            loc = _table_location(spark, qualified)
            if loc:
                b_scheme, b_host, b_path = _uri_parts(loc)
                for f in df.inputFiles():
                    f_scheme, f_host, f_path = _uri_parts(f)
                    if (
                        f_scheme == b_scheme
                        and f_host == b_host
                        and (f_path == b_path or f_path.startswith(b_path + "/"))
                    ):
                        raise ValueError(
                            "write_bucketed(mode='overwrite'): input "
                            f"DataFrame reads from target table {table} "
                            f"(file {f} under {loc}); materialize it first "
                            "(write to a different table, or persist+"
                            "checkpoint)"
                        )
            spark.sql(f"DROP TABLE IF EXISTS {qualified}")
        elif len(parts) <= 2:
            # True orphan: no catalog entry, but a stale managed-table
            # directory may survive from a previous session. Resolve the
            # database's location via the catalog and clear only that dir.
            db = parts[0] if len(parts) == 2 else spark.catalog.currentDatabase()
            dbloc = spark.catalog.getDatabase(db).locationUri
            jvm = spark._jvm
            loc = jvm.org.apache.hadoop.fs.Path(f"{dbloc}/{parts[-1].lower()}")
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
