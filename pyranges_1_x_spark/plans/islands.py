"""Island (overlap-connected-component) planner — shared by merge/cluster/complement/...

The reference funnels merge/cluster through ``ruranges.numpy.merge`` /
``ruranges.numpy.cluster`` (a sorted sweep per group,
``/root/reference/pyranges1/methods/merge.py:29-34``,
``range_frame/range_frame.py:255-260``). On Spark the same sweep is a window
function: sort by Start and flag a new island whenever
``Start >= max(End so far) + slack`` — verified against the reference's
cluster_overlaps doctest (``core/pyranges_main.py:700-745``: slack=0 does NOT
merge bookended intervals, slack=1 does).

Scale posture — two-phase bucketed scan (same decomposition as
``plans/sweep.py``): a plain ``Window.partitionBy(keys)`` puts a whole
chromosome in ONE task (~25-way parallelism cap no matter the cluster). The
island scan is a running ``max(End)`` — associative — so it splits:

1. bucket the Start axis (``floor(Start / bucket_width)``; bucket order is
   consistent with Start order, ties always share a bucket) and compute the
   bucket-local exclusive running max(End) per (keys, bucket) — parallelism =
   #buckets;
2. patch each bucket with ``max(End)`` of all EARLIER buckets, prefix-scanned
   over the tiny one-row-per-bucket summary and broadcast back. A row's true
   preceding-max is ``greatest(local, patch)``, which decides ``is_new``
   row-locally;
3. the island id (global prefix count of ``is_new``) decomposes the same way:
   bucket-local cumsum + the broadcast prefix total of earlier buckets.

Cost shape: one full-width shuffle on (keys, bucket) — whose exchange Catalyst
reuses for the phase-3 summary branch (ReusedExchange; the bucket-local window
sort runs twice) — plus two summary-sized broadcasts. Callers that already pay
for a cache can persist the input. ``bucket_width=None`` (or 0) falls back to
the single-window-per-keys plan for bounded inputs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pyranges_1_x_spark.names import DEFAULT_BIN_SIZE, END_COL, ISLAND_COL, START_COL
from pyranges_1_x_spark.plans.interval_join import floordiv

__all__ = ["assign_islands", "island_agg"]

#: Default island bucket width: coarse multiple of the join bin so each bucket
#: holds enough rows to amortize its summary row.
DEFAULT_ISLAND_BUCKET = DEFAULT_BIN_SIZE * 16

#: Inputs whose Catalyst size estimate is at or below this many bytes take the
#: single-window-per-keys plan instead of the two-phase bucketed scan
#: (VERDICT r6 #2): the bucketed plan's patch-join + double window sort is pure
#: overhead when every key-group trivially fits one task (~+40% on five bench
#: rows at sf0.1), while above the threshold the serial per-chromosome sort is
#: the scale-killer the bucketed plan exists to avoid. 256 MB spread over a
#: genome's ~25 chromosomes is ~10 MB per key-group task — far below task
#: spill territory — and join-bearing inputs inflate their estimate, which
#: errs toward the bucketed (scale-safe) side. Override with
#: SPARK_GRAFT_ISLAND_SINGLE_WINDOW_BYTES (0 forces bucketed always).
DEFAULT_SINGLE_WINDOW_BYTES = 256 << 20


def _single_window_ok(df: DataFrame) -> bool:
    """True when the size estimate says the whole input is small enough that
    one sort task per key-group beats the bucketed two-phase plan.
    Estimate unavailable => False (keep the scale-safe bucketed plan).

    Reads the ANALYZED plan's stats, not the optimized plan's: the basic
    sizeInBytes visitor gives the same order-of-magnitude answer (identical
    on scan/union inputs) but skips a full Catalyst optimization pass per
    call — measured 0.005s vs 0.15s on a two-table union, and operators
    like mcc that build many island plans per query were spending more
    driver time optimizing throwaway plans for this check than executing
    (mcc build 4.8s -> ~1s at sf0.1). Without pushdown pruning the
    analyzed estimate can only overshoot, which errs toward the bucketed
    (scale-safe) side."""
    threshold = int(
        os.environ.get("SPARK_GRAFT_ISLAND_SINGLE_WINDOW_BYTES", DEFAULT_SINGLE_WINDOW_BYTES)
    )
    if threshold <= 0:
        return False
    try:
        est = int(df._jdf.queryExecution().analyzed().stats().sizeInBytes())
    except Exception:  # noqa: BLE001
        return False
    return est <= threshold


def _is_new(prev_max, slack: int):
    return F.when(
        prev_max.isNull() | (F.col(START_COL) >= prev_max + F.lit(slack)),
        F.lit(1),
    ).otherwise(F.lit(0))


def assign_islands(
    df: DataFrame,
    keys: list[str],
    *,
    slack: int = 0,
    island_col: str = ISLAND_COL,
    tiebreak: list[str] | None = None,
    bucket_width: int | None = DEFAULT_ISLAND_BUCKET,
    adaptive: bool = False,
    materialize: bool = False,
) -> DataFrame:
    """Attach a per-group island id (0-based within each key-group).

    Two intervals share an island iff they are transitively connected by
    ``Start < prev_interval_max_End + slack``. Island MEMBERSHIP is a function
    of the coordinate multiset only (ties on (Start, End) are coordinate-
    identical rows, which always co-island); ``tiebreak`` columns additionally
    pin the scan order so downstream per-island sorts are fully deterministic.

    With ``adaptive=True`` (what the operator layer passes), a numeric
    ``bucket_width`` is a CEILING, not a mandate — when Catalyst's size
    estimate says the input fits comfortably in one task per key-group (see
    ``DEFAULT_SINGLE_WINDOW_BYTES``), the single-window plan runs instead.
    ``bucket_width=None``/``0`` forces the single-window plan unconditionally;
    ``adaptive=False`` with a numeric width forces the bucketed plan (how the
    cross-bucket unit tests pin the two-phase path).

    ``materialize`` (r16, VERDICT r15 #7): in the bucketed plan the
    bucket-tagged input feeds TWO branches that never canonicalize equal
    (the phase-2 groupBy summary and the phase-1 window), so an
    upstream-derived input is evaluated twice end to end. ``True`` runs it
    once via a tracked persist (caller releases with ``free_tracked()``).
    Default ``False``: the honest A/B at the bucketed plan's firing shape
    (scripts/ab_islands_mat_r16.py, 6M-row derived input, bucketed plan
    FORCED via SPARK_GRAFT_ISLAND_SINGLE_WINDOW_BYTES=0) measured the
    persist a consistent LOSS locally (see OPTIMIZATION_r16.md) — the
    phase-2 summary re-scan is cheaper than writing+reading the cache.
    Pass ``True`` when the input subtree is expensive (wide joins, UDF
    stages) rather than scan-shaped.
    """
    if adaptive and bucket_width and _single_window_ok(df):
        bucket_width = None
    order = [F.col(START_COL).asc(), F.col(END_COL).asc()] + [
        F.col(c).asc() for c in (tiebreak or [])
    ]
    if not bucket_width:
        w = Window.partitionBy(*keys).orderBy(*order)
        prev_max = F.max(END_COL).over(w.rowsBetween(Window.unboundedPreceding, -1))
        island = (
            F.sum(_is_new(prev_max, slack)).over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
            - 1
        )
        return df.withColumn(island_col, island.cast("long"))

    bkt = "__ibkt__"
    d = df.withColumn(bkt, floordiv(F.col(START_COL), bucket_width))
    if materialize:
        from pyranges_1_x_spark.plans.qcache import persist_tracked

        d = persist_tracked(d)

    # Phase 2 summary first (cheap pruned scan + map-side-combined agg):
    # patch = max(End) over all earlier buckets of the same key-group.
    ws = Window.partitionBy(*keys).orderBy(F.col(bkt).asc())
    patch = (
        d.groupBy(*keys, bkt)
        .agg(F.max(END_COL).alias("__bmax__"))
        .select(
            *keys,
            bkt,
            F.max("__bmax__")
            .over(ws.rowsBetween(Window.unboundedPreceding, -1))
            .alias("__patch__"),
        )
    )

    # Phase 1: bucket-local exclusive running max, patched to the true
    # preceding max; is_new becomes row-local.
    wl = Window.partitionBy(*keys, bkt).orderBy(*order)
    local = d.withColumn(
        "__lpm__", F.max(END_COL).over(wl.rowsBetween(Window.unboundedPreceding, -1))
    ).join(F.broadcast(patch), on=[*keys, bkt])
    # greatest() skips nulls: first bucket has null patch, bucket-first rows
    # have null local max; both-null => very first row of the key-group.
    prev_max = F.greatest(F.col("__lpm__"), F.col("__patch__"))
    flagged = local.withColumn("__inew__", _is_new(prev_max, slack))

    # Phase 3: global island id = bucket-local cumsum of is_new + the count of
    # islands started in earlier buckets (prefix over the summary relation).
    flagged = flagged.withColumn(
        "__lcum__",
        F.sum("__inew__").over(wl.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    offsets = (
        flagged.groupBy(*keys, bkt)
        .agg(F.sum("__inew__").alias("__bn__"))
        .select(
            *keys,
            bkt,
            F.coalesce(
                F.sum("__bn__").over(ws.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0),
            ).alias("__ioff__"),
        )
    )
    out = flagged.join(F.broadcast(offsets), on=[*keys, bkt]).withColumn(
        island_col, (F.col("__ioff__") + F.col("__lcum__") - 1).cast("long")
    )
    return out.drop(bkt, "__lpm__", "__patch__", "__inew__", "__lcum__", "__ioff__")


def island_agg(
    df: DataFrame,
    keys: list[str],
    *,
    slack: int = 0,
    count_col: str | None = None,
    tiebreak: list[str] | None = None,
    bucket_width: int | None = DEFAULT_ISLAND_BUCKET,
    adaptive: bool = False,
    materialize: bool = False,
) -> DataFrame:
    """Merge overlapping intervals per key-group (the `merge` kernel equivalent).

    Returns one row per island: keys..., Start=min, End=max [, count_col].
    ``materialize`` forwards to :func:`assign_islands` (bucketed-plan
    duplicate-evaluation knob).
    """
    with_islands = assign_islands(
        df,
        keys,
        slack=slack,
        tiebreak=tiebreak,
        bucket_width=bucket_width,
        adaptive=adaptive,
        materialize=materialize,
    )
    aggs = [
        F.min(START_COL).alias(START_COL),
        F.max(END_COL).alias(END_COL),
    ]
    if count_col is not None:
        aggs.append(F.count(F.lit(1)).alias(count_col))
    out = with_islands.groupBy(*keys, ISLAND_COL).agg(*aggs).drop(ISLAND_COL)
    return out.select(*keys, START_COL, END_COL, *([count_col] if count_col else []))
