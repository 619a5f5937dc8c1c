"""Island-planner tests: merge/cluster goldens from the reference doctests."""

from __future__ import annotations

import pandas as pd

from pyranges_1_x_spark.core import GenomicRanges


def gr(spark, starts, ends, chrom="1"):
    return GenomicRanges(
        spark.createDataFrame(pd.DataFrame({"Chromosome": chrom, "Start": starts, "End": ends}))
    )


# The cluster_overlaps doctest fixture (reference pyranges_main.py:683-745).
STARTS = [5, 6, 12, 16, 20, 22, 24]
ENDS = [9, 8, 16, 18, 23, 25, 27]


def test_cluster_golden_slack0(spark):
    res = gr(spark, STARTS, ENDS).cluster_overlaps().df.toPandas().sort_values(["Start", "End"])
    assert res.Cluster.tolist() == [0, 0, 1, 2, 3, 3, 3]


def test_cluster_golden_slack1(spark):
    res = gr(spark, STARTS, ENDS).cluster_overlaps(slack=1).df.toPandas().sort_values(["Start", "End"])
    assert res.Cluster.tolist() == [0, 0, 1, 1, 2, 2, 2]


def test_cluster_golden_slack3(spark):
    res = gr(spark, STARTS, ENDS).cluster_overlaps(slack=3).df.toPandas().sort_values(["Start", "End"])
    assert res.Cluster.tolist() == [0, 0, 1, 1, 1, 1, 1]


def test_merge_with_count(spark):
    res = (
        gr(spark, STARTS, ENDS)
        .merge_overlaps(count_col="Count")
        .df.toPandas()
        .sort_values("Start")
    )
    assert list(map(tuple, res[["Start", "End", "Count"]].values)) == [
        (5, 9, 2),
        (12, 16, 1),
        (16, 18, 1),
        (20, 27, 3),
    ]


def test_merge_nested_interval(spark):
    # an interval fully containing later ones must keep the island open
    res = gr(spark, [1, 2, 8], [20, 3, 9]).merge_overlaps().df.toPandas()
    assert list(map(tuple, res[["Start", "End"]].values)) == [(1, 20)]


def test_outer_ranges(spark):
    res = gr(spark, STARTS, ENDS).outer_ranges(count_col="Count").df.toPandas()
    assert list(map(tuple, res[["Start", "End", "Count"]].values)) == [(5, 27, 7)]


def test_bucketed_islands_match_single_window(spark):
    """Cross-bucket correctness: with a tiny bucket width (4), islands span
    many buckets and every row's is_new depends on the broadcast prefix-max
    patch; membership must equal the single-window (bucket_width=None) plan."""
    import random

    from pyranges_1_x_spark.plans.islands import assign_islands

    rng = random.Random(7)
    rows = []
    for i in range(300):
        s = rng.randrange(0, 200)
        rows.append(("chr1" if i % 3 else "chr2", s, s + rng.randrange(1, 30), i))
    df = spark.createDataFrame(rows, "Chromosome string, Start long, End long, rid long")

    def memberships(bucket_width):
        out = assign_islands(
            df, ["Chromosome"], bucket_width=bucket_width, tiebreak=["rid"]
        ).collect()
        isl = {}
        for r in out:
            isl.setdefault((r["Chromosome"], r["__island__"]), set()).add(r["rid"])
        return sorted(frozenset(v) for v in isl.values())

    assert memberships(4) == memberships(None)


def test_bucketed_islands_slack_and_bookends(spark):
    from pyranges_1_x_spark.plans.islands import assign_islands

    # bookended intervals: slack=0 keeps them apart, slack=1 merges
    df = spark.createDataFrame(
        [("c", 0, 8), ("c", 8, 16), ("c", 20, 24)],
        "Chromosome string, Start long, End long",
    )
    def islands(slack):
        out = assign_islands(df, ["Chromosome"], slack=slack, bucket_width=4).collect()
        return sorted((r["Start"], r["__island__"]) for r in out)

    assert islands(0) == [(0, 0), (8, 1), (20, 2)]
    assert islands(1) == [(0, 0), (8, 0), (20, 1)]


def test_adaptive_plan_selection(spark, monkeypatch):
    """adaptive=True picks single-window for small-stats inputs, keeps the
    bucketed two-phase plan when the size estimate exceeds the threshold
    (VERDICT r6 #2); adaptive=False always honors the numeric width."""
    from pyranges_1_x_spark.plans.islands import assign_islands

    # NOTE: built from range(), not createDataFrame — a Python LogicalRDD has
    # UNKNOWN stats (sizeInBytes = Long.MaxValue), which the gate reads as
    # "assume huge, stay bucketed" (the scale-safe direction).
    df = spark.range(50).selectExpr(
        "'c' as Chromosome", "id * 10 as Start", "id * 10 + 5 as End"
    )

    def has_bucket(adaptive):
        plan = (
            assign_islands(df, ["Chromosome"], bucket_width=4, adaptive=adaptive)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        return "__ibkt__" in plan

    # small input + adaptive => single window; explicit width always bucketed
    assert not has_bucket(adaptive=True)
    assert has_bucket(adaptive=False)
    # threshold 0 disables the fallback: adaptive inputs stay bucketed
    monkeypatch.setenv("SPARK_GRAFT_ISLAND_SINGLE_WINDOW_BYTES", "0")
    assert has_bucket(adaptive=True)
    # a 1-byte threshold says nothing is small enough either
    monkeypatch.setenv("SPARK_GRAFT_ISLAND_SINGLE_WINDOW_BYTES", "1")
    assert has_bucket(adaptive=True)
