"""Bucketed sweep primitives vs brute force — tiny bucket widths so every
randomized case crosses many bucket boundaries (the patch path, not just the
local window)."""

from __future__ import annotations

import random

import pandas as pd
from pyspark.sql import functions as F

from pyranges_1_x_spark.plans.sweep import asof_extreme, bucketed_row_number


def _points(seed, n=120, span=200):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        rows.append(
            (
                rng.choice(["chr1", "chr2"]),
                rng.randrange(-span // 4, span),  # negative positions too
                rng.random() < 0.5,
                i,
            )
        )
    return pd.DataFrame(rows, columns=["k", "pos", "isd", "rid"])


def _brute_asof(pdf, side, agg):
    out = {}
    for _, row in pdf.iterrows():
        data = pdf[(pdf.k == row.k) & pdf.isd]
        elig = data[data.pos >= row.pos] if side == "ge" else data[data.pos <= row.pos]
        vals = elig.pos.tolist()
        out[row.rid] = (min(vals) if agg == "min" else max(vals)) if vals else None
    return out


def test_asof_extreme_all_modes_vs_brute(spark):
    for seed in (1, 2):
        pdf = _points(seed)
        df = spark.createDataFrame(pdf)
        for side in ("ge", "le"):
            for agg in ("min", "max"):
                got = asof_extreme(
                    df, ["k"], "pos", F.col("isd"), "pos",
                    side=side, agg=agg, bucket_width=7, out_col="cand",
                )
                gotmap = {r["rid"]: r["cand"] for r in got.collect()}
                assert gotmap == _brute_asof(pdf, side, agg), (seed, side, agg)


def test_bucketed_row_number_matches_global_sort(spark):
    pdf = _points(7, n=150)
    df = spark.createDataFrame(pdf)
    for descending in (False, True):
        order = [
            F.col("pos").desc() if descending else F.col("pos").asc(),
            F.col("rid").asc(),
        ]
        got = bucketed_row_number(
            df, ["k"], "pos", order, bucket_width=5, descending=descending, out_col="rr"
        ).collect()
        gotmap = {r["rid"]: r["rr"] for r in got}
        for k, grp in pdf.groupby("k"):
            srt = grp.sort_values(["pos", "rid"], ascending=[not descending, True])
            for want, rid in enumerate(srt.rid.tolist(), start=1):
                assert gotmap[rid] == want, (k, rid, descending)


def test_asof_extreme_ties_include_data_rows(spark):
    # A data row exactly at the query position must count on both sides
    # (touching => eligible, reference range_frame.py:451-537).
    pdf = pd.DataFrame(
        [("chr1", 10, True, 0), ("chr1", 10, False, 1), ("chr1", 3, True, 2)],
        columns=["k", "pos", "isd", "rid"],
    )
    df = spark.createDataFrame(pdf)
    ge = asof_extreme(
        df, ["k"], "pos", F.col("isd"), "pos",
        side="ge", agg="min", bucket_width=4, out_col="cand",
    )
    assert {r["rid"]: r["cand"] for r in ge.collect()}[1] == 10
    le = asof_extreme(
        df, ["k"], "pos", F.col("isd"), "pos",
        side="le", agg="max", bucket_width=4, out_col="cand",
    )
    assert {r["rid"]: r["cand"] for r in le.collect()}[1] == 10
