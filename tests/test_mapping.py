"""map_to_global / map_to_local goldens from the reference doctest
(pyranges_main.py:1543-1605)."""

from __future__ import annotations

import pandas as pd

from pyranges_1_x_spark.core import GenomicRanges


def exons(spark):
    return GenomicRanges(
        spark.createDataFrame(
            pd.DataFrame(
                {
                    "Chromosome": ["chr1", "chr1", "chr1", "chr1"],
                    "Start": [100, 300, 1000, 1100],
                    "End": [200, 400, 1050, 1200],
                    "Strand": ["+", "+", "-", "-"],
                    "transcript_id": ["tx1", "tx1", "tx2", "tx2"],
                }
            )
        )
    )


def local(spark):
    return GenomicRanges(
        spark.createDataFrame(
            pd.DataFrame(
                {
                    "Chromosome": ["tx1", "tx1", "tx1", "tx2", "tx2"],
                    "Start": [0, 120, 160, 0, 100],
                    "End": [80, 140, 170, 20, 130],
                    "Strand": ["-", "-", "+", "+", "+"],
                    "label": ["a", "b", "c", "d", "e"],
                }
            )
        )
    )


EXPECT = {
    "a": ("chr1", 100, 180, "-"),
    "b": ("chr1", 320, 340, "-"),
    "c": ("chr1", 360, 370, "+"),
    "d": ("chr1", 1180, 1200, "-"),
    "e": ("chr1", 1020, 1050, "-"),
}


def test_map_to_global_doctest(spark):
    out = local(spark).map_to_global(exons(spark), "transcript_id").df.toPandas()
    got = {r.label: (r.Chromosome, r.Start, r.End, r.Strand) for r in out.itertuples()}
    assert got == EXPECT


def test_map_to_global_keep_id_loc(spark):
    out = local(spark).map_to_global(
        exons(spark), "transcript_id", keep_id=True, keep_loc=True
    ).df.toPandas()
    row = out[out.label == "e"].iloc[0]
    assert row.transcript_id == "tx2"
    assert (row.Start_local, row.End_local, row.Strand_local) == (100, 130, "+")


def test_map_to_global_splits_on_junction(spark):
    # A local interval spanning the tx1 exon junction (local 100 is the break).
    g = GenomicRanges(
        exons(spark).df.sparkSession.createDataFrame(
            pd.DataFrame({"Chromosome": ["tx1"], "Start": [90], "End": [110]})
        )
    )
    out = g.map_to_global(exons(spark), "transcript_id").df.toPandas()
    got = sorted(map(tuple, out[["Start", "End"]].values))
    assert got == [(190, 200), (300, 310)]


def test_map_to_local_inverts(spark):
    # Lift the doctest locals to genome, then map back: coordinates round-trip.
    lifted = local(spark).map_to_global(exons(spark), "transcript_id", keep_id=False)
    back = lifted.map_to_local(exons(spark), "transcript_id").df.toPandas()
    got = {r.label: (r.Chromosome, r.Start, r.End) for r in back.itertuples()}
    orig = local(spark).df.toPandas()
    want = {r.label: (r.Chromosome, r.Start, r.End) for r in orig.itertuples()}
    assert got == want
    # Round-trip strand: local-vs-exon product applied twice restores '+-' per label.
    strands = {r.label: r.Strand for r in back.itertuples()}
    assert strands == {"a": "-", "b": "-", "c": "+", "d": "+", "e": "+"}


def test_map_to_local_keep_cols(spark):
    g = GenomicRanges(
        local(spark).df.sparkSession.createDataFrame(
            pd.DataFrame({"Chromosome": ["chr1"], "Start": [150], "End": [350]})
        )
    )
    out = g.map_to_local(
        exons(spark), "transcript_id", keep_chrom=True, keep_loc=True
    ).df.toPandas()
    # (150,350) intersects exon1 (100,200)+ -> local [50,100); exon2 (300,400)+ -> [100,150)
    got = sorted(map(tuple, out[["Start", "End", "Start_global", "End_global"]].values))
    assert got == [(50, 100, 100, 200), (100, 150, 300, 400)]
    assert set(out.Chromosome_global) == {"chr1"}
    assert set(out.Chromosome) == {"tx1"}
