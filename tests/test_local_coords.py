"""Local-coordinate family: goldens from the reference's group_cumsum doctest
(pyranges_main.py:5252-5280) plus slice/five_end/three_end behavior."""

from __future__ import annotations

import pandas as pd
import pytest

from pyranges_1_x_spark.core import GenomicRanges

# The ensembl exon fixture from the group_cumsum doctest.
EXONS = [
    ("1", 11868, 12227, "+", "DDX11L1"),
    ("1", 12612, 12721, "+", "DDX11L1"),
    ("1", 13220, 14409, "+", "DDX11L1"),
    ("1", 112699, 112804, "-", "AL627309.1"),
    ("1", 110952, 111357, "-", "AL627309.1"),
    ("1", 133373, 133723, "-", "AL627309.1"),
    ("1", 129054, 129223, "-", "AL627309.1"),
    ("1", 120873, 120932, "-", "AL627309.1"),
]
COLS = ["Chromosome", "Start", "End", "Strand", "gene_name"]


@pytest.fixture(scope="module")
def exons(spark):
    return GenomicRanges(spark.createDataFrame(pd.DataFrame(EXONS, columns=COLS)))


def test_group_cumsum_golden(exons):
    res = exons.group_cumsum(group_by="gene_name").df.toPandas()
    got = {
        (r.gene_name, r.Start, r.End) for r in res.itertuples()
    }
    expected = {
        ("DDX11L1", 0, 359),
        ("DDX11L1", 359, 468),
        ("DDX11L1", 468, 1657),
        ("AL627309.1", 578, 683),
        ("AL627309.1", 683, 1088),
        ("AL627309.1", 0, 350),
        ("AL627309.1", 350, 519),
        ("AL627309.1", 519, 578),
    }
    assert got == expected


def test_slice_ranges_spliced(exons):
    # first 400 local bases of DDX11L1 (+): exon1 [11868,12227) = 359, then 41 of exon2
    res = (
        exons.slice_ranges(0, 400, group_by="gene_name")
        .df.filter("gene_name = 'DDX11L1'")
        .toPandas()
        .sort_values("Start")
    )
    assert list(map(tuple, res[["Start", "End"]].values)) == [(11868, 12227), (12612, 12653)]


def test_slice_negative_from_three_end(exons):
    # last 50 local bases of DDX11L1: tail of exon3
    res = (
        exons.slice_ranges(-50, None, group_by="gene_name")
        .df.filter("gene_name = 'DDX11L1'")
        .toPandas()
    )
    assert list(map(tuple, res[["Start", "End"]].values)) == [(14359, 14409)]


def test_five_end_grouped(exons):
    res = exons.five_end(group_by="gene_name").df.toPandas()
    got = {(r.gene_name, r.Start, r.End) for r in res.itertuples()}
    # DDX11L1 '+': first base of exon1; AL627309.1 '-': last base of rightmost exon
    assert got == {("DDX11L1", 11868, 11869), ("AL627309.1", 133722, 133723)}


def test_three_end_grouped(exons):
    res = exons.three_end(group_by="gene_name").df.toPandas()
    got = {(r.gene_name, r.Start, r.End) for r in res.itertuples()}
    assert got == {("DDX11L1", 14408, 14409), ("AL627309.1", 110952, 110953)}


def test_upstream_downstream(spark):
    gr = GenomicRanges(
        spark.createDataFrame(
            pd.DataFrame(
                [("chr1", 100, 200, "+"), ("chr1", 300, 400, "-")],
                columns=["Chromosome", "Start", "End", "Strand"],
            )
        )
    )
    up = gr.upstream(10, gap=5).df.toPandas().sort_values("Start")
    assert list(map(tuple, up[["Start", "End"]].values)) == [(85, 95), (405, 415)]
    dn = gr.downstream(10).df.toPandas().sort_values("Start")
    assert list(map(tuple, dn[["Start", "End"]].values)) == [(200, 210), (290, 300)]


def test_calculate_frame(exons):
    res = exons.calculate_frame("gene_name").df.toPandas()
    ddx = res[res.gene_name == "DDX11L1"].sort_values("Start")
    assert ddx.Frame.tolist() == [0, 359 % 3, 468 % 3]


def _slice_fixture(spark):
    """Reference slice_ranges doctest frame (pyranges_main.py:3144-3149)."""
    return GenomicRanges(
        spark.createDataFrame(
            pd.DataFrame(
                {
                    "Chromosome": ["1", "1", "2", "2", "3"],
                    "Strand": ["+", "+", "-", "-", "+"],
                    "Start": [1, 40, 10, 70, 140],
                    "End": [11, 60, 25, 80, 152],
                    "transcript_id": ["t1", "t1", "t2", "t2", "t3"],
                }
            )
        )
    )


def test_slice_ranges_count_introns_unstranded(spark):
    # reference doctest pyranges_main.py:3186-3196
    p = _slice_fixture(spark)
    res = p.slice_ranges(0, 50, group_by="transcript_id", count_introns=True, use_strand=False)
    got = {(r.transcript_id, r.Start, r.End) for r in res.df.toPandas().itertuples()}
    assert got == {("t1", 1, 11), ("t1", 40, 51), ("t2", 10, 25), ("t3", 140, 152)}


def test_slice_ranges_count_introns_negative_stranded(spark):
    # reference doctest pyranges_main.py:3198-3208
    p = _slice_fixture(spark)
    res = p.slice_ranges(-50, -5, group_by="transcript_id", count_introns=True)
    got = {(r.transcript_id, r.Start, r.End) for r in res.df.toPandas().itertuples()}
    assert got == {("t1", 10, 11), ("t1", 40, 55), ("t2", 15, 25), ("t3", 140, 147)}


def test_slice_ranges_count_introns_rowwise(spark):
    # no group_by: every row is its own span (temp per-row id in the reference)
    p = _slice_fixture(spark)
    res = p.slice_ranges(0, 5, count_introns=True, use_strand=False)
    got = {(r.Start, r.End) for r in res.df.toPandas().itertuples()}
    assert got == {(1, 6), (40, 45), (10, 15), (70, 75), (140, 145)}


def test_slice_ranges_ungrouped_per_row_golden(spark):
    """Reference doctest pyranges_main.py:3082-3106: with NO group_by every
    row slices independently (ruranges passes arange group ids)."""
    import pandas as pd

    d = pd.DataFrame(
        {
            "Chromosome": ["1", "1", "2", "2", "3"],
            "Strand": ["+", "+", "-", "-", "+"],
            "Start": [1, 40, 10, 70, 140],
            "End": [11, 60, 25, 80, 152],
            "transcript_id": ["t1", "t1", "t2", "t2", "t3"],
        }
    )
    g = GenomicRanges(spark.createDataFrame(d))
    first5 = sorted(
        map(tuple, g.slice_ranges(0, 5).df.select("Start", "End").toPandas().values)
    )
    assert first5 == [(1, 6), (20, 25), (40, 45), (75, 80), (140, 145)]
    last10 = sorted(
        map(tuple, g.slice_ranges(-10).df.select("Start", "End").toPandas().values)
    )
    assert last10 == [(1, 11), (10, 20), (50, 60), (70, 80), (142, 152)]


def test_window_ranges_grouped_and_window_id(spark):
    """Grouped windows run over the SPLICED transcript axis: a window
    spanning an intron yields non-contiguous pieces sharing a window_id
    (reference window_ranges group_by/add_window_id docs)."""
    import pandas as pd

    d = pd.DataFrame(
        {
            "Chromosome": ["1", "1", "2"],
            "Strand": ["+", "+", "-"],
            "Start": [1, 40, 10],
            "End": [11, 60, 25],
            "transcript_id": ["t1", "t1", "t2"],
        }
    )
    g = GenomicRanges(spark.createDataFrame(d))
    out = (
        g.window_ranges(15, group_by="transcript_id", add_window_id=True)
        .df.select("Chromosome", "Start", "End", "window_id")
        .toPandas()
    )
    got = sorted(map(tuple, out.values))
    # t1 local axis: exon1 [0,10), exon2 [10,30); w=15 -> window0 covers
    # [1,11) + [40,45), window1 covers [45,60).
    # t2 '-' : local [0,15) -> window0 = whole exon reflected = [10,25).
    assert got == [
        ("1", 1, 11, 0),
        ("1", 40, 45, 0),
        ("1", 45, 60, 1),
        ("2", 10, 25, 0),
    ]
    # ungrouped doctest (pyranges_main.py:5100): [800,1012) w=100
    d2 = pd.DataFrame({"Chromosome": ["1"], "Start": [800], "End": [1012]})
    g2 = GenomicRanges(spark.createDataFrame(d2))
    got2 = sorted(
        map(tuple, g2.window_ranges(100).df.select("Start", "End").toPandas().values)
    )
    assert got2 == [(800, 900), (900, 1000), (1000, 1012)]
