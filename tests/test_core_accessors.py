"""loci accessor + auto-rewrapping group_by (reference core/loci_getter.py
and core/pyranges_groupby.py doctest behaviors)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pyranges_1_x_spark.core import GenomicRanges


@pytest.fixture(scope="module")
def gr(spark):
    rows = [
        ("chr1", 1, 5, "+", 10),
        ("chr1", 4, 9, "-", 20),
        ("chr1", 20, 30, "+", 30),
        ("chr2", 2, 6, "-", 40),
    ]
    return GenomicRanges(
        spark.createDataFrame(
            pd.DataFrame(rows, columns=["Chromosome", "Start", "End", "Strand", "Score"])
        )
    )


def _starts(g):
    return sorted(r["Start"] for r in g.df.collect())


def test_loci_getitem_forms(gr):
    assert _starts(gr.loci["chr1"]) == [1, 4, 20]
    assert _starts(gr.loci["+"]) == [1, 20]
    assert _starts(gr.loci[3:8]) == [1, 2, 4]  # overlap semantics, all chroms
    assert _starts(gr.loci["chr1", "-"]) == [4]
    assert _starts(gr.loci["chr1", 3:8]) == [1, 4]
    assert _starts(gr.loci["chr1", "+", 0:10]) == [1]
    # old callable form still works
    assert _starts(gr.loci("chr1", start=3, end=8)) == [1, 4]


def test_loci_2tuple_second_string_is_always_strand(gr):
    # (str, str) is (chromosome, strand) even for strands outside {+,-}:
    # reference is_chrom_and_strand only checks key[1] is a str
    # (loci_getter.py:110-117), so ('chr1', '.') filters Strand == '.'
    # (empty here), never Chromosome == '.'.
    assert _starts(gr.loci["chr1", "."]) == []
    assert _starts(gr.loci["chr1", "+"]) == [1, 20]
    # ('+', slice) disambiguates the first element as strand
    assert _starts(gr.loci["+", 0:10]) == [1]
    # without a Strand column a lone '+' is a chromosome name, not a strand
    unstranded = GenomicRanges(gr.df.drop("Strand"))
    assert _starts(unstranded.loci["+"]) == []


def test_loci_getitem_rejects_bad_keys(gr):
    with pytest.raises(TypeError, match="does not accept a list"):
        gr.loci[["chr1"]]
    with pytest.raises(ValueError, match="length 2 or 3"):
        gr.loci["chr1", "+", slice(0, 5), "x"]


def test_loci_assign_updates_only_matching_rows(gr):
    out = gr.loci.assign(("chr1", slice(0, 10)), Score=99, Flag="hit")
    rows = {r["Start"]: (r["Score"], r["Flag"]) for r in out.df.collect()}
    assert rows[1] == (99, "hit") and rows[4] == (99, "hit")
    assert rows[20] == (30, None) and rows[2] == (40, None)


def test_loci_assign_accepts_columns(gr):
    out = gr.loci.assign("chr2", Score=F.col("Score") * 10)
    rows = {r["Start"]: r["Score"] for r in out.df.collect()}
    assert rows[2] == 400 and rows[1] == 10


def test_group_by_rewraps_when_loc_columns_survive(gr):
    res = gr.group_by("Chromosome", "Start", "End").agg(F.sum("Score").alias("Score"))
    assert isinstance(res, GenomicRanges)
    assert sorted(r["Score"] for r in res.df.collect()) == [10, 20, 30, 40]


def test_group_by_returns_plain_df_otherwise(gr):
    res = gr.group_by("Chromosome").agg(F.count(F.lit(1)).alias("n"))
    assert not isinstance(res, GenomicRanges)
    assert {r["Chromosome"]: r["n"] for r in res.collect()} == {"chr1": 3, "chr2": 1}


def test_strand_valid_and_make_strand_valid(spark):
    # reference doctests pyranges_main.py:3418-3452+
    import pandas as pd

    d = pd.DataFrame(
        {"Chromosome": ["chr1", "chr1"], "Start": [1, 6], "End": [5, 8], "Strand": ["+", "."]}
    )
    g = GenomicRanges(spark.createDataFrame(d))
    assert g.strand_valid is False
    fixed = g.make_strand_valid()
    assert fixed.strand_valid is True
    assert sorted(r["Strand"] for r in fixed.df.collect()) == ["+", "+"]
    # no Strand column at all -> invalid; make valid adds all-'+'
    g2 = GenomicRanges(spark.createDataFrame(d.drop(columns=["Strand"])))
    assert g2.strand_valid is False
    assert g2.make_strand_valid().strand_valid is True


def test_chromosomes_natsorted(spark):
    import pandas as pd

    d = pd.DataFrame(
        {
            "Chromosome": ["chr11", "chr2", "chrM", "chr1", "chr2"],
            "Start": [0, 0, 0, 0, 5],
            "End": [1, 1, 1, 1, 6],
        }
    )
    g = GenomicRanges(spark.createDataFrame(d))
    assert g.chromosomes == ["chr1", "chr2", "chr11", "chrM"]


def test_chromosomes_and_strands(spark):
    # reference doctest pyranges_main.py:617-632
    import pandas as pd

    d = pd.DataFrame(
        {
            "Chromosome": ["1", "2", "2", "3"],
            "Start": [1, 2, 3, 9],
            "End": [3, 3, 10, 12],
            "Strand": ["+", "-", "+", "-"],
        }
    )
    g = GenomicRanges(spark.createDataFrame(d))
    assert g.chromosomes_and_strands == [("1", "+"), ("2", "+"), ("2", "-"), ("3", "-")]
    import pytest as _pt

    with _pt.raises(ValueError, match="no strand column"):
        _ = GenomicRanges(spark.createDataFrame(d.drop(columns=["Strand"]))).chromosomes_and_strands


def test_sort_by_position(spark):
    import pandas as pd

    d = pd.DataFrame(
        {"Chromosome": ["c", "c", "c"], "Start": [9, 1, 1], "End": [10, 5, 3]}
    )
    g = GenomicRanges(spark.createDataFrame(d))
    out = g.sort_by_position().df.toPandas()
    assert list(map(tuple, out[["Start", "End"]].values)) == [(1, 3), (1, 5), (9, 10)]


def test_clip_ranges_only_right(spark):
    # reference doctest pyranges_main.py:6171-6191 (w fixture + only_right)
    import pandas as pd

    d = pd.DataFrame(
        {
            "Chromosome": ["1", "1", "1"],
            "Start": [-10, 249250600, 100],
            "End": [2, 249250640, 150],
        }
    )
    sizes = spark.createDataFrame(
        pd.DataFrame({"Chromosome": ["1"], "End": [249250620]})
    )
    g = GenomicRanges(spark.createDataFrame(d))
    out = g.clip_ranges(sizes, only_right=True).df.toPandas()
    got = sorted(map(tuple, out[["Start", "End"]].values))
    assert got == [(-10, 2), (100, 150), (249250600, 249250620)]
    # remove + only_right keeps the negative-Start row, drops right overhang
    out2 = g.clip_ranges(sizes, mode="remove", only_right=True).df.toPandas()
    got2 = sorted(map(tuple, out2[["Start", "End"]].values))
    assert got2 == [(-10, 2), (100, 150)]


def test_repr_show_head(spark, capsys):
    from pyranges_1_x_spark.sources.example_data import f1

    g = f1(spark)
    r = repr(g)
    assert r.startswith("GenomicRanges[") and "Chromosome" in r and "lazy" in r
    g.show(2)
    out = capsys.readouterr().out
    assert "Chromosome" in out and "interval1" in out
    h = g.head(2)
    assert len(h) == 2 and list(h.columns)[:3] == ["Chromosome", "Start", "End"]


def test_length_loc_columns_copy_groupby(spark):
    # reference .length doctest (pyranges_main.py:1404-1431): f1 -> 6;
    # merged (unstranded) -> 5
    from pyranges_1_x_spark.sources.example_data import f1

    g = f1(spark)
    assert g.length == 6
    assert g.merge_overlaps(use_strand=False).length == 5
    assert g.loc_columns == ["Chromosome", "Strand"]
    assert g.remove_strand().loc_columns == ["Chromosome"]
    c = g.copy()
    assert c is not g and c.df.columns == g.df.columns
    agg = g.groupby("Chromosome").count().toPandas()
    assert int(agg["count"].iloc[0]) == 3


def test_to_rle_and_to_bigwig_method(spark, tmp_path):
    # to_rle == coverage runs; to_bigwig(return_data=True) drops zero runs
    # and rpm-normalizes; to_bigwig(path) round-trips through the native
    # bigwig writer/reader (reference core/out.py:164-224).
    import pandas as pd

    from pyranges_1_x_spark.sources.binary import read_bigwig

    d = pd.DataFrame(
        {
            "Chromosome": ["chr1", "chr1", "chr1"],
            "Start": [3, 8, 5],
            "End": [6, 9, 7],
        }
    )
    g = GenomicRanges(spark.createDataFrame(d))
    rle = g.to_rle(strand=False).df.toPandas().sort_values("Start")
    got = list(map(tuple, rle[["Start", "End", "Value"]].values))
    # includes the zero-depth gap run, like reference Rle (runs 3,2,1,1,1 /
    # values 1,2,1,0,1 over [3,9))
    assert got == [(3, 5, 1), (5, 6, 2), (6, 7, 1), (7, 8, 0), (8, 9, 1)]

    data = g.to_bigwig(return_data=True, rpm=False).df.toPandas()
    assert sorted(data.columns) == ["Chromosome", "End", "Score", "Start"]
    assert len(data) == 4

    p = str(tmp_path / "t.bw")
    g.to_bigwig(p, rpm=False)
    back = read_bigwig(spark, p).df.toPandas().sort_values("Start")
    got2 = list(map(tuple, back[["Start", "End", "Value"]].values))
    assert got2 == [(3.0, 5.0, 1.0), (5.0, 6.0, 2.0), (6.0, 7.0, 1.0), (8.0, 9.0, 1.0)]


def test_clip_ranges_reference_params(spark):
    """Reference clip_ranges parameter surface: dict chromsizes,
    remove=True boolean, and chromsizes=None (left-clip-only fallback,
    pyranges_main.py:6189-6194)."""
    d = pd.DataFrame(
        {
            "Chromosome": ["chr1", "chr1", "chr1"],
            "Start": [-5, 10, 90],
            "End": [3, 20, 120],
        }
    )
    g = GenomicRanges(spark.createDataFrame(d))

    def rows(r):
        return sorted(map(tuple, r.df.select("Start", "End").toPandas().values))

    assert rows(g.clip_ranges({"chr1": 100})) == [(0, 3), (10, 20), (90, 100)]
    assert rows(g.clip_ranges({"chr1": 100}, remove=True)) == [(10, 20)]
    # None: clip left only, Ends untouched
    assert rows(g.clip_ranges()) == [(0, 3), (10, 20), (90, 120)]
    assert rows(g.clip_ranges(remove=True)) == [(10, 20), (90, 120)]


def test_namespace_exports_match_reference():
    """Reference pyranges1/__init__.py exports (pr.read_*, pr.count_overlaps,
    pr.concat, pr.random, pr.tile_genome, pr.example_data, pr.orfs/seqs/
    stats) resolve at our package top level too."""
    import pyranges_1_x_spark as prs

    for name in (
        "GenomicRanges", "concat", "random", "from_string", "empty",
        "tile_genome", "count_overlaps", "read_bed", "read_gtf", "read_gff3",
        "read_bam", "read_bigwig", "example_data", "orfs", "seqs", "stats",
        "options", "assistant",
    ):
        assert hasattr(prs, name), name
    assert prs.count_overlaps is prs.count_overlaps_matrix
    # read_gff is the GTF reader under the GFF2 name (reference
    # __init__.py:19 `read_gff = read_gtf`).
    assert prs.read_gff is prs.read_gtf
    assert hasattr(prs.stats, "fdr") and hasattr(prs.seqs, "translate")
    assert hasattr(prs.orfs, "extend_orfs")


def test_assistant_prompt_and_export_docs(tmp_path):
    """pr.assistant (reference core/assistant.py): prompt() returns the
    priming text (longer with concise=False vs +suffix with concise=True),
    to_file writes instead of returning, and export_docs() introspects the
    REAL public surface — no network anywhere."""
    import pyranges_1_x_spark as prs

    p = prs.assistant.prompt()
    assert "pyranges_1_x_spark" in p and "join_overlaps" in p
    pc = prs.assistant.prompt(concise=True)
    assert pc.startswith(p) and len(pc) > len(p)
    f = tmp_path / "prompt.txt"
    assert prs.assistant.prompt(to_file=f) is None
    assert f.read_text(encoding="utf-8") == p
    assert "prime" in repr(prs.assistant)

    docs = prs.assistant.export_docs()
    # the blob carries real docstrings from across the package
    for needle in (
        "GenomicRanges.join_overlaps",
        "GenomicRanges.merge_overlaps",
        "RangeFrame.merge_overlaps",
        "pyranges_1_x_spark.functions.stats.fdr",
        "pyranges_1_x_spark.ml.dedup.dedup_clusters",
    ):
        assert needle in docs, needle
    # inherited-docs dial: include_inherited=True copies each same-named
    # kernel function's docstring into empty class-method delegator entries
    # (assistant.py module docstring), so the blob must grow and carry the
    # provenance marker.
    bigger = prs.assistant.export_docs(include_inherited=True)
    assert len(bigger) > len(docs)
    assert "(docstring inherited from pyranges_1_x_spark.operators.merge.merge_overlaps)" in bigger
    assert "(docstring inherited from" not in docs
    df = tmp_path / "docs.txt"
    assert prs.assistant.export_docs(to_file=df) is None
    assert df.read_text(encoding="utf-8") == docs


def test_range_frame_surface(spark):
    """Reference RangeFrame (range_frame.py): interval kernels on bare
    (Start, End) frames — no Chromosome required; grouping only via
    match_by; a metadata column named Chromosome passes through untouched."""
    import pandas as pd

    from pyranges_1_x_spark import RangeFrame

    a = RangeFrame(spark.createDataFrame(pd.DataFrame(
        {"Start": [1, 4, 20], "End": [5, 9, 30], "tag": ["x", "y", "z"]})))
    b = RangeFrame(spark.createDataFrame(pd.DataFrame(
        {"Start": [8, 100], "End": [21, 110]})))

    m = a.merge_overlaps().df.toPandas()
    assert sorted(map(tuple, m[["Start", "End"]].values)) == [(1, 9), (20, 30)]

    ov = a.overlap(b).df.toPandas()
    assert sorted(ov.Start.tolist()) == [4, 20]

    j = a.join_overlaps(b).df.toPandas()
    assert sorted(map(tuple, j[["Start", "Start_b"]].values)) == [(4, 8), (20, 8)]

    s = a.subtract_overlaps(b).df.toPandas()
    assert sorted(map(tuple, s[["Start", "End"]].values)) == [(1, 5), (4, 8), (21, 30)]

    n = a.nearest_ranges(b).df.toPandas()
    assert len(n) == 3

    c = a.count_overlaps(b).df.toPandas()
    assert sorted(c.Count.tolist()) == [0, 1, 1]

    # match_by grouping; metadata Chromosome column survives untouched
    d = RangeFrame(spark.createDataFrame(pd.DataFrame(
        {"Start": [0, 3, 0], "End": [5, 8, 5],
         "g": ["a", "a", "b"], "Chromosome": ["meta1", "meta2", "meta3"]})))
    mg = d.merge_overlaps(match_by="g").df.toPandas()
    assert sorted(map(tuple, mg[["g", "Start", "End"]].values)) == [
        ("a", 0, 8), ("b", 0, 5)]
    assert "Chromosome" in d.overlap(d).df.columns

    srt = a.sort_by_position().df.toPandas()
    assert srt.Start.tolist() == [1, 4, 20]


def test_options_manager_reference_semantics():
    """pr.options (reference core/options.py): same option names/defaults,
    set/get/reset round-trip, unknown names raise, display_options aligns
    name : value (description) lines."""
    import pyranges_1_x_spark as prs

    o = prs.options
    o.reset_options()
    assert o.get_option("max_rows_to_show") == 8
    assert o.get_option("max_column_names_to_show") == 3
    assert o.get_option("console_width") is None
    assert o.get_option("html_max_cols") == 20
    assert o.get_option("html_max_rows") is None
    o.set_option("max_rows_to_show", 10)
    assert o.get_option("max_rows_to_show") == 10
    o.reset_options()
    assert o.get_option("max_rows_to_show") == 8
    with pytest.raises(ValueError, match="not recognized"):
        o.get_option("nope")
    with pytest.raises(ValueError, match="not recognized"):
        o.set_option("nope", 1)
    disp = o.display_options()
    assert "max_rows_to_show" in disp and "(the max number of rows" in disp
    assert repr(o) == disp


def test_tostring_bounded_repr(spark):
    """tostring(): max_rows window + '...' probe row, dtype line, console-
    width column truncation with the hidden-columns note, job-free __repr__."""
    import pyranges_1_x_spark as prs

    prs.options.reset_options()
    rows = [("chr1", i, i + 5, "+", i * 2, f"meta{i}") for i in range(12)]
    g = GenomicRanges(spark.createDataFrame(
        rows, "Chromosome string, Start long, End long, Strand string, "
              "Score long, note string"))
    s = g.tostring(max_total_width=200)
    lines = s.splitlines()
    # header + dtype + rule + 8 rows + '...' + footer
    assert lines[0].split()[:3] == ["Chromosome", "Start", "End"]
    assert "bigint" in lines[1] and "string" in lines[1]
    assert lines[-2].strip().startswith("...")
    assert "more than 8 rows" in lines[-1] and "6 columns" in lines[-1]
    # exact count on demand
    assert "12 rows" in g.tostring(max_total_width=200, count_rows=True)
    # tail=True: the reference's exact head+tail split (core/tostring.py:72)
    # — head(n//2), a '...' marker row, tail(n//2), exact count footer.
    ts = g.tostring(max_total_width=200, tail=True)
    tl = ts.splitlines()
    # header + dtype + rule + 4 head + '...' + 4 tail + footer = 13 lines
    assert len(tl) == 13
    assert tl[3].split()[1] == "0" and tl[6].split()[1] == "3"  # head Starts
    assert tl[7].strip().startswith("...")
    assert tl[8].split()[1] == "8" and tl[11].split()[1] == "11"  # tail Starts
    assert "12 rows" in tl[-1] and "more than" not in tl[-1]
    # tail=True on a frame smaller than the window: no split, exact count
    small3 = g.df.limit(3)
    ts3 = GenomicRanges(small3).tostring(max_total_width=200, tail=True)
    assert "3 rows" in ts3 and "..." not in ts3
    # small frame: exact rows, no probe row
    small = GenomicRanges(spark.createDataFrame(
        rows[:3], "Chromosome string, Start long, End long, Strand string, "
                  "Score long, note string"))
    st = small.tostring(max_total_width=200)
    assert "3 rows" in st and "..." not in st
    # narrow console: columns drop, note lists hidden names
    narrow = g.tostring(max_total_width=30)
    assert "columns not shown" in narrow
    # per-cell truncation
    wide = GenomicRanges(spark.createDataFrame(
        [("chr1", 0, 1, "x" * 50)],
        "Chromosome string, Start long, End long, blob string"))
    assert "..." in wide.tostring(max_col_width=10, max_total_width=200)
    # __repr__ stays schema-only (no Spark job): mentions types, not values
    assert "lazy" in repr(g)
    # RangeFrame delegation
    from pyranges_1_x_spark import RangeFrame

    rf = RangeFrame(spark.createDataFrame([(1, 5)], "Start long, End long"))
    assert "RangeFrame with 1 rows" in rf.tostring(max_total_width=100)


def test_to_html_honors_html_options(spark):
    """to_html(): html_max_rows/html_max_cols drive the bound, cells are
    escaped, and the lazy more-rows probe renders an ellipsis row."""
    import pyranges_1_x_spark as prs

    prs.options.reset_options()
    rows = [("chr1", i, i + 1, f"<b&{i}>") for i in range(12)]
    g = GenomicRanges(spark.createDataFrame(
        rows, "Chromosome string, Start long, End long, note string"))
    h = g.to_html()
    assert h.count("<tr>") == 1 + 8 + 1  # header + 8 rows + ellipsis row
    assert "&lt;b&amp;0&gt;" in h and "<b&" not in h
    assert "more than 8 rows" in h
    try:
        prs.options.set_option("html_max_rows", 3)
        prs.options.set_option("html_max_cols", 2)
        h2 = g.to_html()
        assert h2.count("<tr>") == 1 + 3 + 1
        assert "2 columns hidden" in h2 and "<th>...</th>" in h2
    finally:
        prs.options.reset_options()
