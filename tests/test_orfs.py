"""extend_orfs vs the reference doctest goldens (ext/orfs.py:193-355)."""

from __future__ import annotations

import pandas as pd
import pytest

from pyranges_1_x_spark.core import GenomicRanges

SEQ1 = " AA TAA TGT ATG GTA ATG GGC GCC GGG ATT CCA CAG TAA GTG C".replace(" ", "")
SEQ1B = " AA TAA TGT ATG GTA ATG GGC GCC GGG ATT CCA CAG AAA GTG C".replace(" ", "")
SEQ1C = " AA TAC TGT ATG GTA ATG GGC GCC GGG ATT CCA CAG TAA GTG C".replace(" ", "")
SEQ2 = " CC GGG CTA CTG AAA CAC CTG GCC CAA CAT CAA ACG CTA G".replace(" ", "")


def _gr(spark, rows, cols=("Chromosome", "Start", "End", "Strand")):
    return GenomicRanges(spark.createDataFrame(pd.DataFrame(rows, columns=list(cols))))


def _seqs(spark, chrom, s):
    return spark.createDataFrame(pd.DataFrame({"Chromosome": [chrom], "Sequence": [s]}))


def _one(g):
    rows = g.df.collect()
    assert len(rows) == 1
    return rows[0]


@pytest.fixture(scope="module")
def p(spark):
    return _gr(spark, [("seq1", 20, 29, "+")])


def test_extend_orfs_both_directions(spark, p):
    r = _one(p.extend_orfs(_seqs(spark, "seq1", SEQ1), record_extensions=True))
    assert (r.Start, r.End) == (8, 38)
    assert (r.extension_up, r.extension_down) == (12, 9)


def test_extend_orfs_up_only(spark, p):
    r = _one(p.extend_orfs(_seqs(spark, "seq1", SEQ1), direction="up"))
    assert (r.Start, r.End) == (8, 29)


def test_extend_orfs_stop_delimited(spark, p):
    r = _one(p.extend_orfs(_seqs(spark, "seq1", SEQ1), starts=()))
    assert (r.Start, r.End) == (5, 38)


def test_extend_orfs_no_downstream_stop(spark, p):
    seqs = _seqs(spark, "seq1", SEQ1B)
    r = _one(p.extend_orfs(seqs, record_extensions=True))
    assert (r.Start, r.End, r.extension_up, r.extension_down) == (8, 29, 12, 0)
    r = _one(p.extend_orfs(seqs, record_extensions=True, keep_off_bounds=True))
    assert (r.Start, r.End, r.extension_up, r.extension_down) == (8, 41, 12, 12)


def test_extend_orfs_no_upstream_stop(spark, p):
    seqs = _seqs(spark, "seq1", SEQ1C)
    r = _one(p.extend_orfs(seqs, record_extensions=True))
    assert (r.Start, r.End, r.extension_up, r.extension_down) == (8, 38, 12, 9)
    r = _one(p.extend_orfs(seqs, record_extensions=True, keep_off_bounds=True))
    assert (r.Start, r.End, r.extension_up, r.extension_down) == (2, 38, 18, 9)


def test_extend_orfs_multi_exon_negative_strand(spark):
    np_ = _gr(
        spark,
        [("seq2", 19, 23, "-", "a"), ("seq2", 11, 13, "-", "a")],
        ("Chromosome", "Start", "End", "Strand", "ID"),
    )
    out = np_.extend_orfs(_seqs(spark, "seq2", SEQ2), group_by="ID")
    got = {(r.Start, r.End) for r in out.df.collect()}
    # upstream on '-' moves the max-End exon right; downstream moves the
    # min-Start exon left (doctest: GGCC -> ATGTTGGGCC, TT -> TTCAGTAG).
    assert got == {(19, 29), (5, 13)}


def test_extend_orfs_validations(spark, p):
    seqs = _seqs(spark, "seq1", SEQ1)
    with pytest.raises(AssertionError, match="stop codon"):
        p.extend_orfs(seqs, stops=())
    with pytest.raises(AssertionError, match="3 nt"):
        p.extend_orfs(seqs, starts=("ATGA",))
    unstranded = _gr(spark, [("seq1", 20, 29)], ("Chromosome", "Start", "End"))
    with pytest.raises(AssertionError, match="strand"):
        unstranded.extend_orfs(seqs)

def test_extend_orfs_tiled_path_matches_whole_string(spark):
    """max_scan_nt engages the overlapping-tile scale path (operators/
    orfs.py) — wherever the cap is not binding it must agree exactly with
    the whole-string debug path, including windows crossing a tile
    boundary; where the cap binds, extensions must stay within it."""
    motif = "ATGGCAATTCCGTAAGGC"
    seqs = _seqs(spark, "seqT", motif * 400)  # 7200 nt: several 1024-char tiles
    rows = [
        ("seqT", s, s + ln, st, f"r{i}")
        for i, (s, ln, st) in enumerate(
            (s, ln, st)
            for s in (0, 11, 1000, 1020, 1023, 2047, 3000, 7000, 7150)
            for ln, st in ((9, "+"), (12, "-"), (30, "+"))
            if s + ln <= 7200
        )
    ]
    gr = _gr(spark, rows, ("Chromosome", "Start", "End", "Strand", "ID"))
    cols = ["ID", "Start", "End", "extension_up", "extension_down"]

    def grab(g):
        return {r.ID: r for r in g.df.select(*cols).collect()}

    tiled = grab(gr.extend_orfs(seqs, record_extensions=True, max_scan_nt=120))
    whole = grab(gr.extend_orfs(seqs, record_extensions=True, max_scan_nt=None))
    assert set(tiled) == set(whole) == {r[-1] for r in rows}
    for rid, w in whole.items():
        t = tiled[rid]
        if w.extension_up <= 120 and w.extension_down <= 120:
            assert tuple(t) == tuple(w), rid
        else:
            assert t.extension_up <= 120 and t.extension_down <= 120, rid

def test_extend_orfs_missing_chromosome_passthrough(spark):
    """ADVICE r3: rows whose chromosome has no sequence must pass through
    unextended (not null) in every branch, including keep_off_bounds."""
    gr = _gr(spark, [("nochrom", 20, 29, "+"), ("nochrom", 20, 29, "-")])
    seqs = _seqs(spark, "seq1", SEQ1)
    for kwargs in ({}, {"keep_off_bounds": True}, {"max_scan_nt": 120},
                   {"keep_off_bounds": True, "max_scan_nt": 120}):
        out = gr.extend_orfs(seqs, record_extensions=True, **kwargs)
        got = sorted((r.Start, r.End, r.extension_up, r.extension_down)
                     for r in out.df.collect())
        assert got == [(20, 29, 0, 0), (20, 29, 0, 0)], kwargs


def test_extend_orfs_out_of_bounds_interval_never_shrinks(spark):
    """r15 review: an interval reaching PAST the chromosome edge (End >
    len(seq), or Start < 0) made the codon count m NEGATIVE, and the
    keep_off_bounds no-stop branch emitted ext = 3*m < 0 — a negative
    "extension" that SHRANK the interval. Clamped m must pass such rows
    through unextended in every branch/path combination."""
    seqs = _seqs(spark, "seq1", SEQ1)  # 44 nt
    gr = _gr(
        spark,
        [("seq1", 20, 80, "+"), ("seq1", 20, 80, "-"),
         ("seq1", -9, 8, "+"), ("seq1", -9, 8, "-")],
    )
    for kwargs in ({}, {"keep_off_bounds": True}, {"max_scan_nt": 120},
                   {"keep_off_bounds": True, "max_scan_nt": 120}):
        out = gr.extend_orfs(seqs, record_extensions=True, **kwargs)
        for r in out.df.collect():
            assert r.extension_up >= 0 and r.extension_down >= 0, (kwargs, r)
            assert r.End - r.Start >= 17, (kwargs, r)  # never shrunk


def test_extend_orfs_rejects_regex_metachar_codons(spark, p):
    """r15 review: codons are spliced into Java-regex alternations — a
    metacharacter pattern like 'A.G' would silently become a wildcard."""
    seqs = _seqs(spark, "seq1", SEQ1)
    with pytest.raises(AssertionError, match="alphanumeric"):
        p.extend_orfs(seqs, starts=("A.G",))
    with pytest.raises(AssertionError, match="alphanumeric"):
        p.extend_orfs(seqs, stops=("TA(",))


def test_extend_orfs_from_native_fasta(spark, tmp_path):
    """Integration: write a genome FASTA, read it with the native parser,
    and feed the sequence table straight into extend_orfs — the composition
    a reference user performs with pyfaidx."""
    from pyranges_1_x_spark.core import GenomicRanges
    from pyranges_1_x_spark.operators.orfs import extend_orfs
    from pyranges_1_x_spark.sources.fasta import read_fasta_native, write_fasta

    #            0         1         2
    #            0123456789012345678901234567
    seq =       "AAATGACCCGGGTTTAAACCCGGGTGAA"
    # CDS [3,9) = ATGACC; downstream in-frame stop TGA at [24,27)
    write_fasta(str(tmp_path / "g.fa"), [("chrZ", seq)], width=10)
    table = read_fasta_native(spark, str(tmp_path / "g.fa"))
    gr = GenomicRanges(
        spark.createDataFrame(
            [("chrZ", 3, 9, "+")],
            "Chromosome string, Start long, End long, Strand string",
        )
    )
    out = extend_orfs(gr, table, direction="down", starts=()).df.collect()
    assert len(out) == 1
    assert out[0]["Start"] == 3 and out[0]["End"] == 27
