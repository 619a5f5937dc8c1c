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
