"""CLI pipeline chain (reference cli.py:94-208 grammar)."""

from __future__ import annotations

from pyranges_1_x_spark.cli import main


def test_cli_chain(spark, tmp_path, capsys):
    a = tmp_path / "a.bed"
    a.write_text("chr1\t0\t10\tx\t0\t+\nchr1\t5\t20\ty\t0\t-\nchr2\t0\t5\tz\t0\t+\n")
    b = tmp_path / "b.bed"
    b.write_text("chr1\t8\t12\tw\t0\t+\n")
    rc = main(
        [
            "read_bed", str(a),
            ",", "other=read_bed", str(b),
            ",", "join_overlaps", "other", "--strand_behavior", "ignore",
            ",", "merge_overlaps", "--use_strand=False",
        ],
        spark=spark,
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "[1 rows]" in out  # both chr1 rows overlap b -> intersecting region merges to one


def test_cli_unknown_method(spark, tmp_path):
    a = tmp_path / "a.bed"
    a.write_text("chr1\t0\t10\n")
    import pytest

    with pytest.raises(SystemExit):
        main(["read_bed", str(a), ",", "frobnicate"], spark=spark)
