"""coverage_ratio + GFF3 round-trip + binary-format stubs."""

from __future__ import annotations

import math

import pandas as pd
import pytest

from pyranges_1_x_spark.core import GenomicRanges
from pyranges_1_x_spark.sources.binary import read_bam, read_bigwig
from pyranges_1_x_spark.sources.gtf import read_gff3, to_gff3


def test_coverage_ratio_golden(spark):
    # two overlapping reads with Score weights 4 and 2:
    # [0,10) w=4 ; [5,15) w=2  => runs: [0,5) v=4 c=1; [5,10) v=6 c=2; [10,15) v=2 c=1
    g = GenomicRanges(
        spark.createDataFrame(
            pd.DataFrame(
                {"Chromosome": ["1", "1"], "Start": [0, 5], "End": [10, 15], "Score": [4, 2]}
            )
        )
    )
    out = g.coverage_ratio(value_col="Score", defragment=False).df.toPandas()
    out = out.sort_values("Start").reset_index(drop=True)
    assert list(map(tuple, out[["Start", "End", "Value", "Depth"]].values)) == [
        (0, 5, 4, 1),
        (5, 10, 6, 2),
        (10, 15, 2, 1),
    ]
    assert out.Ratio.tolist() == pytest.approx([2.0, math.log2(3.0), 1.0])


def test_coverage_ratio_defragment(spark):
    # equal-weight reads: ratio == weight everywhere it's covered -> defrag to one run
    g = GenomicRanges(
        spark.createDataFrame(
            pd.DataFrame(
                {"Chromosome": ["1", "1"], "Start": [0, 10], "End": [10, 20], "Score": [8, 8]}
            )
        )
    )
    out = g.coverage_ratio(value_col="Score").df.toPandas()
    covered = out[out.Ratio.notna()]
    assert len(covered) == 1
    assert (covered.iloc[0].Start, covered.iloc[0].End, covered.iloc[0].Ratio) == (0, 20, 3.0)


def test_gff3_round_trip(spark, tmp_path):
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "Chromosome": ["chr1", "chr1"],
                "Source": ["test", "test"],
                "Feature": ["gene", "exon"],
                "Start": [9, 19],
                "End": [100, 50],
                "Score": [".", "."],
                "Strand": ["+", "-"],
                "Frame": [".", "."],
                "gene_id": ["g1", "g1"],
            }
        )
    )
    path = str(tmp_path / "out.gff3")
    to_gff3(df, path)
    back = read_gff3(spark, path)
    pdf = back.df.toPandas().sort_values("Start").reset_index(drop=True)
    assert pdf.Start.tolist() == [9, 19]  # 1-based on disk, 0-based in memory
    assert pdf.End.tolist() == [100, 50]
    assert pdf.gene_id.tolist() == ["g1", "g1"]


def test_binary_stubs(spark, tmp_path):
    # BAM and bigwig both decode natively now (see the round-trip tests);
    # only an unrecognized extension still raises the conversion hint.
    with pytest.raises(NotImplementedError):
        read_bigwig(spark, "/some/file.wig.txt")
    # parquet-converted fixture path works, with flag filtering
    p = str(tmp_path / "bam.parquet")
    spark.createDataFrame(
        pd.DataFrame(
            {
                "Chromosome": ["chr1", "chr1", "chr1"],
                "Start": [0, 10, 20],
                "End": [5, 15, 25],
                "Strand": ["+", "-", "+"],
                "Flag": [0, 4, 0],   # 4 = unmapped, filtered by default mask 1540
                "MapQ": [60, 60, 10],
            }
        )
    ).write.mode("overwrite").parquet(p)
    got = read_bam(spark, p, mapq=30).df.toPandas()
    assert sorted(got.Start.tolist()) == [0]

def test_native_bam_roundtrip(spark, tmp_path):
    """write_bam produces a spec-valid BGZF file; read_bam decodes it natively
    (gzip members + struct records), applying the reference's default
    1540 filter (unmapped | QC-fail | duplicate) and CIGAR reference-length
    End arithmetic."""
    from pyranges_1_x_spark.sources.bam_native import decode_bam_bytes, write_bam
    from pyranges_1_x_spark.sources.binary import read_bam

    path = str(tmp_path / "t.bam")
    # (name, flag, chrom, pos, mapq, cigar, seq, qual)
    write_bam(
        path,
        [
            ("r1", 0, "chr1", 100, 60, "25M", "A" * 25, "I" * 25),
            ("r2", 16, "chr1", 200, 60, "10M5D10M", "C" * 20, "I" * 20),      # End=200+25
            ("r3", 0, "chr2", 50, 60, "5S20M", "G" * 25, "I" * 25),           # soft clip: End=50+20
            ("r4", 4, "chr2", 0, 0, "25M", "T" * 25, "I" * 25),               # unmapped -> filtered
            ("r5", 1024, "chr2", 10, 60, "25M", "T" * 25, "I" * 25),          # duplicate -> filtered
            ("r6", 0, "chr2", 99, 5, "10M100N10M", "A" * 20, "I" * 20),       # spliced: End=99+120
        ],
        {"chr1": 100000, "chr2": 100000},
    )
    got = read_bam(spark, path).df.toPandas().sort_values(["Chromosome", "Start"])
    assert list(got.Chromosome) == ["chr1", "chr1", "chr2", "chr2"]
    assert list(got.Start) == [100, 200, 50, 99]
    assert list(got.End) == [125, 225, 70, 219]
    assert list(got.Strand) == ["+", "-", "+", "+"]
    # mapq filter drops r6
    got_q = read_bam(spark, path, mapq=30).df.toPandas()
    assert len(got_q) == 3
    # full decode recovers name/cigar/seq/qual
    import gzip

    full = decode_bam_bytes(gzip.open(path, "rb").read(), full=True)
    r2 = full[full.Name == "r2"].iloc[0]
    assert r2.Cigar == "10M5D10M" and r2.QuerySequence == "C" * 20 and r2.MapQ == 60
    assert r2.Quality == "I" * 20


def test_native_bigwig_roundtrip(spark, tmp_path):
    """write_bigwig emits a spec-valid bbi file (bedGraph sections, zlib
    blocks, R-tree); read_bigwig walks the index on the driver and decodes
    blocks distributed. Also round-trips through the to_bigwig_file sink."""
    from pyranges_1_x_spark.sources.bigwig_native import decode_block, write_bigwig
    from pyranges_1_x_spark.sources.binary import read_bigwig, to_bigwig_file

    path = str(tmp_path / "t.bw")
    rows = [
        ("chr1", 0, 100, 1.5),
        ("chr1", 100, 250, 2.0),
        ("chr1", 300, 400, 0.25),
        ("chr2", 0, 50, 7.0),
    ] + [("chr2", 100 + 10 * i, 110 + 10 * i, float(i)) for i in range(2000)]
    write_bigwig(path, rows, {"chr1": 1_000_000, "chr2": 1_000_000}, items_per_block=256)
    got = (
        read_bigwig(spark, path)
        .df.toPandas()
        .sort_values(["Chromosome", "Start"])
        .reset_index(drop=True)
    )
    assert len(got) == len(rows)
    assert list(got.iloc[0]) == ["chr1", 0, 100, 1.5]
    assert list(got.iloc[3]) == ["chr2", 0, 50, 7.0]
    assert got.Value.sum() == sum(r[3] for r in rows)

    # sink round-trip: DataFrame -> binary bigwig -> DataFrame
    out2 = str(tmp_path / "o.bw")
    to_bigwig_file(read_bigwig(spark, path).df, out2, {"chr1": 1_000_000, "chr2": 1_000_000})
    back = read_bigwig(spark, out2).df.toPandas().sort_values(["Chromosome", "Start"])
    assert back.reset_index(drop=True).equals(got)

    # varStep / fixedStep section decoding (format parity beyond what the
    # writer emits)
    import struct

    var = struct.pack("<IIIIIBBH", 0, 0, 0, 0, 25, 2, 0, 2) + struct.pack("<If", 10, 1.0) + struct.pack("<If", 50, 2.0)
    fixed = struct.pack("<IIIIIBBH", 1, 1000, 0, 100, 25, 3, 0, 2) + struct.pack("<f", 3.0) + struct.pack("<f", 4.0)
    assert decode_block(var, {0: "chr1"}) == [("chr1", 10, 35, 1.0), ("chr1", 50, 75, 2.0)]
    assert decode_block(fixed, {1: "chr9"}) == [("chr9", 1000, 1025, 3.0), ("chr9", 1100, 1125, 4.0)]


def test_native_bam_corrupt_and_edge_records(tmp_path):
    """r15 targeted review of the native BAM decoder:

    * a corrupt negative block_size moved the record cursor BACKWARDS — an
      infinite loop on malformed input (BAM is the one container not in the
      mutation-fuzz roster because its BGZF wrapper hides byte mutations);
    * truncated headers/records surfaced as cryptic struct.error;
    * ref_id past the reference list surfaced as IndexError;
    * pos == -1 with a valid ref_id is UNPLACED per spec but leaked
      through as Start=-1;
    * all-0xFF quality means ABSENT (SAM '*') but decoded to garbage.
    """
    import gzip
    import struct as st

    import pytest

    from pyranges_1_x_spark.sources.bam_native import decode_bam_bytes, write_bam

    path = str(tmp_path / "t.bam")
    write_bam(
        path,
        [("zz1", 0, "chr1", 100, 60, "4M", "ACGT", "IIII"),
         ("zz2", 0, "chr1", -1, 60, "4M", "ACGT", "IIII")],  # unplaced pos
        {"chr1": 1000},
    )
    raw = gzip.open(path, "rb").read()

    # pos=-1 dropped even though ref_id is valid
    assert decode_bam_bytes(raw).Start.tolist() == [100]

    # negative block_size: parse error, not an infinite loop
    pos0 = raw.index(b"zz1\x00") - 36
    bad = raw[:pos0] + st.pack("<i", -8) + raw[pos0 + 4 :]
    with pytest.raises(ValueError, match="truncated or corrupt"):
        decode_bam_bytes(bad)
    # oversized block_size: ditto
    bad2 = raw[:pos0] + st.pack("<i", 1 << 30) + raw[pos0 + 4 :]
    with pytest.raises(ValueError, match="truncated or corrupt"):
        decode_bam_bytes(bad2)
    # truncated header
    with pytest.raises(ValueError, match="truncated BAM header"):
        decode_bam_bytes(raw[:6])
    # ref_id beyond the reference list
    recpos = pos0 + 4
    bad3 = raw[:recpos] + st.pack("<i", 7) + raw[recpos + 4 :]
    with pytest.raises(ValueError, match="ref_id"):
        decode_bam_bytes(bad3)

    # absent quality (all 0xFF) decodes as '*'
    path2 = str(tmp_path / "q.bam")
    write_bam(
        path2,
        [("r1", 0, "chr1", 100, 60, "4M", "ACGT", "".join(chr(0xFF + 33)) * 4)],
        {"chr1": 1000},
    )
    full = decode_bam_bytes(gzip.open(path2, "rb").read(), full=True)
    assert full.Quality.tolist() == ["*"]


def test_native_bigwig_corrupt_blocks(tmp_path):
    """r15 targeted review: truncated wig sections and unknown chrom ids
    raise clear parse errors (previously struct.error/KeyError), and a
    sub-64-byte file reports truncation, not struct.error."""
    import struct as st

    import pytest

    from pyranges_1_x_spark.sources.bigwig_native import decode_block

    # count says 3 items, payload carries 1
    sec = st.pack("<IIIIIBBH", 0, 0, 0, 0, 25, 2, 0, 3) + st.pack("<If", 10, 1.0)
    with pytest.raises(ValueError, match="truncated wig section"):
        decode_block(sec, {0: "chr1"})
    # unknown chrom id
    ok = st.pack("<IIIIIBBH", 5, 0, 0, 0, 25, 2, 0, 1) + st.pack("<If", 10, 1.0)
    with pytest.raises(ValueError, match="unknown chrom id"):
        decode_block(ok, {0: "chr1"})

    from io import BytesIO

    from pyranges_1_x_spark.sources.bigwig_native import _read_header

    with pytest.raises(ValueError, match="truncated bigWig"):
        _read_header(BytesIO(b"\x26\xfc\x8f\x88short"))


def test_native_bigwig_tree_cycle_and_bam_no_seq(tmp_path):
    """r15 review finds: (1) a corrupt tree whose child offset points back
    at an ancestor (or lists the same child twice) must be rejected as
    ValueError — the recursive walkers previously spun to RecursionError
    on cycles and re-walked duplicated offsets exponentially; (2) a BAM
    record with l_seq=0 (no stored sequence) decodes QuerySequence and
    Quality as the SAM absent marker '*', not ''."""
    import gzip
    import struct as st
    from io import BytesIO

    import pytest

    from pyranges_1_x_spark.sources.bam_native import decode_bam_bytes, write_bam
    from pyranges_1_x_spark.sources.bigwig_native import (
        _rtree_leaves,
        write_bigwig,
    )

    # R-tree root that is an INTERNAL node whose only child is itself.
    idx = st.pack("<IIQIIIIQII", 0x2468ACE0, 256, 1, 0, 0, 0, 0, 0, 64, 0)
    node = st.pack("<BBH", 0, 0, 1) + st.pack("<IIIIQ", 0, 0, 0, 0, 48)
    buf = BytesIO((idx + node).ljust(512, b"\x00"))
    with pytest.raises(ValueError, match="cyclic or duplicated"):
        _rtree_leaves(buf, 0)
    # ...and one listing the same (valid leaf) child twice: also corrupt.
    path = str(tmp_path / "t.bw")
    write_bigwig(path, [("chr1", 0, 10, 1.0)], {"chr1": 100})
    raw = bytearray(open(path, "rb").read())
    (index_off,) = st.unpack_from("<Q", raw, 24)
    leaf_off = index_off + 48
    dup = st.pack("<BBH", 0, 0, 2) + 2 * st.pack("<IIIIQ", 0, 0, 0, 10, leaf_off)
    raw2 = bytes(raw[:leaf_off]) + dup + bytes(raw[leaf_off:])
    # (this crafted layout reuses the original leaf at a shifted offset —
    # the point is only that duplicate child offsets raise, not hang)
    with pytest.raises(ValueError):
        _rtree_leaves(BytesIO(raw2), index_off)

    bam = str(tmp_path / "t.bam")
    write_bam(bam, [("r1", 0, "chr1", 5, 60, "3M", "", "")], {"chr1": 100})
    full = decode_bam_bytes(gzip.open(bam, "rb").read(), full=True)
    assert full.QuerySequence.tolist() == ["*"]
    assert full.Quality.tolist() == ["*"]


def test_fasta_roundtrip_and_get_sequence(spark, tmp_path):
    """write_fasta -> read_fasta_native -> get_sequence: wrapped lines, .gz,
    multi-record, header-comment word split, '-'-strand revcomp."""
    from pyranges_1_x_spark.core import GenomicRanges
    from pyranges_1_x_spark.functions.seqs import get_sequence
    from pyranges_1_x_spark.sources.fasta import read_fasta_native, write_fasta

    seqs = [("chrA", "ACGTACGTACGTACGTAAACCCGGGTTT"), ("chrB", "TTTTGGGGCCCCAAAA")]
    plain = str(tmp_path / "g.fa")
    gz = str(tmp_path / "g2.fa.gz")
    write_fasta(plain, seqs, width=7)
    # .gz variant with a description after the name (must be dropped)
    with open(plain) as fh:
        txt = fh.read().replace(">chrA", ">chrA assembled contig")
    import gzip as _gz

    with _gz.open(gz, "wt") as fh:
        fh.write(txt)

    for path in (plain, gz):
        table = read_fasta_native(spark, path)
        got = {r["Chromosome"]: r["Sequence"] for r in table.collect()}
        assert got == dict(seqs), path

    gr = GenomicRanges(
        spark.createDataFrame(
            [("chrA", 2, 6, "+"), ("chrA", 2, 6, "-"), ("chrB", 0, 4, "+")],
            "Chromosome string, Start long, End long, Strand string",
        )
    )
    out = {
        (r["Chromosome"], r["Start"], r["Strand"]): r["Seq"]
        for r in get_sequence(gr, read_fasta_native(spark, plain)).df.collect()
    }
    assert out[("chrA", 2, "+")] == "GTAC"
    assert out[("chrA", 2, "-")] == "GTAC"  # revcomp of GTAC is GTAC
    assert out[("chrB", 0, "+")] == "TTTT"


def test_fasta_multi_file_parallel_read(spark, tmp_path):
    from pyranges_1_x_spark.sources.fasta import read_fasta_native, write_fasta

    for i in range(3):
        write_fasta(str(tmp_path / f"part{i}.fa"), [(f"c{i}", "ACGT" * (i + 1))])
    table = read_fasta_native(spark, str(tmp_path / "part*.fa"))
    got = {r["Chromosome"]: r["Sequence"] for r in table.collect()}
    assert got == {"c0": "ACGT", "c1": "ACGTACGT", "c2": "ACGTACGTACGT"}


def test_bucketed_table_aggregation_skips_shuffle(spark, tmp_path):
    """groupBy(Chromosome, ...) over a bucketBy(Chromosome) table must plan
    with NO Exchange (the co-location contract sources/bucketed.py claims);
    the same aggregation over the plain table must show one."""
    from pyranges_1_x_spark.sources.bucketed import read_bucketed, write_bucketed

    df = spark.createDataFrame(
        [("chr%d" % (i % 3), i * 10, i * 10 + 5, i) for i in range(200)],
        "Chromosome string, Start long, End long, Score long",
    )
    try:
        write_bucketed(df, "t_bucketed", buckets=4)
        agg = (
            read_bucketed(spark, "t_bucketed")
            .groupBy("Chromosome")
            .count()
        )
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        # multi-key grouping with the bucket column as prefix also co-locates
        agg2 = (
            read_bucketed(spark, "t_bucketed")
            .groupBy("Chromosome", "Score")
            .count()
        )
        plan2 = agg2._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan2, plan2
        # control: the un-bucketed frame shuffles
        plain = df.groupBy("Chromosome").count()
        plan3 = plain._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plan3
        # values identical either way
        assert sorted(map(tuple, agg.collect())) == sorted(map(tuple, plain.collect()))
    finally:
        spark.sql("DROP TABLE IF EXISTS t_bucketed")


def test_bucketed_join_colocates_on_exact_bucket_key(spark):
    """Two same-bucketed tables join with zero exchanges on the exact bucket
    key; a superset join key still shuffles (the contract documented in
    sources/bucketed.py)."""
    from pyranges_1_x_spark.sources.bucketed import write_bucketed

    df = spark.createDataFrame(
        [("chr%d" % (i % 3), i * 10, i * 10 + 5, i) for i in range(100)],
        "Chromosome string, Start long, End long, Score long",
    )
    try:
        write_bucketed(df, "t_ja", buckets=4)
        write_bucketed(df, "t_jb", buckets=4)
        a = spark.table("t_ja")
        b = spark.table("t_jb").toDF("Chromosome", "S2", "E2", "Sc2")
        with_hint = a.hint("merge").join(b, on="Chromosome")
        plan = with_hint._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
    finally:
        spark.sql("DROP TABLE IF EXISTS t_ja")
        spark.sql("DROP TABLE IF EXISTS t_jb")


def test_write_bucketed_overwrites_orphan_warehouse_dir(spark):
    """With the in-memory catalog, a managed table's directory left behind
    by a PREVIOUS session has no catalog entry — CREATE used to fail with
    LOCATION_ALREADY_EXISTS. write_bucketed(mode='overwrite') must clear
    the orphan location and succeed (sources/bucketed.py)."""
    import os
    import urllib.parse

    from pyranges_1_x_spark.sources.bucketed import read_bucketed, write_bucketed

    df = spark.createDataFrame(
        [("chr1", 0, 5, 1), ("chr2", 3, 9, 2)],
        "Chromosome string, Start long, End long, Score long",
    )
    tbl = "t_orphan_bucketed"
    wh = urllib.parse.urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    loc = os.path.join(wh, tbl)
    try:
        # fabricate the cross-session orphan: directory exists, catalog clean
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        os.makedirs(loc, exist_ok=True)
        with open(os.path.join(loc, "leftover.parquet"), "wb") as fh:
            fh.write(b"junk")
        write_bucketed(df, tbl, buckets=2)
        assert read_bucketed(spark, tbl).count() == 2
        # and plain repeated overwrite (catalog entry present) still works
        write_bucketed(df, tbl, buckets=2)
        assert read_bucketed(spark, tbl).count() == 2
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")


def test_uri_parts_guard_compare(spark):
    """ADVICE r11 + r12 review: the self-read guard compares
    (scheme, host-sans-port, path). Equal paths on DIFFERENT buckets never
    match (a path-only compare false-positived the guard); equal hosts
    where one side omits the default PORT still match (an exact-authority
    compare false-negatived and would have let an overwrite destroy its
    own source). Local spellings all collapse to ('file', '', path)."""
    from pyranges_1_x_spark.sources.bucketed import _uri_parts

    # local spellings are interchangeable
    assert (
        _uri_parts("file:/x/wh/t")
        == _uri_parts("file:///x/wh/t")
        == _uri_parts("file://localhost/x/wh/t")
        == _uri_parts("/x/wh/t")
        == ("file", "", "/x/wh/t")
    )
    # different buckets with equal paths must NOT compare equal
    a = _uri_parts("s3a://bucketA/wh/t")
    b = _uri_parts("s3a://bucketB/wh/t")
    assert a != b and a == ("s3a", "bucketa", "/wh/t")
    # same bucket stays prefix-comparable (guard logic: path + '/')
    fs, fh, fp = _uri_parts("s3a://bucketA/wh/t/part-0.parquet")
    assert (fs, fh) == a[:2] and fp.startswith(a[2] + "/")
    # a local file never matches a remote location
    assert _uri_parts("file:///wh/t/part-0.parquet")[:2] != a[:2]
    # default-port spelling asymmetry matches (fail-safe): catalog
    # 'hdfs://nn/wh/t' vs fully-qualified inputFiles 'hdfs://NN:8020/...'
    assert _uri_parts("hdfs://NN:8020/wh/t") == _uri_parts("hdfs://nn/wh/t")
    # but a different scheme on the same host/path does not
    assert _uri_parts("s3a://nn/wh/t") != _uri_parts("hdfs://nn/wh/t")


def test_write_bucketed_overwrite_refuses_self_read(spark):
    """ADVICE r10: overwriting a table with a DataFrame derived FROM that
    table must fail fast BEFORE the drop — the old data stays intact —
    instead of destroying the source under a lazy write."""
    import pytest as _pytest

    from pyranges_1_x_spark.sources.bucketed import read_bucketed, write_bucketed

    df = spark.createDataFrame(
        [("chr1", 0, 5, 1), ("chr2", 3, 9, 2)],
        "Chromosome string, Start long, End long, Score long",
    )
    tbl = "t_selfread_bucketed"
    try:
        write_bucketed(df, tbl, buckets=2)
        derived = read_bucketed(spark, tbl).filter("Score > 0")
        with _pytest.raises(ValueError, match="reads from target table"):
            write_bucketed(derived, tbl, buckets=2)
        # r11 code-review find: the guard is PHYSICAL (inputFiles vs the
        # catalog location), so a path-based read of the table's own
        # directory is caught too — no name ever appears in that plan
        import urllib.parse

        from pyranges_1_x_spark.sources.bucketed import _table_location

        loc = _table_location(spark, f"`{tbl}`")
        path_read = spark.read.parquet(urllib.parse.urlparse(loc).path)
        with _pytest.raises(ValueError, match="reads from target table"):
            write_bucketed(path_read, tbl, buckets=2)
        # ...and a plan merely CONTAINING the table name as a string
        # literal is NOT a self-read (the old regex false-positive)
        lit = spark.createDataFrame(
            [(f"default.{tbl}", "chr1", 0, 5)],
            f"note string, Chromosome string, Start long, End long",
        )
        write_bucketed(lit, tbl, buckets=2)
        assert read_bucketed(spark, tbl).count() == 1
        # old table survived the refused overwrites above
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")


def test_write_bucketed_orphan_cleanup_respects_current_database(spark):
    """ADVICE r10: with a non-default current database, the orphan cleanup
    must resolve the table location through the CATALOG — it must never
    delete the data directory of an unrelated default.<name> table."""
    from pyranges_1_x_spark.sources.bucketed import write_bucketed

    df = spark.createDataFrame(
        [("chr1", 0, 5, 1), ("chr2", 3, 9, 2)],
        "Chromosome string, Start long, End long, Score long",
    )
    tbl = "t_dbscope_bucketed"
    try:
        write_bucketed(df, tbl, buckets=2)  # default.t_dbscope_bucketed
        spark.sql("CREATE DATABASE IF NOT EXISTS sgtestdb")
        spark.catalog.setCurrentDatabase("sgtestdb")
        # unqualified write while current db != default: creates
        # sgtestdb.<tbl> and must leave default.<tbl>'s data untouched
        write_bucketed(df.limit(1), tbl, buckets=2)
        assert spark.table(f"sgtestdb.{tbl}").count() == 1
        assert spark.table(f"default.{tbl}").count() == 2
    finally:
        spark.catalog.setCurrentDatabase("default")
        spark.sql(f"DROP TABLE IF EXISTS sgtestdb.{tbl}")
        spark.sql("DROP DATABASE IF EXISTS sgtestdb")
        spark.sql(f"DROP TABLE IF EXISTS default.{tbl}")


def test_write_bucketed_rejects_unsafe_identifier(spark):
    """ADVICE r10: the table name is embedded in SQL — anything outside
    [A-Za-z0-9_] per part is refused, not interpolated."""
    import pytest as _pytest

    from pyranges_1_x_spark.sources.bucketed import write_bucketed

    df = spark.createDataFrame([("chr1", 0, 5)], "Chromosome string, Start long, End long")
    with _pytest.raises(ValueError, match="identifier"):
        write_bucketed(df, "t; DROP TABLE lineitem", buckets=2)
    with _pytest.raises(ValueError, match="identifier"):
        write_bucketed(df, "evil`name", buckets=2)
    # 3-part (catalog-qualified) names are accepted (r11 code-review find)
    write_bucketed(df, "spark_catalog.default.t_threepart", buckets=2)
    try:
        assert spark.table("spark_catalog.default.t_threepart").count() == 1
        write_bucketed(df, "spark_catalog.default.t_threepart", buckets=2)
        assert spark.table("spark_catalog.default.t_threepart").count() == 1
    finally:
        spark.sql("DROP TABLE IF EXISTS spark_catalog.default.t_threepart")
