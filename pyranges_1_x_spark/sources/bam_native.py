"""Native BAM decoding — pure stdlib, no bamread/pysam dependency.

The reference reads BAM through the optional ``bamread`` extension
(readers.py:149-240); this module implements the same record surface
directly from the published SAM/BAM spec (https://samtools.github.io/hts-specs/):

* BGZF is a sequence of standard gzip members, so ``gzip`` decompresses a
  whole file correctly (including the empty EOF member) with no custom code;
* the uncompressed stream is ``"BAM\\x01"`` + SAM header text + reference
  list + fixed-layout alignment records (struct-unpacked here).

Distribution model: a BGZF file cannot be split without an external index,
so the parallel unit is the FILE — ``read_bam_native`` fans a path list out
with ``mapInPandas``, one task per file. That matches how aligned data lives
at scale (many per-sample BAMs); a single giant BAM should be converted to
parquet once (see sources/binary.py) so the columnar scan path applies.

Filter semantics mirror the reference exactly: ``mapq`` minimum,
``required_flag`` must all be present, ``filter_flag`` (default 1540 =
unmapped | QC-fail | duplicate) must be absent, unplaced records dropped.
End = Start + reference-consumed CIGAR length (ops M/D/N/=/X).
"""

from __future__ import annotations

import gzip
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.types import LongType, StringType, StructField, StructType

BAM_MAGIC = b"BAM\x01"
CIGAR_OPS = "MIDNSHP=X"
#: CIGAR ops that consume reference bases (spec section 4.2).
_REF_CONSUMING = {0, 2, 3, 7, 8}  # M D N = X
SEQ_CODES = "=ACMGRSVTWYHKDBN"

SPARSE_SCHEMA = StructType(
    [
        StructField("Chromosome", StringType()),
        StructField("Start", LongType()),
        StructField("End", LongType()),
        StructField("Strand", StringType()),
        StructField("Flag", LongType()),
    ]
)

FULL_SCHEMA = StructType(
    SPARSE_SCHEMA.fields
    + [
        StructField("Name", StringType()),
        StructField("Cigar", StringType()),
        StructField("QuerySequence", StringType()),
        StructField("Quality", StringType()),
        StructField("MapQ", LongType()),
    ]
)


def decode_bam_bytes(
    raw: bytes,
    *,
    mapq: int = 0,
    required_flag: int = 0,
    filter_flag: int = 1540,
    full: bool = False,
) -> pd.DataFrame:
    """Parse an UNCOMPRESSED BAM stream into a pandas frame (one row per
    passing alignment). ``raw`` is the gzip-decompressed file content."""
    if raw[:4] != BAM_MAGIC:
        raise ValueError("not a BAM stream (missing BAM\\x01 magic)")
    n = len(raw)
    try:
        off = 4
        (l_text,) = struct.unpack_from("<i", raw, off)
        off += 4 + l_text
        (n_ref,) = struct.unpack_from("<i", raw, off)
        off += 4
        if l_text < 0 or n_ref < 0:
            raise ValueError("corrupt BAM header (negative length field)")
        ref_names: list[str] = []
        for _ in range(n_ref):
            (l_name,) = struct.unpack_from("<i", raw, off)
            off += 4
            if l_name < 1 or off + l_name + 4 > n:
                raise ValueError("corrupt BAM reference list")
            ref_names.append(raw[off : off + l_name - 1].decode("ascii"))
            off += l_name + 4  # name (nul-terminated) + l_ref
    except struct.error as e:  # truncated header
        raise ValueError(f"truncated BAM header: {e}") from None
    rows: list[tuple] = []
    while off + 4 <= n:
        (block_size,) = struct.unpack_from("<i", raw, off)
        off += 4
        end_rec = off + block_size
        # Guard BEFORE trusting block_size (r15 review): a corrupt
        # negative value moved `off` BACKWARDS — an infinite loop on
        # malformed input — and a short/overlong one surfaced as a
        # cryptic struct.error/silent garbage instead of a parse error.
        if block_size < 32 or end_rec > n:
            raise ValueError("truncated or corrupt BAM record")
        (
            ref_id,
            pos,
            l_read_name,
            mq,
            _bin,
            n_cigar,
            flag,
            l_seq,
            _next_ref,
            _next_pos,
            _tlen,
        ) = struct.unpack_from("<iiBBHHHiiii", raw, off)
        if ref_id >= len(ref_names):
            raise ValueError(
                f"corrupt BAM record: ref_id {ref_id} >= n_ref {len(ref_names)}"
            )
        # pos == -1 with a valid ref_id is still an UNPLACED record per the
        # spec; the pre-r15 check let it through as Start=-1 (r15 review).
        keep = (
            ref_id >= 0
            and pos >= 0
            and mq >= mapq
            and (flag & required_flag) == required_flag
            and (flag & filter_flag) == 0
        )
        if keep:
            p = off + 32
            # Per-field bounds inside the record (r15 fuzz hardening): a
            # mutated l_read_name/n_cigar/l_seq otherwise walks past the
            # record into struct.error / IndexError instead of a parse error.
            need = 32 + l_read_name + 4 * n_cigar
            if full:
                need += (l_seq + 1) // 2 + l_seq
            if l_read_name < 1 or n_cigar < 0 or l_seq < 0 or off + need > end_rec:
                raise ValueError("corrupt BAM record (field lengths exceed block)")
            name = raw[p : p + l_read_name - 1].decode("ascii")
            p += l_read_name
            cigar = struct.unpack_from(f"<{n_cigar}I", raw, p)
            p += 4 * n_cigar
            if any((c & 0xF) > 8 for c in cigar):
                raise ValueError("corrupt BAM record (invalid CIGAR op)")
            ref_len = sum(c >> 4 for c in cigar if (c & 0xF) in _REF_CONSUMING)
            row = (
                ref_names[ref_id],
                pos,
                pos + ref_len,
                "-" if flag & 16 else "+",
                flag,
            )
            if full:
                cigar_str = "".join(f"{c >> 4}{CIGAR_OPS[c & 0xF]}" for c in cigar)
                seq_bytes = raw[p : p + (l_seq + 1) // 2]
                p += (l_seq + 1) // 2
                # l_seq == 0 means SEQ (and with it QUAL) is ABSENT — SAM
                # shows "*" for both (r15 review find; e.g. a secondary
                # alignment written without sequence).
                seq = (
                    "".join(
                        SEQ_CODES[
                            (seq_bytes[i // 2] >> 4)
                            if i % 2 == 0
                            else (seq_bytes[i // 2] & 0xF)
                        ]
                        for i in range(l_seq)
                    )
                    if l_seq
                    else "*"
                )
                qb = raw[p : p + l_seq]
                # all-0xFF quality means ABSENT per the spec (SAM "*");
                # chr(0xFF+33) previously emitted garbage U+0120s (r15).
                qual = (
                    "*"
                    if not qb or (qb[0] == 0xFF and not qb.strip(b"\xff"))
                    else "".join(chr(q + 33) for q in qb)
                )
                row = row + (name, cigar_str, seq, qual, mq)
            rows.append(row)
        off = end_rec
    cols = [f.name for f in (FULL_SCHEMA if full else SPARSE_SCHEMA).fields]
    return pd.DataFrame(rows, columns=cols)


def read_bam_native(
    spark: SparkSession,
    paths: str | list[str],
    *,
    mapq: int = 0,
    required_flag: int = 0,
    filter_flag: int = 1540,
    full: bool = False,
):
    """Distributed BAM scan: one decode task per file (see module docstring)."""
    import glob as _glob

    if isinstance(paths, str):
        expanded = sorted(_glob.glob(paths)) or [paths]
    else:
        expanded = list(paths)
    schema = FULL_SCHEMA if full else SPARSE_SCHEMA

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for path in pdf["path"]:
                with gzip.open(path, "rb") as fh:
                    raw = fh.read()
                yield decode_bam_bytes(
                    raw,
                    mapq=mapq,
                    required_flag=required_flag,
                    filter_flag=filter_flag,
                    full=full,
                )

    files = spark.createDataFrame([(p,) for p in expanded], "path string").repartition(
        len(expanded)
    )
    return files.mapInPandas(run, schema=schema)


def write_bam(
    path: str,
    records: list[tuple],
    chrom_sizes: dict[str, int],
    *,
    header_text: str = "@HD\tVN:1.6\n",
) -> None:
    """Minimal BAM writer (single gzip member + BGZF EOF marker) — enough to
    produce spec-valid files for tests and converters. ``records`` rows:
    (name, flag, chrom, pos, mapq, cigar_str, seq, qual_str)."""
    refs = list(chrom_sizes)
    ref_idx = {c: i for i, c in enumerate(refs)}
    out = bytearray()
    out += BAM_MAGIC
    text = header_text.encode()
    out += struct.pack("<i", len(text)) + text
    out += struct.pack("<i", len(refs))
    for c in refs:
        nm_ = c.encode() + b"\x00"
        out += struct.pack("<i", len(nm_)) + nm_ + struct.pack("<i", chrom_sizes[c])
    for name, flag, chrom, pos, mq, cigar_str, seq, qual in records:
        cig = []
        num = ""
        for ch in cigar_str:
            if ch.isdigit():
                num += ch
            else:
                cig.append((int(num) << 4) | CIGAR_OPS.index(ch))
                num = ""
        nm_ = name.encode() + b"\x00"
        seq_codes = [SEQ_CODES.index(b) for b in seq]
        packed = bytearray()
        for i in range(0, len(seq_codes), 2):
            hi = seq_codes[i] << 4
            lo = seq_codes[i + 1] if i + 1 < len(seq_codes) else 0
            packed.append(hi | lo)
        body = (
            struct.pack(
                "<iiBBHHHiiii",
                ref_idx[chrom],
                pos,
                len(nm_),
                mq,
                0,
                len(cig),
                flag,
                len(seq),
                -1,
                -1,
                0,
            )
            + nm_
            + struct.pack(f"<{len(cig)}I", *cig)
            + bytes(packed)
            + bytes((ord(q) - 33) for q in qual)
        )
        out += struct.pack("<i", len(body)) + body
    # One gzip member for the payload + the canonical 28-byte BGZF EOF member.
    eof = bytes.fromhex(
        "1f8b08040000000000ff0600424302001b0003000000000000000000"
    )
    with open(path, "wb") as fh:
        fh.write(gzip.compress(bytes(out)) + eof)
