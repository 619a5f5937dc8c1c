"""Native BigWig decoding/encoding — pure stdlib, no pyBigWig dependency.

Implements the published bbiFile format (Kent et al., Bioinformatics 2010,
"BigWig and BigBed: enabling browsing of large distributed datasets"; struct
layouts at https://genome.ucsc.edu/goldenPath/help/bigWig.html and the
hts-specs bbi documentation). The reference reads bigwig through the
optional ``pyBigWig`` extension (readers.py:452-533).

Scan model — distributed by design: the driver reads only the fixed header,
the chromosome B+ tree and the R-tree LEAVES (kilobytes), yielding the
(offset, size) list of compressed data blocks; block decompression and
section parsing then fan out as one Arrow-batched ``mapInPandas`` over that
list, so a multi-GB bigwig decodes with cluster parallelism — unlike BAM,
the R-tree makes the container splittable without any external index.

The writer emits spec-valid files (bedGraph-type sections, zlib-compressed,
single-leaf R-tree chain, zoomLevels=0) — enough for converters, tests, and
`to_bigwig`'s binary sink; browser-grade zoom levels are out of scope.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.types import DoubleType, LongType, StringType, StructField, StructType

BIGWIG_MAGIC = 0x888FFC26
CHROM_TREE_MAGIC = 0x78CA8C91
RTREE_MAGIC = 0x2468ACE0

BW_SCHEMA = StructType(
    [
        StructField("Chromosome", StringType()),
        StructField("Start", LongType()),
        StructField("End", LongType()),
        StructField("Value", DoubleType()),
    ]
)


def _read_header(fh) -> dict:
    fh.seek(0)
    raw = fh.read(64)
    if len(raw) < 64:
        raise ValueError("truncated bigWig file (header under 64 bytes)")
    (magic,) = struct.unpack_from("<I", raw, 0)
    if magic != BIGWIG_MAGIC:
        raise ValueError("not a little-endian bigWig file (bad magic)")
    (
        version,
        zoom_levels,
        chrom_tree_off,
        data_off,
        index_off,
        field_count,
        defined_field_count,
        auto_sql_off,
        summary_off,
        uncompress_buf,
    ) = struct.unpack_from("<HHQQQHHQQI", raw, 4)
    file_end = _file_end(fh)
    # Corrupt 64-bit offsets otherwise reach seek() as near-2^64 values
    # (OverflowError past ssize_t) or send the tree walkers past EOF
    # (r15 fuzz find).
    if chrom_tree_off > file_end or index_off > file_end or data_off > file_end:
        raise ValueError("corrupt bigWig header (offset past EOF)")
    return {
        "chrom_tree_off": chrom_tree_off,
        "data_off": data_off,
        "index_off": index_off,
        "uncompress_buf": uncompress_buf,
    }


def _read_exact(fh, n: int) -> bytes:
    """Read exactly ``n`` bytes or raise a clear parse error — a mutated
    tree offset otherwise seeks near EOF and the short read surfaces as
    struct.error (r15 fuzz hardening)."""
    b = fh.read(n)
    if len(b) != n:
        raise ValueError("truncated bigWig structure (short read)")
    return b


def _file_end(fh) -> int:
    pos0 = fh.tell()
    fh.seek(0, 2)
    end = fh.tell()
    fh.seek(pos0)
    return end


def _tree_guard(file_end: int):
    """Shared corrupt-tree guard for the two walkers (r15 review find #2):
    without a visited set, a corrupt child offset pointing at an ancestor
    recursed to RecursionError (escaping the module's data-or-ValueError
    contract), and a node listing the SAME child k times re-walked it k
    times — a crafted DAG of repeated offsets costs up to 65535^depth node
    visits, an effective driver hang no past-EOF check can catch. Visit
    each node offset once, reject revisits as corruption (a valid tree is
    a tree), and bound total visits as a backstop."""
    seen: set[int] = set()

    def check(node_off: int) -> None:
        if node_off > file_end:
            raise ValueError("corrupt tree (node offset past EOF)")
        if node_off in seen:
            raise ValueError("corrupt tree (cyclic or duplicated node offset)")
        if len(seen) >= 1_000_000:
            raise ValueError("corrupt tree (node count exceeds bound)")
        seen.add(node_off)

    return check


def _chrom_map(fh, offset: int) -> dict[int, str]:
    fh.seek(offset)
    magic, block_size, key_size, val_size, item_count, _res = struct.unpack(
        "<IIIIQQ", _read_exact(fh, 32)
    )
    if magic != CHROM_TREE_MAGIC:
        raise ValueError("bad chromosome B+ tree magic")
    out: dict[int, str] = {}
    guard = _tree_guard(_file_end(fh))
    # Explicit stack, not recursion: a crafted chain of distinct offsets
    # would otherwise reach RecursionError before the visited guard bites.
    stack = [offset + 32]
    while stack:
        node_off = stack.pop()
        guard(node_off)
        fh.seek(node_off)
        is_leaf, _res2, count = struct.unpack("<BBH", _read_exact(fh, 4))
        if is_leaf:
            for _ in range(count):
                key = _read_exact(fh, key_size).rstrip(b"\x00").decode("ascii")
                chrom_id, _size = struct.unpack("<II", _read_exact(fh, 8))
                out[chrom_id] = key
        else:
            for _ in range(count):
                _read_exact(fh, key_size)
                (child_off,) = struct.unpack("<Q", _read_exact(fh, 8))
                stack.append(child_off)
    return out


def _rtree_leaves(fh, index_off: int) -> list[tuple[int, int]]:
    fh.seek(index_off)
    magic = struct.unpack("<I", _read_exact(fh, 4))[0]
    if magic != RTREE_MAGIC:
        raise ValueError("bad R-tree magic")
    _read_exact(fh, 44)  # blockSize, itemCount, start/end chrom+base,
    # endFileOffset, itemsPerSlot, reserved — not needed for a full scan
    blocks: list[tuple[int, int]] = []
    file_end = _file_end(fh)
    guard = _tree_guard(file_end)
    # Explicit stack + visited guard — see _tree_guard / _chrom_map.
    stack = [index_off + 48]
    while stack:
        node_off = stack.pop()
        guard(node_off)
        fh.seek(node_off)
        is_leaf, _res, count = struct.unpack("<BBH", _read_exact(fh, 4))
        if is_leaf:
            for _ in range(count):
                (_sci, _sb, _eci, _eb, off, size) = struct.unpack(
                    "<IIIIQQ", _read_exact(fh, 32)
                )
                # A corrupt 64-bit size otherwise reaches the executors as
                # a near-2^64 read() — OverflowError, or an absurd
                # allocation for smaller-but-bogus values (r15 fuzz find).
                if off + size > file_end:
                    raise ValueError(
                        "corrupt R-tree leaf (block extends past EOF)"
                    )
                blocks.append((off, size))
        else:
            for _ in range(count):
                (_sci, _sb, _eci, _eb, child) = struct.unpack(
                    "<IIIIQ", _read_exact(fh, 24)
                )
                stack.append(child)
    return blocks


def decode_block(raw: bytes, chrom_names: dict[int, str]) -> list[tuple]:
    """Parse one UNCOMPRESSED data block: binary-wig section header + items
    (type 1 = bedGraph, 2 = varStep, 3 = fixedStep)."""
    rows: list[tuple] = []
    off = 0
    n = len(raw)
    #: bytes per item for each section type (truncation guard below).
    item_bytes = {1: 12, 2: 8, 3: 4}
    while off + 24 <= n:
        chrom_id, start, _end, step, span, sec_type, _res, count = struct.unpack_from(
            "<IIIIIBBH", raw, off
        )
        off += 24
        # Clear parse errors instead of cryptic struct.error/KeyError on
        # truncated or corrupt blocks (r15 review).
        if sec_type in item_bytes and off + count * item_bytes[sec_type] > n:
            raise ValueError(
                f"truncated wig section (type {sec_type}, {count} items)"
            )
        if chrom_id not in chrom_names:
            raise ValueError(f"corrupt wig section: unknown chrom id {chrom_id}")
        chrom = chrom_names[chrom_id]
        if sec_type == 1:  # bedGraph: start, end, value per item
            for _ in range(count):
                s, e, v = struct.unpack_from("<IIf", raw, off)
                off += 12
                rows.append((chrom, s, e, float(v)))
        elif sec_type == 2:  # varStep: start, value; width = span
            for _ in range(count):
                s, v = struct.unpack_from("<If", raw, off)
                off += 8
                rows.append((chrom, s, s + span, float(v)))
        elif sec_type == 3:  # fixedStep: value only; pos advances by step
            pos = start
            for _ in range(count):
                (v,) = struct.unpack_from("<f", raw, off)
                off += 4
                rows.append((chrom, pos, pos + span, float(v)))
                pos += step
        else:
            raise ValueError(f"unknown wig section type {sec_type}")
    return rows


def read_bigwig_native(spark: SparkSession, path: str):
    """Distributed bigwig scan: driver walks the index, executors decode
    blocks (see module docstring). Returns (Chromosome, Start, End, Value)."""
    with open(path, "rb") as fh:
        hdr = _read_header(fh)
        chroms = _chrom_map(fh, hdr["chrom_tree_off"])
        blocks = _rtree_leaves(fh, hdr["index_off"])
    compressed = hdr["uncompress_buf"] > 0

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        with open(path, "rb") as f:
            for pdf in batches:
                rows: list[tuple] = []
                for off, size in zip(pdf["off"], pdf["size"]):
                    f.seek(int(off))
                    raw = f.read(int(size))
                    if compressed:
                        raw = zlib.decompress(raw)
                    rows.extend(decode_block(raw, chroms))
                yield pd.DataFrame(
                    rows, columns=["Chromosome", "Start", "End", "Value"]
                )

    n_part = max(1, min(len(blocks), spark.sparkContext.defaultParallelism))
    files = spark.createDataFrame(
        [(int(o), int(s)) for o, s in blocks], "off long, size long"
    ).repartition(n_part)
    return files.mapInPandas(run, schema=BW_SCHEMA)


def write_bigwig(
    path: str,
    rows: list[tuple],
    chrom_sizes: dict[str, int],
    *,
    items_per_block: int = 1024,
) -> None:
    """Minimal spec-valid bigwig writer: bedGraph sections, zlib-compressed
    blocks, flat R-tree, zoomLevels=0. ``rows``: (chrom, start, end, value),
    must be sorted by (chrom-id order, start)."""
    chrom_ids = {c: i for i, c in enumerate(chrom_sizes)}
    key_size = max(len(c) for c in chrom_sizes)

    # --- chrom B+ tree (single leaf) ---
    bpt = struct.pack("<IIIIQQ", CHROM_TREE_MAGIC, 256, key_size, 8, len(chrom_sizes), 0)
    bpt += struct.pack("<BBH", 1, 0, len(chrom_sizes))
    for c, i in chrom_ids.items():
        bpt += c.encode().ljust(key_size, b"\x00") + struct.pack("<II", i, chrom_sizes[c])

    # --- data blocks (bedGraph sections) ---
    blocks: list[bytes] = []
    bounds: list[tuple[int, int, int, int]] = []  # sci, sb, eci, eb per block
    for i in range(0, len(rows), items_per_block):
        chunk = rows[i : i + items_per_block]
        by_chrom: dict[str, list[tuple]] = {}
        for r in chunk:
            by_chrom.setdefault(r[0], []).append(r)
        payload = b""
        for c, items in by_chrom.items():
            payload += struct.pack(
                "<IIIIIBBH",
                chrom_ids[c],
                items[0][1],
                items[-1][2],
                0,
                0,
                1,
                0,
                len(items),
            )
            for _c, s, e, v in items:
                payload += struct.pack("<IIf", s, e, v)
        blocks.append(zlib.compress(payload))
        cs = [chrom_ids[r[0]] for r in chunk]
        bounds.append((min(cs), chunk[0][1], max(cs), max(r[2] for r in chunk)))

    header_size = 64
    data_off = header_size + len(bpt)
    sections = b"".join(blocks)
    index_off = data_off + 8 + len(sections)

    # --- R-tree: root header + one leaf chain ---
    offs = []
    pos = data_off + 8
    for b in blocks:
        offs.append(pos)
        pos += len(b)
    rtree = struct.pack(
        "<IIQIIIIQII",
        RTREE_MAGIC,
        256,
        len(rows),
        bounds[0][0] if bounds else 0,
        bounds[0][1] if bounds else 0,
        bounds[-1][2] if bounds else 0,
        bounds[-1][3] if bounds else 0,
        index_off,  # endFileOffset placeholder (not used by our reader)
        items_per_block,
        0,
    )
    rtree += struct.pack("<BBH", 1, 0, len(blocks))
    for (sci, sb, eci, eb), off, b in zip(bounds, offs, blocks):
        rtree += struct.pack("<IIIIQQ", sci, sb, eci, eb, off, len(b))

    summary_off = index_off + len(rtree)
    vals = [r[3] for r in rows]
    covered = sum(r[2] - r[1] for r in rows)
    summary = struct.pack(
        "<Qdddd",
        covered,
        min(vals) if vals else 0.0,
        max(vals) if vals else 0.0,
        sum(v * (r[2] - r[1]) for v, r in zip(vals, rows)),
        sum(v * v * (r[2] - r[1]) for v, r in zip(vals, rows)),
    )

    uncompress_buf = max(
        (len(zlib.decompress(b)) for b in blocks), default=0
    )
    header = struct.pack(
        "<IHHQQQHHQQI",
        BIGWIG_MAGIC,
        4,  # version
        0,  # zoomLevels
        header_size,
        data_off,
        index_off,
        0,
        0,
        0,  # autoSql
        summary_off,
        uncompress_buf,
    )
    header = header.ljust(header_size, b"\x00")

    with open(path, "wb") as fh:
        fh.write(header)
        fh.write(bpt)
        fh.write(struct.pack("<Q", len(rows)))
        fh.write(sections)
        fh.write(rtree)
        fh.write(summary)
