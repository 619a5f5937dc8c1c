"""Native FASTA reader/writer (pure stdlib) — the pyfaidx stand-in.

The reference fetches sequences through pyfaidx handles
(reference pyranges1/core/pyranges_main.py:5898-6073, readers via optional
dep); here a FASTA file becomes the per-chromosome sequence TABLE that
``functions/seqs.py:get_sequence`` broadcasts — the idiomatic Spark shape
for a genome (a few GB of sequence vs a 100 TB interval/read corpus: the
genome is always the broadcast side, never the shuffled side).

Distribution: one parse task per file (``mapInPandas`` over the file list,
same fan-out as the native BAM reader — a multi-file genome collection
scans in parallel; a single genome FASTA is a bounded few-GB task, which is
exactly what its downstream broadcast requires anyway). ``.gz`` inputs
decompress with stdlib gzip.
"""

from __future__ import annotations

import gzip
from collections.abc import Iterator
from typing import TYPE_CHECKING

import pandas as pd

if TYPE_CHECKING:
    from pyspark.sql import DataFrame, SparkSession

FASTA_SCHEMA = "Chromosome string, Sequence string"


def parse_fasta_bytes(raw: bytes) -> pd.DataFrame:
    """Parse FASTA text into (Chromosome, Sequence) rows. The record name is
    the first whitespace-delimited word after '>' (the convention every
    aligner header follows); sequence lines concatenate with whitespace
    stripped, case preserved."""
    chroms: list[str] = []
    seqs: list[str] = []
    cur: list[str] | None = None
    for line in raw.decode("ascii", errors="strict").splitlines():
        if line.startswith(">"):
            # (line[1:].split() or [""]) guards '>' followed by only
            # whitespace — a nameless header yields "" instead of an
            # executor-side IndexError (ADVICE r6).
            chroms.append((line[1:].split() or [""])[0])
            cur = []
            seqs.append(cur)  # type: ignore[arg-type]
        elif line.strip():
            if cur is None:
                raise ValueError("FASTA sequence data before the first '>' header")
            cur.append(line.strip())
    return pd.DataFrame(
        {"Chromosome": chroms, "Sequence": ["".join(s) for s in seqs]}
    )


def read_fasta_native(spark: SparkSession, paths: str | list[str]) -> DataFrame:
    """Distributed FASTA scan: one parse task per file; returns the
    per-chromosome sequence table ``(Chromosome, Sequence)`` that
    ``get_sequence``/``get_transcript_sequence``/``extend_orfs`` broadcast."""
    import glob as _glob

    if isinstance(paths, str):
        expanded = sorted(_glob.glob(paths)) or [paths]
    else:
        expanded = list(paths)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for path in pdf["path"]:
                opener = gzip.open if str(path).endswith(".gz") else open
                with opener(path, "rb") as fh:  # type: ignore[operator]
                    yield parse_fasta_bytes(fh.read())

    files = spark.createDataFrame([(p,) for p in expanded], "path string").repartition(
        len(expanded)
    )
    return files.mapInPandas(run, schema=FASTA_SCHEMA)


def read_fasta_tiles(
    spark: SparkSession, paths: str | list[str], tile_size: int = 16384
) -> DataFrame:
    """Distributed FASTA scan emitting PRE-TILED sequences: one row per
    ``tile_size`` chunk, ``(Chromosome, tile_id, tile)`` — the production
    ingest format for large genomes. A 250 Mb chromosome never
    materializes as a single row/column value downstream; persist this
    table (parquet) once and hand it to
    ``get_sequence(tiled_sequences=..., tile_size=...)`` so every query
    skips the per-call chunk split (SCALING.md: the split is the dominant
    fixed cost of the tiled plan). Parsing is still one task per FILE —
    FASTA's sequential format forces that — but the parse slices to tiles
    in the same pass."""
    import glob as _glob

    if isinstance(paths, str):
        expanded = sorted(_glob.glob(paths)) or [paths]
    else:
        expanded = list(paths)
    s = int(tile_size)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for path in pdf["path"]:
                opener = gzip.open if str(path).endswith(".gz") else open
                with opener(path, "rb") as fh:  # type: ignore[operator]
                    whole = parse_fasta_bytes(fh.read())
                rows = []
                for chrom, seq in zip(whole["Chromosome"], whole["Sequence"]):
                    if not seq:
                        # a sequence-less header is still a PRESENT
                        # chromosome: keep one empty tile so the pre-tiled
                        # get_sequence probe yields Seq='' (matching the
                        # broadcast plan), not null-for-absent
                        rows.append((chrom, 0, ""))
                        continue
                    for tid in range(0, (len(seq) + s - 1) // s):
                        rows.append((chrom, tid, seq[tid * s : (tid + 1) * s]))
                yield pd.DataFrame(
                    rows, columns=["Chromosome", "tile_id", "tile"]
                )

    files = spark.createDataFrame([(p,) for p in expanded], "path string").repartition(
        len(expanded)
    )
    return files.mapInPandas(
        run, schema="Chromosome string, tile_id long, tile string"
    )


def write_fasta(path: str, sequences: list[tuple[str, str]], *, width: int = 60) -> None:
    """Write (name, sequence) pairs as a FASTA file, wrapped at ``width``
    columns. Driver-side by nature (one ordered text artifact, like the
    BigWig sink); for sharded corpus-scale output write the sequence TABLE
    as parquet instead."""
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "wt") as fh:  # type: ignore[arg-type]
        for name, seq in sequences:
            fh.write(f">{name}\n")
            for i in range(0, len(seq), width):
                fh.write(seq[i : i + width] + "\n")
