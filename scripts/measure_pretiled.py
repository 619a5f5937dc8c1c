"""Measure the pre-tiled get_sequence amortization (VERDICT r9 #4).

`get_sequence_tiled` is the most expensive r9 gate (4.57s at sf0.1) and its
cost is dominated by the per-call one-pass \\G chunk split of the genome —
the exact fixed cost the `read_fasta_tiles` ingest path exists to eliminate
(pay the split ONCE at ingest, persist (Chromosome, tile_id, tile) parquet,
then every query equi-joins the stored tiles).

This script measures, in ONE session with interleaved min-of-N sampling
(the SCALING.md noise discipline):

  ingest    — write the gate's 5 x 500 kb genome as FASTA, read_fasta_tiles
              -> parquet (one-time cost)
  per-call  — get_sequence(seqs, tile_size=16k): split per call (gate path)
  pre-tiled — get_sequence(tiled_sequences=parquet, tile_size=16k)

Output: one JSON line with the three numbers + the break-even call count
(ingest / (per_call - pre_tiled)). Intervals = the sf fixture `a`.

Usage: python scripts/measure_pretiled.py [sf_dir] [n_samples]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, ".")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_samples = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    import __spark_entry__ as em
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from pyranges_1_x_spark.functions.seqs import get_sequence
    from pyranges_1_x_spark.sources.fasta import read_fasta_tiles, write_fasta

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .getOrCreate()
    )

    a = em._gr_a(spark, sf_dir)
    seqs = spark.sql(
        f"""
        SELECT Chromosome,
               concat_ws('', transform(sequence(0, {em._SEQ_LEN - 1}),
                                       i -> {em._SEQ_BASE_EXPR})) AS Sequence
        FROM VALUES {em._SEQ_CHROMS} AS t(Chromosome)
        """
    )

    tmp = tempfile.mkdtemp(prefix="sg_pretiled_")
    fa = os.path.join(tmp, "genome.fa")
    tiles_pq = os.path.join(tmp, "tiles.parquet")

    # one-time ingest: FASTA materialize (driver) + distributed tile split
    rows = [(r["Chromosome"], r["Sequence"]) for r in seqs.collect()]
    write_fasta(fa, rows, width=80)
    t0 = time.perf_counter()
    read_fasta_tiles(spark, fa, tile_size=16384).write.mode("overwrite").parquet(tiles_pq)
    ingest = time.perf_counter() - t0
    tiled = spark.read.parquet(tiles_pq)

    def run_percall():
        out = get_sequence(a, seqs, tile_size=16384)
        return out.df.agg(
            F.sum(F.length("Seq")), F.count("*"), F.max(F.md5("Seq"))
        ).collect()

    def run_pretiled():
        out = get_sequence(a, tiled_sequences=tiled, tile_size=16384)
        return out.df.agg(
            F.sum(F.length("Seq")), F.count("*"), F.max(F.md5("Seq"))
        ).collect()

    # answers must agree before timing means anything
    assert run_percall() == run_pretiled(), "per-call vs pre-tiled value mismatch"

    percall, pretiled = [], []
    for _ in range(n_samples):  # interleaved min-of-N, one session
        t0 = time.perf_counter()
        run_percall()
        percall.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        run_pretiled()
        pretiled.append(time.perf_counter() - t0)

    pc, pt = min(percall), min(pretiled)
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "ingest_sec": round(ingest, 3),
                "per_call_sec": round(pc, 3),
                "pre_tiled_sec": round(pt, 3),
                "delta_sec": round(pc - pt, 3),
                "break_even_calls": round(ingest / (pc - pt), 1) if pc > pt else None,
                "samples_per_call": [round(x, 3) for x in percall],
                "samples_pre_tiled": [round(x, 3) for x in pretiled],
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
