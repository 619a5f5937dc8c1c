"""Measure the r11 auto-adopted tile cache at the r8 big-genome cell.

SCALING.md's r8 cell measured the per-call tiled plan at a 64 MB genome /
100k intervals: ~27.7s per call, dominated by the \\G chunk split of the
whole genome. The r11 auto-adoption (per-session tile memo) pays that split
ONCE (localCheckpoint at first call) — this script quantifies the steady
state at the same shape, in ONE session:

  opt-out   — get_sequence(..., auto_tile_cache=False), min of N: the
              per-call split every time (the r8 behavior)
  adopt-1   — first adopted call: split + checkpoint store + query
  adopted   — calls 2..N+1: the cached-tile steady state (split-free)

Output fingerprints (sum of xxhash64 over every output cell) are asserted
identical across paths before any timing is reported.

Usage: python scripts/measure_adoption_bigseq.py [genome_mb] [n_rows] [n_samples]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")


def main() -> int:
    genome_mb = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    n_rows = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    n_samples = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from pyranges_1_x_spark.core import GenomicRanges
    from pyranges_1_x_spark.functions import seqs as S

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).join(F.broadcast(spark.range(1000)), on="id").write.format(
        "noop"
    ).mode("overwrite").save()

    n_chrom = 8
    chrom_len = genome_mb * (1 << 20) // n_chrom
    unit = "ACGTTGCAATCGGCTAACGTGTCAGTCAGGCTAGCTAGGATCCAGTACGTACGGTACGTTAGC"  # 64
    seqs = spark.sql(
        f"""
        SELECT concat('chr', id) AS Chromosome,
               repeat('{unit}', {chrom_len // len(unit)}) AS Sequence
        FROM range({n_chrom})
        """
    )
    span = chrom_len - 2000
    iv = spark.sql(
        f"""
        SELECT concat('chr', id % {n_chrom}) AS Chromosome,
               CAST((id * 9973) % {span} AS BIGINT) AS Start,
               CAST((id * 9973) % {span} + 200 + id % 800 AS BIGINT) AS `End`
        FROM range({n_rows})
        """
    )
    gr = GenomicRanges(iv)

    def fingerprint(out):
        # bit_xor, not sum: 100k 64-bit hashes overflow long under ANSI
        return out.df.select(
            F.expr("bit_xor(xxhash64(Chromosome, Start, `End`, Seq))").alias("h")
        ).first()["h"]

    def timed(fn):
        t0 = time.time()
        fn().df.write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 3)

    S._tiles_memo(spark).clear()
    # value parity first (one materialization each path)
    fp_off = fingerprint(gr.get_sequence(seqs, auto_tile_cache=False))
    S._tiles_memo(spark).clear()
    fp_on = fingerprint(gr.get_sequence(seqs))  # adopts
    fp_on2 = fingerprint(gr.get_sequence(seqs))  # cached
    assert fp_off == fp_on == fp_on2, (fp_off, fp_on, fp_on2)

    S._tiles_memo(spark).clear()
    opt_out = [
        timed(lambda: gr.get_sequence(seqs, auto_tile_cache=False))
        for _ in range(n_samples)
    ]
    S._tiles_memo(spark).clear()
    adopt_first = timed(lambda: gr.get_sequence(seqs))
    adopted = [timed(lambda: gr.get_sequence(seqs)) for _ in range(n_samples)]
    print(
        json.dumps(
            {
                "genome_mb": genome_mb,
                "n_rows": n_rows,
                "opt_out_per_call": opt_out,
                "opt_out_min": min(opt_out),
                "adopt_first_call": adopt_first,
                "adopted_steady": adopted,
                "adopted_min": min(adopted),
                "fingerprint_equal": True,
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
