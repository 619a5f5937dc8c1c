"""r15 production-vocabulary BPE trainer measurement — VERDICT r14 #4.

The r14 cell (64 merges, merge_batch 1 vs 8, ~1.6x) was suggestive; this
measures a production-shaped run: N merges (default 1000) on the sf0.01
documents corpus at merge_batch in {1, 8, 32}, recording wall, realized
Spark-job count (the cost model's driver: jobs ~= rounds), and asserting
the merge TABLES are identical across batch settings (the prefix-disjoint
strict-drop rule provably preserves the sequential table; parity is also
pinned in pytest — this re-asserts it at vocabulary scale).

Expected shape: early high-count merges batch well (few rounds per many
merges); the tail degenerates toward sequential as counts tie, so the
realized speedup is below B but grows with corpus Zipfiness.

Methodology: ONE session, no parallel load, console progress off,
sequential arms (a single arm is minutes-long — interleaving rounds would
multiply wall; cross-arm noise is bounded by the job-count metric, which
is load-independent).

Usage: python scripts/measure_bpe_batch_r15.py [sf_dir] [n_merges] [batches...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n_merges = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    # The synthetic corpora saturate ~127 merges at min_pair_count=2 (small
    # generated vocabulary: every distinct word fully fuses). Export the
    # knob so the production-shaped 1k-merge cell can run with
    # min_pair_count=1, which ALSO exercises the tied-count degenerate tail
    # the cost model predicts batching handles worst.
    min_pair = int(os.environ.get("BPE_MIN_PAIR", "2"))
    batches = [int(b) for b in sys.argv[3:]] or [1, 8, 32]

    from pyspark.sql import SparkSession

    from pyranges_1_x_spark.ml.text import bpe_train

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("measure-bpe-batch-r15")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    if sf_dir.startswith("synth:"):
        # The sf corpora EXHAUST at ~127 merges (every distinct pretoken
        # fully fused — even min_pair_count=1 finds zero pairs after that),
        # so a production-vocabulary cell needs a corpus with a production
        # vocabulary. Deterministic Zipf synthesis: n_words distinct
        # 8-letter words (md5-derived, letters only so the pretokenizer
        # sees one pretoken per word), word i occurring max(1, n//i) times,
        # packed 500 words per doc. This measures TRAINER mechanics
        # (job count and wall vs merge_batch), not corpus semantics.
        import hashlib

        n_words = int(sf_dir.split(":", 1)[1])

        def _word(i: int) -> str:
            h = hashlib.md5(str(i).encode()).hexdigest()
            return "".join(chr(ord("a") + int(c, 16) % 26) for c in h[:8])

        stream: list[str] = []
        for i in range(1, n_words + 1):
            stream.extend([_word(i)] * max(1, n_words // i))
        docs_rows = [
            (j, " ".join(stream[j * 500 : (j + 1) * 500]))
            for j in range((len(stream) + 499) // 500)
        ]
        docs = spark.createDataFrame(docs_rows, "doc_id long, text string")
        print(f"synth corpus: {n_words} distinct words, "
              f"{len(stream)} occurrences, {len(docs_rows)} docs", flush=True)
    else:
        docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    docs.write.format("noop").mode("overwrite").save()  # warm scan

    try:
        la = round(os.getloadavg()[0], 2)
    except OSError:
        la = -1.0
    print(f"n_merges={n_merges} min_pair={min_pair} corpus={sf_dir} loadavg_start={la}", flush=True)

    tables = {}
    for b in batches:
        jobs0 = sc._jsc.sc().dagScheduler().nextJobId()
        t0 = time.time()
        tables[b] = bpe_train(docs, n_merges, merge_batch=b, min_pair_count=min_pair)
        wall = time.time() - t0
        jobs = sc._jsc.sc().dagScheduler().nextJobId() - jobs0
        print(
            f"merge_batch={b}: wall={wall:.1f}s jobs={jobs} "
            f"merges={len(tables[b])}",
            flush=True,
        )

    ref = tables[batches[0]]
    for b in batches[1:]:
        assert tables[b] == ref, (
            f"merge table for batch={b} differs from batch={batches[0]}!"
        )
    print(f"merge tables identical across batches {batches} "
          f"({len(ref)} merges)", flush=True)

    # Persist each arm's table so arms run in SEPARATE processes (one arm
    # is minutes-long at 1k merges) can still be parity-compared offline.
    import json

    for b, t in tables.items():
        with open(f"/tmp/bpe_table_n{n_merges}_b{b}.json", "w") as fh:
            json.dump(t, fh)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
