"""Soak-test DuckDB oracle SQL under CPU load, comparing to unloaded results.

DuckDB 1.0.0's ordered MAX/MIN window frames intermittently return wrong
values under CPU contention (reproduced: 4/60 runs with 30 hog processes;
root cause of the r5 max_disjoint gate flake and an r6 summary_stats one).
All island-family oracles were rewritten onto SUM-sweep / LAG / GROUP BY
constructs that soak clean; this script re-proves that after any oracle edit.

Usage: python scripts/oracle_load_soak.py [iters] [query ...]
"""

from __future__ import annotations

import multiprocessing as mp
import sys
import time

import duckdb

sys.path.insert(0, ".")

import __spark_entry__ as m  # noqa: E402

SF = "/root/testdata/sf0.01"
DEFAULT = [
    "merge_stranded", "cluster", "complement", "subtract", "split",
    "set_union", "set_intersect", "mcc", "summary_stats", "jaccard_stat",
    "forbes_stat", "fdr", "winnow", "max_disjoint", "running_anomalies",
    # r6 additions: recursive-CTE label spreads, ROW_NUMBER rank replay,
    # hash-threshold sampling, regex tokenization, KMV sketch.
    "dedup_clusters", "semantic_dedup", "shuffle_rank", "decontaminate",
    "stratified_sample", "fasta_roundtrip", "kmv_vocab", "corpus_filter",
    "bpe_tokens", "normalize_dedup",
    # late-r12 additions whose oracles carry windows: the quota ROW_NUMBER
    # rank replay, the repeated-span SUM-sweep island merge, and the
    # boilerplate ordered string_agg reassembly.
    "quota_sample", "repeated_spans", "boilerplate_lines",
    # r13: the composed curation oracle stacks every flake-prone construct
    # at once — SUM-sweep island merge, LAG gap rebuild, ordered string_agg
    # reassembly, ROW_NUMBER quota replay, running-sum packing. (Not
    # mjpeg_frames: its oracle is pure integer formula arithmetic with no
    # window at all.)
    "curation_pipeline",
]


def _run(sql: str):
    con = duckdb.connect()
    for t in m.TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    out = con.execute(sql).fetchall()
    con.close()
    return sorted(map(str, out))


def _hog(stop: float) -> None:
    x = 0
    while time.time() < stop:
        x += sum(i * i for i in range(10000))


def main() -> int:
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    names = sys.argv[2:] or DEFAULT
    oracles = m.oracle_sql()
    ref = {n: _run(oracles[n]) for n in names}
    stop = time.time() + 3600
    procs = [mp.Process(target=_hog, args=(stop,)) for _ in range(30)]
    [p.start() for p in procs]
    bad_total = 0
    try:
        for n in names:
            bad = 0
            for i in range(iters):
                if _run(oracles[n]) != ref[n]:
                    bad += 1
                    print(f"{n} BAD iter {i}", flush=True)
            print(f"{n}: {bad} bad / {iters}", flush=True)
            bad_total += bad
    finally:
        [p.terminate() for p in procs]
    print(f"TOTAL BAD: {bad_total}")
    return 1 if bad_total else 0


if __name__ == "__main__":
    raise SystemExit(main())
