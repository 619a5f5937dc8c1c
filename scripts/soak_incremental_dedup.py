"""Store-growth soak for incremental dedup (r13, VERDICT r12 #8).

Two claims back ``dedup_against_store``'s 100 TB story; this script turns
both into measured assertions:

(a) CORRECTNESS UNDER SEQUENTIAL GROWTH — N batches flow through
    ``dedup_against_store`` one after another, each batch's kept signatures
    appended to the persisted sig-bucketed store exactly as a daily
    pipeline would. After EVERY round, the union of all kept rows must
    equal the from-scratch dedup of everything seen so far (smallest id
    per fingerprint — batch ids increase monotonically, so first-occurrence
    across increments IS the global min id).

(b) THE ANTI-JOIN STAYS EXCHANGE-FREE ON THE STORE SIDE AS THE STORE GROWS
    DECADE OVER DECADE — the store is probed through its bucketed scan
    (sources/bucketed.py): per decade (default 1e4 -> 1e5 -> 1e6 signature
    rows) the executed plan must show the store's parquet scan with
    Bucketed: true and NO Exchange between that scan and the anti-join
    (the batch is the only relation that moves), and the measured per-batch
    wall must stay ~flat — the store contributes one cheap columnar
    signature scan, never a text rescan or a reshuffle.

Usage:
    python scripts/soak_incremental_dedup.py            # full decades
    python scripts/soak_incremental_dedup.py --quick    # pytest-sized

Prints one JSON line: {"sequential_rounds": N, "all_rounds_match": bool,
"decades": [{"store_rows": n, "wall_sec": w, "bucketed_scan": bool,
"store_side_exchange_free": bool}, ...]}.
Exit 1 on any failed assertion.
"""

from __future__ import annotations

import argparse
import json
import re
import sys
import time

sys.path.insert(0, ".")


def _node_depth(line: str) -> int:
    m = re.search(r"[+:]- ", line)
    return m.start() if m else -1


def store_side_exchange_free(plan: str, table: str) -> tuple[bool, bool]:
    """(scan_is_bucketed, no_exchange_between_scan_and_join) for the store
    table's scan inside ``plan`` — the indentation-parsed ancestor walk of
    scripts/plan_audit.py: from each store scan line, climb strictly
    decreasing marker depths; any Exchange ancestor BEFORE the first Join
    node means the store side reshuffled."""
    lines = plan.splitlines()
    scan_is_bucketed = False
    exchange_free = True
    found = False
    for i, ln in enumerate(lines):
        if "Scan" not in ln or table not in ln:
            continue
        found = True
        if "Bucketed: true" in ln or "SelectedBucketsCount" in ln:
            scan_is_bucketed = True
        cur = _node_depth(ln)
        for j in range(i - 1, -1, -1):
            dj = _node_depth(lines[j])
            if dj < 0 or dj >= cur:
                continue
            if "Exchange" in lines[j]:
                exchange_free = False
            if "Join" in lines[j]:
                break
            cur = dj
    return (found and scan_is_bucketed), exchange_free


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="pytest-sized run")
    ap.add_argument("--rounds", type=int, default=None)
    args = ap.parse_args()
    rounds = args.rounds or (3 if args.quick else 6)
    decades = [1_000, 10_000] if args.quick else [10_000, 100_000, 1_000_000]
    batch_rows = 200 if args.quick else 2_000

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from pyranges_1_x_spark.ml.dedup import dedup_against_store
    from pyranges_1_x_spark.sources.bucketed import read_bucketed, write_bucketed

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("soak-incremental-dedup")
        .config("spark.sql.shuffle.partitions", "8")
        # At soak scale Spark rightly BROADCASTS the distinct store sigs —
        # but the claim under test is the 100 TB regime where the store is
        # far past broadcast range and the anti-join must ride the bucketed
        # scan's partitioning. Disabling auto-broadcast forces that plan
        # shape so its exchange-freeness is what gets asserted.
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    ok = True

    # ---- (a) sequential-growth correctness ---------------------------------
    # Content keyed so consecutive batches overlap ~50% with history and
    # carry in-batch dups; ids increase across batches.
    def batch_df(r: int):
        rows = []
        for k in range(batch_rows):
            did = r * batch_rows + k
            content = f"content {(r * batch_rows // 2 + k) % (batch_rows * rounds)}"
            if k % 7 == 0:  # in-batch duplicate of a neighbour
                content = f"content {(r * batch_rows // 2 + k + 1) % (batch_rows * rounds)}"
            rows.append((did, content))
        return spark.createDataFrame(rows, "doc_id long, text string")

    store_tbl = "soak_seq_store"
    spark.sql(f"DROP TABLE IF EXISTS {store_tbl}")
    write_bucketed(
        spark.createDataFrame([], "sig string"),
        store_tbl, buckets=8, bucket_cols=("sig",), sort_cols=("sig",),
    )
    seen: dict[str, int] = {}  # python twin: fingerprint text -> first id
    kept_all: set[int] = set()
    rounds_match = []
    for r in range(rounds):
        b = batch_df(r)
        kept = dedup_against_store(b, read_bucketed(spark, store_tbl))
        kept_rows = kept.select("doc_id", "text", "sig").collect()
        kept_all.update(row["doc_id"] for row in kept_rows)
        # append this increment's sigs to the store (daily-pipeline step);
        # collect-then-write avoids overwriting a table the plan reads.
        new_sigs = spark.createDataFrame(
            [(row["sig"],) for row in kept_rows], "sig string"
        )
        write_bucketed(
            read_bucketed(spark, store_tbl).unionByName(new_sigs).localCheckpoint(),
            store_tbl, buckets=8, bucket_cols=("sig",), sort_cols=("sig",),
        )
        # python twin over everything seen so far
        for row in b.collect():
            seen.setdefault(row["text"], row["doc_id"])
        expect = set(seen.values())
        match = expect == kept_all
        rounds_match.append(match)
        ok &= match
        print(
            f"round {r}: kept {len(kept_rows)}, total {len(kept_all)}, "
            f"match={match}", file=sys.stderr,
        )
    spark.sql(f"DROP TABLE IF EXISTS {store_tbl}")

    # ---- (b) decade growth: plan + wall ------------------------------------
    probe = spark.createDataFrame(
        [(i, f"probe {i % (batch_rows // 2)}") for i in range(batch_rows)],
        "doc_id long, text string",
    )
    dec_tbl = "soak_decade_store"
    decade_results = []
    for n in decades:
        spark.sql(f"DROP TABLE IF EXISTS {dec_tbl}")
        hist = spark.range(n).select(
            F.md5(F.concat(F.lit("hist"), F.col("id").cast("string"))).alias("sig")
        )
        write_bucketed(
            hist, dec_tbl, buckets=8, bucket_cols=("sig",), sort_cols=("sig",)
        )
        out = dedup_against_store(probe, read_bucketed(spark, dec_tbl))
        plan = out._jdf.queryExecution().executedPlan().toString()
        bucketed, xfree = store_side_exchange_free(plan, dec_tbl)
        walls = []
        for _ in range(3):
            t0 = time.time()
            out.write.format("noop").mode("overwrite").save()
            walls.append(time.time() - t0)
        decade_results.append(
            {
                "store_rows": n,
                "wall_sec": round(min(walls), 3),
                "bucketed_scan": bucketed,
                "store_side_exchange_free": xfree,
            }
        )
        ok &= bucketed and xfree
        print(f"decade {n}: {decade_results[-1]}", file=sys.stderr)
    spark.sql(f"DROP TABLE IF EXISTS {dec_tbl}")

    # flatness: the largest decade may cost at most 3x the smallest (the
    # sig scan is columnar and cheap; anything steeper means the store is
    # being reshuffled or rescanned as text)
    flat = decade_results[-1]["wall_sec"] <= 3.0 * max(
        decade_results[0]["wall_sec"], 0.2
    )
    ok &= flat
    print(
        json.dumps(
            {
                "sequential_rounds": rounds,
                "all_rounds_match": all(rounds_match),
                "decades": decade_results,
                "wall_flat_within_3x": flat,
            }
        )
    )
    spark.stop()
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
