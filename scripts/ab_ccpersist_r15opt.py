"""Interleaved A/B for the r15 dedup-pipeline persist fixes.

A = r14 shape, reproduced by reverting to it at runtime: DataFrame.persist
    no-op'd for the two NEW persists (prefix relation, directed edge base)
    while keeping the pre-existing persists live — done by running the old
    code shape via monkeypatch is impractical, so instead A no-ops persist
    selectively is impossible; A therefore no-ops ALL persist calls in
    connected_components' edge prep and jaccard_similarity_join's prefix by
    patching pyspark.StorageLevel-marked persists... (see note below).

Practical approach: A is approximated by no-op'ing every DataFrame.persist
(the ONLY persists on the dedup_clusters/token_jaccard path are the r15
prefix persist and CC's edge persists; CC's old `ed.persist()` mattered for
count+collect sharing, so A keeps ed materialization honest by the fact the
driver path collects right after count — the same lineage evaluation count
as r14 for that relation, one).

Queries: dedup_clusters (prefix + CC edge base), token_jaccard (prefix),
semantic_dedup (CC edge base via minhash candidates).

One warm session, alternating runs, noop sink, value-identity asserted first.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")

QUERIES = ["dedup_clusters", "token_jaccard", "semantic_dedup"]


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    rounds = int(os.environ.get("AB_ROUNDS", "4"))

    from pyspark.sql import DataFrame, SparkSession

    import __spark_entry__ as entrymod

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("ab-ccpersist-r15opt")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    real_persist = DataFrame.persist

    def build(q: str, variant: str):
        if variant == "A":
            DataFrame.persist = lambda self, *a, **k: self  # type: ignore[method-assign]
        try:
            return entrymod.queries()[q](spark, sf_dir)
        finally:
            DataFrame.persist = real_persist  # type: ignore[method-assign]

    for q in QUERIES:
        ra = sorted(map(tuple, build(q, "A").collect()))
        rb = sorted(map(tuple, build(q, "B").collect()))
        assert ra == rb, f"value mismatch {q}: {len(ra)} vs {len(rb)}"
        print(f"{q}: value-identical, {len(ra)} rows", flush=True)

    def run(q: str, variant: str) -> float:
        spark.sparkContext.setJobDescription(f"{q}-{variant}")
        t0 = time.time()
        build(q, variant).write.format("noop").mode("overwrite").save()
        return time.time() - t0

    for q in QUERIES:
        run(q, "A")  # warm
        run(q, "B")
        ta, tb = [], []
        for _ in range(rounds):
            ta.append(run(q, "A"))
            tb.append(run(q, "B"))
        print(
            f"{q}: A(no persist) {['%.2f' % t for t in ta]} min={min(ta):.2f} | "
            f"B(persisted)  {['%.2f' % t for t in tb]} min={min(tb):.2f} | "
            f"per-round B/A {['%.2f' % (b / a) for a, b in zip(ta, tb)]}",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
