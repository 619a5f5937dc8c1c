"""r14 (VERDICT r13 #6): VALUE-asserted scale cells on the EMBEDDINGS axis,
the vector twin of check_oracle_scaled (intervals) / check_oracle_longdocs
(text).

--cell : the dominant-topic shape cluster_quota exists to cap. The
  embeddings view is swapped in BOTH engines for a twin where every vector
  except the k-means init anchors (vec_id 1..8) and a 5% remnant
  (vec_id % 20 == 7) is collapsed into one tight blob
  (x -> x * 0.0625 + 0.5 — power-of-two scale and exact constant, so the
  doubles are bit-identical cross-engine). The anchors keep their original
  positions, so Lloyd assigns the ~90% blob to ONE cell; quota_sample must
  cap it at 40 while the sparse cells pass through. The gate is the usual
  row/schema/value-hash compare; the cell-share is printed and asserted
  dominant (>= 0.75) so the cell tests the shape it claims.

--vecs=N [--clustered] : ivfpq_topk at N-x vectors — the IVF pruning story
  measured with values asserted. Both twins keep the centroid anchors
  (vec_id 1..8) intact and remix copy ids by +rep*2^24; arithmetic is
  exact-binary and dialect-twinned, so doubles are bit-identical
  cross-engine. The gate compares Spark vs the DuckDB twin exactly at
  n_probe=2, then an ADC-score-everything sweep reads recall@10 against
  the global ADC top-10 at n_probe = 1/2/4/8.

  Default (uniform) twin: N-1 shifted copies (x + rep*2^-10) of every
  non-malformed row. This is the NEGATIVE CONTROL: on near-uniform 64-dim
  data, distance concentration makes Voronoi cells uninformative — r14
  measured recall@10 FLAT AT 0.0 until the full 8/8 scan, for both the
  old dot-probe and the L2-consistent composition. IVF pruning buys
  nothing without cluster structure; that is a property of the data, not
  a defect of the plan.

  --clustered twin: every non-anchor vector is blended 75% toward its
  (vec_id %% 8)-th anchor (x*0.25 + c*0.75 + rep*2^-10) — the clustered
  shape IVF exists for. r14 measured: 2/8 probes scan 25.1%% of the 10x
  corpus and read recall@10 = 1.00 (asserted >= 0.8), monotone in probe
  count. Together the two twins are the measured form of "IVF needs a
  trained/clustered quantizer".

Usage:
  python scripts/check_vectors_scaled.py --cell  [sf_dir]
  python scripts/check_vectors_scaled.py --vecs=10 [--clustered] [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, ".")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from check_oracle import normalize  # noqa: E402  (shared canonicalizer)

# Twin SQL per engine — the ARITHMETIC is identical (power-of-two constants,
# one multiply + one add per element, same order), only the dialect differs
# (transform/ARRAY<DOUBLE> vs list_transform/DOUBLE[]), so the doubles are
# bit-identical cross-engine.
BLOB_SPARK = """
    SELECT vec_id,
           CASE WHEN vec_id > 8 AND vec_id % 20 <> 7
                THEN transform(CAST(embedding AS ARRAY<DOUBLE>),
                               x -> x * 0.0625D + 0.5D)
                ELSE CAST(embedding AS ARRAY<DOUBLE>) END AS embedding
    FROM embeddings_base
"""
BLOB_DUCK = """
    SELECT vec_id,
           CASE WHEN vec_id > 8 AND vec_id % 20 <> 7
                THEN list_transform(CAST(embedding AS DOUBLE[]),
                                    x -> x * 0.0625 + 0.5)
                ELSE CAST(embedding AS DOUBLE[]) END AS embedding
    FROM embeddings_base
"""


def vecs_spark(n: int) -> str:
    return f"""
    SELECT vec_id, CAST(embedding AS ARRAY<DOUBLE>) AS embedding
    FROM embeddings_base
    UNION ALL
    SELECT vec_id + rep * 16777216 AS vec_id,
           transform(CAST(embedding AS ARRAY<DOUBLE>),
                     x -> x + rep * 0.0009765625D) AS embedding
    FROM embeddings_base
    CROSS JOIN (SELECT explode(sequence(1, {n - 1})) AS rep) r
    WHERE vec_id <> 0
"""


def vecs_duck(n: int) -> str:
    return f"""
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS embedding
    FROM embeddings_base
    UNION ALL
    SELECT vec_id + rep * 16777216 AS vec_id,
           list_transform(CAST(embedding AS DOUBLE[]),
                          x -> x + rep * 0.0009765625) AS embedding
    FROM embeddings_base
    CROSS JOIN (SELECT unnest(range(1, {n})) AS rep) r
    WHERE vec_id <> 0
"""




def vecs_spark_clustered(n: int) -> str:
    return f"""
    SELECT b.vec_id, CAST(b.embedding AS ARRAY<DOUBLE>) AS embedding
    FROM embeddings_base b WHERE b.vec_id BETWEEN 1 AND 8
    UNION ALL
    SELECT b.vec_id + rep * 16777216 AS vec_id,
           zip_with(CAST(b.embedding AS ARRAY<DOUBLE>),
                    CAST(a.embedding AS ARRAY<DOUBLE>),
                    (x, c) -> x * 0.25D + c * 0.75D + rep * 0.0009765625D)
             AS embedding
    FROM embeddings_base b
    JOIN embeddings_base a ON a.vec_id = b.vec_id % 8 + 1
    CROSS JOIN (SELECT explode(sequence(0, {n - 1})) AS rep) r
    WHERE b.vec_id > 8
"""


def vecs_duck_clustered(n: int) -> str:
    return f"""
    SELECT b.vec_id, CAST(b.embedding AS DOUBLE[]) AS embedding
    FROM embeddings_base b WHERE b.vec_id BETWEEN 1 AND 8
    UNION ALL
    SELECT b.vec_id + rep * 16777216 AS vec_id,
           list_transform(list_zip(CAST(b.embedding AS DOUBLE[]),
                                   CAST(a.embedding AS DOUBLE[])),
                          x -> x[1] * 0.25 + x[2] * 0.75 + rep * 0.0009765625)
             AS embedding
    FROM embeddings_base b
    JOIN embeddings_base a ON a.vec_id = b.vec_id % 8 + 1
    CROSS JOIN (SELECT unnest(range(0, {n})) AS rep) r
    WHERE b.vec_id > 8
"""


def main() -> int:
    argv = list(sys.argv[1:])
    mode = None
    n_reps = 0
    clustered = False
    for a in list(argv):
        if a == "--cell":
            mode = "cell"
            argv.remove(a)
        elif a.startswith("--vecs="):
            mode = "vecs"
            n_reps = int(a.split("=", 1)[1])
            argv.remove(a)
        elif a == "--clustered":
            clustered = True
            argv.remove(a)
    if mode is None:
        print("pass --cell or --vecs=N")
        return 2
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"

    import __spark_entry__ as em
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    if mode == "cell":
        spark_twin, duck_twin = BLOB_SPARK, BLOB_DUCK
    elif clustered:
        spark_twin = vecs_spark_clustered(n_reps)
        duck_twin = vecs_duck_clustered(n_reps)
    else:
        spark_twin, duck_twin = vecs_spark(n_reps), vecs_duck(n_reps)
    qname = "cluster_quota" if mode == "cell" else "ivfpq_topk"

    # Spark side: queries reach embeddings only through em._load's temp view;
    # wrap it so the view is the twin (the check_oracle_longdocs idiom). The
    # per-engine twin SQL differs only in dialect; the arithmetic is shared.
    orig_load = em._load

    def _load_twin(s, d, tables=None):
        orig_load(s, d, tables)
        if tables is None or "embeddings" in tables:
            s.read.parquet(f"{d}/embeddings.parquet").createOrReplaceTempView(
                "embeddings_base"
            )
            s.sql(spark_twin).createOrReplaceTempView("embeddings")

    em._load = _load_twin
    t0 = time.time()
    spark_df = em.queries()[qname](spark, sf_dir).toPandas()
    t_spark = time.time() - t0
    em._load = orig_load

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings_base AS SELECT * FROM "
        f"read_parquet('{sf_dir}/embeddings.parquet')"
    )
    con.execute(f"CREATE VIEW embeddings AS {duck_twin}")
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    t0 = time.time()
    duck_df = con.execute(em.oracle_sql()[qname]).df()
    t_duck = time.time() - t0

    a, b = normalize(spark_df), normalize(duck_df)
    ok = a.equals(b)
    print(f"{'PASS' if ok else 'FAIL'} {qname} [{mode}]: rows={len(a)} "
          f"[spark {t_spark:.1f}s, duckdb {t_duck:.1f}s]")
    if not ok:
        print("spark:\n", a.head(20), "\nduckdb:\n", b.head(20))
        return 1

    if mode == "cell":
        share = spark_df.groupby("cell")["vec_id"].count()
        # quota caps every cell at 40 in the OUTPUT; dominance is asserted on
        # the ASSIGNMENT, recomputed without the cap
        from pyranges_1_x_spark.ml.similarity import kmeans_lloyd
        from pyspark.sql import functions as F

        em._load = _load_twin
        em._load(spark, sf_dir, ["embeddings"])
        em._load = orig_load
        emb = spark.table("embeddings")
        assigned, _ = kmeans_lloyd(emb, k=8, iters=2)
        counts = assigned.groupBy("__cell__").count().toPandas()
        top = counts["count"].max() / counts["count"].sum()
        print(f"assignment cells={len(counts)}, dominant share={top:.3f} "
              f"(output capped at 40/cell: {dict(share)})")
        assert top >= 0.75, f"cell not dominant enough to test the shape: {top}"
    else:
        # Pruning story: ADC-score EVERY candidate once, then sweep the
        # probe count and read recall@10 against the global ADC top-10.
        # (A single recall@10 at n_probe=2 is DEGENERATE on the replica
        # twin: the global top-10 collapses onto copies of 1-2 source
        # vectors, so the number is 0 or 1 depending on whether that one
        # cell is probed. The curve is the real trade.) All stages use the
        # r14 L2-consistent metric.
        from pyspark.sql import functions as F

        from pyranges_1_x_spark.ml.similarity import (
            ivf_assign,
            pq_adc_table,
            pq_codebooks,
            pq_topk,
            sq_l2,
        )
        from pyranges_1_x_spark.ml.similarity import _pq_adist_arrow

        em._load = _load_twin
        em._load(spark, sf_dir, ["embeddings"])
        em._load = orig_load
        emb = spark.table("embeddings")
        qv = em._pq_query_vec()
        qlit = F.array(*[F.lit(float(x)) for x in qv])
        cents = [
            [float(x) for x in r.embedding]
            for r in emb.filter("vec_id BETWEEN 1 AND 8").orderBy("vec_id").collect()
        ]
        probe_rank = [
            i for i, _ in sorted(
                (
                    (int(r.vec_id) - 1, r.d)
                    for r in emb.filter("vec_id BETWEEN 1 AND 8")
                    .select("vec_id", sq_l2(F.col("embedding"), qlit).alias("d"))
                    .collect()
                ),
                key=lambda t: (t[1], t[0]),
            )
        ]
        live = emb.filter("vec_id % 16777216 <> 0")
        cbs = pq_codebooks()
        scored = (
            ivf_assign(live, cents, metric="l2")
            .join(
                _pq_adist_arrow(live, "embedding", "vec_id",
                                pq_adc_table(qv, cbs), cbs),
                "vec_id",
            )
            .filter(F.col("adist").isNotNull())
            .select("vec_id", "__cell__", "adist")
            .toPandas()
        )
        total = len(scored)
        full10 = set(
            scored.sort_values(["adist", "vec_id"]).head(10)["vec_id"]
        )
        got = set(spark_df["vec_id"].tolist())
        shape = "clustered" if clustered else "uniform"
        print(f"vectors={total} (x{n_reps}, {shape}); probe order {probe_rank}")
        last = -1.0
        for n_probe in (1, 2, 4, 8):
            cells = probe_rank[:n_probe]
            sub = scored[scored["__cell__"].isin(cells)]
            top = set(sub.sort_values(["adist", "vec_id"]).head(10)["vec_id"])
            recall = len(top & full10) / 10.0
            print(f"  n_probe={n_probe}: scanned {len(sub)}/{total} "
                  f"({len(sub) / total:.3f}), recall@10={recall:.2f}")
            assert recall >= last - 1e-9, "recall must grow with probes"
            last = recall
            if n_probe == 2:
                assert top == got, (
                    "sweep at n_probe=2 must reproduce the gated query"
                )
                if clustered:
                    # the IVF use case: on clustered data 2/8 probes must
                    # hold (nearly) all of the global ADC top-10
                    assert recall >= 0.8, f"clustered recall@2 low: {recall}"
        assert last == 1.0, "probing every cell must recover the full top-10"
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
