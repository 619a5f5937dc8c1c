"""Correctness at 10x DOCUMENT LENGTH, the text twin of check_oracle_scaled.

check_oracle_scaled densifies the INTERVAL fixtures to prove the pair-heavy
planners value-exact at scale shapes. The r10 sqrt-chunked string plans
(translate_cds in functions/seqs.py, winnow_fingerprints' gram hashing in
ml/text.py) scale along a different axis — characters per row — and their
chunk count c = ceil(sqrt(n)) grows with it, so a length-10x replica
exercises chunk-boundary arithmetic the sf0.01 gate (~300-char docs, a
handful of chunks) never reaches (~30 chunks/doc at 3 kb).

Construction: the ``documents`` view is swapped for a twin whose text is
``repeat(text, 10)`` — computed independently by Spark (F.repeat) and DuckDB
(repeat()) from the same parquet, so the value-hash discipline of
check_oracle.py carries over unchanged. Every other column is untouched
(n_chars stays the ORIGINAL length on both sides, deliberately — the gated
queries read only doc_id/text).

r11 (VERDICT r10 #4) extends the gate to the OTHER bound-lambda expression
APIs repaired in the r10 no-CSE sweep, so those fixes cannot silently
regress on the length axis: ``minhash_lsh`` and ``simhash`` ride the same
10x-text documents twin (shingle/minhash/simhash expression forms); for
``spearman_rows``, whose input is the embeddings table, the length axis is
VECTOR DIMENSIONALITY — its twin repeats each embedding 10x (64 -> 640
dims, Spark ``flatten(array_repeat(...))`` vs DuckDB
``flatten(list_transform(range(10), ...))``), which additionally stresses
average-rank tie handling (every value now appears 10 times per row).

Usage: python scripts/check_oracle_longdocs.py [--replicate=N] [sf_dir] [query ...]
Default queries: translate_cds, winnow (the two chunked plans) +
minhash_lsh, simhash, spearman_rows (the no-CSE sweep APIs) + the r12
exploded-aggregation text stats.

``--replicate=N`` (r12) swaps the LENGTH axis for a DUPLICATION axis: the
documents view becomes N exact copies of every doc (doc_id' = doc_id*M +
rep with M the next power of two >= N — a fixed *16 collided for N>16,
fusing different docs under one id and making the 100x packing cell
order-nondeterministic), the shape a dedup pipeline actually faces — dup-group
sizes multiply by N and candidate-pair relations by ~N^2. Both engines
derive the twin from the same parquet with the same arithmetic, so the
value-hash discipline carries over. Default roster in that mode:
the dedup family (exact / signature / incremental / streaming-incremental /
minhash-LSH) + sequence packing (global token cumsum over the inflated
corpus).
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

DEFAULT_QUERIES = [
    "translate_cds",
    "winnow",
    "minhash_lsh",
    "simhash",
    "spearman_rows",
    # r12: the exploded-aggregation text stats ride the same 10x twin — the
    # length axis multiplies their exploded relation (lines/2-grams/terms)
    # 10x per doc, exercising the linear-in-tokens claim with values asserted
    # (repeat(text,10) also makes every line a 10x duplicate group).
    "doc_repetition",
    "tfidf_topterms",
    "pack_examples",
    # late r12: the bigram-LM score rides the same 10x twin — its exploded
    # bigram relation (and the vocabulary-keyed joins back) grow 10x per
    # doc, and the repeat seam adds cross-copy bigrams both engines must
    # agree on bit-exactly (min_prob is a raw IEEE division).
    "lm_score",
    # late r12: substring-repeat spans on 10x text — the gram relation grows
    # 10x AND the repeat construction makes nearly every gram repeated, so
    # the island merge has to fuse ~whole-document span chains with exact
    # character coordinates (~30 sqrt-chunks per doc at 3 kb).
    "repeated_spans",
    # late r12: RAG chunking on 10x text — ~10x windows per doc, slice
    # boundaries and the short final chunk exercised at every length.
    "chunk_docs",
    # late r12: character-diversity counters on 10x text — the exploded
    # char relation grows 10x; simpson_num scales by exactly 100x under
    # pure repetition (counts x10, squares x100), a value the twin must hit.
    "char_diversity",
    # r13: BPE pair statistic on 10x text — every within-pretoken pair
    # count scales exactly 10x (pretokens repeat verbatim; the repeat seam
    # adds a handful of new cross-seam pretokens both engines must agree on)
    "bpe_pairs",
    # r14: the trainer+segmenter end-to-end gate on 10x text (VERDICT r13
    # #2's "done" bar) — x10 pair counts can reorder ties against the
    # sf-native table only if an engine's argmax diverges, and the
    # segmentation md5 re-pins every token on the longer docs.
    "bpe_segment",
    # NOT curation_pipeline: on repeat(text,10) every 30-gram is
    # self-repeated, so the strip stage (correctly) excises whole documents
    # and the quality filter drops everything — both engines agree on ZERO
    # rows, a vacuous cell. Its length-axis coverage comes from the
    # individually-gated stages above (repeated_spans, lm_score, ...); the
    # chain itself rides the NON-vacuous --skew-source roster.
]
#: --replicate default roster: the operators whose cost/semantics follow
#: DUPLICATE-GROUP size rather than document length.
REPLICATE_QUERIES = [
    "dedup_exact",
    "doc_signature_dedup",
    "normalize_dedup",
    "incremental_dedup",
    "stream_incremental_dedup",
    "minhash_lsh",
    "pack_examples",
    # late r12: substring-repeat spans under corpus duplication — N exact
    # copies make EVERY gram repeated, so the island merge must produce one
    # whole-text span per copy (the shape a dedup pipeline faces on a
    # crawl with heavy mirroring).
    "repeated_spans",
    # r14: paragraph keep-first under corpus duplication — every copy's
    # lead paragraph is a corpus-wide duplicate, so exactly ONE copy per
    # dup-group keeps it (the smallest remapped doc_id) and the md5 pins
    # the reassembly on all the rest.
    "para_dedup",
]
#: --skew-source roster: the group-quota operators, whose scale story IS
#: "few huge groups" — the twin remaps ~95% of docs onto one source, the
#: single-dominant-domain shape a crawl mix actually faces.
SKEW_SOURCE_QUERIES = [
    "quota_sample",
    "token_quota",
    "stratified_sample",
    # r13: the composed chain's quota stage under the same ~95% one-source
    # remap — the few-huge-groups shape flowing through the WHOLE pipeline
    # (filter counts, LM vocabulary and pack offsets all shift with the mix).
    "curation_pipeline",
]
N_REPS = 10


def main() -> int:
    argv = list(sys.argv[1:])
    replicate = 0
    skew_source = False
    for arg in list(argv):
        if arg.startswith("--replicate="):
            replicate = int(arg.split("=", 1)[1])
            argv.remove(arg)
        elif arg == "--skew-source":
            skew_source = True
            argv.remove(arg)
    rep_mult = 1 << max(replicate - 1, 1).bit_length() if replicate else 0
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = argv[1:] or (
        SKEW_SOURCE_QUERIES
        if skew_source
        else (REPLICATE_QUERIES if replicate else DEFAULT_QUERIES)
    )

    import __spark_entry__ as em
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .getOrCreate()
    )

    # Spark side: queries reach documents only through em._load's temp view;
    # wrap it so the view is the 10x-length twin. Queries' own plans are
    # untouched.
    orig_load = em._load

    def _load_long(s, d, tables=None):
        orig_load(s, d, tables)
        if tables is None or "documents" in tables:
            base = s.read.parquet(f"{d}/documents.parquet")
            if skew_source:
                base.select(
                    "doc_id",
                    "text",
                    "lang",
                    F.when(F.col("doc_id") % 20 == 0, F.col("source"))
                    .otherwise(F.lit("web"))
                    .alias("source"),
                    "n_chars",
                ).createOrReplaceTempView("documents")
                return
            if replicate:
                base.crossJoin(
                    s.range(replicate).withColumnRenamed("id", "__rep__")
                ).select(
                    (F.col("doc_id") * rep_mult + F.col("__rep__")).alias(
                        "doc_id"
                    ),
                    "text",
                    "lang",
                    "source",
                    "n_chars",
                ).createOrReplaceTempView("documents")
                return
            base.select(
                "doc_id",
                F.repeat(F.col("text"), N_REPS).alias("text"),
                "lang",
                "source",
                "n_chars",
            ).createOrReplaceTempView("documents")
        if tables is None or "embeddings" in tables:
            base = s.read.parquet(f"{d}/embeddings.parquet")
            base.select(
                "vec_id",
                F.flatten(F.array_repeat(F.col("embedding"), N_REPS)).alias(
                    "embedding"
                ),
                "label",
            ).createOrReplaceTempView("embeddings")

    em._load = _load_long

    con = duckdb.connect()
    for t in em.TABLES:
        if t == "documents" and skew_source:
            con.execute(
                f"CREATE VIEW documents AS SELECT doc_id, text, lang,"
                f" CASE WHEN doc_id % 20 = 0 THEN source ELSE 'web' END AS source,"
                f" n_chars FROM '{sf_dir}/{t}.parquet'"
            )
        elif t == "documents" and replicate:
            con.execute(
                f"CREATE VIEW documents AS SELECT doc_id * {rep_mult} + r.i AS doc_id,"
                f" text, lang, source, n_chars FROM '{sf_dir}/{t}.parquet',"
                f" unnest(range({replicate})) AS r(i)"
            )
        elif t == "documents":
            con.execute(
                f"CREATE VIEW documents AS SELECT doc_id, repeat(text, {N_REPS})"
                f" AS text, lang, source, n_chars FROM '{sf_dir}/{t}.parquet'"
            )
        elif t == "embeddings":
            con.execute(
                "CREATE VIEW embeddings AS SELECT vec_id,"
                f" flatten(list_transform(range({N_REPS}), i -> embedding))"
                f" AS embedding, label FROM '{sf_dir}/{t}.parquet'"
            )
        else:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = em.queries(), em.oracle_sql()
    failures = []
    for name in only:
        t0 = time.time()
        try:
            got = qs[name](spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
            failures.append(name)
            continue
        t_spark = time.time() - t0
        spark.catalog.clearCache()
        t0 = time.time()
        try:
            exp = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error {type(e).__name__}: {e}")
            failures.append(name)
            continue
        t_duck = time.time() - t0
        if sorted(got.columns) != sorted(exp.columns):
            print(f"FAIL {name}: columns {sorted(got.columns)} vs {sorted(exp.columns)}")
            failures.append(name)
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rowcount {len(got)} vs {len(exp)}")
            failures.append(name)
            continue
        g, e = normalize(got), normalize(exp)
        try:
            pd.testing.assert_frame_equal(g, e, check_exact=True)
            mode = (
                "@source-skew"
                if skew_source
                else (f"@{replicate}x-dup" if replicate else "@10x-length")
            )
            print(
                f"PASS {name} {mode}: rows={len(got)}"
                f" [spark {t_spark:.1f}s, duckdb {t_duck:.1f}s]"
            )
        except AssertionError as ex:
            print(f"FAIL {name}: values differ: {str(ex)[:400]}")
            failures.append(name)

    spark.stop()
    if failures:
        print(f"\n{len(failures)} FAILURES: {failures}")
        return 1
    tag = (
        "source-skew"
        if skew_source
        else (f"{replicate}x-dup" if replicate else "10x-length")
    )
    print(f"\nALL PASS ({tag})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
