"""r15 interleaved A/B: narrow-keyed join-backs in dedup_paragraphs /
remove_boilerplate_lines vs the r14 text-keyed joins — VERDICT r14 #3.

The r14 shapes joined the occurrence-sized exploded relation back on the
FULL paragraph/line text, so the exchange carried every fragment's bytes
as the join key on both sides. This script keeps local copies of the OLD
shapes, asserts byte-exact output parity against the package functions,
then times alternating A/B rounds.

OUTCOME (recorded r15, 477 MB forced-sort-merge corpus + 1.5 MB gate
corpus, min of 3 interleaved):
* dedup_paragraphs — SHIPPED a by-doc winners join: the MIN aggregate's
  winner coordinates are re-grouped into per-doc position lists and the
  occurrence relation joins on DOC ID, which the per-doc reassembly
  aggregate then reuses (ONE corpus-sized exchange instead of two, no
  text in any join key, mirrored-paragraph skew structurally gone).
  Measured 1.10x at 477 MB. An intermediate (doc, pos)-keyed variant
  (unique keys but no partitioning reuse) measured 0.86x and was
  discarded.
* remove_boilerplate_lines — KEPT the text-keyed join: an xxhash64-keyed
  variant with per-hash array + exact array_contains verification
  measured 0.88x (477 MB) / 0.79x (1.5 MB): boilerplate membership must
  meet every occurrence by content, the occurrence text rides the
  exchange either way (it is the reassembly payload), the saved bytes
  are only the small frequent-lines relation, and value-frequency skew
  is unmoved by key encoding. See the function docstring.

Methodology (house rules, memory/bench-measurement-pitfalls): ONE session,
no parallel load, console progress off, alternating runs, min-of-N per arm,
bit-exactness asserted before any timing is trusted.

Usage: python scripts/ab_text_joinback_r15.py [sf_dir] [n_rounds]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def _old_tail(df, tagged, kept, id_col, text_col, out_col, sep, elem):
    agg = tagged.groupBy(id_col).agg(
        F.concat_ws(
            sep,
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(kept, F.struct(F.col("__pos__"), F.col(elem)))
                    )
                ),
                lambda s: s[elem],
            ),
        ).alias("__ct__"),
        F.sum(F.when(kept, 0).otherwise(1)).cast("long").alias("__nr__"),
        F.sum(F.when(kept, 1).otherwise(0)).cast("long").alias("__nk__"),
    )
    joined = df.join(agg, on=id_col, how="left")
    clean = F.coalesce(F.col("__ct__"), F.lit(""))
    cols = [clean.alias(out_col) if c == out_col else F.col(c) for c in df.columns]
    if out_col not in df.columns:
        cols.append(clean.alias(out_col))
    return joined.select(
        *cols,
        F.coalesce(F.col("__nr__"), F.lit(0)).cast("long").alias("n_removed"),
        F.coalesce(F.col("__nk__"), F.lit(0)).cast("long").alias("n_kept"),
    )


def old_dedup_paragraphs(df, text_col="text", id_col="doc_id", *, min_len=1,
                         out_col="clean_text"):
    """The r14 shape: text-keyed MIN join-back (ml/text.py @ 2c1a237)."""
    did = F.col(id_col)
    paras = df.select(
        did,
        F.posexplode(F.split(F.col(text_col), "\\n\\n")).alias("__pos__", "__p__"),
    )
    cand = (F.trim(F.col("__p__")) != "") & (F.length("__p__") >= min_len)
    first = (
        paras.filter(cand)
        .groupBy("__p__")
        .agg(F.min(F.struct(did.alias("d"), F.col("__pos__").alias("p"))
                   ).alias("__first__"))
    )
    tagged = paras.join(first, on="__p__", how="left")
    kept = F.col("__first__").isNull() | (
        F.struct(did.alias("d"), F.col("__pos__").alias("p")) == F.col("__first__")
    )
    return _old_tail(df, tagged, kept, id_col, text_col, out_col, "\n\n", "__p__")


def old_remove_boilerplate_lines(df, text_col="text", id_col="doc_id", *,
                                 min_docs=2, out_col="clean_text"):
    """The r14 shape: line-text-keyed frequency join-back."""
    did = F.col(id_col)
    lines = df.select(
        did, F.posexplode(F.split(F.col(text_col), "\n")).alias("__pos__", "__ln__")
    )
    blank = F.trim(F.col("__ln__")) == ""
    freq = (
        lines.filter(~blank)
        .groupBy("__ln__")
        .agg(F.countDistinct(id_col).alias("__nd__"))
        .filter(F.col("__nd__") >= min_docs)
    )
    tagged = lines.join(freq, on="__ln__", how="left")
    kept = F.col("__nd__").isNull() | blank
    return _old_tail(df, tagged, kept, id_col, text_col, out_col, "\n", "__ln__")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from pyspark.sql import SparkSession

    from pyranges_1_x_spark.ml.text import (
        dedup_paragraphs,
        remove_boilerplate_lines,
    )

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("ab-text-joinback-r15")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    # NULL ids diverge BY DESIGN in r15 (verbatim passthrough vs blanking);
    # parity is asserted on the non-null-id corpus, which the sf tables are.
    docs = docs.filter(F.col("doc_id").isNotNull())

    scale = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    if scale:
        # Exchange-byte regime — the 100 TB proxy. At real scale the
        # distinct-fragment relation is far past any broadcast threshold
        # (sort-merge both sides), and distinct-fragment cardinality grows
        # WITH the corpus. Emulate both: `scale` copies of each doc, each
        # paragraph inflated ~16x and salted with (copy mod scale/2) so
        # every distinct paragraph occurs exactly twice corpus-wide, and
        # broadcast joins disabled so the join exchanges actually happen.
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        half = max(scale // 2, 1)
        # Injective copy ids: multiplier = next power of two >= scale (a
        # fixed 1024 collides for scale > 1024, fusing copies of different
        # docs under one id — the check_oracle_longdocs M rule; r15 review).
        mult = 1 << max(scale - 1, 1).bit_length()
        docs = (
            docs.crossJoin(spark.range(scale).select(F.col("id").alias("__i__")))
            .select(
                (F.col("doc_id") * mult + F.col("__i__")).alias("doc_id"),
                F.concat_ws(
                    "\n\n",
                    F.transform(
                        F.split(F.col("text"), "\\n\\n"),
                        lambda p: F.concat(
                            F.concat_ws(" ", F.array_repeat(p, 16)),
                            F.lit(" #"),
                            (F.col("__i__") % half).cast("string"),
                        ),
                    ),
                ).alias("text"),
            )
            .repartition(32)
            .localCheckpoint()
        )

    arms = {
        "para_dedup": (
            lambda: old_dedup_paragraphs(docs),
            lambda: dedup_paragraphs(docs),
        ),
        "boilerplate": (
            lambda: old_remove_boilerplate_lines(docs),
            lambda: remove_boilerplate_lines(docs),
        ),
    }

    # --- byte-exactness gate first ---
    for name, (old, new) in arms.items():
        a = {r["doc_id"]: tuple(r) for r in old().collect()}
        b = {r["doc_id"]: tuple(r) for r in new().collect()}
        assert a == b, f"{name}: r15 output differs from r14 shape!"
        print(f"byte-exact OK: {name} ({len(a)} docs)", flush=True)

    n, size = docs.agg(
        F.count("*"), F.sum(F.length("text"))
    ).first()
    print(f"corpus: {n} docs, {size/1e6:.1f} MB text", flush=True)

    # Force full evaluation of the rebuilt text (a bare count() lets
    # Catalyst prune the clean_text column and with it most of the work).
    def run(q):
        q().agg(F.sum(F.length("clean_text")), F.sum("n_removed")).first()

    # --- interleaved timing ---
    results = {}
    for name, (old, new) in arms.items():
        t_old, t_new = [], []
        run(old); run(new)  # warm both plans
        for _ in range(rounds):
            t0 = time.time(); run(old); t_old.append(time.time() - t0)
            t0 = time.time(); run(new); t_new.append(time.time() - t0)
        results[name] = (min(t_old), min(t_new))
        print(f"{name}: old={min(t_old):.2f}s new={min(t_new):.2f}s "
              f"(speedup {min(t_old)/min(t_new):.2f}x) "
              f"all_old={[round(t,2) for t in t_old]} "
              f"all_new={[round(t,2) for t in t_new]}", flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
