"""r16 para_dedup A/B: dedup_paragraphs' first-occurrence election.

A: groupBy(paragraph).agg(min(struct(doc,pos))) — struct buffer => SortAggregate
B: row_number over (partition by paragraph order by doc,pos) == 1 => WindowGroupLimit
Both then regroup winners per doc; downstream identical.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import SparkSession, Window, functions as F  # noqa: E402

import __spark_entry__ as em  # noqa: E402
from pyranges_1_x_spark import free_query_caches  # noqa: E402
from pyranges_1_x_spark.ml.text import _attach_rebuilt_text, _rebuild_docs  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.driver.memory", "16g")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
spark.range(1_000_000).join(F.broadcast(spark.range(1000)), on="id").write.format(
    "noop"
).mode("overwrite").save()

em._load(spark, SF, ["documents"])


def docs():
    # q_para_dedup's fixture shape: inject paragraph structure by formula
    import inspect

    src = inspect.getsource(em.q_para_dedup)
    return em.q_para_dedup  # we call the entry query directly for A


def dedup_paras(df, winners_shape, text_col="text", id_col="doc_id", min_len=1,
                out_col="clean_text"):
    did = F.col(id_col)
    paras = df.filter(did.isNotNull()).select(
        did,
        F.posexplode(F.split(F.col(text_col), "\\n\\n")).alias("__pos__", "__p__"),
    )
    cand = (F.trim(F.col("__p__")) != "") & (F.length("__p__") >= min_len)
    if winners_shape == "minstruct":
        winners = (
            paras.filter(cand)
            .groupBy("__p__")
            .agg(F.min(F.struct(did.alias("d"), F.col("__pos__").alias("p"))).alias("__w__"))
            .groupBy(F.col("__w__.d").alias(id_col))
            .agg(F.collect_list("__w__.p").alias("__wp__"))
        )
    else:
        w = Window.partitionBy("__p__").orderBy(did.asc(), F.col("__pos__").asc())
        winners = (
            paras.filter(cand)
            .withColumn("__rk1__", F.row_number().over(w))
            .filter(F.col("__rk1__") == 1)
            .groupBy(did.alias(id_col))
            .agg(F.collect_list("__pos__").alias("__wp__"))
        )
    tagged = paras.join(winners, on=id_col, how="left")
    kept = ~cand | F.coalesce(
        F.array_contains(F.col("__wp__"), F.col("__pos__")), F.lit(False)
    )
    agg = _rebuild_docs(tagged, kept, id_col, "\n\n", "__p__")
    return _attach_rebuilt_text(df, agg, text_col, id_col, out_col)


def fixture():
    import re

    # replicate q_para_dedup's input construction by calling the entry query's
    # source: read its source to find the doc build. Simpler: rebuild here
    # the same way the entry does (structure injection by formula).
    raise SystemExit("unused")


# Use the entry query's own input by monkey-patching dedup_paragraphs.
import pyranges_1_x_spark.ml.text as textmod  # noqa: E402

orig = textmod.dedup_paragraphs


def make_q(shape):
    def patched(df, text_col="text", id_col="doc_id", *, min_len=1, out_col="clean_text"):
        return dedup_paras(df, shape, text_col, id_col, min_len, out_col)

    def q():
        textmod.dedup_paragraphs = patched
        em.q_para_dedup.__globals__  # entry imports inside the fn
        try:
            return em.q_para_dedup(spark, SF)
        finally:
            textmod.dedup_paragraphs = orig

    return q


qa, qb = make_q("minstruct"), make_q("window")

va = sorted(map(tuple, qa().collect()))
vb = sorted(map(tuple, qb().collect()))
assert va == vb, f"mismatch {len(va)} {len(vb)}"
print(f"value-identical on {len(va)} rows")

import contextlib, io  # noqa: E402

for name, q in (("A minstruct", qa), ("B window", qb)):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        q().explain("formatted")
    s = buf.getvalue()
    print(name, {n: s.count(") " + n) for n in
                 ("SortAggregate", "HashAggregate", "ObjectHashAggregate",
                  "WindowGroupLimit", "Window", "Exchange", "Sort")})


def run(q):
    t0 = time.time()
    q().write.format("noop").mode("overwrite").save()
    wl = time.time() - t0
    free_query_caches()
    return round(wl, 3)


run(qa); run(qb)
a, b = [], []
for i in range(5):
    a.append(run(qa))
    b.append(run(qb))
print("A:", a, "min", min(a))
print("B:", b, "min", min(b))
spark.stop()
