"""r16 get_sequence_tiled assembly A/B (VERDICT r15 #10, guide §5).

The tiled plan's fragment assembly is
groupBy(id).agg(concat_ws('', transform(array_sort(collect_list(struct)))))
— an ObjectHashAggregate whose buffer holds every fragment struct, fed by a
full exchange of the fragment relation. At the gate shape most intervals
cover ONE tile (len << 16384), so the aggregate is identity work for ~most
rows. Variant B splits: single-tile fragments bypass the aggregate (frag IS
the assembled sequence), only multi-tile fragments shuffle into the
collect — then union. The frags relation is checkpointed first so both
variants time the ASSEMBLY, not the upstream split/join; outputs asserted
identical (md5 per id) before timing.
"""

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import SparkSession, functions as F  # noqa: E402

import __spark_entry__ as em  # noqa: E402
from pyranges_1_x_spark.plans.ids import STABLE_ID_COLS, with_stable_id  # noqa: E402

SF = "/root/testdata/sf0.1"
S = 16384

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.driver.memory", "16g")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
spark.range(1_000_000).join(F.broadcast(spark.range(1000)), on="id").write.format(
    "noop"
).mode("overwrite").save()

a = em._gr_a(spark, SF)
seqs = spark.sql(
    f"""
    SELECT Chromosome,
           concat_ws('', transform(sequence(0, {em._SEQ_LEN - 1}),
                                   i -> {em._SEQ_BASE_EXPR})) AS Sequence
    FROM VALUES {em._SEQ_CHROMS} AS t(Chromosome)
    """
)
# chunk relation: the tiled plan's (Chromosome, __tid__, __chunk__) rows
chunks = seqs.select(
    "Chromosome",
    F.posexplode(F.split(F.col("Sequence"), f"(?<=\\G.{{{S}}})")).alias(
        "__tid__", "__chunk__"
    ),
)

d0 = with_stable_id(a.df)
start, end = F.col("Start"), F.col("End")
spans = (
    d0.select("Chromosome", "Start", "End", *STABLE_ID_COLS)
    .filter(end > start)
    .select(
        "Chromosome",
        "Start",
        "End",
        *STABLE_ID_COLS,
        F.explode(
            F.sequence(
                F.floor(start / S).cast("long"), F.floor((end - 1) / S).cast("long")
            )
        ).alias("__tid__"),
    )
)
tlo = F.col("__tid__") * S
frag = F.substring(
    F.col("__chunk__"),
    (F.greatest(start - tlo, F.lit(0)) + 1).cast("int"),
    (F.least(end, tlo + S) - F.greatest(start, tlo)).cast("int"),
)
nt = (F.floor((end - 1) / S) - F.floor(start / S)).alias("__nt__")
frags = (
    spans.join(chunks, on=["Chromosome", "__tid__"], how="inner")
    .select(*STABLE_ID_COLS, nt, F.col("__tid__"), frag.alias("__frag__"))
    .localCheckpoint()
)
n_single = frags.filter("__nt__ = 0").count()
n_total = frags.count()
print(f"fragments: {n_total} total, {n_single} single-tile", flush=True)


def asm_a():
    return frags.groupBy(*STABLE_ID_COLS).agg(
        F.concat_ws(
            "",
            F.transform(
                F.array_sort(F.collect_list(F.struct("__tid__", "__frag__"))),
                lambda st: st["__frag__"],
            ),
        ).alias("__asm__")
    )


def asm_b():
    single = frags.filter("__nt__ = 0").select(
        *STABLE_ID_COLS, F.col("__frag__").alias("__asm__")
    )
    multi = (
        frags.filter("__nt__ <> 0")
        .groupBy(*STABLE_ID_COLS)
        .agg(
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("__tid__", "__frag__"))),
                    lambda st: st["__frag__"],
                ),
            ).alias("__asm__")
        )
    )
    return single.unionByName(multi)


va = sorted((tuple(r[c] for c in STABLE_ID_COLS), r["__asm__"]) for r in asm_a().collect())
vb = sorted((tuple(r[c] for c in STABLE_ID_COLS), r["__asm__"]) for r in asm_b().collect())
assert va == vb, f"mismatch {len(va)} {len(vb)}"
print(f"value-identical on {len(va)} assembled rows", flush=True)


def run(fn):
    t0 = time.time()
    fn().write.format("noop").mode("overwrite").save()
    return round(time.time() - t0, 3)


run(asm_a); run(asm_b)
ra, rb = [], []
for _ in range(5):
    ra.append(run(asm_a))
    rb.append(run(asm_b))
print("A collect-all :", ra, "min", min(ra))
print("B split-single:", rb, "min", min(rb))
spark.stop()
