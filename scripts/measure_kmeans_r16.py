"""r16 kmeans breakdown: is the wall the 8 interpreted sq_dist folds per
assignment scan (the r14 PQ CodegenFallback lesson) or the posexplode
(cell,dim) aggregate / collects?"""
import sys, time
sys.path.insert(0, ".")
from pyspark.sql import SparkSession, functions as F
import __spark_entry__ as em
from pyranges_1_x_spark import free_query_caches
from pyranges_1_x_spark.ml.similarity import kmeans_assign, kmeans_lloyd

SF = "/root/testdata/sf0.1"
spark = (SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.driver.memory", "16g")
    .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
spark.range(1_000_000).join(F.broadcast(spark.range(1000)), on="id").write.format("noop").mode("overwrite").save()

em._load(spark, SF, ["embeddings"])
emb = spark.table("embeddings").withColumn("embedding", F.col("embedding").cast("array<double>"))
n = emb.count(); print("vectors:", n)
rows = emb.orderBy(F.col("vec_id").asc()).limit(8).select("embedding").collect()
cents = [[float(x) for x in r[0]] for r in rows]

def t(label, fn, reps=3):
    walls = []
    for _ in range(reps):
        t0 = time.time(); fn(); walls.append(round(time.time()-t0, 3))
        free_query_caches()
    print(f"{label:28s} min={min(walls)} all={walls}", flush=True)

def noop(df): df.write.format("noop").mode("overwrite").save()

t("assign only (8 folds)", lambda: noop(kmeans_assign(emb, cents)))
t("stats agg (explode+agg)", lambda: kmeans_assign(emb, cents).select("__cell__",
    F.posexplode(F.col("embedding").cast("array<double>")).alias("__dim__","__x__"))
    .groupBy("__cell__","__dim__").agg(F.sum("__x__").alias("s"), F.count(F.lit(1)).alias("n")).collect() and None)
t("full q_kmeans", lambda: noop(em.q_kmeans(spark, SF)))
t("full q_cluster_quota", lambda: noop(em.q_cluster_quota(spark, SF)))
spark.stop()
