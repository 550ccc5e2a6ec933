"""r9: decompose text_tfidf's sf10 residual (~0.6 s, floor_share 0.95).

Times successive prefixes of the plan under the bench forcing protocol
(noop write), best-of-3 each, warm: scan+filter / +explode+groupBy(tf) /
+window(df) / +N-leg crossJoin (full query). Also times the N-leg alone.
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ["SPARK_GRAFT_GC_NUDGE"] = "0"

from pyspark.sql import functions as F
from pyspark.sql import Window as W

from lagom_kinesis_spark.catalog import load
from lagom_kinesis_spark.functions import fan_out, r6
from lagom_kinesis_spark.operators.text import tokens
from lagom_kinesis_spark.queries.llm_ops import TEXT_FAN_OUT_MIN_BYTES
from lagom_kinesis_spark.session import get_spark, tune

SF = "/tmp/lagom_kinesis_spark/scale/sf10"
spark = get_spark("ab-tfidf")
spark.sparkContext.setLogLevel("ERROR")
tune(spark)


def force(df):
    df.write.format("noop").mode("overwrite").save()


def timed(mk):
    force(mk())  # warm
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        force(mk())
        best = min(best, time.time() - t0)
    return round(best, 3)


def d():
    return fan_out(
        load(spark, SF, "documents"), min_bytes=TEXT_FAN_OUT_MIN_BYTES, by="doc_id"
    ).filter(F.col("doc_id") % 50 == 0)


def tf():
    return (
        d().select("doc_id", F.explode(tokens("text")).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("tf"))
    )


def with_df():
    return tf().withColumn("df", F.count("*").over(W.partitionBy("token"))).filter(
        F.col("tf") >= 2
    )


def n_leg():
    return (
        load(spark, SF, "documents")
        .filter(F.col("doc_id") % 50 == 0)
        .agg(F.count("*").cast("double").alias("n_docs"))
    )


def full():
    return (
        with_df()
        .crossJoin(F.broadcast(n_leg()))
        .select(
            "doc_id",
            "token",
            r6(F.col("tf") * F.log(F.col("n_docs") / F.col("df"))).alias("tfidf"),
        )
    )


print("scan+filter      :", timed(d))
print("  rows sampled   :", d().count())
print("tf (explode+agg) :", timed(tf))
print("  tf rows        :", tf().count())
print("tf+window df     :", timed(with_df))
print("N leg alone      :", timed(n_leg))
print("full query       :", timed(full))


print("\n# shuffle.partitions sweep on the full query (interleaved best-of-3)")
prev = spark.conf.get("spark.sql.shuffle.partitions")
for p in ["4", "8", "16", "32"]:
    spark.conf.set("spark.sql.shuffle.partitions", p)
    force(full())  # warm per conf
best = {p: [] for p in ["4", "8", "16", "32"]}
import time as _t
for _ in range(3):
    for p in ["4", "8", "16", "32"]:
        spark.conf.set("spark.sql.shuffle.partitions", p)
        t0 = _t.time(); force(full()); best[p].append(_t.time() - t0)
spark.conf.set("spark.sql.shuffle.partitions", prev)
print({p: round(min(v), 3) for p, v in best.items()})
