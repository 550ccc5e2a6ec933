"""r9: decompose dedup_minhash_lsh's ~1s at sf0.1 (biggest headline row):
shingling / signatures (64-min agg) / banding+self-join / exact verify."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ["SPARK_GRAFT_GC_NUDGE"] = "0"

from pyspark.sql import functions as F

from lagom_kinesis_spark.catalog import load
from lagom_kinesis_spark.functions import fan_out
from lagom_kinesis_spark.operators.similarity import (
    lsh_candidate_pairs,
    minhash_signatures,
)
from lagom_kinesis_spark.operators.text import shingles, tokens
from lagom_kinesis_spark.session import get_spark, tune

SF = "/root/testdata/sf0.1"
spark = get_spark("ab-minhash")
spark.sparkContext.setLogLevel("ERROR")
tune(spark)


def force(df):
    df.write.format("noop").mode("overwrite").save()


def timed(mk, n=3):
    force(mk())
    best = 1e9
    for _ in range(n):
        spark.catalog.clearCache()
        t0 = time.time()
        force(mk())
        best = min(best, time.time() - t0)
    return round(best, 3)


def sh():
    d = fan_out(load(spark, SF, "documents"))
    return d.select("doc_id", shingles(tokens("text")).alias("sh")).filter(
        F.size("sh") > 0
    )


def sigs():
    return minhash_signatures(sh(), "doc_id", "sh", 64)


def cands():
    return lsh_candidate_pairs(sh(), "doc_id", "sh", num_hashes=64, bands=16)


def full():
    s = sh().persist()
    c = lsh_candidate_pairs(s, "doc_id", "sh", num_hashes=64, bands=16)
    a = s.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = s.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sh_b"))
    from lagom_kinesis_spark.functions import r6
    from lagom_kinesis_spark.operators.text import jaccard

    return (
        c.join(a, "id_a").join(b, "id_b")
        .withColumn("jac", r6(jaccard(F.col("sh_a"), F.col("sh_b"))))
        .filter(F.col("jac") >= 0.8)
        .select("id_a", "id_b", "jac")
    )


print("shingles            :", timed(sh))
print("signatures (64 mins):", timed(sigs))
print("candidates (banded) :", timed(cands))
print("full                :", timed(full))
