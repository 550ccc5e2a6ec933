"""A/B: pipeline_corpus_filter dedup via agg+self-join (current: the
scoring pipeline evaluates twice, two scans) vs window-min over h (one
scan, one exchange). Run on an idle box at sf10."""
import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import Window as W
from pyspark.sql import functions as F
from lagom_kinesis_spark.catalog import load
from lagom_kinesis_spark.operators.text import LANG_MARKERS, tokens
from lagom_kinesis_spark.registry import all_queries
from lagom_kinesis_spark.session import get_spark

sf = sys.argv[1] if len(sys.argv) > 1 else "/tmp/lagom_kinesis_spark/scale/sf10"
spark = get_spark("ab-corpus-filter")
spark.sparkContext.setLogLevel("ERROR")

def variant_window(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    toks = tokens("text")
    langexpr = F.lit("und")
    for lang in reversed(list(LANG_MARKERS)):
        markers = F.array([F.lit(m) for m in LANG_MARKERS[lang]])
        langexpr = F.when(F.arrays_overlap(F.col("toks"), markers), lang).otherwise(langexpr)
    scored = d.select(
        "doc_id", F.md5(F.col("text").cast("binary")).alias("h"), toks.alias("toks")
    ).select(
        "doc_id", "h", langexpr.alias("lang_guess"),
        F.size("toks").alias("n_tokens"),
        (F.size(F.array_distinct("toks")) / F.size("toks").cast("double")).alias("ttr"),
    )
    filtered = scored.filter((F.col("n_tokens") >= 20) & (F.col("ttr") >= 0.2))
    kept = filtered.withColumn(
        "mn", F.min("doc_id").over(W.partitionBy("h"))
    ).filter(F.col("doc_id") == F.col("mn"))
    return kept.groupBy("lang_guess").agg(
        F.count("*").alias("n_docs"),
        F.round(F.sum("n_tokens").cast("double") / F.count("*"), 6).alias("avg_tokens"),
        F.round(F.avg("ttr"), 6).alias("avg_ttr"),
    )

cur = all_queries()["pipeline_corpus_filter"].fn(spark, sf)
new = variant_window(spark, sf)
a = sorted(map(tuple, cur.collect())); b = sorted(map(tuple, new.collect()))
print("results equal:", a == b)
for name, df in (("current(agg+join)", cur), ("window-min", new)):
    df.write.format("noop").mode("overwrite").save()
    best = 1e9
    for _ in range(3):
        t0 = time.time(); df.write.format("noop").mode("overwrite").save()
        best = min(best, time.time() - t0)
    print(name, round(best, 3))
