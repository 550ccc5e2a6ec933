"""r9: agg_count_distinct_multi_bitmap shape A/B at sf10 — stacked
generator (current) vs two independent legs joined on the group key —
plus the shuffle-VOLUME comparison that is the twin's actual scale claim
(post-partial shuffle rows of the expand plan vs bitmap count x 4KB)."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ["SPARK_GRAFT_GC_NUDGE"] = "0"

from pyspark.sql import functions as F

from lagom_kinesis_spark.catalog import load
from lagom_kinesis_spark.registry import all_queries
from lagom_kinesis_spark.session import get_spark, tune

SF = "/tmp/lagom_kinesis_spark/scale/sf10"
spark = get_spark("ab-bitmap")
spark.sparkContext.setLogLevel("ERROR")
tune(spark)
qs = all_queries()


def force(df):
    df.write.format("noop").mode("overwrite").save()


def two_leg():
    o = load(spark, SF, "orders")

    def leg(col, expr, with_count):
        per_bucket = (
            o.select(
                "o_orderpriority",
                F.expr(f"bitmap_bucket_number({expr})").alias("b"),
                F.expr(f"bitmap_bit_position({expr})").alias("p"),
            )
            .groupBy("o_orderpriority", "b")
            .agg(
                F.expr("bitmap_construct_agg(p)").alias("bm"),
                *( [F.count("*").alias("c")] if with_count else [] ),
            )
        )
        aggs = [F.sum(F.expr("bitmap_count(bm)")).cast("long").alias(col)]
        if with_count:
            aggs.append(F.sum("c").cast("long").alias("n_orders"))
        return per_bucket.groupBy("o_orderpriority").agg(*aggs)

    cust = leg("n_custs", "CAST(o_custkey AS BIGINT)", True)
    yr = leg("n_years", "CAST(year(o_orderdate) AS BIGINT)", False)
    return cust.join(yr, "o_orderpriority").select(
        "o_orderpriority", "n_custs", "n_years", "n_orders"
    )


variants = {
    "stack (current)": lambda: qs["agg_count_distinct_multi_bitmap"].fn(spark, SF),
    "two-leg": two_leg,
    "expand twin": lambda: qs["agg_count_distinct_multi"].fn(spark, SF),
}
for name, mk in variants.items():
    force(mk())
best = {n: [] for n in variants}
for _ in range(3):
    for n, mk in variants.items():
        t0 = time.time()
        force(mk())
        best[n].append(time.time() - t0)
print({n: round(min(v), 3) for n, v in best.items()})

# Shuffle-volume proxy: rows surviving map-side partial aggregation.
o = load(spark, SF, "orders")
pid = F.spark_partition_id().alias("pid")
expand_cust = (
    o.select(pid, "o_orderpriority", "o_custkey")
    .groupBy("pid", "o_orderpriority", "o_custkey").count().count()
)
expand_year = (
    o.select(pid, "o_orderpriority", F.year("o_orderdate").alias("y"))
    .groupBy("pid", "o_orderpriority", "y").count().count()
)
bitmap_groups = (
    o.select(
        pid,
        "o_orderpriority",
        F.expr("bitmap_bucket_number(CAST(o_custkey AS BIGINT))").alias("b"),
    )
    .groupBy("pid", "o_orderpriority", "b").count().count()
)
print(f"expand shuffle rows: custkey leg {expand_cust:,} + year leg {expand_year:,}"
      f" (~20-30B each); bitmap shuffle groups {bitmap_groups:,} x ~4KB")
