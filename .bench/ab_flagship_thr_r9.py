"""r9: unbucketed flagship at sf10, post-AQE-coalescing-fix A/B —
shuffle-hash hint (current) vs planner default (SMJ) vs explicit
broadcast of the reduced orders build side. Interleaved best-of-3."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ["SPARK_GRAFT_GC_NUDGE"] = "0"

from pyspark.sql import functions as F

from lagom_kinesis_spark.catalog import load
from lagom_kinesis_spark.functions.helpers import money_sum_units
from lagom_kinesis_spark.queries.relational import (
    _customer_nation_asia,
    revenue_units,
)
from lagom_kinesis_spark.session import get_spark, tune

SF = "/tmp/lagom_kinesis_spark/scale/sf10"
spark = get_spark("ab-flagship")
spark.sparkContext.setLogLevel("ERROR")
tune(spark)


def force(df):
    df.write.format("noop").mode("overwrite").save()


def build(variant):
    li = load(spark, SF, "lineitem")
    orders = load(spark, SF, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1999-01-01")
    )
    ca = _customer_nation_asia(spark, SF)
    oa = orders.join(F.broadcast(ca), orders.o_custkey == ca.c_custkey).select(
        "o_orderkey", "n_name"
    )
    if variant == "shj":
        oa = oa.hint("shuffle_hash")
    elif variant == "bcast":
        oa = F.broadcast(oa)
    return (
        li.join(oa, li.l_orderkey == oa.o_orderkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            money_sum_units(revenue_units(), 4).alias("revenue"),
            F.count("*").alias("n_items"),
        )
        .orderBy(F.col("revenue").desc())
    )


import time
print("\n# adaptive-threshold probe: does AQE convert shj->bcast, and at what cost")
for thr in ["64MB", "256MB"]:
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", thr)
    force(build("shj"))  # warm/convert
    ts = []
    for _ in range(3):
        t0 = time.time(); force(build("shj")); ts.append(time.time() - t0)
    df = build("shj")
    df.write.format("noop").mode("overwrite").save()
    plan = df._jdf.queryExecution().executedPlan().toString()
    kind = "BroadcastHashJoin" if "BroadcastHashJoin" in plan else (
        "ShuffledHashJoin" if "ShuffledHashJoin" in plan else "SortMergeJoin")
    print(thr, kind, [round(x,3) for x in ts])
spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
