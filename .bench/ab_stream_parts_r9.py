"""r9 A/B: streaming shuffle/state partitions 4 vs 8 vs 16 vs 32 for the
tumbling and session window shapes, at sf0.1 and sf10 (interleaved,
best-of-3 per conf)."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from lagom_kinesis_spark.queries.streaming_ops import events_stream
from lagom_kinesis_spark.session import get_spark

SFS = {
    "sf0.1": "/root/testdata/sf0.1",
    "sf10": "/tmp/lagom_kinesis_spark/scale/sf10",
}
PARTS = ["4", "8", "16", "32"]
spark = get_spark("ab-stream-parts")
spark.sparkContext.setLogLevel("ERROR")
os.environ["SPARK_GRAFT_STREAM_UNLOAD"] = "0"
os.environ["SPARK_GRAFT_GC_NUDGE"] = "0"


def shape(kind, sf_dir):
    s = events_stream(spark, sf_dir)
    if kind == "tumbling":
        return (
            s.groupBy(F.window("ts", "5 minutes"), "event_type")
            .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
        )
    return (
        s.groupBy(F.session_window("ts", "5 minutes"), "user_id")
        .agg(F.count("*").alias("n_events"))
    )


def run_once(kind, sf_dir, parts):
    prev_p = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", parts)
    try:
        t0 = time.time()
        name = f"p_{int(time.time()*1e6)}"
        q = (
            shape(kind, sf_dir).writeStream.format("memory").queryName(name)
            .outputMode("complete").trigger(availableNow=True).start()
        )
        q.awaitTermination()
        dt = time.time() - t0
        q.stop()
        spark.catalog.dropTempView(name)
        return dt
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_p)


for sf, d in SFS.items():
    for kind in ["tumbling", "session"]:
        run_once(kind, d, "4")  # warm
        best = {p: [] for p in PARTS}
        for _ in range(3):
            for p in PARTS:
                best[p].append(run_once(kind, d, p))
        print(sf, kind, {p: round(min(v), 3) for p, v in best.items()})
