"""r9 probe: decompose the streaming cold-start floor and A/B candidate cuts.

Runs the tumbling-window shape the way the bench does (warm session,
availableNow, memory sink) and prints per-run progress durationMs
breakdowns, then A/Bs: (a) noDataMicroBatches off, (b) shuffle
partitions 2/4/8, (c) pure-lifecycle run over an empty source dir.
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from lagom_kinesis_spark.catalog import normalize_event_ts
from lagom_kinesis_spark.queries.streaming_ops import (
    _events_raw_schema,
    events_stream,
)
from lagom_kinesis_spark.session import get_spark
from lagom_kinesis_spark.streaming.topics import memory_sink_table

SF = "/root/testdata/sf0.1"
spark = get_spark("ab-stream-floor")
spark.sparkContext.setLogLevel("ERROR")
os.environ["SPARK_GRAFT_STREAM_UNLOAD"] = "0"
os.environ["SPARK_GRAFT_GC_NUDGE"] = "0"


def run_once(no_data=True, parts="4", src=None, collect_progress=False):
    prev_nd = spark.conf.get("spark.sql.streaming.noDataMicroBatches.enabled")
    prev_p = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", str(no_data).lower())
    spark.conf.set("spark.sql.shuffle.partitions", parts)
    try:
        t0 = time.time()
        if src is None:
            s = events_stream(spark, SF)
        else:
            s = normalize_event_ts(
                spark.readStream.schema(_events_raw_schema(spark, SF)).parquet(src)
            )
        agg = (
            s.groupBy(F.window("ts", "5 minutes"), "event_type")
            .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
        )
        name = f"p_{int(time.time()*1e6)}"
        q = (
            agg.writeStream.format("memory").queryName(name)
            .outputMode("complete").trigger(availableNow=True).start()
        )
        q.awaitTermination()
        dt = time.time() - t0
        prog = [json.loads(p.json) for p in q.recentProgress] if collect_progress else []
        q.stop()
        spark.catalog.dropTempView(name)
        return dt, prog
    finally:
        spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", prev_nd)
        spark.conf.set("spark.sql.shuffle.partitions", prev_p)


# warm
for _ in range(2):
    run_once()

dt, prog = run_once(collect_progress=True)
print(f"warm cold-query run: {dt:.3f}s, {len(prog)} progress events")
for p in prog:
    print("  batch", p["batchId"], "rows", p["numInputRows"], "durationMs", p["durationMs"])

# empty-source lifecycle
empty = "/tmp/lagom_kinesis_spark/steady_probe_empty"
os.makedirs(empty, exist_ok=True)

for label, kw in [
    ("baseline nd=on p=4", dict()),
    ("noData off       ", dict(no_data=False)),
    ("parts=2          ", dict(parts="2")),
    ("parts=8          ", dict(parts="8")),
    ("empty-src (lifecycle)", dict(src=empty)),
    ("empty nd=off     ", dict(src=empty, no_data=False)),
]:
    ts = [run_once(**kw)[0] for _ in range(3)]
    print(f"{label}: best {min(ts):.3f}  all {[round(t,3) for t in ts]}")
