"""r10 A/B: decompose sf10 stream_tumbling_window's amortized cost and
close the tumbling-vs-session ratio anomaly (VERDICT r9 ask #1).

Hypothesis from the r9 artifact: the 22x-vs-4.2x ratio gap at sf10 is the
DENOMINATOR — Spark's amortized seconds are within 6% across shapes
(tumbling 1.532 s vs session 1.449 s) while DuckDB pays 0.077 s for the
trivial GROUP BY tumbling oracle vs 0.504 s for the gaps-and-islands
session oracle. This probe decomposes the Spark tumbling 1.5 s:

  A  batch agg (same plan, spark.read)           -> pure data-work floor
  B  streaming availableNow, complete mode, 16p  -> the recorded shape
  C  streaming, UPDATE mode, 16p                 -> state write-back share
  D  streaming, complete, 8p / 32p               -> partition-rule check
  E  duckdb tumbling + session oracles           -> denominator on record

Interleaved 3 rounds, min per variant. Run: python .bench/ab_stream_tumbling_sf10_r10.py
"""

from __future__ import annotations

import os
import shutil
import sys
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF10 = "/tmp/lagom_kinesis_spark/scale/sf10"


def main() -> None:
    from pyspark.sql import functions as F

    from lagom_kinesis_spark.catalog import io_scratch, load, normalize_event_ts
    from lagom_kinesis_spark.session import get_spark

    spark = get_spark("ab-stream-tumbling-r10")
    spark.sparkContext.setLogLevel("ERROR")
    root = io_scratch("ab_tumble", SF10, source="events")
    chunk_dir = os.path.join(root, "one")
    if not os.path.exists(os.path.join(chunk_dir, "_SUCCESS")):
        load(spark, SF10, "events").repartition(8).write.mode(
            "overwrite"
        ).parquet(chunk_dir)
    schema = spark.read.parquet(chunk_dir).schema
    n = spark.read.parquet(chunk_dir).count()
    print(f"# rows: {n}")

    def agg_of(s):
        return s.groupBy(F.window("ts", "5 minutes"), "event_type").agg(
            F.count("*").alias("n"), F.sum("value").alias("total_value")
        )

    def run_batch() -> float:
        df = agg_of(normalize_event_ts(spark.read.schema(schema).parquet(chunk_dir)))
        t0 = time.time()
        df.write.mode("overwrite").format("noop").save()
        return time.time() - t0

    def run_stream(mode: str, parts: int) -> float:
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", str(parts))
        ckpt = os.path.join(root, "ckpt", uuid.uuid4().hex[:12])
        try:
            s = normalize_event_ts(
                spark.readStream.schema(schema).parquet(chunk_dir)
            )
            t0 = time.time()
            q = (
                agg_of(s)
                .writeStream.format("noop")
                .outputMode(mode)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            try:
                q.awaitTermination()
                return time.time() - t0
            finally:
                q.stop()
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
            shutil.rmtree(ckpt, ignore_errors=True)

    variants = {
        "A_batch": run_batch,
        "B_complete_16p": lambda: run_stream("complete", 16),
        "C_update_16p": lambda: run_stream("update", 16),
        "D_complete_8p": lambda: run_stream("complete", 8),
        "D_complete_32p": lambda: run_stream("complete", 32),
    }
    best: dict[str, float] = {}
    for v, fn in variants.items():  # warm-up round, untimed
        fn()
    for rnd in range(3):
        for v, fn in variants.items():
            t = fn()
            best[v] = min(best.get(v, 1e9), t)
            print(f"# round {rnd} {v}: {t:.3f}")
    print("\nRESULTS (min of 3, interleaved):")
    for v, t in best.items():
        print(f"  {v}: {t:.3f} s")

    # E: the denominators
    import duckdb

    from lagom_kinesis_spark.registry import all_queries

    qs = all_queries()
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF10}/events.parquet')"
    )
    for q in ("stream_tumbling_window", "stream_session_window"):
        o = qs[q].oracle
        con.sql(o).fetch_arrow_table()  # warm
        t0 = time.time()
        con.sql(o).fetch_arrow_table()
        print(f"  duckdb {q}: {time.time() - t0:.3f} s")


if __name__ == "__main__":
    main()
