"""r13 streaming probes (VERDICT r12 ask #4): attack the per-batch
constant behind the stream_tumbling/session headline ratios.

Two instruments:

1. State-store provider A/B (guide §5): HashMap (default) vs RocksDB at
   a real-volume tier (sf1 by default), steady-state protocol (amortized
   resident-query batch + marginal per-micro-batch), fresh process per
   run, providers interleaved h,r,h,r,... per shape.
2. Commit-path breakdown: run the same aggregation as an 8-micro-batch
   availableNow stream and read StreamingQueryProgress.durationMs +
   stateOperators metrics per batch — decomposes each batch into
   addBatch (the agg itself) vs walCommit/commitOffsets/latestOffset/
   queryPlanning (query-machinery floor) and the state-store commit.
   This is the event-log-grade evidence the r12 verdict asked for,
   pulled from the query's own progress telemetry.

Run: python .bench/ab_stream_state_r13.py [sf_dir [n_reps]]
     (defaults /tmp/lagom_kinesis_spark/scale/sf1, 3)
Child mode: --child SHAPE PROVIDER SF_DIR   (steady-state timing)
            --breakdown SHAPE SF_DIR        (progress decomposition)
Writes .bench/ab_stream_state_r13.json
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

OUT = os.path.join(HERE, "ab_stream_state_r13.json")
ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)
HASHMAP = (
    "org.apache.spark.sql.execution.streaming.state."
    "HashMapStateStoreProvider"
)


def child(shape: str, provider: str, sf_dir: str) -> None:
    import bench
    from lagom_kinesis_spark.session import get_spark

    spark = get_spark(f"ab-stream-state-{shape}-{provider}")
    if provider == "rocksdb":
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass", ROCKSDB
        )
    os.environ["SPARK_GRAFT_STREAM_UNLOAD"] = "0"
    rec = bench._stream_steady_state(spark, sf_dir, shape=shape)
    rec["provider"] = provider
    print(json.dumps(rec))


def breakdown(shape: str, sf_dir: str) -> None:
    """Per-batch duration decomposition from StreamingQueryProgress."""
    import shutil
    import time
    import uuid as _uuid

    from pyspark.sql import functions as F

    from lagom_kinesis_spark.catalog import io_scratch, load, normalize_event_ts
    from lagom_kinesis_spark.queries.streaming_ops import (
        stream_shuffle_partitions,
    )
    from lagom_kinesis_spark.session import get_spark

    spark = get_spark(f"stream-breakdown-{shape}")
    os.environ["SPARK_GRAFT_STREAM_UNLOAD"] = "0"
    n_chunks = 8
    root = io_scratch("steady", sf_dir, source="events")
    chunk_dir = os.path.join(root, f"chunks{n_chunks}")
    if not os.path.exists(os.path.join(chunk_dir, "_SUCCESS")):
        shutil.rmtree(chunk_dir, ignore_errors=True)
        load(spark, sf_dir, "events").repartition(n_chunks).write.mode(
            "overwrite"
        ).parquet(chunk_dir)
    schema = spark.read.parquet(chunk_dir).schema
    spark.conf.set(
        "spark.sql.shuffle.partitions",
        str(
            stream_shuffle_partitions(
                sf_dir, state="small" if shape == "tumbling" else "large"
            )
        ),
    )
    s = normalize_event_ts(
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(chunk_dir)
    )
    if shape == "session":
        agg = s.groupBy(F.session_window("ts", "5 minutes"), "user_id").agg(
            F.count("*").alias("n_events")
        )
        mode = "complete"
    else:
        agg = s.groupBy(F.window("ts", "5 minutes"), "event_type").agg(
            F.count("*").alias("n"), F.sum("value").alias("total_value")
        )
        mode = "update"
    ckpt = os.path.join(root, "ckpt", _uuid.uuid4().hex[:12])
    q = (
        agg.writeStream.format("noop")
        .outputMode(mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
        # allow the last progress event to flush
        time.sleep(0.5)
        progress = [json.loads(p.json) for p in q.recentProgress]
    finally:
        q.stop()
        shutil.rmtree(ckpt, ignore_errors=True)
    batches = []
    for p in progress:
        if p.get("numInputRows", 0) == 0 and not p.get("stateOperators"):
            continue
        d = p.get("durationMs", {})
        so = (p.get("stateOperators") or [{}])[0]
        batches.append(
            {
                "batchId": p.get("batchId"),
                "numInputRows": p.get("numInputRows"),
                "durationMs": d,
                "state": {
                    k: so.get(k)
                    for k in (
                        "operatorName",
                        "numRowsTotal",
                        "numRowsUpdated",
                        "commitTimeMs",
                        "stateMemory",
                    )
                },
            }
        )
    keys = sorted({k for b in batches for k in b["durationMs"]})
    mean = {
        k: round(
            sum(b["durationMs"].get(k, 0) for b in batches) / max(1, len(batches)),
            1,
        )
        for k in keys
    }
    print(
        json.dumps(
            {
                "shape": shape,
                "n_batches": len(batches),
                "mean_durationMs": mean,
                "mean_state_commit_ms": round(
                    sum(b["state"].get("commitTimeMs") or 0 for b in batches)
                    / max(1, len(batches)),
                    1,
                ),
                "batches": batches,
            }
        )
    )


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(sys.argv[2], sys.argv[3], sys.argv[4])
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--breakdown":
        breakdown(sys.argv[2], sys.argv[3])
        return
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else (
        "/tmp/lagom_kinesis_spark/scale/sf1"
    )
    n_reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    import bench

    out: dict = {
        "probe_pre": bench._contention_probe(),
        "sf_dir": sf_dir,
        "provider_ab": {},
        "commit_breakdown": {},
    }
    for shape in ("tumbling", "session"):
        runs: dict[str, list[dict]] = {"hashmap": [], "rocksdb": []}
        for rep in range(n_reps):
            for provider in ("hashmap", "rocksdb"):
                proc = subprocess.run(
                    [
                        sys.executable,
                        os.path.abspath(__file__),
                        "--child",
                        shape,
                        provider,
                        sf_dir,
                    ],
                    capture_output=True,
                    text=True,
                    check=True,
                )
                rec = json.loads(proc.stdout.strip().splitlines()[-1])
                runs[provider].append(rec)
                print(
                    f"# {shape} rep{rep} {provider}: amortized "
                    f"{rec['amortized_one_batch_s']}s marginal "
                    f"{rec['marginal_batch_s']}s",
                    file=sys.stderr,
                    flush=True,
                )
        out["provider_ab"][shape] = {
            "runs": runs,
            "min_amortized_s": {
                k: min(r["amortized_one_batch_s"] for r in v)
                for k, v in runs.items()
            },
            "min_marginal_s": {
                k: min(r["marginal_batch_s"] for r in v)
                for k, v in runs.items()
            },
        }
        proc = subprocess.run(
            [
                sys.executable,
                os.path.abspath(__file__),
                "--breakdown",
                shape,
                sf_dir,
            ],
            capture_output=True,
            text=True,
            check=True,
        )
        out["commit_breakdown"][shape] = json.loads(
            proc.stdout.strip().splitlines()[-1]
        )
        print(
            f"# {shape} breakdown: "
            f"{out['commit_breakdown'][shape]['mean_durationMs']}",
            file=sys.stderr,
            flush=True,
        )
    out["probe_post"] = bench._contention_probe()
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
