"""r12 A/B: shuffle/IO compression codec lz4 (default) vs zstd
(optimization guide §2.3 "Compression ... there is no universal answer —
measure").

``spark.io.compression.codec`` is a STATIC conf, so every timed run is
its own process (cold-interleaved l-z-l-z-l-z per query): the child
builds a session identical to lagom_kinesis_spark.session.get_spark
plus the codec override, runs ONE query cold against the sf1 fixture
through the noop sink, and prints the seconds. Queries: the four
biggest shufflers in the registry (sort+window exchange, multi-distinct
expand, multiway join, LSH band-key shuffle).

Run: python .bench/ab_shuffle_codec_r12.py [n_reps [sf_dir]]
(defaults 3, /tmp/lagom_kinesis_spark/scale/sf1; writes
.bench/ab_shuffle_codec_r12.json)
Child mode (internal): --child CODEC QUERY SF_DIR
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

OUT = os.path.join(HERE, "ab_shuffle_codec_r12.json")
QUERIES = (
    "win_running_total",
    "agg_count_distinct_multi",
    "join_multiway",
    "dedup_minhash_lsh",
)


def child(codec: str, query: str, sf_dir: str) -> None:
    from pyspark.sql import SparkSession

    from lagom_kinesis_spark.registry import all_queries
    from lagom_kinesis_spark.session import (
        RUNTIME_CONFS,
        _gc_stale_local_dirs,
        tune,
    )

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"ab-codec-{codec}-{query}")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.io.compression.codec", codec)  # the A/B variable
    )
    # same tmpfs shuffle-dir policy as get_spark (matters for shuffle cost)
    shm = "/dev/shm"
    min_free = int(os.environ.get("SPARK_GRAFT_SHM_MIN_FREE_GB", "16")) << 30
    if os.path.isdir(shm) and os.access(shm, os.W_OK):
        try:
            st = os.statvfs(shm)
            if st.f_bavail * st.f_frsize >= min_free:
                local_root = f"{shm}/spark-local"
                _gc_stale_local_dirs(local_root)
                builder = builder.config("spark.local.dir", local_root)
        except OSError:
            pass
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    spark = tune(builder.getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    assert spark.conf.get("spark.io.compression.codec") == codec

    fn = all_queries()[query].fn
    spark.sparkContext.setJobDescription(f"ab-codec:{codec}:{query}")
    t0 = time.time()
    fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
    t = round(time.time() - t0, 3)
    print(json.dumps({"codec": codec, "query": query, "s": t}))


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(sys.argv[2], sys.argv[3], sys.argv[4])
        return
    n_reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/lagom_kinesis_spark/scale/sf1"

    import bench

    out = {
        "sf_dir": sf_dir,
        "n_reps": n_reps,
        "probe_pre": bench._contention_probe(),
        "queries": {},
    }
    for query in QUERIES:
        runs: dict[str, list[float]] = {"lz4": [], "zstd": []}
        for rep in range(n_reps):
            for codec in ("lz4", "zstd"):
                proc = subprocess.run(
                    [
                        sys.executable,
                        os.path.abspath(__file__),
                        "--child",
                        codec,
                        query,
                        sf_dir,
                    ],
                    capture_output=True,
                    text=True,
                    check=True,
                )
                rec = json.loads(proc.stdout.strip().splitlines()[-1])
                runs[codec].append(rec["s"])
                print(f"# {query} rep{rep} {codec}: {rec['s']}s",
                      file=sys.stderr, flush=True)
        out["queries"][query] = {
            "runs_s": runs,
            "min_s": {k: min(v) for k, v in runs.items()},
        }
    out["probe_post"] = bench._contention_probe()
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
