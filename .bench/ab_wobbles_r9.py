"""r9: characterize the three r8 headline wobbles under the DRIVER
protocol (bench._time_spark — warm-to-stable + best-of-3, noop force,
GC nudge between queries) with 3 independent repetitions in one process,
interleaved with DuckDB mirrors."""
import os
import sys

sys.path.insert(0, "/root/repo")
os.environ["SPARK_GRAFT_GC_NUDGE"] = "0"
os.environ["SPARK_GRAFT_STREAM_UNLOAD"] = "0"

import bench
from lagom_kinesis_spark.registry import all_queries
from lagom_kinesis_spark.session import get_spark

SF = "/root/testdata/sf0.1"
NAMES = ["join_asof", "win_topk_per_group", "dedup_minhash_lsh"]
spark = get_spark("ab-wobbles")
spark.sparkContext.setLogLevel("ERROR")
qs = all_queries()

for rep in range(3):
    t, _tel = bench._time_spark(qs, spark, NAMES, SF)  # r13: returns (times, telemetry)
    try:
        d = bench._time_duck(qs, NAMES, SF)
    except Exception as e:
        d = {"err": str(e)}
    print(f"rep{rep}: spark={t} duck={d}", flush=True)
