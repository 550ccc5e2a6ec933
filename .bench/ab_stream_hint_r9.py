"""r9 interleaved A/B: volume-aware stream partitions (hint=8 at sf0.1)
vs the r4 pin (4), on the REGISTERED queries under the bench timing
protocol (warm-to-stable + best-of-3, noop-forced via collect-free sink).
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ["SPARK_GRAFT_STREAM_UNLOAD"] = "0"
os.environ["SPARK_GRAFT_GC_NUDGE"] = "0"

from lagom_kinesis_spark.queries import streaming_ops as so
from lagom_kinesis_spark.registry import all_queries
from lagom_kinesis_spark.session import get_spark

SF = "/root/testdata/sf0.1"
spark = get_spark("ab-stream-hint")
spark.sparkContext.setLogLevel("ERROR")
qs = all_queries()

orig = so.stream_shuffle_partitions


def timed(name):
    t0 = time.time()
    qs[name].fn(spark, SF).collect()
    return time.time() - t0


res = {}
for name in ["stream_tumbling_window", "stream_session_window"]:
    for conf in ["4", "hint"]:
        so.stream_shuffle_partitions = (
            orig if conf == "hint" else (lambda sf_dir: 4)
        )
        timed(name)  # warm
    best = {"4": [], "hint": []}
    for _ in range(4):
        for conf in ["4", "hint"]:
            so.stream_shuffle_partitions = (
                orig if conf == "hint" else (lambda sf_dir: 4)
            )
            best[conf].append(timed(name))
    res[name] = {c: round(min(v), 3) for c, v in best.items()}
    print(name, res[name], {c: [round(x, 3) for x in v] for c, v in best.items()})
