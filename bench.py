"""Benchmark runner (driver protocol, BASELINE.md §3).

Runs the headline query suite at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": <total sec>, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced with a full collect-free action (count of the result)
so we measure execution, not result serialization to the driver.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "flagship_revenue_by_nation",
    "agg_pricing_summary",
    "agg_count_distinct_multi",
    "join_multiway",
    "join_broadcast_dims",
    "join_asof",
    "win_topk_per_group",
    "win_running_total",
    "sort_multikey_rownum",
    "dedup_exact",
    "dedup_minhash_lsh",
    "sim_topk_cosine",
    "text_top_tokens",
    "text_tfidf",
    "stream_tumbling_window",
    "stream_session_window",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    from lagom_kinesis_spark.registry import all_queries
    from lagom_kinesis_spark.session import get_spark

    spark = get_spark("lagom-kinesis-spark-bench")
    qs = all_queries()
    # Warm the JVM/codegen path outside the timed region.
    spark.range(1000).selectExpr("sum(id)").collect()

    times: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        fn = qs[name].fn
        t0 = time.time()
        df = fn(spark, sf_dir)
        n = df.count()
        dt = round(time.time() - t0, 3)
        times[name] = dt
        total += dt
        print(f"# {name}: {dt}s ({n} rows)", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "headline_suite_wallclock",
                "value": round(total, 3),
                "unit": "sec",
                "queries": times,
                "sf": float(sf),
            }
        )
    )


if __name__ == "__main__":
    main()
