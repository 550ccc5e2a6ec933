"""r12 A/B (CC-only, sf10, fresh-process interleave): pre- vs
post-co-partitioning connected_components (guide §2.4).

Same two arms as ab_cc_only_r12.py (cc_old = mid-r12 6f85c92 verbatim;
new = the registered operator), but EACH TIMED RUN IS ITS OWN PROCESS:
same-session reps poison each other at sf10 — accumulated
localCheckpoint blocks drove both arms monotonically slower across reps
(old 13.8→46.2 s, new 8.7→179.3 s in one session) — so the evidential
protocol is one arm per process over a pre-materialized pair parquet,
interleaved old/new ×N.

Run: python .bench/ab_cc_fresh_r12.py [n_reps]   (default 3; writes the
"fresh_process_sf10" section of .bench/ab_cc_copart_r12.json)
Child mode (internal): --child {old,new} PAIRS_DIR
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))
sys.path.insert(0, HERE)

OUT = os.path.join(HERE, "ab_cc_copart_r12.json")
SF10 = "/tmp/lagom_kinesis_spark/scale/sf10"


def child(arm: str, pairs_dir: str) -> None:
    from pyspark.sql import functions as F

    from ab_cc_only_r12 import cc_old  # noqa: F401 (sibling probe module)
    from lagom_kinesis_spark.operators.components import connected_components
    from lagom_kinesis_spark.session import get_spark

    spark = get_spark(f"ab-cc-fresh-{arm}")
    fn = cc_old if arm == "old" else connected_components
    pairs = spark.read.parquet(pairs_dir)
    spark.sparkContext.setJobDescription(f"ab-cc-fresh:{arm}")
    t0 = time.time()
    cc = fn(pairs)
    n_nodes = cc.count()
    t = round(time.time() - t0, 3)
    n_clusters = cc.agg(F.countDistinct("cluster_id")).collect()[0][0]
    print(
        json.dumps(
            {"arm": arm, "s": t, "n_nodes": n_nodes, "n_clusters": n_clusters}
        )
    )


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(sys.argv[2], sys.argv[3])
        return
    n_reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3

    import bench
    from ab_cc_only_r12 import ensure_pairs, merge_out
    from lagom_kinesis_spark.session import get_spark

    out = {"probe_pre": bench._contention_probe(), "n_reps": n_reps}
    spark = get_spark("ab-cc-fresh-prep")
    pairs_dir = ensure_pairs(spark, "sf10", SF10)
    out["n_pairs"] = spark.read.parquet(pairs_dir).count()
    spark.stop()  # free the JVM before any child is timed

    runs: dict[str, list[float]] = {"old": [], "new": []}
    cards = set()
    for rep in range(n_reps):
        for arm in ("old", "new"):
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child", arm, pairs_dir],
                capture_output=True,
                text=True,
                check=True,
            )
            rec = json.loads(proc.stdout.strip().splitlines()[-1])
            runs[arm].append(rec["s"])
            cards.add((rec["n_nodes"], rec["n_clusters"]))
            print(f"# rep{rep} {arm}: {rec}", file=sys.stderr, flush=True)
    assert len(cards) == 1, f"arms disagree on cardinalities: {cards}"
    out["n_nodes"], out["n_clusters"] = next(iter(cards))
    out["runs_s"] = runs
    out["min_s"] = {k: round(min(v), 3) for k, v in runs.items()}
    out["probe_post"] = bench._contention_probe()
    merge_out("fresh_process_sf10", out)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
