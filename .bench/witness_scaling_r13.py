"""r13 (VERDICT r12 ask #2): pick & prove the core-scaling witness row.

The driver's 8-vs-32-core probe read ~1.0 for every headline row because
the sf0.1 tier is job-floor-bound — the harness could not distinguish
"honors cores" from "serial". This measures candidate CPU-heavy
registered queries at SPARK_GRAFT_CPUS=32 vs 8 (fresh process per run,
noop sink, warm + best-of-2) and records the ratio; the winner joins the
headline suite as `scaling witness` so the next PERF scaling block has a
row that tracks the core count.

Run: python .bench/witness_scaling_r13.py [query ...]
Writes .bench/witness_scaling_r13.json
Child mode: --child QUERY CPUS
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

OUT = os.path.join(HERE, "witness_scaling_r13.json")
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DEFAULT_CANDIDATES = [
    "dedup_semantic_semdedup",
    "text_levenshtein_knn",
    "dedup_embedding_cosine",
]


def child(qname: str) -> None:
    from lagom_kinesis_spark.registry import all_queries
    from lagom_kinesis_spark.session import get_spark

    spark = get_spark(f"witness-{qname}")
    fn = all_queries()[qname].fn

    def force() -> None:
        fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()

    force()  # warm
    best = float("inf")
    for _ in range(2):
        try:
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()  # noqa: SLF001
        except Exception:
            pass
        t0 = time.time()
        force()
        best = min(best, time.time() - t0)
    print(json.dumps({"q": qname, "cpus": os.environ.get("SPARK_GRAFT_CPUS"),
                      "s": round(best, 3)}))


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(sys.argv[2])
        return
    candidates = sys.argv[1:] or DEFAULT_CANDIDATES

    import bench

    # merge-update: candidate sweeps run in batches; a later batch must
    # extend the artifact, not overwrite the earlier candidates' rows.
    out: dict = {"sf_dir": SF_DIR, "queries": {}}
    if os.path.exists(OUT):
        try:
            with open(OUT) as f:
                out = json.load(f)
        except ValueError:
            pass
    out["probe_pre"] = bench._contention_probe()
    out.setdefault("queries", {})
    for qname in candidates:
        rec: dict = {}
        for cpus in ("32", "8"):
            env = dict(os.environ)
            env["SPARK_GRAFT_CPUS"] = cpus
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child", qname],
                capture_output=True, text=True, env=env, check=True,
            )
            r = json.loads(proc.stdout.strip().splitlines()[-1])
            rec[f"s_c{cpus}"] = r["s"]
            print(f"# {qname} cpus={cpus}: {r['s']}s", file=sys.stderr,
                  flush=True)
        rec["ratio_8_over_32"] = round(rec["s_c8"] / rec["s_c32"], 2)
        out["queries"][qname] = rec
    out["probe_post"] = bench._contention_probe()
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
