"""r13 A/B (VERDICT r12 ask #1): dedup_semantic_semdedup's r12 salted-SMJ
plan vs the r11 broadcast plan at sf1/sf10 — the one r12 optimization
whose scale win was asserted by OOM class (the minhash probe) instead of
measured on THIS query.

Arms:
- old: the r11 body verbatim (snapshot 6697ac8) — unhinted join on
  ``cluster``; the planner broadcasts the cached (vec_id, embedding,
  cluster) corpus (its stats come from the compressed scan, ~100x under),
  so the quadratic cosine stage runs on the scan partitioning with no
  shuffle to re-spread it.
- new: the registered query (merge hint + salted (cluster, id_a % R) key
  with pinned numbered repartitions).

Protocol (the CC r12 evidential protocol): EACH TIMED RUN IS ITS OWN
PROCESS (same-session reps poison each other via accumulated JVM state),
arms interleaved old/new x n_reps per tier, noop-sink forcing, output
rows collected once per arm and asserted identical across every run,
contention probes around the whole sweep.

Run: python .bench/ab_semdedup_scale_r13.py [n_reps_sf1 [n_reps_sf10]]
     (defaults 3 and 2; writes .bench/ab_semdedup_scale_r13.json)
Child mode (internal): --child {old,new} SF_DIR
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

OUT = os.path.join(HERE, "ab_semdedup_scale_r13.json")
TIERS = {
    "sf1": "/tmp/lagom_kinesis_spark/scale/sf1",
    "sf10": "/tmp/lagom_kinesis_spark/scale/sf10",
}


def old_arm(spark, sf_dir):
    """r11 dedup_semantic_semdedup, verbatim from snapshot 6697ac8."""
    from pyspark.sql import functions as F

    from lagom_kinesis_spark.catalog import load
    from lagom_kinesis_spark.functions import fan_out, r6
    from lagom_kinesis_spark.operators.similarity import (
        centroid_rank,
        cosine,
        md5_sample_matrix,
    )

    e = fan_out(load(spark, sf_dir, "embeddings"))
    C = md5_sample_matrix(e, 8)
    assigned = e.select(
        "vec_id", "embedding", centroid_rank(C)[0]["cid"].alias("cluster")
    ).persist()
    a = assigned.select(
        "cluster", F.col("vec_id").alias("id_a"), F.col("embedding").alias("va")
    )
    b = assigned.select(
        "cluster", F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb")
    )
    dups = (
        a.join(b, "cluster")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(r6(cosine(F.col("va"), F.col("vb"))) >= 0.35)
        .select("cluster", F.col("id_b").alias("vec_id"))
        .distinct()
        .withColumn("is_dup", F.lit(1))
    )
    return (
        assigned.join(dups, ["cluster", "vec_id"], "left")
        .groupBy("cluster")
        .agg(
            F.count("*").alias("n_vectors"),
            F.count("is_dup").alias("n_dups"),
            r6(F.count("is_dup") / F.count("*").cast("double")).alias(
                "dup_share"
            ),
        )
    )


def child(arm: str, sf_dir: str) -> None:
    from lagom_kinesis_spark.registry import all_queries
    from lagom_kinesis_spark.session import get_spark

    spark = get_spark(f"ab-semdedup-{arm}")
    qs = all_queries()
    fn = old_arm if arm == "old" else qs["dedup_semantic_semdedup"].fn
    spark.sparkContext.setJobDescription(f"ab-semdedup:{arm}")
    t0 = time.time()
    df = fn(spark, sf_dir)
    df.write.mode("overwrite").format("noop").save()
    t = round(time.time() - t0, 3)
    rows = sorted(tuple(r) for r in df.collect())
    print(json.dumps({"arm": arm, "s": t, "rows": rows}))


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(sys.argv[2], sys.argv[3])
        return
    n_sf1 = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    n_sf10 = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    import bench

    out: dict = {"probe_pre": bench._contention_probe(), "tiers": {}}
    for tier, sf_dir in TIERS.items():
        n_reps = n_sf1 if tier == "sf1" else n_sf10
        bench._thermal_gate()
        runs: dict[str, list] = {"old": [], "new": []}
        errors: dict[str, list] = {"old": [], "new": []}
        rowsets: dict[str, list] = {}
        for rep in range(n_reps):
            for arm in ("old", "new"):
                proc = subprocess.run(
                    [
                        sys.executable,
                        os.path.abspath(__file__),
                        "--child",
                        arm,
                        sf_dir,
                    ],
                    capture_output=True,
                    text=True,
                )
                if proc.returncode != 0:
                    tail = proc.stderr.strip().splitlines()[-8:]
                    errors[arm].append(
                        {"rep": rep, "rc": proc.returncode, "stderr": tail}
                    )
                    print(f"# {tier} rep{rep} {arm}: FAILED rc="
                          f"{proc.returncode}", file=sys.stderr, flush=True)
                    continue
                rec = json.loads(proc.stdout.strip().splitlines()[-1])
                runs[arm].append(rec["s"])
                rowsets.setdefault(arm, rec["rows"])
                assert rec["rows"] == rowsets[arm], f"{arm} rows drifted"
                print(f"# {tier} rep{rep} {arm}: {rec['s']}s",
                      file=sys.stderr, flush=True)
        if "old" in rowsets and "new" in rowsets:
            assert rowsets["old"] == rowsets["new"], (
                "arms disagree on output rows"
            )
        out["tiers"][tier] = {
            "n_reps": n_reps,
            "runs_s": runs,
            "min_s": {
                k: (round(min(v), 3) if v else None) for k, v in runs.items()
            },
            "errors": errors,
            "rows_equal": (
                rowsets.get("old") == rowsets.get("new")
                if "old" in rowsets and "new" in rowsets
                else None
            ),
            "n_out_rows": len(next(iter(rowsets.values()), [])),
        }
    out["probe_post"] = bench._contention_probe()
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
