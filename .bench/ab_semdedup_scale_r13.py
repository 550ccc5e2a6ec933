"""r13 A/B (VERDICT r12 ask #1): dedup_semantic_semdedup at sf1/sf10 —
the one r12 optimization whose scale win was asserted by OOM class
instead of measured on THIS query. Measuring it found a REAL regression
and led to a redesign this round:

Arms:
- old:     the r11 body verbatim (snapshot 6697ac8) — unhinted join on
           ``cluster``; the planner broadcasts the cached corpus (stats
           ~100x under from the compressed scan). Fast locally, the OOM
           class at real scale (r12 broadcast audit).
- r12salt: the r12 body — merge hint + 1-D salt (cluster, id_a % R),
           R = partitions // k. MEASURED LOSING 2x at sf1 (62-67 s vs
           ~30 s old): k*R = |partitions| distinct keys hash into the
           partitions and balls-in-bins idles ~1/3 of them (guide §2.5).
           Exploration gradient (fresh process per run): R=4 62.0 s,
           R=16 50.1 s, R=64 33.1 s — balance improves with key count,
           but 1-D pays R-fold replication for it.
- new:     the r13 registered query — 2-D BLOCK salt: a-side fixed
           bi=id_a%m + exploded bj, b-side fixed bj=id_b%m + exploded
           bi, join (cluster,bi,bj); keys k*m^2 grow quadratically,
           replication m per side grows linearly. m =
           ceil(sqrt(64*partitions/k)) -> m=1 (zero overhead) once
           k >= 64*partitions (any production capacity-bounded
           quantizer). Exploration: m=8 37.9-38.1 s, m=16 32.5 s.

Protocol: EACH TIMED RUN IS ITS OWN PROCESS, arms interleaved per rep,
noop-sink forcing, output rows asserted identical across every run,
contention probes around the sweep.

Run: python .bench/ab_semdedup_scale_r13.py            (sf1, 2 reps x 3 arms)
     python .bench/ab_semdedup_scale_r13.py --sf10     (sf10, 1 rep x old,new)
Child mode (internal): --child {old,r12salt,new} SF_DIR
Writes/merges .bench/ab_semdedup_scale_r13.json
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

OUT = os.path.join(HERE, "ab_semdedup_scale_r13.json")
SF1 = "/tmp/lagom_kinesis_spark/scale/sf1"
SF10 = "/tmp/lagom_kinesis_spark/scale/sf10"


def _common(spark, sf_dir):
    from pyspark.sql import functions as F

    from lagom_kinesis_spark.catalog import load
    from lagom_kinesis_spark.functions import fan_out
    from lagom_kinesis_spark.operators.similarity import (
        centroid_rank,
        md5_sample_matrix,
    )

    e = fan_out(load(spark, sf_dir, "embeddings"))
    C = md5_sample_matrix(e, 8)
    assigned = e.select(
        "vec_id", "embedding", centroid_rank(C)[0]["cid"].alias("cluster")
    ).persist()
    return F, assigned


def _finish(F, assigned, joined):
    from lagom_kinesis_spark.functions import r6
    from lagom_kinesis_spark.operators.similarity import cosine

    dups = (
        joined.filter(F.col("id_a") < F.col("id_b"))
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


def old_arm(spark, sf_dir):
    """r11 verbatim: unhinted join on cluster (broadcast at local tiers)."""
    F, assigned = _common(spark, sf_dir)
    a = assigned.select("cluster", F.col("vec_id").alias("id_a"),
                        F.col("embedding").alias("va"))
    b = assigned.select("cluster", F.col("vec_id").alias("id_b"),
                        F.col("embedding").alias("vb"))
    return _finish(F, assigned, a.join(b, "cluster"))


def r12salt_arm(spark, sf_dir):
    """r12 verbatim: merge hint + 1-D salt, R = partitions // k."""
    F, assigned = _common(spark, sf_dir)
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    R = max(1, n_parts // 8)
    a = assigned.select(
        "cluster", F.col("vec_id").alias("id_a"),
        F.col("embedding").alias("va"),
        (F.col("vec_id") % R).alias("salt"),
    ).repartition(n_parts, "cluster", "salt")
    b = (
        assigned.select("cluster", F.col("vec_id").alias("id_b"),
                        F.col("embedding").alias("vb"))
        .withColumn("salt", F.explode(F.array(*[F.lit(i) for i in range(R)])))
        .repartition(n_parts, "cluster", "salt")
    )
    return _finish(F, assigned, a.join(b.hint("merge"), ["cluster", "salt"]))


def child(arm: str, sf_dir: str) -> None:
    from lagom_kinesis_spark.registry import all_queries
    from lagom_kinesis_spark.session import get_spark

    spark = get_spark(f"ab-semdedup-{arm}")
    if arm == "new":
        qs = all_queries()
        fn = qs["dedup_semantic_semdedup"].fn
    else:
        fn = {"old": old_arm, "r12salt": r12salt_arm}[arm]
    spark.sparkContext.setJobDescription(f"ab-semdedup:{arm}")
    t0 = time.time()
    df = fn(spark, sf_dir)
    df.write.mode("overwrite").format("noop").save()
    t = round(time.time() - t0, 3)
    rows = sorted(tuple(r) for r in df.collect())
    print(json.dumps({"arm": arm, "s": t, "rows": rows}))


def sweep(sf_dir: str, arms: tuple, n_reps: int, tier: str) -> None:
    import bench

    out: dict = {}
    if os.path.exists(OUT):
        try:
            with open(OUT) as f:
                out = json.load(f)
        except ValueError:
            pass
    rec: dict = {
        "probe_pre": bench._contention_probe(),
        "arms": list(arms),
        "n_reps": n_reps,
        "runs_s": {a: [] for a in arms},
        "errors": {a: [] for a in arms},
    }
    rowsets: dict = {}
    for rep in range(n_reps):
        for arm in arms:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child", arm,
                 sf_dir],
                capture_output=True, text=True,
            )
            if proc.returncode != 0:
                tail = proc.stderr.strip().splitlines()[-8:]
                rec["errors"][arm].append(
                    {"rep": rep, "rc": proc.returncode, "stderr": tail}
                )
                print(f"# {tier} rep{rep} {arm}: FAILED rc={proc.returncode}",
                      file=sys.stderr, flush=True)
                continue
            r = json.loads(proc.stdout.strip().splitlines()[-1])
            rec["runs_s"][arm].append(r["s"])
            rowsets.setdefault(arm, r["rows"])
            assert r["rows"] == rowsets[arm], f"{arm} rows drifted"
            print(f"# {tier} rep{rep} {arm}: {r['s']}s", file=sys.stderr,
                  flush=True)
    vals = list(rowsets.values())
    rec["rows_equal_across_arms"] = all(v == vals[0] for v in vals)
    assert rec["rows_equal_across_arms"], "arms disagree on output rows"
    rec["n_out_rows"] = len(vals[0]) if vals else 0
    rec["min_s"] = {
        a: (round(min(v), 3) if v else None) for a, v in rec["runs_s"].items()
    }
    rec["probe_post"] = bench._contention_probe()
    out.setdefault("tiers", {})[tier] = rec
    out["exploration_note"] = (
        "1-D salt gradient @ sf1 (fresh process each): R=4 62.0s, R=16 "
        "50.1s, R=64 33.1/32.7s; bare merge (R=1, 8 keys) 121.5s. 2-D "
        "block gradient: m=8 38.1/37.9s, m=16 32.5/35.5s. Broadcast "
        "26.3-26.5s. Key-count balance (balls-in-bins, guide §2.5) is "
        "the lever; 2-D buys it at linear replication."
    )
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(rec["min_s"]))


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(sys.argv[2], sys.argv[3])
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--sf10":
        sweep(SF10, ("old", "new"), 1, "sf10")
        return
    sweep(SF1, ("old", "r12salt", "new"), 2, "sf1")


if __name__ == "__main__":
    main()
