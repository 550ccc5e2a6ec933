"""r12 A/B (CC-only, small tiers): pre- vs post-co-partitioning
connected_components over identical pre-materialized pair parquets
(optimization guide §2.4 "two operations keyed the same way share one
exchange").

``cc_old`` below is the round-12 MID implementation verbatim (commit
6f85c92: fixpoint-fold landed, co-partitioned checkpoint layouts not
yet): edges/labels checkpoint with whatever partitioning the planner
leaves, so every iteration re-exchanges the edge list and the label
table. ``connected_components`` (imported) is the registered operator:
hash(src)/hash(id)+sorted layouts ride inside the checkpoints and each
iteration plans exactly ONE shuffle.

Protocol: per tier, materialize the LSH-verified pairs to parquet once
(both arms read identical input; pair generation is not timed), then
same-session interleave old/new, 1 warm-up + N timed reps each. Label
outputs are checked identical (exceptAll both ways == 0) before timing.
Same-session reps are fine at sf0.1/sf1; sf10 needs fresh processes
(accumulated localCheckpoint blocks poison later reps — see
ab_cc_fresh_r12.py and BENCH_NOTES).

Run: python .bench/ab_cc_only_r12.py [n_reps]   (default 4; writes the
"same_session_tiers" section of .bench/ab_cc_copart_r12.json)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

import bench  # noqa: E402
from lagom_kinesis_spark.catalog import load  # noqa: E402
from lagom_kinesis_spark.operators.components import (  # noqa: E402
    connected_components,
)
from lagom_kinesis_spark.operators.text import shingles, tokens  # noqa: E402
from lagom_kinesis_spark.queries.llm_ops import lsh_verified_pairs  # noqa: E402
from lagom_kinesis_spark.session import get_spark  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "ab_cc_copart_r12.json")
PAIRS_ROOT = "/tmp/lagom_kinesis_spark/ab_cc_pairs"


def cc_old(
    pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b", max_iter: int = 20
) -> DataFrame:
    """Verbatim mid-r12 operator (6f85c92) — fixpoint fold, NO co-partition."""
    fwd = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    edges = (
        fwd.unionByName(
            fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
        .localCheckpoint()
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        nbr_min = (
            edges.join(labels, edges.src == labels.id)
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("label").alias("nbr_label"))
        )
        new_label = F.least(
            F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
        )
        new_labels = (
            labels.join(nbr_min, "id", "left")
            .select(
                "id",
                new_label.alias("new_label"),
                (new_label < F.col("label")).alias("chg"),
            )
            .withColumnRenamed("new_label", "label")
            .localCheckpoint()
        )
        changed = new_labels.filter("chg").count()
        labels = new_labels.select("id", "label")
        if changed == 0:
            break
    else:
        raise RuntimeError("cc_old did not converge")
    return labels.select("id", F.col("label").alias("cluster_id"))


def ensure_pairs(spark, tier: str, sf_dir: str) -> str:
    """Materialize the LSH-verified pair set once per tier (idempotent)."""
    path = f"{PAIRS_ROOT}/{tier}"
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        d = load(spark, sf_dir, "documents")
        sub = (
            d.select("doc_id", shingles(tokens("text")).alias("sh"))
            .filter(F.size("sh") > 0)
            .repartition(32)
            .persist()
        )
        lsh_verified_pairs(sub, 0.8).select("id_a", "id_b").write.mode(
            "overwrite"
        ).parquet(path)
        sub.unpersist()
    return path


def merge_out(section: str, payload: dict) -> None:
    data = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            data = json.load(f)
    data[section] = payload
    with open(OUT, "w") as f:
        json.dump(data, f, indent=1)


def main() -> None:
    n_reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = get_spark("ab-cc-only-r12")
    tiers = {
        "sf0.1": "/root/testdata/sf0.1",
        "sf1": "/tmp/lagom_kinesis_spark/scale/sf1",
    }
    out = {"probe_pre": bench._contention_probe(), "n_reps": n_reps, "tiers": {}}
    for tier, sf_dir in tiers.items():
        if not os.path.exists(sf_dir):
            continue
        pairs_path = ensure_pairs(spark, tier, sf_dir)
        pairs = spark.read.parquet(pairs_path)
        # correctness: identical (id, cluster_id) either way
        a, b = cc_old(pairs), connected_components(pairs)
        assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
        res = {
            "n_pairs": pairs.count(),
            "n_nodes": b.count(),
            "n_clusters": b.agg(F.countDistinct("cluster_id")).collect()[0][0],
            "runs_s": {"old": [], "new": []},
        }
        for rep in range(1 + n_reps):  # rep 0 = warm-up
            for label, fn in (("old", cc_old), ("new", connected_components)):
                spark.catalog.clearCache()
                spark.sparkContext._jvm.System.gc()  # noqa: SLF001
                spark.sparkContext.setJobDescription(f"ab-cc:{tier}:{label}:{rep}")
                p = spark.read.parquet(pairs_path)
                t0 = time.time()
                cc = fn(p)
                n = cc.count()
                t = round(time.time() - t0, 3)
                spark.sparkContext.setJobDescription(None)
                assert n == res["n_nodes"], (label, n)
                if rep > 0:
                    res["runs_s"][label].append(t)
                print(f"# {tier} rep{rep} {label}: {t}s", file=sys.stderr, flush=True)
        res["min_s"] = {k: min(v) for k, v in res["runs_s"].items()}
        out["tiers"][tier] = res
    out["probe_post"] = bench._contention_probe()
    merge_out("same_session_tiers", out)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
