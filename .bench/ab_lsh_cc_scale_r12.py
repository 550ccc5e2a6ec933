"""Scale evidence for dedup_clusters_lsh's full-scale arm (round 12):
time ONLY the LSH arm (lsh_verified_pairs → connected_components) at
sf0.1 and sf1 — the exact all-pairs arm exists solely as the sampled
sf0.01 agreement audit and is quadratic-infeasible at 50k+ docs, which
is exactly why the LSH arm is the one that ships. No DuckDB baseline
(the oracle is the quadratic closure); the recorded quantity is the
Spark seconds trend vs corpus size plus pair/cluster cardinalities.

Usage: python .bench/ab_lsh_cc_scale_r12.py [out.json]
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

import bench
from lagom_kinesis_spark.catalog import load
from lagom_kinesis_spark.operators.components import connected_components
from lagom_kinesis_spark.operators.text import shingles, tokens
from lagom_kinesis_spark.queries.llm_ops import lsh_verified_pairs
from lagom_kinesis_spark.session import get_spark

OUT = sys.argv[1] if len(sys.argv) > 1 else ".bench/ab_lsh_cc_scale_r12.json"


def arm(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    sub = (
        d.select("doc_id", shingles(tokens("text")).alias("sh"))
        .filter(F.size("sh") > 0)
        .repartition(32)
        .persist()
    )
    pairs = lsh_verified_pairs(sub, 0.8)
    cc = connected_components(pairs)  # eager: localCheckpoint inside
    n_docs = d.count()
    n_pairs = pairs.count()
    n_nodes = cc.count()
    n_clusters = cc.agg(F.countDistinct("cluster_id")).collect()[0][0]
    sub.unpersist()
    return n_docs, n_pairs, n_nodes, n_clusters


def main():
    out = {"probe_pre": bench._contention_probe(), "tiers": {}}
    spark = get_spark("lsh-cc-scale-r12")
    tiers = {
        "sf0.1": "/root/testdata/sf0.1",
        "sf1": "/tmp/lagom_kinesis_spark/scale/sf1",
        "sf10": "/tmp/lagom_kinesis_spark/scale/sf10",
    }
    for sf, sf_dir in tiers.items():
        # one warm pass (JIT/codegen), then the timed pass
        arm(spark, sf_dir)
        t0 = time.time()
        n_docs, n_pairs, n_nodes, n_clusters = arm(spark, sf_dir)
        t = round(time.time() - t0, 3)
        out["tiers"][sf] = {
            "spark_s": t,
            "n_docs": n_docs,
            "n_verified_pairs": n_pairs,
            "n_clustered_docs": n_nodes,
            "n_clusters": n_clusters,
        }
        print(f"# {sf}: {t}s docs={n_docs} pairs={n_pairs} "
              f"nodes={n_nodes} clusters={n_clusters}", flush=True)
    out["probe_post"] = bench._contention_probe()
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
