"""r13 A/B (VERDICT r12 ask #5): xxhash64 shingle proxy extended to the
remaining string-shingle comparison paths — dedup_jaccard_pairs (sampled
all-pairs theta join) and dedup_sorted_neighborhood (blk-window exchange +
neighbor equi-join). Old arms are the pre-change bodies verbatim (commit
6088cf0); new arms are the registered queries.

Protocol (the r12 ab_verify_hash protocol): per-rep interleaving in one
session (old,new,old,new per query per rep — contention hits both arms
symmetrically), clearCache+GC between runs, noop-sink forcing, output
rows asserted IDENTICAL old-vs-new in-run, contention probes around the
sweep. Tiers: sf0.01 (the gate tier where these sampled audits actually
run) and sf0.1.

Run: python .bench/ab_shingle_hash_r13.py [n_reps]   (default 5)
Writes .bench/ab_shingle_hash_r13.json
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

OUT = os.path.join(HERE, "ab_shingle_hash_r13.json")
TIERS = ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]


def old_jaccard_pairs(spark, sf_dir):
    """dedup_jaccard_pairs body @ 6088cf0 (string shingles)."""
    from pyspark.sql import functions as F

    from lagom_kinesis_spark.catalog import load
    from lagom_kinesis_spark.functions import fan_out, r6
    from lagom_kinesis_spark.operators.text import jaccard, shingles, tokens

    d = fan_out(load(spark, sf_dir, "documents")).filter(F.col("doc_id") % 2 == 0)
    sub = d.select("doc_id", shingles(tokens("text")).alias("sh"))
    a = sub.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = sub.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sh_b"))
    jac = jaccard(F.col("sh_a"), F.col("sh_b"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("jac", jac)
        .filter(F.col("jac") >= 0.3)
        .select("id_a", "id_b", r6(F.col("jac")).alias("jac"))
    )


def old_sorted_neighborhood(spark, sf_dir):
    """dedup_sorted_neighborhood body @ 6088cf0 (string shingles)."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from lagom_kinesis_spark.catalog import load
    from lagom_kinesis_spark.functions import fan_out, r6
    from lagom_kinesis_spark.operators.text import jaccard, shingles, tokens

    d = fan_out(load(spark, sf_dir, "documents"))
    base = d.select(
        "doc_id",
        shingles(tokens("text")).alias("sh"),
        F.substring(F.lower("text"), 1, 40).alias("k"),
        F.substring(F.lower("text"), 1, 2).alias("blk"),
    )
    ranked = base.withColumn(
        "rn", F.row_number().over(W.partitionBy("blk").orderBy("k", "doc_id"))
    )
    a = ranked.select(
        "blk",
        F.col("rn").alias("rn_a"),
        F.col("doc_id").alias("da"),
        F.col("sh").alias("sa"),
    )
    b = ranked.select(
        "blk",
        F.col("rn").alias("rn_b"),
        F.col("doc_id").alias("db"),
        F.col("sh").alias("sb"),
    )
    cand = (
        a.withColumn("delta", F.explode(F.array(F.lit(1), F.lit(2))))
        .withColumn("rn_b", F.col("rn_a") + F.col("delta"))
        .join(b, ["blk", "rn_b"])
    )
    jac = r6(jaccard(F.col("sa"), F.col("sb")))
    return (
        cand.withColumn("jac", jac)
        .filter(F.col("jac") >= 0.3)
        .select(
            F.least("da", "db").alias("id_a"),
            F.greatest("da", "db").alias("id_b"),
            "jac",
        )
    )


def main() -> None:
    n_reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5

    import bench
    from lagom_kinesis_spark.registry import all_queries
    from lagom_kinesis_spark.session import get_spark

    spark = get_spark("ab-shingle-hash-r13")
    qs = all_queries()
    arms = {
        "dedup_jaccard_pairs": (
            old_jaccard_pairs,
            qs["dedup_jaccard_pairs"].fn,
        ),
        "dedup_sorted_neighborhood": (
            old_sorted_neighborhood,
            qs["dedup_sorted_neighborhood"].fn,
        ),
    }

    def reset() -> None:
        try:
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()  # noqa: SLF001
        except Exception:
            pass

    def force(df) -> None:
        df.write.mode("overwrite").format("noop").save()

    out: dict = {"probe_pre": bench._contention_probe(), "n_reps": n_reps}
    for sf_dir in TIERS:
        tier: dict = {}
        for qname, (old_fn, new_fn) in arms.items():
            # output equality, once per tier (rows incl. r6 jac values)
            rows_old = sorted(tuple(r) for r in old_fn(spark, sf_dir).collect())
            rows_new = sorted(tuple(r) for r in new_fn(spark, sf_dir).collect())
            assert rows_old == rows_new, f"{qname}@{sf_dir}: outputs differ"
            runs: dict[str, list[float]] = {"old": [], "new": []}
            spark.sparkContext.setJobDescription(f"ab-shingle:{qname}")
            # warm both arms once (JIT), untimed
            force(old_fn(spark, sf_dir))
            force(new_fn(spark, sf_dir))
            for _ in range(n_reps):
                for arm_name, fn in (("old", old_fn), ("new", new_fn)):
                    reset()
                    t0 = time.time()
                    force(fn(spark, sf_dir))
                    runs[arm_name].append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
            tier[qname] = {
                "runs_s": runs,
                "min_s": {k: round(min(v), 3) for k, v in runs.items()},
                "rows_equal": True,
                "n_out_rows": len(rows_new),
            }
            print(f"# {sf_dir} {qname}: {tier[qname]['min_s']}",
                  file=sys.stderr, flush=True)
        out[sf_dir] = tier
    out["probe_post"] = bench._contention_probe()
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
