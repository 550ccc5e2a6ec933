"""r12 A/B: string vs xxhash64'd shingles through the WHOLE prefix-filter
pipeline (optimization guide §2.3 "narrower types").

dedup_prefix_filter_join decides on shingle IDENTITY, never content: the
vocab frequency agg, the probe/index equi-joins, the per-doc collect_list
re-sort and the verify arrays all treat a shingle as an opaque token. Any
injective map of the shingle universe therefore preserves the verified
output exactly (prefix pruning is lossless under ANY consistently applied
total order; jac reads set sizes only). Mapping each ~25-framed-byte
3-gram string to an 8-byte xxhash64 long shrinks every shuffled row.

Both arms below are the SAME pipeline body with one switch: the ``sh``
column is either ``shingles(tokens(text))`` (the pre-b7a2b17 registered
plan) or ``transform(..., xxhash64)`` (the registered plan since
b7a2b17). Correctness pre-check before any timing: identical
(id_a, id_b, jac) sets (exceptAll both ways == 0 rows).

Timing: interleaved old/new, 1 warm-up + N timed runs each, noop sink,
clearCache + JVM GC between runs; report all runs and the min.

Run: python .bench/ab_prefix_hash_r12.py [sf_dir [n_runs [out.json]]]
(defaults: /root/testdata/sf0.1, 3, .bench/ab_prefix_hash_r12.json)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

import bench  # noqa: E402
from lagom_kinesis_spark.catalog import load  # noqa: E402
from lagom_kinesis_spark.functions.helpers import fan_out, r6  # noqa: E402
from lagom_kinesis_spark.operators.text import (  # noqa: E402
    jaccard,
    shingles,
    tokens,
)
from lagom_kinesis_spark.session import get_spark  # noqa: E402


def noop(df):
    df.write.mode("overwrite").format("noop").save()


def prefix_filter(spark, sf_dir: str, hashed: bool):
    """dedup_prefix_filter_join's body, shingle representation switchable.

    Mirrors lagom_kinesis_spark/queries/llm_ops.py:dedup_prefix_filter_join
    (same hints, same theta); hashed=True is the registered plan.
    """
    d = fan_out(load(spark, sf_dir, "documents"))
    theta = 0.4
    base = shingles(tokens("text"))
    col = F.transform(base, lambda s: F.xxhash64(s)) if hashed else base
    sh = d.select("doc_id", col.alias("sh")).filter(F.size("sh") > 0)
    ex = sh.select("doc_id", F.explode("sh").alias("t"))
    freq = ex.groupBy("t").agg(F.count("*").alias("ft"))
    ordered = (
        ex.join(freq.hint("merge"), "t")
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list(F.struct("ft", "t"))).alias("os"))
    )
    plen = (
        F.size("os") - F.ceil(F.size("os") * F.lit(theta)) + F.lit(1)
    ).cast("int")
    probe = ordered.select(
        F.col("doc_id").alias("a"),
        F.explode(F.slice("os", F.lit(1), plen)).alias("p"),
    ).select("a", F.col("p.t").alias("t"))
    index = ex.select(F.col("doc_id").alias("b"), "t")
    cand = (
        probe.join(index.hint("merge"), "t")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    va = sh.select(F.col("doc_id").alias("a"), F.col("sh").alias("sha"))
    vb = sh.select(F.col("doc_id").alias("b"), F.col("sh").alias("shb"))
    jac = jaccard(F.col("sha"), F.col("shb"))
    return (
        cand.join(va.hint("merge"), "a")
        .join(vb.hint("merge"), "b")
        .withColumn("jac_raw", jac)
        .filter(F.col("jac_raw") >= theta)
        .select(
            F.col("a").alias("id_a"),
            F.col("b").alias("id_b"),
            r6(F.col("jac_raw")).alias("jac"),
        )
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    out_path = (
        sys.argv[3] if len(sys.argv) > 3 else ".bench/ab_prefix_hash_r12.json"
    )
    spark = get_spark("ab-prefix-hash-r12")
    out = {"sf_dir": sf_dir, "probe_pre": bench._contention_probe()}

    # --- correctness: identical verified output either way
    old_df = prefix_filter(spark, sf_dir, hashed=False)
    new_df = prefix_filter(spark, sf_dir, hashed=True)
    extra = new_df.exceptAll(old_df).count()
    missing = old_df.exceptAll(new_df).count()
    assert extra == 0 and missing == 0, (extra, missing)
    out["n_pairs"] = old_df.count()
    out["outputs_identical"] = True

    runs: dict[str, list[float]] = {"old_str": [], "new_hash": []}
    for rep in range(1 + n_runs):  # rep 0 = warm-up, discarded
        for label, hashed in (("old_str", False), ("new_hash", True)):
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()  # noqa: SLF001
            spark.sparkContext.setJobDescription(f"ab-prefix:{label}:{rep}")
            t0 = time.time()
            noop(prefix_filter(spark, sf_dir, hashed))
            t = round(time.time() - t0, 3)
            spark.sparkContext.setJobDescription(None)
            if rep > 0:
                runs[label].append(t)
            print(f"# rep{rep} {label}: {t}s", file=sys.stderr, flush=True)
    out["runs_s"] = runs
    out["min_s"] = {k: min(v) for k, v in runs.items()}
    out["probe_post"] = bench._contention_probe()
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
