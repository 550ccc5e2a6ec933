"""2-D block-salt vs 1-D R=64 vs broadcast for semdedup's pair stage @ sf1.

2-D: a-side fixed bi=id_a%m + exploded bj; b-side fixed bj=id_b%m +
exploded bi; join (cluster,bi,bj) — each pair meets once at
(id_a%m, id_b%m). keys = k*m^2, replication m per side (vs R per one
side for 1-D).

Usage: python exp_semdedup_2d.py            (driver)
       python exp_semdedup_2d.py --child ARM
"""
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")
SF_DIR = "/tmp/lagom_kinesis_spark/scale/sf1"


def build(spark, arm: str):
    from pyspark.sql import functions as F

    from lagom_kinesis_spark.catalog import load
    from lagom_kinesis_spark.functions import fan_out, r6
    from lagom_kinesis_spark.operators.similarity import (
        centroid_rank,
        cosine,
        md5_sample_matrix,
    )

    e = fan_out(load(spark, SF_DIR, "embeddings"))
    C = md5_sample_matrix(e, 8)
    assigned = e.select(
        "vec_id", "embedding", centroid_rank(C)[0]["cid"].alias("cluster")
    ).persist()
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    if arm == "broadcast":
        a = assigned.select("cluster", F.col("vec_id").alias("id_a"),
                            F.col("embedding").alias("va"))
        b = assigned.select("cluster", F.col("vec_id").alias("id_b"),
                            F.col("embedding").alias("vb"))
        joined = a.join(b, ["cluster"])
    elif arm.startswith("r"):
        R = int(arm[1:])
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
        joined = a.join(b.hint("merge"), ["cluster", "salt"])
    elif arm.startswith("m"):
        m = int(arm[1:])
        blocks = F.array(*[F.lit(i) for i in range(m)])
        a = (
            assigned.select(
                "cluster", F.col("vec_id").alias("id_a"),
                F.col("embedding").alias("va"),
                (F.col("vec_id") % m).alias("bi"),
            )
            .withColumn("bj", F.explode(blocks))
            .repartition(n_parts, "cluster", "bi", "bj")
        )
        b = (
            assigned.select(
                "cluster", F.col("vec_id").alias("id_b"),
                F.col("embedding").alias("vb"),
                (F.col("vec_id") % m).alias("bj"),
            )
            .withColumn("bi", F.explode(blocks))
            .repartition(n_parts, "cluster", "bi", "bj")
        )
        joined = a.join(b.hint("merge"), ["cluster", "bi", "bj"])
    else:
        raise ValueError(arm)
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
            r6(F.count("is_dup") / F.count("*").cast("double")).alias("dup_share"),
        )
    )


def child(arm: str) -> None:
    from lagom_kinesis_spark.session import get_spark

    spark = get_spark(f"exp2d-{arm}")
    t0 = time.time()
    df = build(spark, arm)
    df.write.mode("overwrite").format("noop").save()
    t = round(time.time() - t0, 3)
    rows = sorted(tuple(r) for r in df.collect())
    print(json.dumps({"arm": arm, "s": t, "n_rows": len(rows),
                      "rows_hash": hash(tuple(rows))}))


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(sys.argv[2])
        return
    results: dict = {}
    hashes = set()
    for rep in range(2):
        for arm in ("m8", "r64", "broadcast", "m16"):
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child", arm],
                capture_output=True, text=True, check=True)
            rec = json.loads(proc.stdout.strip().splitlines()[-1])
            results.setdefault(arm, []).append(rec["s"])
            hashes.add((rec["n_rows"], rec["rows_hash"]))
            print(f"# rep{rep} {arm}: {rec['s']}s", file=sys.stderr, flush=True)
    assert len(hashes) == 1, f"arms disagree: {hashes}"
    print(json.dumps({k: {"runs": v, "min": min(v)} for k, v in results.items()}))


if __name__ == "__main__":
    main()
