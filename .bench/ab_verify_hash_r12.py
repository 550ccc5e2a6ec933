"""r12 A/B: shuffle narrower types through the LSH verify joins
(optimization guide §2.3 "narrower types" / "project before the exchange").

After the r12 broadcast sweep, the exact-Jaccard verify joins in
dedup_minhash_lsh / lsh_verified_pairs / dedup_prefix_filter_join are
merge-hinted SMJs whose BOTH sides carry the full array<string> shingle
sets (avg 3-gram shingle ~17 chars ≈ 25+ bytes framed vs 8 for an int64).
The sort + two exchanges therefore move ~3x more bytes than the decision
needs: Jaccard only consumes SET SIZES (|a∩b|, |a∪b|), which are invariant
under any INJECTIVE map of the shingle strings — so xxhash64-ing each
shingle right before the verify join shrinks every shuffled/sorted row
while provably preserving the pair set AND the rounded jac values
(injectivity on the fixture's shingle universe is verified by the
equality check below and by the unchanged DuckDB oracle hashes at the
gate SFs; a collision would need ~2^32 distinct shingles per doc-pair
union at 50% birthday odds — the fixtures carry ~10^5, real corpora
~10^11 TOTAL, per-union ~10^3).

The SIGNATURE path stays on strings: minhash signatures feed the band
keys, and changing their input domain would change the candidate set
(the oracle's exactness argument pins the current one).

Variants (interleaved, min of 3, noop forcing, clearCache+GC between):

  A_cands   lsh_candidate_pairs only (64 hashes, 16 bands) — the shared
            upstream; B−A / C−A isolate the verify layer.
  B_str     verify join shipping array<string> (the registered plan).
  C_hash    verify join shipping xxhash64'd array<bigint> (prototype).

Correctness pre-check before any timing: B and C must produce the
IDENTICAL (id_a, id_b, jac) set (exceptAll both ways == 0 rows).

Run: python .bench/ab_verify_hash_r12.py [sf_dir ...]
(default: /root/testdata/sf0.1 and, if present, the synthetic sf1)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from lagom_kinesis_spark.catalog import load  # noqa: E402
from lagom_kinesis_spark.functions.helpers import fan_out  # noqa: E402
from lagom_kinesis_spark.operators.similarity import (  # noqa: E402
    lsh_candidate_pairs,
)
from lagom_kinesis_spark.operators.text import jaccard, shingles, tokens  # noqa: E402
from lagom_kinesis_spark.functions.helpers import r6  # noqa: E402
from lagom_kinesis_spark.session import get_spark  # noqa: E402

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def noop(df):
    df.write.mode("overwrite").format("noop").save()


def build(spark, sf_dir):
    d = fan_out(load(spark, sf_dir, "documents"))
    sh = d.select("doc_id", shingles(tokens("text")).alias("sh")).filter(
        F.size("sh") > 0
    )
    return sh.persist()


def variant_cands(sh):
    return lsh_candidate_pairs(sh, "doc_id", "sh", num_hashes=64, bands=16)


def _verify(sh, proj):
    cands = variant_cands(sh)
    a = proj(sh, "id_a", "sh_a")
    b = proj(sh, "id_b", "sh_b")
    return (
        cands.join(a.hint("merge"), "id_a")
        .join(b.hint("merge"), "id_b")
        .withColumn("jac", r6(jaccard(F.col("sh_a"), F.col("sh_b"))))
        .filter(F.col("jac") >= 0.8)
        .select("id_a", "id_b", "jac")
    )


def variant_str(sh):
    return _verify(
        sh,
        lambda s, i, c: s.select(
            F.col("doc_id").alias(i), F.col("sh").alias(c)
        ),
    )


def variant_hash(sh):
    return _verify(
        sh,
        lambda s, i, c: s.select(
            F.col("doc_id").alias(i),
            F.transform("sh", lambda x: F.xxhash64(x)).alias(c),
        ),
    )


def run_once(spark, mk):
    spark.catalog.clearCache()
    spark.sparkContext._jvm.System.gc()  # noqa: SLF001
    # the persisted shingle frame is rebuilt inside mk each run
    t0 = time.time()
    noop(mk())
    return time.time() - t0


def main() -> None:
    import bench

    dirs = sys.argv[1:] or [
        p
        for p in ("/root/testdata/sf0.1", "/tmp/lagom_kinesis_spark/scale/sf1")
        if os.path.exists(p)
    ]
    n_runs = 3
    spark = get_spark("ab-verify-hash-r12")
    out = {"probe_pre": bench._contention_probe()}
    for sf_dir in dirs:
        sh = build(spark, sf_dir)
        # --- correctness pre-check: identical (id_a, id_b, jac) sets
        bdf, cdf = variant_str(sh), variant_hash(sh)
        extra = cdf.exceptAll(bdf).count()
        missing = bdf.exceptAll(cdf).count()
        assert extra == 0 and missing == 0, (sf_dir, extra, missing)
        n_pairs = bdf.count()
        sh.unpersist()

        # Variants INTERLEAVED within each rep (A,B,C, A,B,C, ...) so a
        # window drifting mid-run biases all three alike rather than
        # whichever variant's sequential block it lands on; rep 0 warm.
        variants = (
            ("A_cands", variant_cands),
            ("B_str", variant_str),
            ("C_hash", variant_hash),
        )
        runs: dict[str, list[float]] = {k: [] for k, _ in variants}
        for rep in range(1 + n_runs):
            for label, var in variants:
                spark.sparkContext.setJobDescription(
                    f"ab-verify-hash:{label}:{rep}"
                )
                t = round(run_once(spark, lambda: var(build(spark, sf_dir))), 3)
                spark.sparkContext.setJobDescription(None)
                if rep > 0:
                    runs[label].append(t)
                print(f"# {sf_dir} rep{rep} {label}: {t}s",
                      file=sys.stderr, flush=True)
        res = {k: min(v) for k, v in runs.items()}
        res["runs_s"] = runs
        res["n_verified_pairs"] = n_pairs
        res["verify_layer_str"] = round(res["B_str"] - res["A_cands"], 3)
        res["verify_layer_hash"] = round(res["C_hash"] - res["A_cands"], 3)
        out[sf_dir] = res
        print(f"# {sf_dir}: {res}", file=sys.stderr)
    out["probe_post"] = bench._contention_probe()
    # HERE-anchored like the sibling probes — a cwd-relative path written
    # from outside the repo root would mis-place the evidence (ADVICE r12).
    out_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "ab_verify_hash_r12.json"
    )
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
