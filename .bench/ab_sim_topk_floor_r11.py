"""r11 floor decomposition: sim_topk_cosine at sf0.1 (VERDICT r10 ask #6).

At 26.36x cold it is the worst non-streaming headline ratio, yet sf10 runs
1.97x — so the sub-second sf0.1 wall should be nearly all per-query fixed
cost. Give it the measured breakdown flagship and tfidf got:

  A_full    registered sim_topk_cosine (scan + Arrow matmul + partial
            top-k + final window)
  B_scored  batch_topk_cosine frame only (no window) -- A-B = window/rank
  C_scan    embeddings parquet scan + Arrow ship of the same columns
            through an identity mapInPandas -- B-C = matmul + top-k
  D_null    spark.range(1) noop -- the pure job-submission floor
  E_panel   embedding_query_panel alone (driver-side footer read, no job)
  duckdb    the oracle denominator

Interleaved min-of-3 under the bench protocol (clearCache+GC between
runs, noop forcing), contention-probe bracketed.

Run: python .bench/ab_sim_topk_floor_r11.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def main() -> None:
    from pyspark.sql import functions as F

    from bench import _contention_probe
    from lagom_kinesis_spark.catalog import load
    from lagom_kinesis_spark.operators.similarity import (
        batch_topk_cosine,
        embedding_query_panel,
    )
    from lagom_kinesis_spark.registry import all_queries
    from lagom_kinesis_spark.session import get_spark

    qs = all_queries()
    spark = get_spark("ab-simtopk-floor")
    spark.sparkContext.setLogLevel("ERROR")

    print("# pre probe:")
    _contention_probe()

    def reset() -> None:
        try:
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()  # noqa: SLF001
        except Exception:
            pass

    def force(df) -> None:
        df.write.mode("overwrite").format("noop").save()

    q_ids, _, q_vecs = embedding_query_panel(SF, 5)

    def b_scored():
        e = load(spark, SF, "embeddings")
        return batch_topk_cosine(e, "vec_id", "embedding", q_ids, q_vecs, k=10)

    def c_scan():
        e = load(spark, SF, "embeddings").select("vec_id", "embedding")

        def ident(it):
            yield from it

        return e.mapInPandas(ident, e.schema)

    def d_null():
        return spark.range(1)

    variants = {
        "A_full": lambda: qs["sim_topk_cosine"].fn(spark, SF),
        "B_scored": b_scored,
        "C_scan": c_scan,
        "D_null": d_null,
    }
    for v, fn in variants.items():  # warm round, untimed
        reset()
        force(fn())
    best: dict[str, float] = {}
    for rnd in range(3):
        for v, fn in variants.items():
            reset()
            t0 = time.time()
            force(fn())
            t = time.time() - t0
            best[v] = min(best.get(v, 1e9), t)
            print(f"# round {rnd} {v}: {t:.3f}", flush=True)

    # E: panel read alone (driver-side, no job)
    t0 = time.time()
    for _ in range(5):
        embedding_query_panel(SF, 5)
    e_panel = (time.time() - t0) / 5
    print(f"\n  E_panel (driver footer read): {e_panel:.4f} s")

    print("RESULTS (min of 3, interleaved):")
    for v, t in best.items():
        print(f"  {v}: {t:.3f} s")
    print(f"  window/rank layer (A-B): {best['A_full'] - best['B_scored']:.3f} s")
    print(f"  matmul+topk layer (B-C): {best['B_scored'] - best['C_scan']:.3f} s")
    print(f"  scan+arrow layer (C-D):  {best['C_scan'] - best['D_null']:.3f} s")
    print(f"  job floor (D):           {best['D_null']:.3f} s")

    import duckdb

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{SF}/embeddings.parquet')"
    )
    o = qs["sim_topk_cosine"].oracle
    con.sql(o).fetch_arrow_table()  # warm
    t0 = time.time()
    con.sql(o).fetch_arrow_table()
    print(f"  duckdb sim_topk_cosine: {time.time() - t0:.3f} s")

    print("# post probe:")
    _contention_probe()


if __name__ == "__main__":
    main()
