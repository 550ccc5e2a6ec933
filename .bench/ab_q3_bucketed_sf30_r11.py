"""r11 A/B: decompose q_shipping_priority_bucketed's sf30 anomaly
(VERDICT r10 ask #2): 3.06x at sf30 vs 1.88x at sf10 while
flagship_bucketed on the SAME layout goes 3.44x -> 1.08x. Candidate
causes named by the verdict: (a) the GROUP-BY exchange reappearing at
180M rows, (b) memory pressure / spill, (c) the tier's mid-run steal
onset landing on this query.

Variants (interleaved, min of 3, bench protocol: noop forcing,
clearCache+GC between runs, contention probe bracketing the whole set):

  A_full      registered q_shipping_priority_bucketed
  B_flagship  registered flagship_bucketed (tier-health canary: 1.08x
              on a clean window -- if it degrades too, the window is
              dirty, not the query)
  C_join      the SMJ + broadcast join only, project the revenue inputs,
              no aggregate -- isolates scan+join from agg
  D_join_agg  C + groupBy/agg (no orderBy/limit) -- isolates the agg
              layer; D-C = agg cost, A-D = TakeOrdered cost
  E           DuckDB q3 + flagship oracle denominators

Also prints the FORMATTED plan of A at sf30 (grep Exchange) so the
"aggregate exchange reappears" hypothesis is read straight off the plan.

Run: python .bench/ab_q3_bucketed_sf30_r11.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = sys.argv[1] if len(sys.argv) > 1 else "/tmp/lagom_kinesis_spark/scale/sf30"


def main() -> None:
    from pyspark.sql import functions as F

    from bench import _contention_probe
    from lagom_kinesis_spark.catalog import load
    from lagom_kinesis_spark.queries.relational import fact_bucketed_layout
    from lagom_kinesis_spark.functions import money_sum_units, revenue_units
    from lagom_kinesis_spark.registry import all_queries
    from lagom_kinesis_spark.session import get_spark

    qs = all_queries()
    spark = get_spark("ab-q3-sf30")
    spark.sparkContext.setLogLevel("ERROR")

    print("# pre probe:")
    pre = _contention_probe()

    def reset() -> None:
        try:
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()  # noqa: SLF001
        except Exception:
            pass

    def force(df) -> None:
        df.write.mode("overwrite").format("noop").save()

    bo, bl = fact_bucketed_layout(spark, SF)

    def join_frame():
        c = load(spark, SF, "customer").filter(
            F.col("c_mktsegment") == "BUILDING"
        )
        o = spark.table(bo).filter(F.col("o_orderdate") < "1998-03-15")
        li = spark.table(bl).filter(F.col("l_shipdate") > "1998-03-15")
        return (
            li.join(o.hint("merge"), li.l_orderkey == o.o_orderkey)
            .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        )

    def c_join():
        return join_frame().select(
            "l_orderkey", "o_orderdate", "o_orderpriority",
            "l_extendedprice", "l_discount",
        )

    def d_join_agg():
        return (
            join_frame()
            .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
            .agg(money_sum_units(revenue_units(), 4).alias("revenue"))
        )

    variants = {
        "A_full": lambda: qs["q_shipping_priority_bucketed"].fn(spark, SF),
        "B_flagship": lambda: qs["flagship_bucketed"].fn(spark, SF),
        "C_join": c_join,
        "D_join_agg": d_join_agg,
    }

    # plan of the full query: does the agg still elide its Exchange?
    plan = (
        variants["A_full"]()
        ._sc._jvm.PythonSQLUtils.explainString(
            variants["A_full"]()._jdf.queryExecution(), "formatted"
        )
    )
    ex_lines = [ln for ln in plan.splitlines() if "Exchange" in ln or "Sort" in ln]
    print(f"# A_full plan Exchange/Sort lines ({len(ex_lines)}):")
    for ln in ex_lines:
        print(f"#   {ln.strip()}")

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

    print("\nRESULTS (min of 3, interleaved):")
    for v, t in best.items():
        print(f"  {v}: {t:.3f} s")

    import duckdb

    con = duckdb.connect()
    for t in ("customer", "orders", "lineitem", "nation", "region"):
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    for q in ("q_shipping_priority_bucketed", "flagship_bucketed"):
        o = qs[q].oracle
        con.sql(o).fetch_arrow_table()  # warm
        t0 = time.time()
        con.sql(o).fetch_arrow_table()
        print(f"  duckdb {q}: {time.time() - t0:.3f} s")

    print("# post probe:")
    _contention_probe()


if __name__ == "__main__":
    main()
