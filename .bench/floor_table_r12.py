"""Floor decomposition for the 11 still-undecomposed weak sf0.1 rows
(VERDICT r11 ask #5): per query, time cumulative plan PREFIXES under the
exact headline protocol (warm-to-stable ≤4 + best-of-3, noop force,
cache-clear between runs) so the sf0.1 seconds attribute to layers —
job floor / scan(+project/filter) / mid (join / explode-agg / hash
compute) / full — instead of riding the generic "fixed-cost floor"
argument. The job floor is one trivial 32-partition job timed the same
way. Streaming session gets the tumbling-style BATCH-TWIN treatment
(scan+normalize, then the same session_window aggregate as a batch
plan) — the cold streaming number is query-start lifecycle on top.

Usage: python .bench/floor_table_r12.py [sf_dir] [out.json]
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from lagom_kinesis_spark.catalog import load
from lagom_kinesis_spark.functions import (
    hash_build,
    money_sum_units,
    revenue_units,
)
from lagom_kinesis_spark.session import get_spark

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = sys.argv[2] if len(sys.argv) > 2 else ".bench/floor_table_r12.json"


def layers(spark, sf_dir):
    """name -> ordered [(layer, df_builder)]; each builder returns the
    CUMULATIVE prefix plan (so layer N's cost = t[N] - t[N-1])."""
    from lagom_kinesis_spark.operators import asof_join
    from lagom_kinesis_spark.operators.text import tokens
    from lagom_kinesis_spark.registry import all_queries

    qs = all_queries()

    def q(name):
        return lambda: qs[name].fn(spark, sf_dir)

    def li_scan():
        return load(spark, sf_dir, "lineitem").filter(
            F.col("l_shipdate") <= "2001-09-02"
        ).select(
            "l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
            "l_discount", "l_tax",
        )

    def orders_scan():
        return load(spark, sf_dir, "orders").select(
            "o_orderpriority", "o_custkey", "o_orderdate"
        )

    def mw_join():
        li = load(spark, sf_dir, "lineitem")
        o = load(spark, sf_dir, "orders").filter(
            F.col("o_orderdate") >= "1997-01-01"
        )
        p = load(spark, sf_dir, "part").filter(F.col("p_size") <= 20)
        s = load(spark, sf_dir, "supplier")
        n = load(spark, sf_dir, "nation")
        sn = s.join(n, s.s_nationkey == n.n_nationkey).select(
            "s_suppkey", "n_name"
        )
        return (
            li.join(hash_build(o), li.l_orderkey == o.o_orderkey)
            .join(F.broadcast(p), li.l_partkey == p.p_partkey)
            .join(F.broadcast(sn), li.l_suppkey == sn.s_suppkey)
            .select("p_brand", "n_name", "l_extendedprice", "l_discount")
        )

    def bd_join():
        li = load(spark, sf_dir, "lineitem")
        s = load(spark, sf_dir, "supplier")
        n = load(spark, sf_dir, "nation")
        r = load(spark, sf_dir, "region")
        dim = (
            s.join(n, s.s_nationkey == n.n_nationkey)
            .join(r, n.n_regionkey == r.r_regionkey)
            .select("s_suppkey", "r_name")
        )
        return li.join(F.broadcast(dim), li.l_suppkey == dim.s_suppkey).select(
            "r_name", "l_extendedprice", "l_discount"
        )

    def q3_join():
        c = load(spark, sf_dir, "customer").filter(
            F.col("c_mktsegment") == "BUILDING"
        )
        o = hash_build(
            load(spark, sf_dir, "orders").filter(
                F.col("o_orderdate") < "1998-03-15"
            )
        )
        li = load(spark, sf_dir, "lineitem").filter(
            F.col("l_shipdate") > "1998-03-15"
        )
        return (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .join(F.broadcast(c), o.o_custkey == c.c_custkey)
            .select(
                "l_orderkey", "o_orderdate", "o_orderpriority",
                "l_extendedprice", "l_discount",
            )
        )

    def q3_agg():
        return (
            q3_join()
            .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
            .agg(money_sum_units(revenue_units(), 4).alias("revenue"))
        )

    def ev_scan():
        return load(spark, sf_dir, "events").select(
            "event_id", "user_id", "ts", "value", "event_type"
        )

    def asof_mid():
        e = load(spark, sf_dir, "events")
        purchases = e.filter(F.col("event_type") == "purchase").select(
            "event_id", "user_id", "ts", "value"
        )
        clicks = e.filter(F.col("event_type") == "click").select(
            F.col("event_id").alias("click_id"),
            "user_id",
            "ts",
            F.col("value").alias("click_value"),
        )
        return asof_join(
            purchases, clicks, ts="ts", by=["user_id"],
            right_payload=["click_id", "click_value"], tie="click_id",
        )

    def docs_scan():
        return load(spark, sf_dir, "documents").select("doc_id", "text")

    def md5_only():
        return docs_scan().select(
            "doc_id", F.md5(F.col("text").cast("binary")).alias("text_md5")
        )

    def tok_count():
        from lagom_kinesis_spark.functions import fan_out
        from lagom_kinesis_spark.queries.llm_ops import TEXT_FAN_OUT_MIN_BYTES

        d = fan_out(
            load(spark, sf_dir, "documents"),
            min_bytes=TEXT_FAN_OUT_MIN_BYTES,
        )
        return (
            d.select(F.explode(tokens("text")).alias("token"))
            .groupBy("token")
            .agg(F.count("*").alias("n"))
        )

    def sess_batch():
        e = load(spark, sf_dir, "events")
        return (
            e.groupBy("user_id", F.session_window("ts", "30 minutes"))
            .agg(F.count("*").alias("n_events"))
            .select("user_id", "n_events")
        )

    def topk_scan():
        return load(spark, sf_dir, "orders").select(
            "o_custkey", "o_orderkey", "o_totalprice"
        )

    return {
        "agg_pricing_summary": [("scan", li_scan), ("full(+agg)", q("agg_pricing_summary"))],
        "agg_count_distinct_multi": [
            ("scan", orders_scan),
            ("full(+expand+2shuffle-agg)", q("agg_count_distinct_multi")),
        ],
        "join_multiway": [("joins", mw_join), ("full(+agg)", q("join_multiway"))],
        "join_broadcast_dims": [("join", bd_join), ("full(+agg)", q("join_broadcast_dims"))],
        "q_shipping_priority": [
            ("joins", q3_join),
            ("+agg", q3_agg),
            ("full(+TakeOrdered)", q("q_shipping_priority")),
        ],
        "join_asof": [
            ("scan+normalize", ev_scan),
            ("asof(union+window+filter)", asof_mid),
            ("full(+project)", q("join_asof")),
        ],
        "win_topk_per_group": [
            ("scan", topk_scan),
            ("full(+exchange+sort+window)", q("win_topk_per_group")),
        ],
        "win_running_total": [
            ("scan+normalize", ev_scan),
            ("full(+exchange+sort+window)", q("win_running_total")),
        ],
        "dedup_exact": [
            ("scan", docs_scan),
            ("+md5", md5_only),
            ("full(+hash-agg shuffle)", q("dedup_exact")),
        ],
        "text_top_tokens": [
            ("scan", docs_scan),
            ("explode+count", tok_count),
            ("full(+TakeOrdered+rn)", q("text_top_tokens")),
        ],
        "stream_session_window_batch_twin": [
            ("scan+normalize", ev_scan),
            ("full(batch session_window agg)", sess_batch),
        ],
    }


def timed(spark, builder) -> float:
    def force(df):
        df.write.mode("overwrite").format("noop").save()

    def reset():
        try:
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()  # noqa: SLF001
        except Exception:
            pass

    prev = None
    for _ in range(4):
        reset()
        t0 = time.time()
        force(builder())
        t = time.time() - t0
        if prev is not None and t > prev * 0.75:
            break
        prev = t
    best = float("inf")
    for _ in range(3):
        reset()
        t0 = time.time()
        force(builder())
        best = min(best, time.time() - t0)
    return round(best, 3)


def main():
    import bench

    probe_pre = bench._contention_probe()
    spark = get_spark("floor-table-r12")
    os.environ["SPARK_GRAFT_GC_NUDGE"] = "0"
    # warm the engine like the headline protocol
    spark.range(100000).groupBy((F.col("id") % 7).alias("k")).count().write.mode(
        "overwrite"
    ).format("noop").save()
    job_floor = timed(spark, lambda: spark.range(32 * 1024).repartition(32))
    out = {"sf_dir": SF_DIR, "job_floor_s": job_floor, "queries": {}}
    for name, steps in layers(spark, SF_DIR).items():
        row = {}
        for label, builder in steps:
            row[label] = timed(spark, builder)
            print(f"# {name} / {label}: {row[label]}s", flush=True)
        out["queries"][name] = row
    out["probe_pre"] = probe_pre
    out["probe_post"] = bench._contention_probe()
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
