"""Plan audit: sweep every registered query's physical plan for scale red
flags (mandate: ".explain() the plan and iterate until it's the plan you'd
want"). Run: python scripts/audit_plans.py [--sf DIR]

Flags raised:
- CartesianProduct / BroadcastNestedLoopJoin in a query not tagged
  theta/cross (accidental cartesians are the #1 scale killer);
- parquet scans with no pushed filters AND full-width ReadSchema in
  filter-tagged queries (pushdown lost);
- missing partial aggregation (single HashAggregate with Exchange above it).

Streaming queries are skipped (they execute during construction; their plan
shape is covered by the batch-equivalence oracles).
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main() -> int:
    sf_dir = "/root/testdata/sf0.001"
    if "--sf" in sys.argv:
        sf_dir = sys.argv[sys.argv.index("--sf") + 1]
    from lagom_kinesis_spark.registry import all_queries
    from lagom_kinesis_spark.session import get_spark

    spark = get_spark("plan-audit")
    qs = all_queries()
    findings: list[str] = []
    audited = 0
    for name, q in sorted(qs.items()):
        if "streaming" in q.tags or name.startswith("stream_"):
            continue
        try:
            df = q.fn(spark, sf_dir)
            plan = plan_of(df)
        except Exception as e:  # noqa: BLE001
            findings.append(f"{name}: PLAN FAILED: {e}")
            continue
        audited += 1
        # Exemptions are EXPLICIT per-query tags only — a name-prefix
        # blanket ("sim_"/"dedup_") would hide an accidental cartesian in
        # the two families where candidate generation exists precisely to
        # avoid one.
        allow_nlj = any(t in q.tags for t in ("theta", "cross", "scalar"))
        if ("CartesianProduct" in plan or "BroadcastNestedLoopJoin" in plan) and not allow_nlj:
            findings.append(f"{name}: unexpected nested-loop/cartesian join")
        if (
            "filter" in q.tags
            and "PushedFilters: [" in plan
            and not re.search(r"PushedFilters: \[[^\]]", plan)
        ):
            # Flag only when NO scan carries a pushed filter — a dimension
            # scanned unfiltered next to a pushed fact filter is fine.
            findings.append(f"{name}: no filter pushed to any scan")
        if (
            "agg" in q.tags
            and "Exchange hashpartitioning" in plan
            and re.search(r"(Hash|Sort|ObjectHash)Aggregate", plan)
            and "partial_" not in plan
            and "Expand" not in plan  # exact-distinct plans expand instead
        ):
            findings.append(f"{name}: missing partial (map-side) aggregation")
    print(f"audited {audited} query plans")
    for f in findings:
        print("  FLAG", f)
    print("clean" if not findings else f"{len(findings)} flags")
    return 1 if findings else 0


if __name__ == "__main__":
    raise SystemExit(main())
