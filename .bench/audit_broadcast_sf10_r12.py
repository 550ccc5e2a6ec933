"""Broadcast-trap audit at sf10 (round 12, follow-up to the LSH
broadcast-OOM find): generate every non-streaming query's physical plan
against the sf10 fixture and report each BroadcastExchange whose subtree
scans a FACT-scaled table (lineitem / orders / events / documents /
embeddings) with no aggregation between the scan and the exchange — the
shape that under-estimates (cached/exploded frames inherit the
compressed-scan size) and OOMs the broadcast build at scale.

Plans only — no execution — except queries whose CONSTRUCTION runs jobs
(iterative CC, k-means unrolls, bucketed layout builds); those are
skipped by tag/name and listed, since running them at sf10 is a tier
job, not an audit. Findings are for MANUAL review: a broadcast of a
FILTERED dim-like slice (e.g. Q3's BUILDING customers) can be a
deliberate, documented choice.

Usage: python .bench/audit_broadcast_sf10_r12.py [sf_dir]
"""

import re
import sys

sys.path.insert(0, "/root/repo")

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/lagom_kinesis_spark/scale/sf10"
FACTS = ("lineitem", "orders", "events", "documents", "embeddings")
#: tags/names whose query construction executes jobs (eager at sf10) or
#: builds layouts — skipped, with a line in the report.
SKIP_TAGS = {"bucketed", "iterative", "kmeans", "scale", "sink", "merge",
             "source", "kinesis", "udtf"}
SKIP_NAMES_RE = re.compile(
    r"^(dedup_clusters|split_leakage_audit|graph_|pipeline_kmeans"
    r"|sim_ann_pq|sim_ann_ivf_pq"
    r"|sim_pq_|sim_ivf_persisted|bpe_|sql_scripting"
    # construction writes sf10-scale fixture copies (csv/json/text/orc/...)
    # or sf10-scale sink output — a tier job, not a plan audit
    r"|scan_(?!parquet)|sink_|merge_|scd2|zorder)"
)


def subtree_lines(plan: str, node_re: str) -> list[list[str]]:
    """For each tree line matching node_re, return the node line plus all
    deeper-indented following lines (its subtree) from the tree section."""
    tree = plan.split("\n\n")[0].splitlines()
    out = []
    for i, ln in enumerate(tree):
        if re.search(node_re, ln):
            indent = len(ln) - len(ln.lstrip(" +-:*"))
            sub = [ln]
            for nxt in tree[i + 1:]:
                nindent = len(nxt) - len(nxt.lstrip(" +-:*"))
                if nindent <= indent:
                    break
                sub.append(nxt)
            out.append(sub)
    return out


def main() -> None:
    from lagom_kinesis_spark.registry import all_queries
    from lagom_kinesis_spark.session import get_spark

    spark = get_spark("broadcast-audit-sf10")
    qs = all_queries()
    skipped, failed, findings, clean = [], [], [], 0
    for name, q in sorted(qs.items()):
        if "streaming" in q.tags or name.startswith("stream_"):
            continue
        if SKIP_TAGS & set(q.tags) or SKIP_NAMES_RE.match(name):
            skipped.append(name)
            continue
        print(f"... {name}", file=sys.stderr, flush=True)
        try:
            df = q.fn(spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001
            failed.append(f"{name}: {type(e).__name__}: {str(e)[:120]}")
            continue
        # Tree lines show "Scan parquet (3)" WITHOUT the table — names
        # live in the details section as "(3) Scan parquet ..\nLocation:
        # ... /lineitem.parquet ...". Resolve each subtree's node ids to
        # their detail blocks before matching fact names (the v1 audit
        # matched names against tree lines and was blind).
        details: dict[str, str] = {}
        for block in re.split(r"\n(?=\(\d+\) )", plan):
            m = re.match(r"\((\d+)\) ", block)
            if m:
                details[m.group(1)] = block
        hits = []
        for sub in subtree_lines(plan, r"BroadcastExchange"):
            ids = [i for ln in sub for i in re.findall(r"\((\d+)\)", ln)]
            body = "\n".join(sub) + "\n" + "\n".join(
                details.get(i, "") for i in ids
            )
            scanned = [t for t in FACTS if re.search(rf"/{t}\.?", body)]
            # An Aggregate/limit between scan and exchange USUALLY bounds
            # the broadcast side's cardinality — but NOT when the grouping
            # key is the doc/vec id itself (corpus-cardinality after the
            # agg) and the frame is cached: a cached frame's stats come
            # from the compressed scan, which is how dedup_simhash's band
            # frame and semdedup's embedding frame planned sf10 broadcasts
            # this audit v1 excused. So: cached subtrees
            # (InMemoryRelation) over fact scans are ALWAYS flagged;
            # uncached ones are excused only by a reducing node.
            cached = "InMemoryRelation" in body
            reduced = re.search(
                r"HashAggregate|SortAggregate|TakeOrdered|GlobalLimit|Window",
                body,
            )
            if scanned and (cached or not reduced):
                hits.append((scanned, sub[0].strip()))
        if hits:
            findings.append((name, hits))
        else:
            clean += 1
    print(f"audited {clean + len(findings)} plans @ {SF_DIR}; "
          f"skipped {len(skipped)} (eager/bucketed), {len(failed)} failed")
    for name, hits in findings:
        for scanned, node in hits:
            print(f"  REVIEW {name}: broadcast subtree scans {scanned} ({node[:80]})")
    for f in failed:
        print(f"  FAILED {f}")
    if not findings:
        print("no fact-scaled broadcast subtrees found outside skipped set")


if __name__ == "__main__":
    main()
