"""Capture .explain("formatted") plans for the round-12 touched queries.

Usage: python capture_plans_r12.py <tree_root> <out_dir> <suffix> [sf_dir]

- <tree_root>: repo tree to import lagom_kinesis_spark from (HEAD checkout
  for the *_after plans, a git worktree at the r11 snapshot for *_before).
- <suffix>: "before" or "after".
- sf_dir defaults to the driver bench fixture /root/testdata/sf0.1 so size
  estimates (and therefore join-strategy choices) match the bench.

connected_components drives its iterations eagerly (count() per round), so
the returned frame's plan is just a scan of the final checkpoint. To show
the per-iteration plan — where the r12 change (change flag riding inside
the checkpoint instead of a |V|x|V| re-join) lives — we intercept
DataFrame.localCheckpoint and dump the plan of every frame the operator
checkpoints while dedup_clusters runs at sf0.001 (small, converges fast).
No operator code is modified; the captured plans are the operator's own.
"""

import os
import sys

tree, out_dir, suffix = sys.argv[1], sys.argv[2], sys.argv[3]
sf_dir = sys.argv[4] if len(sys.argv) > 4 else "/root/testdata/sf0.1"
sys.path.insert(0, tree)
os.makedirs(out_dir, exist_ok=True)

from lagom_kinesis_spark.registry import all_queries  # noqa: E402
from lagom_kinesis_spark.session import get_spark  # noqa: E402

spark = get_spark("capture-plans-r12")
qs = all_queries()

QUERIES = [q.strip() for q in os.environ.get(
    "CAPTURE_QUERIES",
    "dedup_minhash_lsh,dedup_simhash,dedup_prefix_filter_join,"
    "dedup_semantic_semdedup",
).split(",") if q.strip()]

for name in QUERIES:
    if name not in qs:
        print(f"# {name}: not registered in this tree — skipped", file=sys.stderr)
        continue
    df = qs[name].fn(spark, sf_dir)
    plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )
    path = os.path.join(out_dir, f"{name}_{suffix}.txt")
    with open(path, "w") as f:
        f.write(f"# {name} — explain('formatted') @ {sf_dir} ({suffix})\n")
        f.write(plan)
    print(f"# wrote {path}", file=sys.stderr)

if os.environ.get("CAPTURE_CC", "1") == "1":
    # Per-iteration connected_components plan via localCheckpoint intercept.
    # Spark 4 note: pyspark.sql.DataFrame is the abstract base; the classic
    # session instantiates pyspark.sql.classic.dataframe.DataFrame, whose own
    # method definition shadows a base-class patch — patch the classic class.
    try:
        from pyspark.sql.classic.dataframe import DataFrame
    except ImportError:  # pre-4.0 layout
        from pyspark.sql import DataFrame

    captured = []
    counts = []
    real_lc = DataFrame.localCheckpoint
    real_count = DataFrame.count

    def spy_lc(self, eager=True):
        plan = self._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            self._jdf.queryExecution(), "formatted"
        )
        captured.append(plan)
        return real_lc(self, eager)

    def spy_count(self):
        # The r11 fixpoint check was a count() over a JOIN of two
        # checkpointed frames (never itself checkpointed); the r12 one is a
        # count() over a filter of ONE checkpointed frame. Checkpoint scans
        # appear as "Scan ExistingRDD" — keep only those counts so the
        # operator's own fixpoint jobs are captured without the query's
        # unrelated counts.
        plan = self._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            self._jdf.queryExecution(), "formatted"
        )
        if "ExistingRDD" in plan:
            counts.append(plan)
        return real_count(self)

    DataFrame.localCheckpoint = spy_lc
    DataFrame.count = spy_count
    try:
        # sf0.001: tiny fixture, CC converges in a few rounds; the plan
        # SHAPE per iteration is scale-independent.
        qs["dedup_clusters"].fn(spark, "/root/testdata/sf0.001").count()
    finally:
        DataFrame.localCheckpoint = real_lc
        DataFrame.count = real_count
    # captured[0] = edges, [1] = initial labels, [2] = first iteration's
    # new_labels — the frame whose plan the r12 change altered.
    path = os.path.join(out_dir, f"connected_components_iteration_{suffix}.txt")
    with open(path, "w") as f:
        f.write(
            "# connected_components: plan of every frame the operator "
            "localCheckpoints while dedup_clusters runs @ sf0.001 "
            f"({suffix}).\n# Frame 3 (and later) is one iteration's "
            "new-labels frame — the per-round loop body.\n"
        )
        for i, p in enumerate(captured, 1):
            f.write(f"\n{'='*72}\n# checkpointed frame {i}\n{'='*72}\n")
            f.write(p)
        f.write(
            f"\n\n{'#'*72}\n# fixpoint-check count() jobs over checkpoint "
            "scans (one per iteration)\n# — the plan the r12 change "
            f"altered\n{'#'*72}\n"
        )
        for i, p in enumerate(counts, 1):
            f.write(f"\n{'='*72}\n# fixpoint count {i}\n{'='*72}\n")
            f.write(p)
    print(
        f"# wrote {path} ({len(captured)} frames, {len(counts)} counts)",
        file=sys.stderr,
    )
