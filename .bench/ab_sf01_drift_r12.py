"""A/B decomposition of the probe-clean sf0.1 suite drift (VERDICT r11
ask #2): r10 tree (git worktree @ 5a4a9d6) vs r11/r12 tree (/root/repo),
INTERLEAVED on the same window so environment drift hits both arms
equally. Each arm runs `bench.py --scaling-tier sf0.1` in its own
subprocess with SPARK_GRAFT_TIER_QUERIES = the full 20-query TRAJECTORY
(skips the steady-state extras — the drifted number is the 20-query
suite total). Order ABBAAB; per-query MIN across each arm's 3 runs is
the reported value (same best-of discipline as the tier protocol).

Usage: python .bench/ab_sf01_drift_r12.py [out.json]
"""

import json
import os
import re
import subprocess
import sys

SF_DIR = "/root/testdata/sf0.1"
TREES = {"r10": "/tmp/r10tree", "r11": "/root/repo"}
ORDER = ["r10", "r11", "r11", "r10", "r10", "r11"]


def trajectory(tree: str) -> list[str]:
    src = open(os.path.join(tree, "bench.py")).read()
    m = re.search(r"TRAJECTORY = \[(.*?)\]", src, re.S)
    return re.findall(r'"([^"]+)"', m.group(1))


def run_tier(tree: str, out: str) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_TIER_QUERIES"] = ",".join(trajectory(tree))
    env["SPARK_GRAFT_SF_DIR"] = SF_DIR
    subprocess.run(
        [sys.executable, "bench.py", "--scaling-tier", SF_DIR, out],
        cwd=tree,
        env=env,
        check=True,
        timeout=1800,
    )
    with open(os.path.join(tree, out) if not os.path.isabs(out) else out) as f:
        return json.load(f)


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else ".bench/ab_sf01_drift_r12.json"
    runs: dict[str, list[dict]] = {"r10": [], "r11": []}
    for i, arm in enumerate(ORDER):
        out = f"/tmp/ab_drift_{arm}_{i}.json"
        print(f"# === run {i + 1}/{len(ORDER)}: {arm} ===", flush=True)
        runs[arm].append(run_tier(TREES[arm], out))
    report: dict = {"sf_dir": SF_DIR, "order": ORDER, "arms": {}}
    for arm, rs in runs.items():
        names = sorted(rs[0]["spark"])
        spark_min = {n: min(r["spark"][n] for r in rs) for n in names}
        duck_min = {
            n: min(r["duckdb"][n] for r in rs)
            for n in names
            if all(n in r["duckdb"] for r in rs)
        }
        report["arms"][arm] = {
            "spark_min": spark_min,
            "duck_min": duck_min,
            "spark_total_min_of_mins": round(sum(spark_min.values()), 3),
            "duck_total_min_of_mins": round(sum(duck_min.values()), 3),
            "spark_totals_per_run": [
                round(sum(r["spark"].values()), 3) for r in rs
            ],
            "duck_totals_per_run": [
                round(sum(r["duckdb"].values()), 3) for r in rs
            ],
            "probes": [r["contention"] for r in rs],
        }
    a, b = report["arms"]["r10"], report["arms"]["r11"]
    report["per_query_delta_pct"] = {
        n: round(
            100.0
            * (b["spark_min"][n] - a["spark_min"][n])
            / a["spark_min"][n],
            1,
        )
        for n in a["spark_min"]
        if n in b["spark_min"] and a["spark_min"][n] > 0
    }
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report["per_query_delta_pct"], indent=1))
    print(
        "r10 spark total(min)", a["spark_total_min_of_mins"],
        "r11 spark total(min)", b["spark_total_min_of_mins"],
    )
    print(
        "r10 duck total(min)", a["duck_total_min_of_mins"],
        "r11 duck total(min)", b["duck_total_min_of_mins"],
    )


if __name__ == "__main__":
    main()
