"""Full-registry differential sweep at a scaled fixture (default sf1).

The scale where tie-order, state-volume, and float-magnitude bugs surface:
this sweep caught the stream_session_window islands tie-order bug (duplicate
boundary timestamps split arbitrarily by DuckDB's window tie order) and the
money-finalization ulp ambiguity (helpers.money_sum_sql docstring) — both
invisible at the sf0.01 gate fixture. Run it whenever money/window/streaming
oracles change.

Usage:
    python scripts/sweep_sf1.py [SF_DIR]   # default /tmp/lagom_kinesis_spark/scale/sf1
                                           # (build with: python scripts/make_scaled_fixture.py \
                                           #    /root/testdata/sf0.1 <SF_DIR> 10)

- Skips `oracle_quadratic`-tagged queries (all-pairs oracles blow up at 50k docs).
- Orders cheap semantic families first so a truncated run maximizes coverage.
- Resumable: names recorded in /tmp/sf1_sweep_done.txt are skipped on re-run.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__))))

DONE_PATH = "/tmp/sf1_sweep_done.txt"


def _done_path(sf_dir: str) -> str:
    """Resume file, keyed by fixture dir: a sweep against a different
    scale (or any non-default dir) must not inherit the default sf1
    sweep's done-set and silently skip everything. The default dir keeps
    the historical un-suffixed path so existing resume state survives."""
    default = "/tmp/lagom_kinesis_spark/scale/sf1"
    if os.path.abspath(sf_dir) == default:
        return DONE_PATH
    import hashlib

    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:8]
    return f"/tmp/sf1_sweep_done_{tag}.txt"


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/lagom_kinesis_spark/scale/sf1"

    import duckdb

    from gate_sim import canon_frame, value_hash
    from lagom_kinesis_spark.catalog import TABLES
    from lagom_kinesis_spark.registry import all_queries
    from lagom_kinesis_spark.session import get_spark

    spark = get_spark("sf1-sweep")
    qs = all_queries()
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    done: set[str] = set()
    done_path = _done_path(sf_dir)
    if os.path.exists(done_path):
        done = set(open(done_path).read().split())
    done_f = open(done_path, "a")

    def cost_key(n: str):
        heavy = (
            "dedup_", "sim_", "decontaminate_", "pipeline_", "emb_", "pack_",
            "text_winnow",
        )
        return (any(n.startswith(h) for h in heavy), n)

    fails: list[str] = []
    slow: list[tuple[str, float]] = []
    t_all = time.time()
    for name in sorted(qs, key=cost_key):
        q = qs[name]
        if name in done:
            continue
        if "oracle_quadratic" in q.tags or "oracle_heavy" in q.tags:
            print(f"SKIP      {name} (scale-limited oracle)", flush=True)
            continue
        t0 = time.time()
        try:
            spdf = q.fn(spark, sf_dir).toPandas()
            if q.oracle is None:
                print(
                    f"ROWS_ONLY {name} rows={len(spdf)} [{time.time() - t0:.1f}s]",
                    flush=True,
                )
                continue
            sc = canon_frame(spdf)
            dc = canon_frame(con.sql(q.oracle).df())
            ok = (
                len(sc) == len(dc)
                and list(sc.columns) == list(dc.columns)
                and value_hash(sc) == value_hash(dc)
            )
            dt = time.time() - t0
            if dt > 60:
                slow.append((name, round(dt, 1)))
            if ok:
                print(f"PASS      {name} [{dt:.1f}s]", flush=True)
                done_f.write(name + "\n")
                done_f.flush()
            else:
                fails.append(name)
                print(
                    f"FAIL      {name} spark_rows={len(sc)} duck_rows={len(dc)} [{dt:.1f}s]",
                    flush=True,
                )
        except Exception as e:  # noqa: BLE001 — sweep must finish
            fails.append(name)
            print(f"ERROR     {name}: {str(e)[:300]}", flush=True)
    print(f"\ntotal {time.time() - t_all:.0f}s; fails={fails}; slow={slow}", flush=True)
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
