"""Simulate the driver's correctness gate: every registered query at sf0.01,
Spark result vs DuckDB oracle, canonicalized like the driver (pandas
sort_values over name-sorted columns + value hash), with per-query wall time.

Usage: python scripts/gate_sim.py [sf_dir]  (default /root/testdata/sf0.01)
Prints one line per query and a budget summary — the tool for keeping all
116 queries inside the driver's check budget.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def canon_frame(pdf):
    """Driver-style canonicalization: RAW-name-sorted columns (the driver
    sorts case-sensitively — r5's transpose red row proved it), sort_values
    over everything, then a stable hash of the values."""
    import pandas as pd  # noqa: F401

    pdf = pdf[sorted(pdf.columns)]
    pdf = pdf.sort_values(by=list(pdf.columns), kind="mergesort").reset_index(
        drop=True
    )
    return pdf


def value_hash(pdf) -> str:
    import hashlib

    import datetime as _dt

    import numpy as np
    import pandas as pd

    h = hashlib.sha256()
    for row in pdf.itertuples(index=False):
        for v in row:
            if isinstance(v, float):
                # EXACT repr — no rounding tolerance. The engine contract is
                # bit-identical doubles (r6 on floats, the money VARCHAR-hop
                # on sums); a lenient local hash would green-light sub-1e-9
                # divergences the driver's exact compare then reds.
                v = repr(v)
            elif isinstance(v, (np.integer, int)) and not isinstance(v, bool):
                v = str(int(v))
            elif isinstance(v, (pd.Timestamp, _dt.datetime, _dt.date)):
                # Spark dates arrive as datetime.date, DuckDB as datetime64 —
                # same instant, different repr; compare on the ISO string.
                v = str(pd.Timestamp(v))
            else:
                v = repr(v)
            h.update(v.encode())
            h.update(b"\x1f")  # value delimiter: (12,3) must not hash as (1,23)
        h.update(b"\n")
    return h.hexdigest()


def main() -> None:
    # Optional subset: --only name1,name2 (anywhere in argv) for targeted
    # re-checks while iterating; the positional sf_dir remains argv[1]-ish.
    args = sys.argv[1:]
    only: set[str] | None = None
    if "--only" in args:
        i = args.index("--only")
        if i + 1 >= len(args):
            sys.exit("usage: gate_sim.py [SF_DIR] [--only name1,name2]")
        only = {n.strip() for n in args[i + 1].split(",") if n.strip()}
        if not only:
            # An empty set would skip every query and print a green-looking
            # empty payload — make the operator error loud instead.
            sys.exit("--only given but no query names parsed")
        args = args[:i] + args[i + 2 :]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    import duckdb

    from lagom_kinesis_spark.catalog import TABLES
    from lagom_kinesis_spark.registry import all_queries
    from lagom_kinesis_spark.session import get_spark

    spark = get_spark("gate-sim")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    results: dict[str, dict] = {}
    t_all = time.time()
    for name, q in all_queries().items():
        if only is not None and name not in only:
            continue
        t0 = time.time()
        entry: dict = {}
        try:
            sdf = q.fn(spark, sf_dir)
            spdf = sdf.toPandas()
            if q.oracle is None:
                entry = {"err": "no_oracle", "spark_rows": len(spdf)}
            else:
                dpdf = con.sql(q.oracle).df()
                sc = canon_frame(spdf)
                dc = canon_frame(dpdf)
                entry = {
                    "rows_match": len(sc) == len(dc),
                    "schema_match": list(sc.columns) == list(dc.columns),
                    "hash_match": value_hash(sc) == value_hash(dc),
                    "spark_rows": len(sc),
                    "oracle_rows": len(dc),
                }
        except Exception as e:  # noqa: BLE001
            entry = {"err": f"{type(e).__name__}: {e}"[:300]}
        entry["sec"] = round(time.time() - t0, 2)
        results[name] = entry
        ok = entry.get("hash_match")
        flag = "PASS" if ok else ("rows-only" if entry.get("err") == "no_oracle" else "FAIL")
        print(f"{flag:9s} {name:32s} {entry['sec']:6.2f}s", flush=True)

    total = round(time.time() - t_all, 1)
    n_pass = sum(1 for e in results.values() if e.get("hash_match"))
    n_ro = sum(1 for e in results.values() if e.get("err") == "no_oracle")
    n_fail = len(results) - n_pass - n_ro
    print(f"\ntotal {total}s  queries={len(results)}  pass={n_pass} rows_only={n_ro} fail={n_fail}")
    slow = sorted(results.items(), key=lambda kv: -kv[1]["sec"])[:10]
    print("slowest:", [(k, v["sec"]) for k, v in slow])
    with open("/tmp/gate_sim_results.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
