"""Fast iteration loop: run registered queries vs DuckDB oracles in ONE
session/process, report every mismatch (no pytest overhead, no -x abort).

Usage: python scripts/check_queries.py [name-substring ...] [--sf DIR]
"""

from __future__ import annotations

import sys
import time
import traceback

sys.path.insert(0, ".")

import duckdb

from lagom_kinesis_spark.catalog import TABLES
from lagom_kinesis_spark.registry import all_queries
from lagom_kinesis_spark.session import get_spark
from tests.conftest import assert_matches_oracle


def main() -> int:
    args = [a for a in sys.argv[1:]]
    sf_dir = "/root/testdata/sf0.001"
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i : i + 2]
    skips: list[str] = []
    while "--skip" in args:
        i = args.index("--skip")
        skips.append(args[i + 1])
        del args[i : i + 2]
    spark = get_spark("check-queries")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs = all_queries()
    names = [
        n
        for n in sorted(qs)
        if (not args or any(a in n for a in args))
        and not any(s in n for s in skips)
    ]
    failed = []
    for name in names:
        q = qs[name]
        t0 = time.time()
        try:
            df = q.fn(spark, sf_dir)
            if q.oracle is None:
                n = len(df.limit(100000).collect())
                print(f"  OK(rows-only) {name}: {n} rows [{time.time()-t0:.1f}s]")
            else:
                assert_matches_oracle(df, con, q.oracle)
                print(f"  OK {name} [{time.time()-t0:.1f}s]")
        except Exception as e:
            failed.append(name)
            msg = "".join(traceback.format_exception_only(type(e), e))[:500]
            print(f"  FAIL {name}: {msg}")
    print(f"\n{len(names)-len(failed)}/{len(names)} ok; failed: {failed}")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
