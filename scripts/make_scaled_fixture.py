"""Generate a scaled-up copy of a test fixture dir for bench floor analysis.

Usage: python scripts/make_scaled_fixture.py SRC_DIR DST_DIR FACTOR

Fact tables are replicated FACTOR times with primary keys offset per copy
(so join fan-outs and window/group densities scale the way a real larger
scale factor would: 10x orders per customer, 10x events per time bucket,
10x near-duplicate documents — not 10x distinct key ranges everywhere);
dimension tables are copied as-is. This exists to answer one question the
sf0.1 bench cannot (BENCH_NOTES.md): do the Spark-over-DuckDB ratios
collapse once per-query fixed costs amortize over real data volume? It is
a bench tool — correctness gates always run against the driver-generated
fixtures, never against this output.
"""

from __future__ import annotations

import os
import sys

import duckdb

#: fact table -> columns to offset by copy_index * domain offset
FACTS: dict[str, tuple[str, ...]] = {
    "lineitem": ("l_orderkey",),
    "orders": ("o_orderkey",),
    "events": ("event_id",),
    "documents": ("doc_id",),
    "embeddings": ("vec_id",),
}
#: shared key domains: every (table, column) in a domain gets ONE offset
#: (1 + max over ALL of them), so replicated copies stay join-aligned even
#: if one table's max key is missing from the other (e.g. an order with no
#: lineitems at the key-range tail).
DOMAINS: dict[str, tuple[tuple[str, str], ...]] = {
    "orderkey": (("lineitem", "l_orderkey"), ("orders", "o_orderkey")),
    "event_id": (("events", "event_id"),),
    "doc_id": (("documents", "doc_id"),),
    "vec_id": (("embeddings", "vec_id"),),
}
DIMS = ("region", "nation", "customer", "supplier", "part")


def make(src: str, dst: str, factor: int) -> None:
    """Build the scaled fixture (importable: bench.py --scaling uses this)."""
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for t in DIMS:
        con.sql(
            f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet')) "
            f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
        )
    domain_offset: dict[tuple[str, str], int] = {}
    for members in DOMAINS.values():
        off = 1 + max(
            con.sql(
                f"SELECT MAX({col}) FROM read_parquet('{src}/{tbl}.parquet')"
            ).fetchone()[0]
            for tbl, col in members
        )
        for tbl, col in members:
            domain_offset[(tbl, col)] = off
    for t, keys in FACTS.items():
        f = f"{src}/{t}.parquet"
        offsets = {k: domain_offset[(t, k)] for k in keys}
        copies = []
        for i in range(factor):
            cols = ", ".join(
                f"({k} + {i * offsets[k]}) AS {k}" if k in keys else k
                for k in [
                    c[0] for c in con.sql(f"DESCRIBE SELECT * FROM read_parquet('{f}')").fetchall()
                ]
            )
            copies.append(f"SELECT {cols} FROM read_parquet('{f}')")
        con.sql(
            f"COPY ({' UNION ALL '.join(copies)}) TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(t, "->", con.sql(f"SELECT COUNT(*) FROM read_parquet('{dst}/{t}.parquet')").fetchone()[0], "rows")
    # Completion marker: written LAST so an interrupted build (facts copied,
    # dims missing/truncated) is never mistaken for a finished fixture.
    # Keyed on (src, factor) so a different build spec forces a rebuild.
    with open(os.path.join(dst, "_DONE"), "w") as fh:
        fh.write(f"{os.path.abspath(src)}\nfactor={factor}\n")


def main() -> None:
    make(sys.argv[1], sys.argv[2], int(sys.argv[3]))


if __name__ == "__main__":
    main()
