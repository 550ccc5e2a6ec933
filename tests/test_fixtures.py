"""Fixture-contract self-check (VERDICT r2 ask #3).

The driver regenerates /root/testdata between rounds and has already changed
the physical encoding of ``events.ts`` once (int64 ns → timestamp[us]),
silently breaking every events consumer. This suite pins the contract the
engine depends on — column names, type families the canonicalizer accepts,
embedding element type, presence at every scale factor — so an encoding swap
fails HERE at commit time instead of inside 29 queries at the driver gate.

Pure-pyarrow (no Spark session): runs in milliseconds, safe as the first
file pytest collects.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF_DIRS = [
    d
    for d in (
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    )
    if os.path.isdir(d)
]

#: column -> acceptable pyarrow type-family predicate, per table.
_INT = pa.types.is_integer
_FLOAT = pa.types.is_floating
_STR = lambda t: pa.types.is_string(t) or pa.types.is_large_string(t)  # noqa: E731
#: ts encodings normalize_event_ts canonicalizes: int64 (legacy ns) or timestamp.
_TS_OK = lambda t: pa.types.is_int64(t) or pa.types.is_timestamp(t)  # noqa: E731

EXPECTED: dict[str, dict[str, object]] = {
    "region": {"r_regionkey": _INT, "r_name": _STR},
    "nation": {"n_nationkey": _INT, "n_name": _STR, "n_regionkey": _INT},
    "customer": {
        "c_custkey": _INT,
        "c_name": _STR,
        "c_nationkey": _INT,
        "c_acctbal": _FLOAT,
        "c_mktsegment": _STR,
    },
    "supplier": {
        "s_suppkey": _INT,
        "s_name": _STR,
        "s_nationkey": _INT,
        "s_acctbal": _FLOAT,
    },
    "part": {
        "p_partkey": _INT,
        "p_name": _STR,
        "p_brand": _STR,
        "p_type": _STR,
        "p_size": _INT,
        "p_retailprice": _FLOAT,
    },
    "orders": {
        "o_orderkey": _INT,
        "o_custkey": _INT,
        "o_orderstatus": _STR,
        "o_totalprice": _FLOAT,
        "o_orderdate": _TS_OK,
        "o_orderpriority": _STR,
    },
    "lineitem": {
        "l_orderkey": _INT,
        "l_partkey": _INT,
        "l_suppkey": _INT,
        "l_linenumber": _INT,
        "l_quantity": _FLOAT,
        "l_extendedprice": _FLOAT,
        "l_discount": _FLOAT,
        "l_tax": _FLOAT,
        "l_returnflag": _STR,
        "l_linestatus": _STR,
        "l_shipdate": _TS_OK,
    },
    "events": {
        "event_id": _INT,
        "ts": _TS_OK,
        "user_id": _INT,
        "event_type": _STR,
        "value": _FLOAT,
        "props": _STR,
    },
    "documents": {
        "doc_id": _INT,
        "text": _STR,
        "lang": _STR,
        "source": _STR,
        "n_chars": _INT,
    },
    "embeddings": {
        "vec_id": _INT,
        "embedding": lambda t: (
            pa.types.is_list(t) or pa.types.is_large_list(t)
        )
        and pa.types.is_floating(t.value_type),
        "label": _INT,
    },
}


@pytest.mark.parametrize("sf_dir", SF_DIRS)
@pytest.mark.parametrize("table", sorted(EXPECTED))
def test_fixture_schema(sf_dir: str, table: str) -> None:
    path = f"{sf_dir}/{table}.parquet"
    assert os.path.exists(path), f"fixture missing: {path}"
    schema = pq.read_schema(path)
    names = set(schema.names)
    for col, ok in EXPECTED[table].items():
        assert col in names, f"{path}: missing column {col}"
        t = schema.field(col).type
        assert ok(t), f"{path}: {col} has unexpected encoding {t}"


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_events_value_is_two_decimal(sf_dir: str) -> None:
    """events.value is a 2-decimal quantity stored as double (each stored
    value is the double nearest to k/100). The exact int64 fast path
    (helpers.units on "value" — win_running_total's window accumulation)
    depends on this: round-to-nearest of value*100 must recover the exact
    unit count. If a future fixture generation ships full-precision
    doubles here, this must fail loudly rather than the units() view
    silently changing the query's semantics."""
    import pyarrow.compute as pc

    v = pq.read_table(f"{sf_dir}/events.parquet", columns=["value"])["value"]
    scaled = pc.multiply(v, pa.scalar(100.0))
    # |value*100 - round(value*100)| stays at float-noise scale (≪ 0.5)
    # for doubles that round-trip a 2-decimal literal.
    err = pc.abs(pc.subtract(scaled, pc.round(scaled)))
    worst = pc.max(err).as_py()
    assert worst is not None and worst < 1e-6, worst


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_events_ts_unit_is_canonicalizable(sf_dir: str) -> None:
    """If events.ts is a timestamp it must be an epoch-anchored unit we map
    exactly to µs; if int64 it is the legacy ns encoding. Anything else is a
    new fixture generation the canonicalizer must be taught about."""
    t = pq.read_schema(f"{sf_dir}/events.parquet").field("ts").type
    if pa.types.is_timestamp(t):
        assert t.unit in ("s", "ms", "us", "ns"), t
    else:
        assert pa.types.is_int64(t), t


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_embedding_dim_constant(sf_dir: str) -> None:
    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["embedding"])
    lengths = pa.compute.list_value_length(tbl["embedding"])
    uniq = pa.compute.unique(lengths).to_pylist()
    assert len(uniq) == 1 and uniq[0] > 0, f"ragged embedding dims: {uniq[:5]}"


def test_normalize_event_ts_equivalent_across_encodings(tmp_path):
    """The canonicalizer must yield IDENTICAL timestamps whether the file
    carries legacy int64 nanos (read via nanosAsLong) or timestamp[us] —
    the two encodings the driver has shipped so far. Written as a
    round-trip over one generated dataset in both encodings."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lagom_kinesis_spark.catalog import normalize_event_ts
    from lagom_kinesis_spark.session import get_spark

    spark = get_spark("ts-equiv")
    # µs values incl. sub-ms tails and an exact-second boundary.
    base = 1_700_000_000_000_000
    us = [base, base + 1, base + 999, base + 123_456, base + 86_400_000_000]
    ns_tbl = pa.table(
        {
            "event_id": pa.array(range(len(us)), pa.int64()),
            "ts": pa.array([u * 1000 + 777 for u in us], pa.int64()),
        }
    )
    us_tbl = pa.table(
        {
            "event_id": pa.array(range(len(us)), pa.int64()),
            "ts": pa.array(us, pa.timestamp("us")),
        }
    )
    ns_path, us_path = str(tmp_path / "ns.parquet"), str(tmp_path / "us.parquet")
    pq.write_table(ns_tbl, ns_path)
    pq.write_table(us_tbl, us_path)

    def canon(path):
        df = normalize_event_ts(spark.read.parquet(path))
        assert str(df.schema["ts"].dataType) == "TimestampType()"
        return {r["event_id"]: r["ts"] for r in df.collect()}

    a, b = canon(ns_path), canon(us_path)
    # ns values carry a +777ns tail the µs file cannot: the floor must drop
    # it, making both encodings agree exactly.
    assert a == b


def test_normalize_event_ts_floor_division_on_negative_ns(spark):
    """The legacy int64-ns branch must FLOOR to µs like the oracle's
    `epoch_ns(ts)//1000` — truncation (`div`) would differ by 1 µs on
    pre-1970 values. -1500 ns floors to -2 µs; +1500 ns to +1 µs."""
    from pyspark.sql import functions as F

    from lagom_kinesis_spark.catalog import normalize_event_ts

    df = spark.createDataFrame([(-1500,), (1500,), (-1000,), (0,)], "ts long")
    out = normalize_event_ts(df).select(
        F.unix_micros("ts").alias("us")
    )
    assert [r["us"] for r in out.collect()] == [-2, 1, -1, 0]


def test_registry_names_map_to_survey_rows():
    """Every registered query name appears backticked in SURVEY.md §2B or
    COVERAGE.md, and no family-prefixed backticked token in those mapping
    docs is an unregistered (renamed/removed) query — the mechanical
    name↔row diff a judge runs, kept green in-tree (VERDICT r9 ask #7)."""
    import os
    import sys

    sys.path.insert(
        0,
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"),
    )
    from check_survey_map import audit

    unmapped, stale = audit()
    assert not unmapped, f"registered queries missing from mapping docs: {unmapped}"
    assert not stale, f"stale doc tokens (rename left behind?): {stale}"
