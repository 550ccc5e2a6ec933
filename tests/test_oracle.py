"""Differential test: every registered query vs its DuckDB oracle at SF_DIR.

Mirrors the driver's t2 gate (CORRECTNESS_r{N}.json) so failures surface
locally first. Rows-only queries (oracle=None) get a smoke check.
"""

from __future__ import annotations

import pytest

from lagom_kinesis_spark.registry import all_queries
from tests.conftest import SF_DIR, assert_matches_oracle

_QUERIES = all_queries()


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_vs_oracle(name, spark, duck):
    q = _QUERIES[name]
    df = q.fn(spark, SF_DIR)
    if q.oracle is None:
        rows = df.limit(10001).collect()
        assert rows is not None  # runs, stable schema, >=0 rows
        assert len(df.columns) > 0
    else:
        assert_matches_oracle(df, duck, q.oracle)


#: Queries whose oracle is legitimately empty on the tiny sf0.001 fixture
#: (data sparsity, not a wrong predicate): q_volume_shipping needs
#: cross-nation (NATION_1 x NATION_2) trade pairs that a 60-order fixture
#: may not contain — it is driver-green with rows at sf0.01.
_MAY_BE_EMPTY_AT_SF0001 = {"q_volume_shipping"}


def test_no_oracle_is_vacuously_empty(duck):
    """A 0-row result makes the differential gate pass without testing
    anything (both engines agree on nothing) — two such vacuous rows hid
    behind green checks until round 4 (q_product_type_profit's LIKE
    pattern matched no fixture part name; join_left_anti's NOT EXISTS was
    universally false). Catch the next one at fixture-regeneration time:
    every oracle must return at least one row, modulo the documented
    small-fixture exceptions."""
    empty = []
    for name in sorted(_QUERIES):
        q = _QUERIES[name]
        if q.oracle is None or name in _MAY_BE_EMPTY_AT_SF0001:
            continue
        if duck.sql(f"SELECT count(*) FROM ({q.oracle})").fetchone()[0] == 0:
            empty.append(name)
    assert not empty, f"vacuously-empty oracles (check their predicates): {empty}"


def test_compare_is_column_case_sensitive(spark, duck):
    """Driver-parity guard (r5 lesson): the driver's value hash sorts columns
    by RAW name, so a Spark frame with 'A','N' where the oracle has 'a','n'
    permutes the value tuples and hash-mismatches even on identical values.
    The local compare used to lowercase first and green-lit exactly that bug
    (sort_transpose_stats, the only red row on the r5 board). Assert the
    hardened compare now rejects it."""
    sdf = spark.createDataFrame([(1.0, 2.0, "x")], ["B", "a", "k"])
    # identical values, lowercase names -> raw-name column order differs
    sql = "SELECT 1.0::DOUBLE AS b, 2.0::DOUBLE AS a, 'x' AS k"
    with pytest.raises(AssertionError):
        assert_matches_oracle(sdf, duck, sql)
    # exact-name match still passes
    sdf2 = spark.createDataFrame([(1.0, 2.0, "x")], ["b", "a", "k"])
    assert_matches_oracle(sdf2, duck, sql)
