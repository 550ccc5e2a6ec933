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
