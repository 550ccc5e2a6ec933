"""Property-based spot checks (SURVEY.md §5.2 layer 4): algebraic
invariants of the engine over hypothesis-generated frames. Few examples,
small frames — each example pays Spark job latency."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

ROWS = st.lists(
    st.tuples(
        st.integers(min_value=-5, max_value=5),  # key
        st.integers(min_value=-1000, max_value=1000),  # value
    ),
    min_size=0,
    max_size=25,
)

SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _df(spark, rows):
    return spark.createDataFrame(rows or [(0, 0)], "k int, v int").limit(
        len(rows)
    )


@given(rows=ROWS)
@SETTINGS
def test_dedup_idempotent(spark, rows):
    df = _df(spark, rows)
    once = df.dropDuplicates().collect()
    twice = df.dropDuplicates().dropDuplicates().collect()
    assert sorted(map(tuple, once)) == sorted(map(tuple, twice))


@given(rows=ROWS)
@SETTINGS
def test_filter_project_commute(spark, rows):
    """filter∘project ≡ project∘filter when the predicate survives pruning —
    the algebraic identity behind predicate pushdown."""
    df = _df(spark, rows)
    a = df.filter(F.col("v") > 0).select("k").collect()
    b = df.select("k", "v").filter(F.col("v") > 0).select("k").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


@given(rows=ROWS, rows2=ROWS)
@SETTINGS
def test_inner_join_commutative(spark, rows, rows2):
    a = _df(spark, rows)
    b = _df(spark, rows2).withColumnRenamed("v", "v2")
    ab = a.join(b, "k").select("k", "v", "v2").collect()
    ba = b.join(a, "k").select("k", "v", "v2").collect()
    assert sorted(map(tuple, ab)) == sorted(map(tuple, ba))


@given(rows=ROWS, rows2=ROWS)
@SETTINGS
def test_union_all_counts(spark, rows, rows2):
    a, b = _df(spark, rows), _df(spark, rows2)
    assert a.unionByName(b).count() == a.count() + b.count()


@given(rows=ROWS)
@SETTINGS
def test_agg_sum_equals_python(spark, rows):
    df = _df(spark, rows)
    got = df.agg(F.sum("v")).collect()[0][0]
    expected = sum(v for _, v in rows) if rows else None
    assert got == expected
