"""Skew-mitigation: salted two-phase aggregation.

At 100 TB a single hot key (one viral user, one dominant language) turns a
groupBy into one straggler task. AQE's skew-join splitting covers joins;
for *aggregations* the classic fix is salting: scatter each key over
``n_salts`` sub-keys, partially aggregate, then merge. Correct for any
algebraic aggregate (sum/count/min/max — and avg via sum+count).

The salt must be deterministic-per-row but uniform: we hash a unique column
rather than using rand() so reruns are reproducible (oracle-testable).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_sum_count(
    df: DataFrame,
    keys: Sequence[str],
    value: Column,
    unique_col: str | Column,
    n_salts: int = 16,
) -> DataFrame:
    """groupBy(keys) → (sum(value) AS total, count(*) AS n), skew-safely.

    ``n`` counts ROWS (count(*)), while ``total`` skips NULL values — so
    ``total / n`` is the average over rows, NOT ``avg(value)``, whenever
    ``value`` is nullable. Reconstruct a null-skipping mean from a
    non-null-counting aggregate (add ``count(__v)``) if you need one; the
    fixture metrics this serves are non-null, so row-count semantics are
    the contract here.

    Phase 1 groups on (keys + salt) — the hot key's rows spread over
    ``n_salts`` reducers; phase 2 merges the ``n_salts`` partials per key.
    Phase-2 input is tiny (n_salts rows per key), so the merge is free.
    """
    keys = list(keys)
    # unique_col may be a column NAME or a ready Column expression (e.g.
    # xxhash64 over a compound key when no single column is row-unique —
    # a non-unique salt source clumps same-key rows onto one sub-reducer
    # and quietly degrades the very skew spread this operator promises).
    ucol = F.col(unique_col) if isinstance(unique_col, str) else unique_col
    salt = F.pmod(F.xxhash64(ucol), F.lit(n_salts)).alias("__salt")
    phase1 = (
        df.select(*keys, salt, value.alias("__v"))
        .groupBy(*keys, "__salt")
        .agg(F.sum("__v").alias("__partial_sum"), F.count("*").alias("__partial_n"))
    )
    return phase1.groupBy(*keys).agg(
        F.sum("__partial_sum").alias("total"),
        F.sum("__partial_n").alias("n"),
    )
