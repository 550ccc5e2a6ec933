"""As-of (point-in-time) join — an operator Spark lacks natively.

Semantics (matches DuckDB ``ASOF JOIN`` with ``l.ts >= r.ts``): for every
left row, attach the right row with the greatest ``ts`` not exceeding the
left row's ``ts``, within the same ``by`` group; null-extend when no prior
right row exists (left asof join).

Implementation is the union + running ``last(..., ignorenulls)`` rewrite
(SURVEY.md §7 M2): tag both sides, union, and take a per-group running
last-non-null of the right payload over rows ordered by
``(ts, side, tie)`` — right rows sort *before* left rows at equal ``ts`` so
the boundary is inclusive. Then keep only left rows.

Scale: exactly one shuffle on ``by`` + one per-partition sort — the same
cost envelope as any window function, and embarrassingly parallel across
groups. A hot ``by`` key concentrates one partition; for known-skewed keys
pre-split the left side by time range and union the results.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

_SIDE = "__asof_side"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    ts: str,
    by: Sequence[str],
    right_payload: Sequence[str],
    tie: str | None = None,
) -> DataFrame:
    """Left as-of join.

    Parameters
    ----------
    ts: timestamp column name present on both sides.
    by: equality-group columns present on both sides.
    right_payload: right-side columns to attach (must not clash with left).
    tie: optional right-side column that breaks ties among right rows with
        identical (by, ts) — the row with the greatest ``tie`` wins.
    """
    by = list(by)
    left_cols = left.columns
    r_tie = [tie] if tie and tie not in right_payload else []
    # A NULL right timestamp matches nothing (DuckDB ASOF: l.ts >= r.ts is
    # NULL → no match); unfiltered it would sort nulls-first and its
    # payload would fill every left row. NULL LEFT timestamps still
    # null-extend: they sort before all (filtered) right rows, so the
    # running frame holds no payload there.
    right = right.filter(F.col(ts).isNotNull())
    # NULL equality keys never match under SQL join semantics, but a
    # window's partitionBy groups NULLs into ONE partition — unfiltered,
    # a NULL-keyed right row would fill every NULL-keyed left row with a
    # phantom match. Dropping them leaves NULL-keyed left rows alone in
    # their partition, so they null-extend exactly like DuckDB.
    for c in by:
        right = right.filter(F.col(c).isNotNull())
    r = right.select(
        *by,
        ts,
        *[F.col(c) for c in right_payload],
        *[F.col(c) for c in r_tie],
        F.lit(0).alias(_SIDE),
    )
    l = left.select(
        "*",
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in right_payload],
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(c)
            for c in r_tie
            if c not in left_cols
        ],
        F.lit(1).alias(_SIDE),
    )
    unioned = l.unionByName(r, allowMissingColumns=True)

    order = [F.col(ts).asc(), F.col(_SIDE).asc()]
    if tie:
        order.append(F.col(tie).asc_nulls_first())
    w = (
        W.partitionBy(*by)
        .orderBy(*order)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    # The running last is taken over ONE struct of the whole right payload,
    # not per column: a per-column last(ignorenulls) cannot distinguish
    # "no prior right row" from "the matching right row's field is NULL" —
    # it would back-fill that field from an OLDER right row, and with
    # several payload columns could stitch together a row that never
    # existed. The struct is non-null exactly when a right row is present
    # (even if every field inside is NULL), so row integrity holds.
    row_struct = F.when(
        F.col(_SIDE) == 0, F.struct(*[F.col(c) for c in right_payload])
    )
    filled = unioned.select(
        "*",
        F.last(row_struct, ignorenulls=True).over(w).alias("__filled"),
    )
    return filled.filter(F.col(_SIDE) == 1).select(
        *left_cols,
        *[F.col(f"__filled.{c}").alias(c) for c in right_payload],
    )
