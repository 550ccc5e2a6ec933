"""As-of (point-in-time) join — an operator Spark lacks natively.

Semantics (matches DuckDB ``ASOF JOIN`` with ``l.ts >= r.ts``): for every
left row, attach the right row with the greatest ``ts`` not exceeding the
left row's ``ts``, within the same ``by`` group; null-extend when no prior
right row exists (left asof join).

Implementation is the union + running ``last(..., ignorenulls)`` rewrite
(SURVEY.md §7 M2): tag both sides, union, and take a per-group running
last-non-null of the right payload over rows ordered by time — right rows
sort *before* left rows at equal ``ts`` so the boundary is inclusive.
Then keep only left rows.

Two sort-cost refinements (measured at sf10, BENCH_NOTES.md round-8):

- **Right-side ties are resolved BEFORE the union**, not by a tie key in
  the window order: the ``tie`` contract ("greatest ``tie`` wins among
  right rows with identical (by, ts)") is one struct-max aggregation on
  the right side — partial+final, so heavily tied inputs shrink at the
  map side before they ever shuffle — and the asof sort then carries at
  most one right row per (by, ts) and needs no third sort key.
- **For timestamp ``ts`` the window orders by ONE packed long**
  (``unix_micros(ts)·2 + side``): Spark's sort radixes only the leading
  key's 64-bit prefix and falls back to comparator calls for the rest,
  so each extra sort key on a low-cardinality-prefixed sort costs real
  time (sf10, 4M rows under ~1.5k `by` groups: 1-key sort 1.9 s, 2-key
  3.2 s). µs magnitudes (~2^51) leave the ×2+side headroom exact in
  int64. Non-timestamp ``ts`` (tests use ints) keeps the generic
  (ts, side) order.

Scale: exactly one shuffle of the union on ``by`` + one per-partition
sort — the same cost envelope as any window function, and embarrassingly
parallel across groups (plus the right-side pre-reduce exchange, which is
dimension-shaped after its map-side combine). A hot ``by`` key
concentrates one partition; for known-skewed keys pre-split the left side
by time range and union the results.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampType

_SIDE = "__asof_side"
_ORD = "__asof_ord"
_TIE = "__asof_tie"


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
        identical (by, ts) — the row with the greatest ``tie`` wins
        (NULL ``tie`` loses to any non-NULL one). Without it, the winner
        among tied right rows is engine-arbitrary.

    Contract: when ``tie`` is given, every ``right_payload`` column must be
    of an ORDERABLE type (the tie winner is pre-reduced with a struct-max
    whose trailing fields are the payload; a map-typed payload fails at
    analysis time). Payloads containing maps need a max_by formulation
    instead — none of the in-repo callers do.
    """
    by = list(by)
    left_cols = left.columns
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
    if tie is not None:
        # Resolve the tie winner per (by, ts) up front (see module doc).
        # struct-max with the tie as the LEADING field: greatest tie wins,
        # NULL tie sorts smallest (loses to non-null — the same outcome as
        # the previous asc_nulls_first window order), and equal ties fall
        # through to a deterministic payload comparison. Requires the
        # payload fields to be orderable (true of every in-repo caller);
        # a map-typed payload would need max_by instead.
        winner = F.max(
            F.struct(F.col(tie).alias(_TIE), *[F.col(c) for c in right_payload])
        ).alias("__asof_w")
        right = (
            right.groupBy(*by, ts)
            .agg(winner)
            .select(
                *by,
                ts,
                *[F.col(f"__asof_w.{c}").alias(c) for c in right_payload],
            )
        )
    r = right.select(
        *by,
        ts,
        *[F.col(c) for c in right_payload],
        F.lit(0).alias(_SIDE),
    )
    l = left.select(
        "*",
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in right_payload],
        F.lit(1).alias(_SIDE),
    )
    unioned = l.unionByName(r, allowMissingColumns=True)

    if isinstance(unioned.schema[ts].dataType, TimestampType):
        # One radix-friendly long: µs·2 + side. TIMESTAMP only — an NTZ
        # value's µs extraction would go through a session-zone cast whose
        # DST folds can merge distinct instants; NTZ/numeric ts keep the
        # two-key order below.
        unioned = unioned.withColumn(
            _ORD, F.unix_micros(F.col(ts)) * 2 + F.col(_SIDE)
        )
        order = [F.col(_ORD).asc()]
    else:
        order = [F.col(ts).asc(), F.col(_SIDE).asc()]
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
    #
    # Rows that share an order key (several left rows at one (by, ts), or
    # tie-less right duplicates) make the ROWS frame order-dependent in
    # principle, but not in result: equal-key left rows contribute only
    # NULL structs, so last(ignorenulls) is invariant to their mutual
    # order, and with `tie` given there is exactly one right row per
    # (by, ts) by construction.
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
