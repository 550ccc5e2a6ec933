"""MERGE / upsert emulation without a lakehouse format.

Delta/Iceberg jars are not in this image; MERGE INTO semantics are
reproduced with pure DataFrame ops (the guide's documented emulation:
anti-join + union). Upsert = updates win over target on key match, inserts
otherwise — one shuffle per side on the key, broadcastable when the update
set is small (the common CDC case).

SCD2 variant (:func:`scd2_apply`): instead of replacing, close the old
version (valid_to = effective ts) and append the new one — the
slowly-changing-dimension type-2 MERGE every warehouse runs nightly. The
emulation returns the new full table state (the parquet-era pattern:
rewrite the dimension snapshot); on a versioned sink format the same two
join legs become the MERGE's matched/not-matched clauses.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def upsert(
    target: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    broadcast_updates: bool = True,
) -> DataFrame:
    """MERGE: rows of ``updates`` replace same-key rows of ``target``;
    unmatched update rows are inserted. Column sets must match.

    ``updates`` must be unique per key (enforce upstream with a window
    dedup) — classic MERGE precondition.
    """
    keys = list(keys)
    if set(target.columns) != set(updates.columns):
        raise ValueError(
            f"column mismatch: {sorted(target.columns)} vs {sorted(updates.columns)}"
        )
    upd = F.broadcast(updates) if broadcast_updates else updates
    kept = target.join(upd, keys, "left_anti")  # target rows not overwritten
    return kept.unionByName(updates)


def scd2_apply(
    target: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    attrs: Sequence[str],
    eff_col: str = "eff",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    is_current: str = "is_current",
    broadcast_updates: bool = True,
) -> DataFrame:
    """Type-2 slowly-changing-dimension MERGE, emulated on an immutable
    snapshot.

    ``target`` carries ``keys + attrs + valid_from + valid_to +
    is_current`` (history rows have is_current = false); ``updates``
    carries ``keys + attrs + eff_col`` and must be unique per key (the
    MERGE precondition, as in :func:`upsert`); update rows with a NULL
    effective timestamp are ignored — they cannot close a version, and
    processing them on only one leg would fork a second current version.
    For a matching CURRENT row
    whose attrs changed (null-safe comparison): the old version closes
    (valid_to = effective ts, is_current = false) and the new version
    appends; identical attrs are a no-op; unknown keys insert as new
    current rows; history rows pass through untouched.

    Scale: the update set is the CDC batch — one broadcast LEFT OUTER join
    (dimension probe side, update batch build side) feeds the close, keep,
    AND changed-reopen legs, plus one broadcast LEFT ANTI join for new
    keys (anti joins CAN build the hinted left side) — zero shuffles on
    the dimension; the returned frame is the full new table state, written
    back partition-parallel. On Delta / Iceberg the same legs are the
    matched/not-matched clauses of one MERGE INTO.
    """
    from functools import reduce

    keys, attrs = list(keys), list(attrs)
    # A NULL effective timestamp is invalid CDC input: it cannot close a
    # version (valid_to would be NULL = "current") and previously slipped
    # through the close leg while still inserting on the fresh leg —
    # forking TWO current versions for one key. Such rows are dropped
    # here so both legs see the same update set.
    u = updates.filter(F.col(eff_col).isNotNull()).select(
        *[F.col(k) for k in keys],
        *[F.col(a).alias(f"__u_{a}") for a in attrs],
        F.col(eff_col).alias("__eff"),
        # __eff doubles as the join-presence marker: the NULL-eff filter
        # above guarantees it is non-null on every update row (attrs can't
        # play this role — see __t_hit below).
    )
    if broadcast_updates:
        u = F.broadcast(u)
    cur = target.filter(F.col(is_current))
    hist = target.filter(~F.col(is_current))
    out_cols = target.columns
    j = cur.join(u, keys, "left")
    differs = reduce(
        lambda a, b: a | b,
        [~F.col(a).eqNullSafe(F.col(f"__u_{a}")) for a in attrs],
    )
    changed = F.col("__eff").isNotNull() & differs
    closed = j.filter(changed).select(
        *keys,
        *attrs,
        valid_from,
        F.col("__eff").alias(valid_to),
        F.lit(False).alias(is_current),
    )
    kept = j.filter(~changed | F.col("__eff").isNull()).select(*out_cols)

    def open_version(src: DataFrame) -> DataFrame:
        return src.select(
            *keys,
            *[F.col(f"__u_{a}").alias(a) for a in attrs],
            F.col("__eff").alias(valid_from),
            F.lit(None).cast(target.schema[valid_to].dataType).alias(valid_to),
            F.lit(True).alias(is_current),
        )

    # New versions open for (a) matched keys whose attrs changed — already
    # sitting in j, the close leg's join, so reuse it rather than joining
    # the dimension again — and (b) brand-new keys: anti-join the batch
    # against the MATCHED key set, which is itself derived from j and at
    # most |updates| rows, so it broadcasts as the anti join's build side.
    # (The previous spelling — updates LEFT OUTER dimension — broke the
    # scale contract: neither left-outer nor left-anti can broadcast-build
    # the LEFT side, so the hinted batch was unusable and the plan
    # sort-merge-shuffled the entire current dimension a second time per
    # MERGE. Every probe of the dimension is now map-side.)
    matched_keys = j.filter(F.col("__eff").isNotNull()).select(*keys)
    if broadcast_updates:
        matched_keys = F.broadcast(matched_keys)
    fresh = open_version(j.filter(changed)).unionByName(
        open_version(u.join(matched_keys, keys, "left_anti"))
    )
    return (
        hist.select(*out_cols)
        .unionByName(kept)
        .unionByName(closed.select(*out_cols))
        .unionByName(fresh.select(*out_cols))
    )
