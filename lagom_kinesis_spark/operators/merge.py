"""MERGE / upsert emulation without a lakehouse format.

Delta/Iceberg jars are not in this image; MERGE INTO semantics are
reproduced with pure DataFrame ops (the guide's documented emulation:
anti-join + union). Upsert = updates win over target on key match, inserts
otherwise — one shuffle per side on the key, broadcastable when the update
set is small (the common CDC case).

SCD2 variant: instead of replacing, close the old row (valid_to = now) and
append the new one — same join skeleton, kept out of scope until a
versioned sink format lands.
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
