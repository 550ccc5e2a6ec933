"""Connected components over a pair graph — near-dup cluster resolution.

The last step of every dedup pipeline: near-dup *pairs* → duplicate
*clusters* → one canonical doc per cluster. Implemented as iterative
min-label propagation driven from the driver: each round every node takes
the min label among itself and its neighbors; converges in O(diameter)
rounds (dup clusters are near-cliques, so 2-3 rounds in practice).

Scale notes:
- Each round is one join + one aggregation — all shuffles on the node id.
- ``localCheckpoint`` truncates the lineage each round; without it the
  plan doubles per iteration and the job dies long before 100 TB.
- For adversarial graphs (long chains) swap in the large-star/small-star
  algorithm (Kiveris et al., "Connected Components in MapReduce"), which
  converges in O(log n) rounds with the same join/agg building blocks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b", max_iter: int = 20
) -> DataFrame:
    """(id, cluster_id) for every node in ``pairs``; cluster_id = min node
    id of the component. Deterministic; fixpoint-checked each round."""
    if max_iter < 1:
        # The non-convergence diagnostic below references the last round's
        # change count; with zero rounds it would raise a NameError instead
        # of the intended message.
        raise ValueError(f"max_iter must be >= 1, got {max_iter}")
    fwd = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    # Materialize the edge list ONCE: every iteration joins against it, and
    # without truncation each round would re-run the (potentially expensive)
    # pair-generation plan upstream — e.g. an all-pairs Jaccard join —
    # once per iteration.
    edges = (
        fwd.unionByName(
            fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
        .localCheckpoint()
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        nbr_min = (
            edges.join(labels, edges.src == labels.id)
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("label").alias("nbr_label"))
        )
        new_label = F.least(
            F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
        )
        # The change flag rides INSIDE the checkpointed frame (1 byte/row)
        # so the fixpoint check is a filter+count over already-materialized
        # partitions — the old form re-joined new labels against old
        # (|V|⋈|V| shuffle per iteration) to compute the same number
        # (r12; min-label never increases, so changed ⇔ new < old).
        new_labels = (
            labels.join(nbr_min, "id", "left")
            .select(
                "id",
                new_label.alias("new_label"),
                (new_label < F.col("label")).alias("chg"),
            )
            .withColumnRenamed("new_label", "label")
            .localCheckpoint()  # truncate lineage — mandatory for iteration
        )
        changed = new_labels.filter("chg").count()
        labels = new_labels.select("id", "label")
        if changed == 0:
            break
    else:
        # Exhausting max_iter without a fixpoint means some component's
        # diameter exceeds the iteration budget — returning the partial
        # labels would silently split one logical cluster into several
        # (duplicate documents surviving dedup with no signal). Fail loud.
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} "
            f"iterations ({changed} labels still changing); raise max_iter"
        )
    return labels.select("id", F.col("label").alias("cluster_id"))
