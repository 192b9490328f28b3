"""Connected components over verified duplicate pairs.

Iterative DataFrame min-label propagation (the north_star's required
"iterative DataFrame connected-components (label-propagation) join loop"):

    labels(id, comp) starts at comp = id;
    each round every vertex takes min(comp) over itself and its
    neighbors; stop when no label changed.

Converges in O(diameter) rounds — duplicate clusters are near-cliques
(LSH links most members directly), so diameter is small in practice; the
star edges from hot bands add hub-spoke diameter 2. ``localCheckpoint``
truncates the plan each round (SURVEY.md §4.2 item 3: without it the
lineage tree grows exponentially), and the loop is capped at
``max_iters`` as a safety guard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    max_iters: int = 50,
    metrics_sink=None,
) -> DataFrame:
    """edges(a, b) -> labels(clip_id, cluster_id) for every vertex that
    appears in an edge. cluster_id = min clip_id of the component."""
    e = edges.select("a", "b")
    sym = e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    sym = sym.dropDuplicates(["a", "b"]).localCheckpoint()

    labels = (
        sym.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("comp", F.col("id"))
        .localCheckpoint()
    )

    from pyspark.sql import Observation

    for it in range(max_iters):
        # neighbor-min: for each dst, min comp over incoming neighbors.
        nbr_min = (
            sym.join(labels, sym["a"] == labels["id"], "inner")
            .select(F.col("b").alias("id"), F.col("comp"))
            .groupBy("id")
            .agg(F.min("comp").alias("nbr_comp"))
        )
        obs = Observation(f"cc_iter_{it}")
        new_labels = (
            labels.join(nbr_min, "id", "left")
            .select(
                "id",
                F.least(F.col("comp"), F.coalesce(F.col("nbr_comp"), F.col("comp"))).alias(
                    "new_comp"
                ),
                "comp",
            )
            .observe(
                obs, F.sum((F.col("new_comp") != F.col("comp")).cast("long")).alias("changed")
            )
            .select("id", F.col("new_comp").alias("comp"))
            .localCheckpoint()  # one action per round: checkpoint + observed count
        )
        changed = int(obs.get["changed"] or 0)
        labels = new_labels
        if metrics_sink is not None:
            metrics_sink("cc_changed", changed, iteration=it)
        if changed == 0:
            break
    else:
        raise RuntimeError(f"connected_components did not converge in {max_iters} iters")

    return labels.select(F.col("id").alias("clip_id"), F.col("comp").alias("cluster_id"))


def assign_clusters(all_ids: DataFrame, cc_labels: DataFrame) -> DataFrame:
    """all_ids(clip_id) + cc_labels -> clusters(clip_id, cluster_id) for
    EVERY clip; singletons get cluster_id = own clip_id."""
    return (
        all_ids.join(cc_labels, "clip_id", "left")
        .select(
            "clip_id",
            F.coalesce(F.col("cluster_id"), F.col("clip_id")).alias("cluster_id"),
        )
    )
