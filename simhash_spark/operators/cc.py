"""Connected components over verified duplicate pairs.

Iterative DataFrame min-label propagation (the north_star's required
"iterative DataFrame connected-components (label-propagation) join loop"):

    labels(id, comp) starts at comp = id;
    each round every vertex takes min(comp) over itself and its
    neighbors; stop when no label changed.

Converges in O(diameter) rounds — duplicate clusters are near-cliques
(LSH links most members directly), so diameter is small in practice; the
star edges from hot bands add hub-spoke diameter 2.

Fault tolerance at scale (SURVEY.md §4.2 item 3):

- every round the plan is truncated with ``localCheckpoint`` (one action
  per round, fused with the convergence Observation) — but executor loss
  loses a localCheckpoint, so when a ``store`` (CheckpointStore) is
  passed the labels table is ALSO committed durably every
  ``checkpoint_every`` rounds, and the loop RESUMES from the committed
  labels on restart (min-label propagation is monotonic + idempotent:
  restarting from any intermediate label state reaches the same
  fixpoint).
- localCheckpoint storage is bounded to ~2 rounds: once round r is
  materialized, round r-1's blocks are explicitly unpersisted (a
  long-lived driver must not accumulate O(iterations) cached RDDs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _local_ckpt(df: DataFrame):
    """Eager localCheckpoint + a DIRECT handle to the checkpointed RDD
    (the LogicalRDD the new plan is rebased onto). Cleanup unpersists
    exactly what CC created — the previous set-diff over the context's
    global getPersistentRDDs map attributed any concurrently-persisted
    blocks (a streaming query, a second pipeline on the same session) to
    'this round' and unpersisted them out from under their owners
    (ADVICE r2)."""
    cdf = df.localCheckpoint()
    return cdf, cdf._jdf.queryExecution().analyzed().rdd()


def _unpersist(handles) -> None:
    for h in handles:
        try:
            h.unpersist(False)
        except Exception:
            pass


def connected_components(
    edges: DataFrame,
    max_iters: int = 50,
    metrics_sink=None,
    store=None,
    stage: str = "cc_labels",
    checkpoint_every: int = 5,
) -> DataFrame:
    """edges(a, b) -> labels(clip_id, cluster_id) for every vertex that
    appears in an edge. cluster_id = min clip_id of the component.

    ``store``: optional CheckpointStore for durable mid-loop checkpoints
    (every ``checkpoint_every`` rounds) and kill/resume: if ``stage`` is
    already committed, iteration continues from the stored labels instead
    of restarting from scratch.
    """
    e = edges.select("a", "b")
    sym = e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    sym, sym_h = _local_ckpt(sym.dropDuplicates(["a", "b"]))

    resumed = store is not None and store.is_committed(stage)
    prev_h: list = []  # handle(s) of the CURRENT round's checkpointed labels
    if resumed:
        labels = store.read(stage)
        if metrics_sink is not None:
            metrics_sink("cc_resume", 1, stage=stage)
    else:
        labels, h = _local_ckpt(
            sym.select(F.col("a").alias("id")).distinct().withColumn("comp", F.col("id"))
        )
        prev_h = [h]

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
        new_labels, new_h = _local_ckpt(  # one action per round: ckpt + observed count
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
        )
        changed = int(obs.get["changed"] or 0)
        # round r is materialized -> free round r-1's localCheckpoint blocks.
        _unpersist(prev_h)
        prev_h = [new_h]
        labels = new_labels
        if metrics_sink is not None:
            metrics_sink("cc_changed", changed, iteration=it)
        if store is not None and changed > 0 and (it + 1) % checkpoint_every == 0:
            # durable mid-loop checkpoint: survives executor/driver loss.
            store.write(stage, labels)
            labels = store.read(stage)
            _unpersist(prev_h)
            prev_h = []
        if changed == 0:
            break
    else:
        raise RuntimeError(f"connected_components did not converge in {max_iters} iters")

    if store is not None:
        # final state durable + plan rebased onto parquet, so every
        # CC-internal localCheckpoint (incl. sym and the last round) can
        # be freed immediately.
        store.write(stage, labels)
        labels = store.read(stage)
        _unpersist(prev_h)
        prev_h = []
    # sym is CC-internal either way: the returned labels never reference it.
    _unpersist([sym_h])

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
