"""Connected components via min-label propagation — the scalable
alternative to driver-side union-find (which dies at the first graph that
doesn't fit one machine).

Used by dedup_components (shingle/hash candidate edges) and
embedding_semantic_clusters (embedding near-dup edges); any (src, dst)
edge frame works. Per round: one shuffle join edges⋈labels + one
min-aggregate; converges in O(component diameter) rounds — tiny for dedup
graphs (chains of near-dups). localCheckpoint truncates lineage every
round so the plan stays flat instead of doubling.

Convergence detection: labels only ever DECREASE, so sum(label) is
strictly monotone while anything changes — an O(1)-output aggregate per
round instead of joining old vs new labels (a second shuffle plus a full
comparison pass).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import col


def propagate_min_labels(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "doc_id",
    max_rounds: int = 30,
    loop_partitions: int | None = None,
) -> DataFrame:
    """``nodes``: one row per vertex with column ``id_col``;
    ``edges``: (src, dst) directed pairs (symmetrized internally).
    Returns (``id_col``, label) where label = min vertex id reachable;
    singletons label themselves.

    ``max_rounds`` is a CORRECTNESS bound, not a budget: propagation needs
    O(component diameter) rounds, and returning early would silently hand
    back partially-propagated labels (diverging from the exact
    recursive-CTE oracles). If the fixpoint is not reached within
    ``max_rounds``, this raises — callers with deeper graphs must pass a
    larger bound.

    ``loop_partitions``: clamp the per-round frames to this many
    partitions. Incremental maintainers (operators/component_index.py)
    propagate batch-sized subgraphs where the default shuffle-partition
    count means every round schedules dozens of near-empty tasks; the
    clamp trades away parallelism the tiny frame can't use. Leave None
    for corpus-scale propagation (dedup_components)."""
    sym = (
        edges.select("src", "dst")
        .unionByName(edges.select(col("dst").alias("src"), col("src").alias("dst")))
        .distinct()
    )
    if loop_partitions:
        # coalesce, not repartition: the distinct above already shuffled,
        # and a tiny subgraph gains nothing from src-clustering — a second
        # full shuffle per propagation is pure overhead
        sym = sym.coalesce(loop_partitions)
    sym = sym.localCheckpoint(eager=False)  # first round's join materializes
    labels = nodes.select(col(id_col), col(id_col).alias("label"))
    prev_sum = None
    converged = False
    for _ in range(max_rounds):
        prop = sym.join(labels, sym.src == labels[id_col]).select(
            col("dst").alias(id_col), "label"
        )
        labels = labels.unionByName(prop).groupBy(id_col).agg(
            F.min("label").alias("label")
        )
        if loop_partitions:
            labels = labels.coalesce(loop_partitions)
        # lazy: the convergence aggregate right below materializes the
        # checkpoint inside its own job — one job per round, not two
        labels = labels.localCheckpoint(eager=False)
        label_sum = labels.agg(F.sum("label")).first()[0]
        if label_sum == prev_sum:
            converged = True
            break
        prev_sum = label_sum
    if not converged:
        raise RuntimeError(
            f"propagate_min_labels did not reach a fixpoint in {max_rounds} "
            "rounds (component diameter exceeds the bound); rerun with a "
            "larger max_rounds — returning partial labels would silently "
            "split components"
        )
    return labels
