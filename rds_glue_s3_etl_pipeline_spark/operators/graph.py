"""Connected components over a pair-edge list — the cluster-resolution
step of a dedup pipeline (near-dup PAIRS from MinHash/Jaccard/SimHash
become dup GROUPS; one representative per group survives).

Algorithm: alternating min-label propagation (the classic large-graph
formulation used by GraphX/GraphFrames' connectedComponents): every
node repeatedly adopts the minimum label among itself and its
neighbors until fixpoint. Each round is one join + one aggregation —
all shuffle-partitioned on the node id, no driver-side graph state.
Rounds needed = graph diameter (dedup clusters are shallow: usually
2-4). Lineage is truncated per round via localCheckpoint so the plan
does not grow exponentially across iterations.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
    strict: bool = True,
) -> DataFrame:
    """Return (id, cluster_id) for every node in ``edges``, where
    cluster_id is the minimum node id of its connected component.

    ``edges`` is undirected input given as one row per pair (either
    orientation). Nodes with no edges are simply absent — union them
    back with label=id if isolated nodes must appear.

    Converges in O(diameter) rounds. If ``max_iter`` is exhausted
    before fixpoint the labels are only partially propagated; with
    ``strict`` (default) that raises, otherwise it warns and returns
    the partial labels.
    """
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
    )
    sym = sym.localCheckpoint(eager=True)

    labels = (
        sym.select(F.col("a").alias("id"))
        .distinct()
        .select("id", F.col("id").alias("label"))
        .localCheckpoint(eager=True)
    )

    changed = 0
    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels, sym.b == labels.id)
            .groupBy("a")
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(nbr_min, labels.id == nbr_min.a, "left")
            .select(
                "id",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break

    if changed != 0:
        msg = (
            f"connected_components did not converge within max_iter={max_iter} "
            "rounds (component diameter exceeds max_iter); labels are partial"
        )
        if strict:
            raise RuntimeError(msg)
        warnings.warn(msg, RuntimeWarning, stacklevel=2)

    return labels.select(F.col("id"), F.col("label").alias("cluster_id"))
