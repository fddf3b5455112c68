"""Distributed DBSCAN over a precomputed eps-edge list — the shared
core/border/noise pipeline behind q219 (exact label-blocked edges),
q223 (adaptive-grid edges), and the incremental grid refresh.

Graph-DBSCAN factorization: once eps-neighborhoods are an edge list,
DBSCAN is (1) one degree aggregate → core points (degree >=
``min_nbrs``), (2) connected components over CORE-CORE edges only
(star contraction, O(log² n) rounds, shuffle = edge count), (3) border
= non-core with a core neighbor, assigned to its MINIMUM core cluster
(the deterministic resolution of DBSCAN's order-dependent border tie),
(4) everything else noise. Nothing downstream of the edge list is ever
all-pairs, so the operator inherits the edge generator's scale law —
linear for the adaptive grid, quadratic-per-label for the exact
anchor (q219's documented contract).

Reference scope: EXT (SURVEY §2.11); the reference job has no
clustering surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .graph import connected_components_star


def dbscan_from_edges(
    ids: DataFrame,
    sym: DataFrame,
    min_nbrs: int,
    id_col: str = "vec_id",
) -> DataFrame:
    """(id_col, role, cluster_id) for every row of ``ids``.

    ``sym`` is the symmetric eps-neighbor edge list as (a, b) with each
    DIRECTED edge appearing exactly once — degree counts are
    duplicate-sensitive, so callers whose pair source may repeat an
    unordered pair must ``.distinct()`` first (q219 does; the grid
    candidate join emits each orientation once by construction).
    ``ids`` is the point universe: one output row per member, role
    'noise' with NULL cluster_id for points absent from the edge list.
    Cluster ids are component-minimum point ids.
    """
    deg = sym.groupBy("a").agg(F.count(F.lit(1)).alias("d"))
    core = deg.filter(F.col("d") >= min_nbrs).select(F.col("a").alias(id_col))
    csym = (
        sym.join(core.withColumnRenamed(id_col, "a"), "a")
        .join(core.withColumnRenamed(id_col, "b"), "b")
        .select("a", "b")
    )
    ccl = connected_components_star(csym, src="a", dst="b").select(
        F.col("id").alias(id_col), "cluster_id"
    )
    corecl = core.join(ccl, id_col, "left").select(
        id_col, F.coalesce("cluster_id", id_col).alias("cluster_id")
    )
    border = (
        sym.join(corecl.select(F.col(id_col).alias("b"), "cluster_id"), "b")
        .join(core.withColumnRenamed(id_col, "a"), "a", "left_anti")
        .groupBy("a")
        .agg(F.min("cluster_id").alias("cluster_id"))
        .withColumnRenamed("a", id_col)
    )
    return (
        ids.join(corecl.withColumnRenamed("cluster_id", "c_cl"), id_col, "left")
        .join(border.withColumnRenamed("cluster_id", "b_cl"), id_col, "left")
        .select(
            id_col,
            F.when(F.col("c_cl").isNotNull(), "core")
            .when(F.col("b_cl").isNotNull(), "border")
            .otherwise("noise")
            .alias("role"),
            F.coalesce("c_cl", "b_cl").alias("cluster_id"),
        )
    )


def dbscan_blocked(
    ids: DataFrame,
    sym: DataFrame,
    min_nbrs: int,
    block_cols,
    id_col: str = "vec_id",
) -> DataFrame:
    """Per-block DBSCAN for edge sets whose components are CONFINED to
    blocks (the adaptive-grid case: eps-edges are within-block by
    construction, so no cluster can span blocks). Same contract as
    :func:`dbscan_from_edges` — (id_col, role, cluster_id) for every
    row of ``ids``, cluster ids = component-minimum point ids — but
    the component search is a per-block union-find in ONE
    applyInPandas pass instead of O(log² n) star-contraction rounds.

    Why this is the right physical plan here: block size is held ~32
    by the adaptive grid at any corpus size, so per-group state is at
    most |block|² integer edges — tiny, embarrassingly parallel, one
    shuffle on the block key, zero iterative jobs. The distributed CC
    (dbscan_from_edges) stays the right plan for UNBOUNDED edge sets
    (q219's label blocks). Measured at the 10× probe: the
    star-contraction form's fixed per-round shuffles dominated its
    wall (13.4 s rebuild with ~0.6 M pairs); this form removes them.

    Determinism/bit-discipline: ``sym`` must carry the block columns
    and each directed edge exactly once; all FLOAT work (cosine, 4dp
    round) stays JVM-side in the edge generator — the pandas stage
    sees only integer ids, so no cross-engine float drift is possible.
    """
    import pandas as pd

    bc = list(block_cols)
    schema = ", ".join(
        f"{c} {t}" for c, t in sym.select(*bc).dtypes
    ) + f", {id_col} long, role string, cluster_id long"

    def run(key, pdf: pd.DataFrame) -> pd.DataFrame:
        a = pdf["a"].to_numpy()
        b = pdf["b"].to_numpy()
        deg: dict[int, int] = {}
        for x in a:
            deg[x] = deg.get(x, 0) + 1
        core = {x for x, d in deg.items() if d >= min_nbrs}
        parent: dict[int, int] = {x: x for x in core}

        def find(x: int) -> int:
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for x, y in zip(a, b):
            if x in core and y in core:
                rx, ry = find(x), find(y)
                if rx != ry:
                    # union by min id so the root IS the component min
                    lo, hi = (rx, ry) if rx < ry else (ry, rx)
                    parent[hi] = lo
        cluster = {x: find(x) for x in core}
        border: dict[int, int] = {}
        for x, y in zip(a, b):
            if x not in core and y in core:
                c = cluster[y]
                if x not in border or c < border[x]:
                    border[x] = c
        rows = [(x, "core", cluster[x]) for x in core] + [
            (x, "border", c) for x, c in border.items()
        ]
        out = pd.DataFrame(rows, columns=[id_col, "role", "cluster_id"])
        for i, c in enumerate(bc):
            out.insert(i, c, key[i])
        return out

    labelled = sym.groupBy(*bc).applyInPandas(run, schema)
    return (
        ids.join(labelled.select(id_col, "role", "cluster_id"), id_col, "left")
        .select(
            id_col,
            F.coalesce("role", F.lit("noise")).alias("role"),
            "cluster_id",
        )
    )


def dbscan_oracle_tail(min_nbrs: int, ids_table: str = "embeddings") -> str:
    """DuckDB CTE tail mirroring :func:`dbscan_from_edges`, to append
    after CTEs that define ``sym(a, b)`` inside a WITH RECURSIVE block
    — the shared SQL skeleton of the q219/q223 oracles (and any gate
    composing both). The caller's WITH must open RECURSIVE (for
    ``reach``)."""
    return f"""
deg AS (SELECT a AS vec_id, COUNT(*) AS d FROM sym GROUP BY a),
core AS (SELECT vec_id FROM deg WHERE d >= {min_nbrs}),
csym AS (
  SELECT s.a, s.b FROM sym s
  JOIN core ca ON s.a = ca.vec_id
  JOIN core cb ON s.b = cb.vec_id
),
reach(a, b) AS (
  SELECT a, b FROM csym
  UNION
  SELECT r.a, s.b FROM reach r JOIN csym s ON r.b = s.a
),
ccl AS (
  SELECT a AS vec_id, LEAST(MIN(b), a) AS cluster_id FROM reach GROUP BY a
),
corecl AS (
  SELECT c.vec_id, COALESCE(ccl.cluster_id, c.vec_id) AS cluster_id
  FROM core c LEFT JOIN ccl ON c.vec_id = ccl.vec_id
),
border AS (
  SELECT s.a AS vec_id, MIN(k.cluster_id) AS cluster_id
  FROM sym s JOIN corecl k ON s.b = k.vec_id
  WHERE s.a NOT IN (SELECT vec_id FROM core)
  GROUP BY s.a
)
SELECT e2.vec_id,
       CASE WHEN c.vec_id IS NOT NULL THEN 'core'
            WHEN b.vec_id IS NOT NULL THEN 'border'
            ELSE 'noise' END AS role,
       COALESCE(c.cluster_id, b.cluster_id) AS cluster_id
FROM {ids_table} e2
LEFT JOIN corecl c ON e2.vec_id = c.vec_id
LEFT JOIN border b ON e2.vec_id = b.vec_id
"""
