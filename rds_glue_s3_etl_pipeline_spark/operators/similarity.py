"""Similarity search over embedding columns (north-star extension):
brute-force cosine top-k as the exact baseline, and random-hyperplane
LSH bucketing as the 100 TB scale path (candidates only within a
bucket).

The hyperplanes are pseudo-random but fully deterministic: component
(plane p, dim d) is derived from xxhash64(p, d) mapped to [-1, 1] —
reproducible across runs with zero driver-side state to broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..functions import vector as V


def cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "q_id",
    round_digits: int | None = 4,
) -> DataFrame:
    """Exact top-k: broadcast the (small) query set against the corpus,
    score with zip_with/aggregate (JVM, codegen), rank per query.

    One pass over the corpus, no shuffle until the final per-query
    top-k window over #queries × #corpus scored rows (use a LIMIT-ed
    query set; for query sets too big to broadcast, use lsh_buckets).
    """
    cos = V.cosine(F.col(vec_col), F.col("q_vec"))
    if round_digits is not None:
        cos = F.round(cos, round_digits)
    scored = (
        embeddings.join(
            F.broadcast(
                queries.select(
                    F.col(query_id_col), F.col(vec_col).alias("q_vec")
                )
            ),
            F.col(id_col) != F.col(query_id_col),
        )
        .select(query_id_col, id_col, cos.alias("cos_sim"))
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos_sim"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def hyperplane_component(plane: F.Column, dim: F.Column) -> F.Column:
    """Deterministic pseudo-random hyperplane weight in [-1, 1]."""
    h = F.xxhash64(plane, dim)
    return (h % 10000).cast("double") / 10000.0


def lsh_bucket(vec_col, n_planes: int = 8) -> F.Column:
    """Random-hyperplane LSH bucket id (n_planes sign bits packed into
    a long). Vectors in the same bucket are cosine-close with high
    probability; at scale, restrict pair generation to equal buckets.
    """
    v = V.as_double_array(vec_col)
    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        proj = F.aggregate(
            F.zip_with(
                v,
                F.transform(
                    F.sequence(F.lit(0), F.size(v) - 1),
                    lambda d: hyperplane_component(F.lit(p), d),
                ),
                lambda x, w: x * w,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(proj >= 0, F.shiftleft(F.lit(1).cast("long"), p)).otherwise(0)
    return bucket


def lsh_cosine_pairs(
    embeddings: DataFrame,
    threshold: float = 0.8,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-duplicate pairs: bucket by hyperplane LSH, then
    exact cosine only within buckets — the scalable variant of an
    all-pairs cosine join."""
    b = embeddings.select(
        id_col, vec_col, lsh_bucket(F.col(vec_col), n_planes).alias("bucket")
    )
    a, c = b.alias("a"), b.alias("b")
    cos = V.cosine(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}"))
    return (
        a.join(
            c,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("vec_a"),
            F.col(f"b.{id_col}").alias("vec_b"),
            cos.alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


# --------------------------------------------------------------------------
# Spherical k-means (Lloyd) — the trainer behind a real IVF codebook.
# --------------------------------------------------------------------------


def kmeans_assign(
    embeddings: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign every vector to its nearest centroid by cosine similarity
    (broadcast codebook, one map-side pass — no shuffle until the
    per-vector argmax window).

    Determinism discipline (shared with queries.vector2 q59): the
    cosine is rounded to 4dp BEFORE the argmax and ties break on the
    centroid id, so a 1-ulp float wobble can never flip an assignment
    between engines or between runs.

    Returns (id_col, vec_col, c_id, cos_sim) with exactly one row per
    input vector.

    Plan shape (optimization round 15): the codebook is collected into
    ONE array row (k entries, c_id-sorted) and the argmax is a
    higher-order fold over it — a map-only pass with NO exchange, where
    the old per-vector window shuffled and sorted N x k scored rows
    (embedding payload included) per assignment. Ordering semantics are
    the window's exactly: 4dp-rounded cosine desc (Spark NaN sorts
    largest, null loses to non-null), ties to the smallest c_id (the
    fold keeps the earlier entry of the c_id-sorted array on equality).
    """
    cb = centroids.select(
        F.array_sort(F.collect_list(F.struct("c_id", "cv"))).alias("__cb")
    )
    cos = lambda x: F.round(V.cosine(F.col(vec_col), x["cv"]), 4)  # noqa: E731

    def merge(acc, x):
        cand = F.struct(cos(x).alias("cos_sim"), x["c_id"].alias("c_id"))
        better = (
            acc.isNull()
            | (cand["cos_sim"] > acc["cos_sim"])
            | (acc["cos_sim"].isNull() & cand["cos_sim"].isNotNull())
        )
        return F.when(better, cand).otherwise(acc)

    best = F.aggregate(
        F.col("__cb"),
        F.lit(None).cast("struct<cos_sim:double,c_id:bigint>"),
        merge,
    )
    return (
        embeddings.crossJoin(F.broadcast(cb))
        .select(id_col, vec_col, best.alias("__best"))
        # an empty codebook yields no assignments, as the join did
        .filter(F.col("__best").isNotNull())
        .select(
            id_col,
            vec_col,
            F.col("__best.c_id").alias("c_id"),
            F.col("__best.cos_sim").alias("cos_sim"),
        )
    )


def kmeans_assign_topn(
    embeddings: DataFrame,
    centroids: DataFrame,
    nprobe: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Multi-probe assignment: each vector's ``nprobe`` nearest
    centroids (same 4dp-rounded cosine + c_id tie-break discipline as
    :func:`kmeans_assign`, which is the nprobe=1 special case).
    Returns (id_col, vec_col, c_id, cos_sim, probe_rank) with nprobe
    rows per vector — the query-side fan-out of an IVF search or a
    multi-probe k-NN graph; the corpus side stays home-cell-indexed."""
    scored = embeddings.crossJoin(
        F.broadcast(centroids.select("c_id", "cv"))
    ).select(
        id_col,
        vec_col,
        "c_id",
        F.round(V.cosine(F.col(vec_col), F.col("cv")), 4).alias("cos_sim"),
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("cos_sim"), F.asc("c_id"))
    return (
        scored.withColumn("probe_rank", F.row_number().over(w))
        .filter(F.col("probe_rank") <= nprobe)
    )


def kmeans_update(
    assigned: DataFrame,
    vec_col: str = "embedding",
) -> DataFrame:
    """Recompute centroids as the per-dimension mean of each cell's
    members (one Lloyd update). Cells that lost every member disappear
    (the standard empty-cell policy; the codebook may shrink).

    The mean is made bit-reproducible across engines and shuffle
    orders: each component is rounded to 6dp (a double both engines
    agree on), cast to DECIMAL — exact, because a 6dp-rounded double's
    shortest decimal form IS its 6dp value — summed exactly, re-entered
    into DOUBLE via the string hop (queries.registry.dsum rationale),
    and divided by the member count in double. Distributed reduce
    order therefore cannot change a centroid bit.

    Returns (c_id, cv: array<double>).
    """
    from ..queries.registry import DEC

    ex = assigned.select(
        "c_id",
        F.posexplode(V.as_double_array(vec_col)).alias("d", "x"),
    )
    upd = ex.groupBy("c_id", "d").agg(
        (
            F.sum(F.round(F.col("x"), 6).cast(DEC)).cast("string").cast("double")
            / F.count(F.lit(1))
        ).alias("m")
    )
    return upd.groupBy("c_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("d", "m"))), lambda s: s["m"]
        ).alias("cv")
    )


def spherical_kmeans(
    embeddings: DataFrame,
    init_centroids: DataFrame,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Fixed-iteration spherical k-means: ``iters`` rounds of
    cosine-assignment + mean-update starting from ``init_centroids``
    (c_id, cv), returning the final ASSIGNMENT
    (id_col, vec_col, c_id, cos_sim).

    Per iteration: one broadcast cross-join pass over the corpus (the
    assignment — map-only scoring, k rows broadcast) plus two hash
    aggregations bounded by k x dim (the update). The codebook is
    localCheckpoint'd every round — it is k rows, so materializing it
    truncates the otherwise-multiplying lineage for free. This is the
    trainer that replaces q59's seedless sample codebook with actual
    cluster centers; assignment cost stays O(N x k) per round with k a
    FIXED constant, the property the 10x scale probe demands of every
    ANN build stage.
    """
    cent = spherical_kmeans_codebook(
        embeddings, init_centroids, iters, id_col, vec_col
    )
    return kmeans_assign(embeddings, cent, id_col, vec_col)


def spherical_kmeans_codebook(
    embeddings: DataFrame,
    init_centroids: DataFrame,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The trained CODEBOOK itself — (c_id, cv) after ``iters`` Lloyd
    rounds — for callers that need more than the argmax assignment:
    multi-probe search (rank the top-nprobe cells per query), balance
    reports, persisting the index artifact."""
    cent = init_centroids
    for _ in range(iters):
        assigned = kmeans_assign(embeddings, cent, id_col, vec_col)
        # eager=False: the next consumer (the following round's
        # assignment broadcast, or the caller's first action over the
        # returned codebook) materializes the k-row checkpoint inside
        # its own job — one driver round-trip per Lloyd round instead
        # of two, the same discipline as the CC loops. The plan is
        # truncated immediately either way.
        cent = kmeans_update(assigned, vec_col).localCheckpoint(eager=False)
    return cent


# --------------------------------------------------------------------------
# Corpus-adaptive hierarchical blocking — the registered fix for the
# fixed-grid law (SCALE.md round-7: any blocking scheme with FIXED
# total block count B has within-block pairs ∝ N²/B, measured at
# 37-64×/decade on q149/q150/q162).
# --------------------------------------------------------------------------


def adaptive_grid(
    n_rows: int, target_block: int, coarse_k: int = 16, fanout: int = 8
) -> list[int]:
    """Per-level codebook sizes for a hierarchical blocking whose TOTAL
    block count scales with the corpus: a trained coarse level of at
    most ``coarse_k`` cells, then sampled sub-codebook levels of at
    most ``fanout`` cells each, deep enough that the product of all
    levels ≥ n_rows / target_block — i.e. the expected block SIZE
    stays ~``target_block`` at any corpus size, with depth growing as
    log(n_rows) at fixed fan-out and the last level trimmed to avoid
    overshooting.

    This is the scale rule the fixed-grid measurements demand:
    per-vector assignment cost is sum(ks) = O(log N) centroid scores,
    while within-block pair work is N x target_block / 2 — LINEAR in
    the corpus where a pinned grid is quadratic. Verified against the
    pinned forms by construction: at the sf0.01 fixture (500 vectors,
    target_block=4) the rule yields exactly q149's (16, 8) grid, so
    the adaptive query hash-matches the fixed-grid oracle there and
    only deepens beyond fixture scale.
    """
    import math

    if n_rows < 0:
        raise ValueError(f"n_rows must be >= 0: {n_rows}")
    needed = max(1, math.ceil(max(n_rows, 1) / max(target_block, 1)))
    ks = [min(coarse_k, needed)]
    prod = ks[0]
    while prod < needed:
        k = min(fanout, math.ceil(needed / prod))
        ks.append(max(k, 2))
        prod *= ks[-1]
    return ks


def block_sub_codebook(
    df: DataFrame,
    block_cols: tuple[str, ...],
    k_sub: int,
    id_out: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nrm_col: str = "nrm",
) -> DataFrame:
    """Per-block sampled sub-codebook: the first ``k_sub`` members of
    each block in md5(id) order — the seedless deterministic sample
    every codebook consumer uses (queries.vector3._init_centroids
    discipline), so any engine reproduces it bit for bit. Returns
    (*block_cols, id_out, __sv, __snrm); bounded by #blocks x k_sub
    rows."""
    w_pick = Window.partitionBy(*block_cols).orderBy(
        F.md5(F.col(id_col).cast("string").cast("binary")), F.col(id_col)
    )
    return (
        df.withColumn("__rn", F.row_number().over(w_pick))
        .filter(F.col("__rn") <= k_sub)
        .select(
            *block_cols,
            F.col(id_col).alias(id_out),
            F.col(vec_col).alias("__sv"),
            F.col(nrm_col).alias("__snrm"),
        )
    )


def block_sub_assign(
    df: DataFrame,
    block_cols: tuple[str, ...],
    k_sub: int,
    id_out: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nrm_col: str = "nrm",
    hint_broadcast: bool = True,
    sub: DataFrame | None = None,
    nprobe: int = 1,
) -> DataFrame:
    """One hierarchy level: sample a ``k_sub``-entry sub-codebook per
    existing block (block_sub_codebook, unless a prebuilt ``sub`` is
    passed) and assign each member to its nearest sub-centroid — 4dp
    cosine, ``id_out`` tie-break, the cross-engine determinism
    discipline shared with kmeans_assign. Returns df plus the
    ``id_out`` block column. ``nprobe`` > 1 keeps each member's top-n
    sub-cells instead of the argmax (n rows per member) — the
    query-side fan-out of a multi-probe search at this level; the
    corpus side stays nprobe=1.

    Scale: the sub-codebook is #blocks x k_sub rows. While that is
    broadcast-sized (early levels; the default hint) the join is
    map-side; once the deepest levels of a very large corpus outgrow
    broadcast, pass hint_broadcast=False — the join keys on the block
    columns, so it shuffle-joins co-located by block with identical
    results. The per-vector argmax windows by ``id_col``, never a
    corpus-wide key."""
    if sub is None:
        sub = block_sub_codebook(
            df, block_cols, k_sub, id_out, id_col, vec_col, nrm_col
        )
    if nprobe == 1:
        # Argmax as a fold over the block's sub-codebook collected into
        # one array row per block (id_out-sorted) — the per-block join
        # stays (broadcast while the hint holds), but the per-vector
        # window that re-shuffled and sorted the whole corpus x k_sub
        # (embedding payload included) is gone. Ordering semantics are
        # the window's exactly (4dp cosine desc, NaN largest, null
        # loses, ties to the smallest id_out via the sorted array).
        arr = sub.groupBy(*block_cols).agg(
            F.array_sort(
                F.collect_list(F.struct(F.col(id_out), "__sv", "__snrm"))
            ).alias("__subs")
        )

        def merge(acc, x):
            cand = F.struct(
                F.round(
                    V.dot(F.col(vec_col), x["__sv"])
                    / (F.col(nrm_col) * x["__snrm"]),
                    4,
                ).alias("s"),
                x[id_out].alias("i"),
            )
            better = (
                acc.isNull()
                | (cand["s"] > acc["s"])
                | (acc["s"].isNull() & cand["s"].isNotNull())
            )
            return F.when(better, cand).otherwise(acc)

        best = F.aggregate(
            F.col("__subs"),
            F.lit(None).cast("struct<s:double,i:bigint>"),
            merge,
        )
        return (
            df.join(F.broadcast(arr) if hint_broadcast else arr, list(block_cols))
            .withColumn(id_out, best["i"])
            .drop("__subs")
        )
    scos = F.round(
        V.dot(F.col(vec_col), F.col("__sv")) / (F.col(nrm_col) * F.col("__snrm")),
        4,
    )
    w_assign = Window.partitionBy(id_col).orderBy(F.desc("__scos"), F.asc(id_out))
    joined = df.join(
        F.broadcast(sub) if hint_broadcast else sub, list(block_cols)
    )
    return (
        joined.withColumn("__scos", scos)
        .withColumn("__rn", F.row_number().over(w_assign))
        .filter(F.col("__rn") <= nprobe)
        .drop("__sv", "__snrm", "__scos", "__rn")
    )


# --------------------------------------------------------------------------
# Product-quantization training: per-subspace L2 Lloyd rounds.
# --------------------------------------------------------------------------


def pq_encode(subs: DataFrame, codebooks: DataFrame) -> DataFrame:
    """Encode each subvector as its nearest sub-centroid — (vec_id, m,
    code). ``subs`` is (vec_id, m, sv: array<double>), ``codebooks`` is
    (m, c_id, cv). The codebook is a fixed M x KSUB rows and is
    BROADCAST; encoding is one map-side pass over the corpus (the
    argmin window partitions by (vec_id, m), never a corpus-wide
    shuffle key). L2 distances round to 4dp before the argmin with
    c_id tie-break — the cross-engine determinism discipline, same as
    kmeans_assign's cosine rounding.
    """
    # Argmin as a fold over the per-subspace codebook collected into
    # one array row per m (c_id-sorted) — map-only after the broadcast
    # join on m, where the per-(vec_id, m) window re-shuffled and
    # sorted the whole encoded corpus x KSUB. Ordering semantics are
    # the window's exactly: 4dp L2 asc with Spark's asc-nulls-first
    # (a null distance wins; NaN sorts largest and loses), ties to the
    # smallest c_id via the sorted array.
    arr = codebooks.groupBy("m").agg(
        F.array_sort(F.collect_list(F.struct("c_id", "cv"))).alias("__cbs")
    )

    def merge(acc, x):
        cand = F.struct(
            F.round(F.sqrt(V.l2_distance_sq(F.col("sv"), x["cv"])), 4).alias(
                "d"
            ),
            x["c_id"].alias("c"),
        )
        better = acc.isNull() | (
            acc["d"].isNotNull() & (cand["d"].isNull() | (cand["d"] < acc["d"]))
        )
        return F.when(better, cand).otherwise(acc)

    best = F.aggregate(
        F.col("__cbs"), F.lit(None).cast("struct<d:double,c:bigint>"), merge
    )
    return (
        subs.join(F.broadcast(arr), "m")
        .select("vec_id", "m", best["c"].alias("code"), "sv")
        .filter(F.col("code").isNotNull())
    )


def pq_update(encoded: DataFrame) -> DataFrame:
    """One per-subspace Lloyd mean update: new sub-centroid (m, c_id,
    cv) = per-dimension mean of the subvectors encoded to it, with the
    bit-reproducible mean discipline of kmeans_update (6dp round →
    exact decimal sum → string hop → double ÷ count). Sub-cells that
    lost every member disappear (codebooks may shrink). Aggregate
    state is bounded by M x KSUB x DSUB — broadcast-sized however big
    the corpus."""
    from ..queries.registry import DEC

    ex = encoded.select(
        "m", F.col("code").alias("c_id"), F.posexplode("sv").alias("d", "x")
    )
    upd = ex.groupBy("m", "c_id", "d").agg(
        (
            F.sum(F.round(F.col("x"), 6).cast(DEC)).cast("string").cast("double")
            / F.count(F.lit(1))
        ).alias("mu")
    )
    return upd.groupBy("m", "c_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("d", "mu"))), lambda s: s["mu"]
        ).alias("cv")
    )


def pq_train_codebooks(
    subs: DataFrame, init_codebooks: DataFrame, iters: int = 2
) -> DataFrame:
    """Train PQ sub-codebooks: ``iters`` rounds of per-subspace L2
    k-means (encode + mean update) from the sampled initialization —
    the training swap q146's docstring documents. All M subspaces
    train in the SAME pass (m is just a grouping column), so the
    per-round cost is one broadcast-codebook scan of the subvector
    table plus a bounded M x KSUB x DSUB aggregation; the codebook is
    localCheckpoint'd per round (M x KSUB rows) to truncate lineage.
    Returns (m, c_id, cv)."""
    cent = init_codebooks
    for _ in range(iters):
        enc = pq_encode(subs, cent)
        # eager=False: materialized by the next round's codebook
        # broadcast (or the caller's first action) — see
        # spherical_kmeans_codebook.
        cent = pq_update(enc).localCheckpoint(eager=False)
    return cent
