"""Scalable near-duplicate detection (north-star extension surface):
MinHash + LSH banding and SimHash — the 100 TB-scale path whose exact
verification stage is the n-gram Jaccard join (queries/text.py q23).

Everything is built-in expressions (xxhash64, explode, groupBy min,
self-join on band buckets): no UDFs, map-side combinable, one shuffle
per stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions import text as X


# Shingles with document frequency above this carry ~no Jaccard signal
# (boilerplate phrases: headers, licenses, nav text) but fan out
# quadratically in df when self-joined — a df-k shingle alone creates
# k·(k-1)/2 candidate rows. Standard web-scale practice drops them
# before any shingle equi-join. 64 is far above organic 5-gram df in
# the fixtures (measured max 4 at sf0.1; tests/test_operators.py
# asserts the margin) so test-scale results are bit-identical.
MAX_SHINGLE_DF = 64


def df_capped_shingles(
    sh: DataFrame,
    hash_col: str = "h",
    min_df: int = 2,
    max_df: int = MAX_SHINGLE_DF,
) -> DataFrame:
    """Keep only shingle hashes whose document frequency lies in
    [min_df, max_df] (left-semi against the df aggregate).

    min_df=2 is lossless for pair joins — a df-1 shingle can never
    produce a pair. max_df bounds hot-key fanout: the worst shingle
    contributes at most max_df² join rows instead of df². The df
    aggregate is map-side combinable (shuffle volume = #distinct
    hashes) and the semi-join reuses the hash partitioning the pair
    join needs anyway.
    """
    df_ok = (
        sh.groupBy(hash_col)
        .agg(F.count(F.lit(1)).alias("__df"))
        .filter((F.col("__df") >= min_df) & (F.col("__df") <= max_df))
        .select(hash_col)
    )
    return sh.join(df_ok, hash_col, "left_semi")


def minhash_signatures(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 32,
    shingle_n: int = 5,
) -> DataFrame:
    """(id, minhash_0..minhash_{k-1}) — min over shingles of seeded
    xxhash64. The seed-per-permutation trick replaces k independent
    hash functions; min-aggregation is map-side combinable so shuffle
    volume is #docs × k longs regardless of corpus size.
    """
    sh = X.exploded_word_shingles(docs, text_col, id_col, shingle_n)
    # Pre-hash each shingle string to ONE long, then derive the k
    # permutations by re-hashing that long with the permutation index
    # as seed. Two wins over seeding the string hash k times: the
    # distinct() shuffle carries 8-byte longs instead of ~n-word
    # strings, and the k-1 extra hashes run over fixed 8-byte input.
    # (64-bit pre-hash collisions are negligible at any corpus size
    # that fits num_perm-bit signatures anyway. ANSI mode forbids the
    # classic overflow-wrapping a*h+b universal mix, so re-hash it is.)
    hashed = sh.select(id_col, F.xxhash64("sh").alias("h")).distinct()
    return minhash_from_hashed_shingles(hashed, id_col=id_col, num_perm=num_perm)


def minhash_from_hashed_shingles(
    hashed: DataFrame, id_col: str = "doc_id", num_perm: int = 32
) -> DataFrame:
    """Signatures from an already-hashed distinct (id, h) shingle set —
    the entry point when the caller shares that set across pipeline
    stages (queries/text.py staged_near_dup_edges materializes it once
    for signatures, sizes, and the verify join)."""
    aggs = [
        F.min(F.xxhash64(F.col("h"), F.lit(i))).alias(f"mh_{i}")
        for i in range(num_perm)
    ]
    return hashed.groupBy(id_col).agg(*aggs)


def _banded_signatures(
    signatures: DataFrame, id_col: str, num_perm: int, bands: int
) -> DataFrame:
    """(id, band_id, band_hash): hash each signature band — the shared
    bucketing step of the self-join and incremental candidate paths."""
    rows = num_perm // bands
    band_cols = []
    for b in range(bands):
        cols = [F.col(f"mh_{b * rows + r}") for r in range(rows)]
        band_cols.append(
            F.struct(F.lit(b).alias("band_id"), F.xxhash64(*cols).alias("band_hash"))
        )
    return signatures.select(
        F.col(id_col), F.explode(F.array(*band_cols)).alias("band")
    ).select(id_col, "band.band_id", "band.band_hash")


def lsh_candidate_pairs(
    signatures: DataFrame,
    id_col: str = "doc_id",
    num_perm: int = 32,
    bands: int = 8,
) -> DataFrame:
    """Band the signature (rows = num_perm/bands), hash each band, and
    self-join docs sharing any band bucket → candidate pairs
    (doc_a < doc_b, distinct).

    Scale notes: the join key is (band_id, band_hash) — high
    cardinality, so no hot keys; banding keeps the candidate set linear
    in the number of true near-duplicates rather than quadratic in
    corpus size.
    """
    banded = _banded_signatures(signatures, id_col, num_perm, bands)
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b")
        )
        .distinct()
    )


def lsh_candidate_pairs_incident(
    signatures: DataFrame,
    new_ids: DataFrame,
    id_col: str = "doc_id",
    num_perm: int = 32,
    bands: int = 8,
) -> DataFrame:
    """Candidate pairs with AT LEAST ONE endpoint in ``new_ids`` — the
    incremental-refresh shape. The banding join is driven from the new
    side only (new × all), so band-join work is linear in the incoming
    batch, never quadratic in the corpus; at 100 TB the "all" side's
    banded signatures are the persisted signature store and only the
    new batch is banded fresh. Output normalized (doc_a < doc_b,
    distinct) so new-new pairs found in both orientations collapse.
    """
    banded = _banded_signatures(signatures, id_col, num_perm, bands)
    ids = new_ids.select(F.col(new_ids.columns[0]).alias(id_col))
    new_banded = banded.join(F.broadcast(ids), id_col, "left_semi")
    n, a = new_banded.alias("n"), banded.alias("a")
    return (
        n.join(
            a,
            (F.col("n.band_id") == F.col("a.band_id"))
            & (F.col("n.band_hash") == F.col("a.band_hash"))
            & (F.col(f"n.{id_col}") != F.col(f"a.{id_col}")),
        )
        .select(
            F.least(F.col(f"n.{id_col}"), F.col(f"a.{id_col}")).alias("doc_a"),
            F.greatest(F.col(f"n.{id_col}"), F.col(f"a.{id_col}")).alias("doc_b"),
        )
        .distinct()
    )


def exact_jaccard_edges(
    sh: DataFrame,
    cand: DataFrame,
    threshold: float,
    hash_col: str = "h",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact shingle-Jaccard verification of LSH candidate pairs:
    intersect the hashed-shingle sets of each candidate pair and keep
    pairs with Jaccard >= threshold. Candidate-driven, so a hot
    shingle's fanout is bounded by the candidate list, not df²; per-doc
    sizes are broadcast (one long per doc). Returns (doc_a, doc_b).
    Shared by the batch staged path (queries/text.py) and the snapshot
    refresh path (operators/corpus_snapshot.py)."""
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
    sha = sh.select(F.col(id_col).alias("doc_a"), F.col(hash_col))
    shb = sh.select(
        F.col(id_col).alias("__b"), F.col(hash_col).alias("hb")
    )
    inter = (
        cand.join(sha, "doc_a")
        .join(
            shb,
            (F.col("doc_b") == F.col("__b")) & (F.col(hash_col) == F.col("hb")),
            "inner",
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col(id_col).alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col(id_col).alias("doc_b"), F.col("n").alias("nb"))
    jacc = F.col("n_common") / (F.col("na") + F.col("nb") - F.col("n_common"))
    return (
        inter.join(F.broadcast(sa), "doc_a")
        .join(F.broadcast(sb), "doc_b")
        .filter(jacc >= threshold)
        .select("doc_a", "doc_b")
    )


def minhash_jaccard_estimate(
    signatures: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    num_perm: int = 32,
) -> DataFrame:
    """Estimated Jaccard = fraction of agreeing minhash slots, computed
    for candidate pairs only (broadcast-friendly join back to sigs)."""
    sig_a = signatures.select(
        F.col(id_col).alias("doc_a"),
        *[F.col(f"mh_{i}").alias(f"a_{i}") for i in range(num_perm)],
    )
    sig_b = signatures.select(
        F.col(id_col).alias("doc_b"),
        *[F.col(f"mh_{i}").alias(f"b_{i}") for i in range(num_perm)],
    )
    joined = pairs.join(sig_a, "doc_a").join(sig_b, "doc_b")
    agree = sum(
        (F.when(F.col(f"a_{i}") == F.col(f"b_{i}"), 1).otherwise(0) for i in range(num_perm)),
        F.lit(0),
    )
    return joined.select(
        "doc_a", "doc_b", (agree / F.lit(num_perm)).alias("est_jaccard")
    )


def simhash(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 32,
    shingle_n: int = 3,
) -> DataFrame:
    """SimHash fingerprint: per shingle-hash bit, vote +1/-1 weighted by
    presence; fingerprint bit b = 1 iff the vote sum is >= 0.

    Implemented as explode(shingles) × explode(bits) → groupBy(id, bit)
    vote-sum → reassemble via shiftleft+sum: three narrow shuffles, all
    combinable. Near-dup pairs = fingerprints within small Hamming
    distance (checked via xor+bit_count).
    """
    sh = X.exploded_word_shingles(docs, text_col, id_col, shingle_n).distinct()
    h = sh.select(id_col, F.xxhash64("sh").alias("h"))
    bitted = h.select(
        id_col,
        F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("bit"),
        "h",
    ).select(
        id_col,
        "bit",
        # shiftright/shiftleft take a literal int in the python API;
        # the SQL forms accept column bit positions.
        F.expr("CASE WHEN (shiftright(h, bit) & 1) = 1 THEN 1 ELSE -1 END").alias(
            "vote"
        ),
    )
    votes = bitted.groupBy(id_col, "bit").agg(F.sum("vote").alias("v"))
    return votes.groupBy(id_col).agg(
        F.sum(
            F.when(F.col("v") >= 0, F.expr("shiftleft(CAST(1 AS BIGINT), bit)"))
            .otherwise(F.lit(0).cast("long"))
        ).alias("simhash")
    )


def simhash_near_pairs(
    fingerprints: DataFrame, id_col: str = "doc_id", max_hamming: int = 3, bits: int = 32
) -> DataFrame:
    """Pairs within Hamming distance via block-split LSH: split the
    fingerprint into (max_hamming+1) blocks — any pair within the
    distance agrees on at least one full block (pigeonhole), so the
    self-join runs on block equality, never all-pairs."""
    n_blocks = max_hamming + 1
    block_bits = bits // n_blocks
    blocks = []
    for i in range(n_blocks):
        mask = ((1 << block_bits) - 1) << (i * block_bits)
        blocks.append(
            F.struct(
                F.lit(i).alias("block_id"),
                F.col("simhash").bitwiseAND(F.lit(mask)).alias("block_val"),
            )
        )
    exploded = fingerprints.select(
        F.col(id_col), F.col("simhash"), F.explode(F.array(*blocks)).alias("b")
    ).select(id_col, "simhash", "b.block_id", "b.block_val")
    a, b = exploded.alias("a"), exploded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.block_id") == F.col("b.block_id"))
            & (F.col("a.block_val") == F.col("b.block_val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .distinct()
    )
    return pairs.filter(F.col("hamming") <= max_hamming)
