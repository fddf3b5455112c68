"""Fourth text batch — tokenizer-training primitives.

q151 is one BPE merge step (Sennrich et al. 2016, "Neural Machine
Translation of Rare Words with Subword Units"): count adjacent symbol
pairs across the corpus weighted by word frequency; the top pair is
the next merge. Training a full BPE vocab is this step iterated — the
expensive part is exactly this distributed count, and its cost profile
is what matters at 100 TB: one token hash-aggregate (vocab-sized), one
character-pair explode bounded by Σ word-length over the DISTINCT
vocab (not the corpus), one pair aggregate.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import load
from ..functions import text as X
from .registry import query

_BPE_TOP = 20

_Q151_ORACLE = f"""
WITH tok AS (
  SELECT UNNEST(regexp_split_to_array(TRIM(text), '\\s+')) AS tok FROM documents
),
words AS (SELECT tok, COUNT(*) AS f FROM tok WHERE tok <> '' GROUP BY tok),
pairs AS (
  SELECT SUBSTRING(tok, i, 1) AS a, SUBSTRING(tok, i + 1, 1) AS b, f
  FROM words, UNNEST(generate_series(1, LENGTH(tok) - 1)) AS t(i)
  WHERE LENGTH(tok) >= 2
)
SELECT a, b, CAST(SUM(f) AS BIGINT) AS n_occurrences
FROM pairs GROUP BY a, b
ORDER BY n_occurrences DESC, a, b
LIMIT {_BPE_TOP}
"""


@query("q151_bpe_merge_step", oracle=_Q151_ORACLE, tags=("text", "agg", "EXT"))
def q151_bpe_merge_step(spark, sf_dir):
    """One distributed BPE merge step: the top-{_BPE_TOP} adjacent
    character pairs by corpus frequency — pair counts weighted by WORD
    frequency, so the explode runs over the distinct vocabulary (each
    word once, carrying its count), never over the raw token stream.
    That collapse is the scale move: a 100 TB corpus has a bounded
    vocab, so the pair stage is vocab x avg-word-length rows however
    big the corpus, and the first aggregate is the only corpus-sized
    pass (map-side combinable). Iterating this step with a merge table
    (re-tokenize, recount) is full BPE training; counts are exact
    integers, so the oracle matches without any float discipline.
    """
    d = load(spark, sf_dir, "documents")
    words = (
        d.select(F.explode(X.tokens("text")).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("f"))
        .filter(F.length("tok") >= 2)
    )
    pairs = words.select(
        F.explode(F.sequence(F.lit(1), F.length("tok") - 1)).alias("i"),
        "tok",
        "f",
    ).select(
        F.col("tok").substr(F.col("i"), F.lit(1)).alias("a"),
        F.col("tok").substr(F.col("i") + 1, F.lit(1)).alias("b"),
        "f",
    )
    return (
        pairs.groupBy("a", "b")
        .agg(F.sum("f").alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), F.asc("a"), F.asc("b"))
        .limit(_BPE_TOP)
    )


_BPE_MERGES = 8


@query("q152_bpe_train", oracle=None, tags=("text", "iterative", "EXT"))
def q152_bpe_train(spark, sf_dir):
    """Full BPE training, {_BPE_MERGES} merges (operators/bpe.py): the
    ordered merge table (step, left, right, n_occurrences) learned
    from the corpus vocabulary. Rows-only by contract — each round's
    argmax feeds the next round's array rewrite, an iterative
    dependency SQL can't unroll over array-valued state. Verified
    instead by differential test against a sequential reference
    implementation of the published algorithm
    (tests/test_operators.py::test_bpe_train_matches_reference_implementation)
    and by q151 (the first merge, fully oracle-checked).

    Scale: the corpus is scanned once for token counts; every round
    after runs over the DISTINCT vocabulary (bounded however large the
    corpus); one row reaches the driver per merge.
    """
    from ..operators.bpe import bpe_train, words_to_symbols

    words = (
        load(spark, sf_dir, "documents")
        .select(F.explode(X.tokens("text")).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("f"))
    )
    merges = bpe_train(words_to_symbols(words), n_merges=_BPE_MERGES)
    rows = [
        (i + 1, a, b, int(n)) for i, (a, b, n) in enumerate(merges)
    ]
    return spark.createDataFrame(
        rows, "step int, left string, right string, n_occurrences long"
    )
