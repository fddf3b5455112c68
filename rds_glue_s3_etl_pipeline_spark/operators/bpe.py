"""Distributed BPE training (Sennrich et al. 2016): iterate the merge
step over a weighted vocabulary held as symbol arrays.

Each merge round is fully distributed:

1. pair counts — explode adjacent symbol pairs from the (vocab-sized)
   word table, weighted by word frequency, hash-aggregate;
2. pick the most frequent pair — ONE row collected to the driver per
   round (the merge decision is a scalar artifact, like a codebook);
3. apply the merge — a left-to-right greedy fold over each word's
   symbol array (``F.aggregate``), entirely JVM-side.

Scale: the corpus is touched ONCE (the initial token count); every
round after that runs over the distinct vocabulary, whose size is
bounded regardless of corpus bytes. Driver traffic is one (pair,
count) row per merge. This is the standard production shape: count on
the cluster, decide on the driver, broadcast the decision back — the
decision here is embedded in the next round's plan as two literals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _pair_counts(words: DataFrame) -> DataFrame:
    """Adjacent-pair counts over symbol arrays, weighted by word freq.
    Pairs via two shifted slices zipped — no positional join."""
    pairs = words.filter(F.size("syms") >= 2).select(
        F.explode(
            F.arrays_zip(
                F.slice(F.col("syms"), 1, F.size("syms") - 1).alias("a"),
                F.slice(F.col("syms"), 2, F.size("syms") - 1).alias("b"),
            )
        ).alias("p"),
        "f",
    )
    return pairs.groupBy(
        F.col("p.a").alias("a"), F.col("p.b").alias("b")
    ).agg(F.sum("f").alias("n"))


def _merge_pair(words: DataFrame, a: str, b: str) -> DataFrame:
    """Greedy leftmost merge of the pair (a, b) in every symbol array:
    a left fold that joins the current symbol onto the accumulator's
    last element when they form (a, b). Handles overlaps the standard
    BPE way ("aaa" + merge(a,a) -> ["aa", "a"])."""
    merged = F.aggregate(
        F.col("syms"),
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.lit(a + b)),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )
    return words.select(merged.alias("syms"), "f")


def bpe_train(
    words: DataFrame,
    n_merges: int,
    sym_col: str = "syms",
    freq_col: str = "f",
    return_vocab: bool = False,
):
    """Learn ``n_merges`` BPE merges from a weighted vocabulary
    (``sym_col``: array<string> of current symbols, ``freq_col``:
    word frequency). Returns the ordered merge table
    [(left, right, count), ...] — ties broken (count desc, a, b) so
    training is deterministic on any partitioning.

    With ``return_vocab=True`` returns ``(merges, final_vocab)`` —
    training already materializes the fully-merged vocabulary, so
    callers that need the encoded corpus state (compression reports,
    vocab export) must not pay a second ``bpe_apply`` pass over the
    same input.
    """
    w = words.select(
        F.col(sym_col).alias("syms"), F.col(freq_col).alias("f")
    ).localCheckpoint(eager=True)
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        top = (
            _pair_counts(w)
            .orderBy(F.desc("n"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b, n = top[0]["a"], top[0]["b"], top[0]["n"]
        merges.append((a, b, n))
        # Materialize each round: the fold rewrites every array and the
        # next round's counts scan it twice (count + merge) — without
        # this the plan nests one fold per historical merge.
        w = _merge_pair(w, a, b).localCheckpoint(eager=True)
    if return_vocab:
        return merges, w
    return merges


def words_to_symbols(tokens: DataFrame, tok_col: str = "tok") -> DataFrame:
    """(tok, f) -> (syms: array<string> of characters, f) — BPE's
    starting state. Char split via regex empty-match split."""
    f_col = [c for c in tokens.columns if c != tok_col][0]
    return tokens.select(
        F.filter(
            F.split(F.col(tok_col), ""), lambda s: s != ""
        ).alias("syms"),
        F.col(f_col).alias("f"),
    )


def bpe_apply(
    words: DataFrame,
    merges: list[tuple[str, str, int]] | list[tuple[str, str]],
    sym_col: str = "syms",
    freq_col: str = "f",
) -> DataFrame:
    """Apply a learned merge table to a symbol-array vocabulary, in
    merge order — the ENCODE side of BPE (tokenizing new text with a
    trained tokenizer). Each merge is one JVM-side array fold over the
    distinct vocab; ``n`` merges = ``n`` chained map-only transforms,
    no shuffle at all.

    Returns the re-segmented (syms, f) table."""
    w = words.select(F.col(sym_col).alias("syms"), F.col(freq_col).alias("f"))
    for i, m in enumerate(merges):
        a, b = m[0], m[1]
        w = _merge_pair(w, a, b)
        # A real tokenizer carries 10k+ merges; without periodic
        # materialization each merge nests another fold lambda inside
        # the previous plan and Catalyst's analysis cost explodes long
        # before data moves. Checkpoint on a cadence to bound depth.
        if (i + 1) % 64 == 0 and i + 1 < len(merges):
            w = w.localCheckpoint(eager=True)
    return w
