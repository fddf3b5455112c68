"""Text-analysis column expressions (north-star extension surface):
tokenization, quality scoring, language-ID heuristic, fingerprinting.

All pure built-in ``pyspark.sql.functions`` compositions — JVM-side,
whole-stage-codegen'd, no UDFs — so they run at scan speed over 100 TB
of documents.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens(col) -> Column:
    """Whitespace tokenization: split on runs of whitespace."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), r"\s+")


def token_count(col) -> Column:
    return F.size(tokens(col))


def normalized(col) -> Column:
    """Canonical text: lowercase, strip non-alphanumerics, collapse
    whitespace — the normalization step before fingerprinting/dedup."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.lower(c)
    c = F.regexp_replace(c, r"[^a-z0-9\s]", "")
    c = F.regexp_replace(c, r"\s+", " ")
    return F.trim(c)


def fingerprint(col) -> Column:
    """Deterministic document fingerprint: MD5 of the normalized text.
    (MD5, not xxhash, so external engines reproduce it byte-for-byte.)"""
    return F.md5(normalized(col))


def occurrences(col, needle: str) -> Column:
    """Number of occurrences of a literal substring — pure length
    arithmetic, no regex, engine-portable."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        (F.length(c) - F.length(F.replace(c, F.lit(needle), F.lit(""))))
        / F.lit(len(needle))
    ).cast("long")


def alpha_ratio(col) -> Column:
    """Fraction of characters that are ASCII letters."""
    c = F.col(col) if isinstance(col, str) else col
    return F.length(F.regexp_replace(c, "[^a-zA-Z]", "")) / F.length(c)


def digit_ratio(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.length(F.regexp_replace(c, "[^0-9]", "")) / F.length(c)


STOPWORDS_EN = ("the", "a", "and", "of", "to")


def stopword_count(col, stopwords=STOPWORDS_EN) -> Column:
    """Occurrences of space-delimited stopwords (padded match so only
    whole words count)."""
    c = F.col(col) if isinstance(col, str) else col
    padded = F.concat(F.lit(" "), F.lower(c), F.lit(" "))
    total = F.lit(0).cast("long")
    for sw in stopwords:
        total = total + occurrences(padded, f" {sw} ")
    return total


def quality_score(col) -> Column:
    """Heuristic document quality in [0,1]: weighted mix of alphabetic
    density, stopword presence, and length band — the shape of the
    classic pre-training quality filters."""
    c = F.col(col) if isinstance(col, str) else col
    n_tok = token_count(c)
    sw_ratio = stopword_count(c) / n_tok
    len_ok = F.when((F.length(c) >= 100) & (F.length(c) <= 20000), 1.0).otherwise(0.0)
    return (
        F.lit(0.5) * alpha_ratio(c) + F.lit(0.3) * F.least(sw_ratio * 5, F.lit(1.0))
        + F.lit(0.2) * len_ok
    )


# Marker words per language for the n-gram/stopword language-ID
# heuristic. Tiny on purpose: broadcast as literal expressions.
LANG_MARKERS = {
    "en": ("the", "and", "of"),
    "de": ("der", "und", "die"),
    "fr": ("le", "et", "les"),
    "es": ("el", "los", "que"),
}


def lang_scores(col) -> dict[str, Column]:
    c = F.col(col) if isinstance(col, str) else col
    padded = F.concat(F.lit(" "), F.lower(c), F.lit(" "))
    return {
        lang: sum(
            (occurrences(padded, f" {w} ") for w in words), F.lit(0).cast("long")
        )
        for lang, words in LANG_MARKERS.items()
    }


def lang_guess(col) -> Column:
    """Pick the language with the highest marker-word count;
    deterministic tie-break by language code order; 'und' when no
    marker hits at all."""
    scores = lang_scores(col)
    best = None
    for lang in sorted(scores):
        s = scores[lang]
        if best is None:
            best = (s, F.lit(lang))
        else:
            best = (
                F.when(s > best[0], s).otherwise(best[0]),
                F.when(s > best[0], F.lit(lang)).otherwise(best[1]),
            )
    total = sum(scores.values(), F.lit(0).cast("long"))
    return F.when(total == 0, F.lit("und")).otherwise(best[1])


def exploded_word_shingles(df, text_col: str, id_col: str, n: int = 5):
    """(id, sh) rows of n-word shingles — the scalable form.

    Why not ``explode(word_shingles(...))``: Spark's higher-order
    functions (transform/slice lambdas) are CodegenFallback and
    re-evaluate the tokenizing ``split`` subtree once PER ARRAY
    ELEMENT, turning an O(tokens) row into O(tokens²) regex work.
    posexplode evaluates the split exactly once per row, and the
    shingle assembly is a lag-window over the token stream — all
    whole-stage-codegen, one shuffle on the doc id that downstream
    groupBys reuse.
    """
    from pyspark.sql import Window

    tok = df.select(
        F.col(id_col), F.posexplode(tokens(text_col)).alias("pos", "tok")
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    lags = [F.lag("tok", n - 1 - j).over(w) for j in range(n - 1)] + [F.col("tok")]
    return (
        tok.select(F.col(id_col), F.col("pos"), F.concat_ws(" ", *lags).alias("sh"))
        .filter(F.col("pos") >= n - 1)
        .drop("pos")
    )


def word_shingles(col, n: int = 5) -> Column:
    """Array of n-word shingles (space-joined) — the unit for Jaccard /
    MinHash dedup. Empty array when the doc has fewer than n tokens."""
    t = tokens(col)
    # Guard: Spark's sequence(1, 0) yields a DESCENDING [1, 0], so short
    # docs must short-circuit to an empty array explicitly.
    return F.when(
        F.size(t) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(t) - (n - 1)),
            lambda i: F.array_join(F.slice(t, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
