"""Second text-analysis batch (north-star training-data pipeline):
rolling-hash document fingerprinting, BPE-ish regex token counting,
PII-style scrubbing, deterministic global shuffle.

Each Spark expression has a structurally-identical DuckDB twin so the
oracle checks the value path, not just row counts.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import load
from ..functions import text as X
from ..operators.prefix import global_row_number
from .registry import query

# --------------------------------------------------------------------------
# Rolling-hash fingerprint (north star: "document fingerprinting
# (rolling hash)"). Per-token value v = ascii(first char)*131 + len;
# polynomial fold h = (h*1000003 + v) mod (2^31-1). All BIGINT
# arithmetic: |h| < 2^31 so h*1000003 + v < 2^51 — no overflow in
# either engine. Seed 0 is prepended on the DuckDB side because
# list_reduce has no initial-value form in 1.0.
# --------------------------------------------------------------------------

_MOD = 2_147_483_647
_MUL = 1_000_003

_Q56_ORACLE = f"""
SELECT doc_id,
       list_reduce(
         list_prepend(
           CAST(0 AS BIGINT),
           list_transform(regexp_split_to_array(TRIM(text), '\\s+'),
                          t -> CAST(ascii(t[1:1]) * 131 + LENGTH(t) AS BIGINT))),
         (acc, v) -> (acc * {_MUL} + v) % {_MOD}) AS rolling_fp
FROM documents
"""


@query("q56_rolling_fingerprint", oracle=_Q56_ORACLE, tags=("text", "EXT"))
def q56_rolling_fingerprint(spark, sf_dir):
    """Rolling-hash document fingerprint: polynomial fold over the
    token stream — one aggregate() pass per doc, O(tokens), no UDF.
    Unlike the md5 fingerprint (q22) this is incremental: shifting a
    window of tokens updates the hash in O(1), which is what makes it
    the primitive for substring-level dedup at 100 TB."""
    d = load(spark, sf_dir, "documents")
    vals = F.transform(
        X.tokens("text"),
        lambda t: (F.ascii(F.substring(t, 1, 1)) * 131 + F.length(t)).cast("long"),
    )
    fp = F.aggregate(
        vals,
        F.lit(0).cast("long"),
        lambda acc, v: (acc * _MUL + v) % _MOD,
    )
    return d.select("doc_id", fp.alias("rolling_fp"))


# --------------------------------------------------------------------------
# BPE-ish token counting (north star: "token counting (whitespace + a
# BPE-ish regex)"). Whitespace counting is q19; this estimates LLM
# token counts with the classic pre-tokenizer shape: letter runs are
# ~1 token, digits split singly, punctuation splits singly.
# --------------------------------------------------------------------------

_BPE_RE = r"[a-z]+|[0-9]|[^a-z0-9\s]"

_Q63_ORACLE = f"""
SELECT doc_id,
       CAST(length(regexp_extract_all(LOWER(text), '{_BPE_RE}')) AS BIGINT) AS n_bpe_tokens,
       CAST(LENGTH(text) AS BIGINT) AS n_chars
FROM documents
"""


@query("q63_bpe_token_count", oracle=_Q63_ORACLE, tags=("text", "EXT"))
def q63_bpe_token_count(spark, sf_dir):
    """BPE-style token-count estimate via a pre-tokenizer regex:
    one regexp_count per doc, JVM-side, scan-speed."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.regexp_count(F.lower(F.col("text")), F.lit(_BPE_RE)).cast("long").alias(
            "n_bpe_tokens"
        ),
        F.length("text").cast("long").alias("n_chars"),
    )


# --------------------------------------------------------------------------
# PII-style scrubbing: mask numeric literals (the shape of phone/SSN/
# account scrubbers) and report how many were masked. The fingerprint
# of the scrubbed text proves the rewrite itself matches, not just the
# counts. DuckDB regexp_replace needs the 'g' flag; Spark is global by
# default.
# --------------------------------------------------------------------------

_NUM_RE = r"[0-9]+(\.[0-9]+)?"

_Q64_ORACLE = f"""
SELECT doc_id,
       CAST(length(regexp_extract_all(text, '{_NUM_RE}')) AS BIGINT) AS n_masked,
       md5(regexp_replace(text, '{_NUM_RE}', '<num>', 'g')) AS scrub_fp
FROM documents
"""


@query("q64_text_scrub", oracle=_Q64_ORACLE, tags=("text", "EXT"))
def q64_text_scrub(spark, sf_dir):
    """Scrub numeric literals to a <num> sentinel (PII-masking shape)
    and fingerprint the scrubbed text. Pure regexp built-ins."""
    d = load(spark, sf_dir, "documents")
    scrubbed = F.regexp_replace(F.col("text"), _NUM_RE, "<num>")
    return d.select(
        "doc_id",
        F.regexp_count(F.col("text"), F.lit(_NUM_RE)).cast("long").alias("n_masked"),
        F.md5(scrubbed.cast("binary")).alias("scrub_fp"),
    )


# --------------------------------------------------------------------------
# Deterministic global shuffle: training pipelines need a reproducible
# random-looking total order over documents (for data loaders / epoch
# shuffles). md5(key) is the engine-portable stand-in for a seeded RNG.
# --------------------------------------------------------------------------

_Q65_ORACLE = """
SELECT doc_id,
       ROW_NUMBER() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS shuffle_pos
FROM documents
"""


@query("q65_deterministic_shuffle", oracle=_Q65_ORACLE, tags=("sample", "sort", "EXT"))
def q65_deterministic_shuffle(spark, sf_dir):
    """Reproducible epoch shuffle: total order by md5(doc_id), with the
    position assigned by the two-pass distributed prefix operator
    (operators/prefix.py) — range-partition on the hash, rank within
    partitions, broadcast prefix offsets. No single-task window; the
    same plan shape is the standard distributed sort at 100 TB."""
    d = load(spark, sf_dir, "documents")
    hsh = F.md5(F.col("doc_id").cast("string").cast("binary"))
    return global_row_number(
        d.withColumn("__h", hsh), ["__h", "doc_id"], out_col="shuffle_pos"
    ).select("doc_id", "shuffle_pos")


# --------------------------------------------------------------------------
# §2.10 UDTF: sentence splitting as a true Python table function,
# lateral-joined per document. The DuckDB twin unnests the same
# RE2-compatible split (functions/udfs.py SENTENCE_BOUNDARY), so the
# oracle checks the per-row expansion, not just counts.
# --------------------------------------------------------------------------

_Q66_ORACLE = """
SELECT doc_id,
       CAST(i - 1 AS INT) AS pos,
       parts[i] AS sentence,
       CAST(CASE WHEN TRIM(parts[i]) = '' THEN 0
                 ELSE array_length(regexp_split_to_array(TRIM(parts[i]), '\\s+'))
            END AS INT) AS n_words
FROM (
  SELECT doc_id, regexp_split_to_array(TRIM(text), '[.!?]\\s+') AS parts
  FROM documents
), UNNEST(generate_series(1, array_length(parts))) AS u(i)
"""


@query("q66_udtf_sentences", oracle=_Q66_ORACLE, tags=("text", "udtf", "EXT"))
def q66_udtf_sentences(spark, sf_dir):
    """Per-document sentence table via a Python UDTF + LATERAL join.
    Arrow-batched; at scale the lateral join is a per-partition flatMap
    — no shuffle, parallelism = input splits."""
    from ..functions.udfs import SplitSentences

    spark.udtf.register("split_sentences", SplitSentences)
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(
        """
        SELECT doc_id, s.pos, s.sentence, s.n_words
        FROM documents, LATERAL split_sentences(trim(text)) AS s
        """
    )
