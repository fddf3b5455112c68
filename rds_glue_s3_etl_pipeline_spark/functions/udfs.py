"""UDF / UDAF / UDTF surface (SURVEY §2.10).

The reference imports ``udf, pandas_udf`` but never defines one
(``gule_test_job.py:13``); its only custom logic is the driver-side
merge loop. This module is the engine's declared escape hatch, with
the preference order enforced by example:

1. built-in functions (everything in functions/text.py, functions/vector.py);
2. Arrow-vectorized ``pandas_udf`` for scalar work with no builtin;
3. ``applyInPandas`` for per-group custom aggregation (UDAF-shaped);
4. ``mapInPandas`` for batch-wise transforms (see multimodal/codec.py).

Row-at-a-time ``@F.udf`` is deliberately absent — never the hot path.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


@F.pandas_udf(T.DoubleType())
def log1p_abs(v: pd.Series) -> pd.Series:
    """Vectorized scalar example: numerically-stable log(1+|x|) —
    Arrow-batched, numpy-backed, ~10-100x a python row UDF."""
    import numpy as np

    return pd.Series(np.log1p(v.abs()))


GAP_STATS_SCHEMA = (
    "o_custkey long, n_orders long, median_gap_days double, max_gap_days double"
)


MIN_GAP_BUCKETS = 64
GAP_ROWS_PER_BUCKET = 250_000


def order_gap_stats(
    orders: DataFrame,
    target_rows_per_bucket: int = GAP_ROWS_PER_BUCKET,
) -> DataFrame:
    """Per-customer order-gap statistics via applyInPandas (the
    UDAF-shaped escape hatch): median and max day-gap between a
    customer's consecutive orders.

    Scale notes — the many-tiny-groups trap and its fix: grouping by
    o_custkey directly means one Python invocation PER CUSTOMER
    (~1 ms each of per-call overhead; measured 18 s for 15k customers
    at sf0.1). Instead the applyInPandas group key is a HASH BUCKET of
    the customer key, and each call runs a vectorized pandas groupby
    over all its customers — same shuffle volume, orders-of-magnitude
    fewer Python calls, 18 s -> sub-second. Customers never straddle
    buckets (bucket is a function of the key), so the per-customer
    result is identical; this is the standard pattern for custom UDAFs
    over high-cardinality keys at 100 TB.

    The bucket count SCALES WITH THE INPUT — buckets =
    rows / ``target_rows_per_bucket``, floored at MIN_GAP_BUCKETS for
    small-input parallelism — so each Python call materializes at most
    ~``target_rows_per_bucket`` rows (3 narrow columns, tens of MB) as
    a pandas frame regardless of corpus size. A FIXED bucket count
    would put rows/64 in every call — per-task memory growing linearly
    with the corpus, the same fixed-grid trap the ANN blockers
    document. The row count comes from one cheap count() over the
    3-column projection (parquet metadata + row-group stats)."""

    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["o_custkey", "o_orderdate", "o_orderkey"])
        gaps = (
            pdf.groupby("o_custkey", sort=False)["o_orderdate"]
            .diff()
            .dt.total_seconds()
            / 86400.0
        )
        out = (
            pdf.assign(gap=gaps)
            .groupby("o_custkey", sort=False)
            .agg(
                n_orders=("o_custkey", "size"),
                median_gap_days=("gap", "median"),
                max_gap_days=("gap", "max"),
            )
            .reset_index()
        )
        return out

    narrow = orders.select("o_custkey", "o_orderdate", "o_orderkey")
    n_buckets = max(
        MIN_GAP_BUCKETS, -(-narrow.count() // max(target_rows_per_bucket, 1))
    )
    return (
        narrow.withColumn(
            "__bucket", F.pmod(F.xxhash64("o_custkey"), F.lit(n_buckets))
        )
        .groupBy("__bucket")
        .applyInPandas(stats, GAP_STATS_SCHEMA)
    )


# Sentence boundary: terminal punctuation + whitespace. Deliberately
# lookbehind-free so the DuckDB oracle (RE2) splits identically to
# Python's re — the boundary match is consumed, dropping the trailing
# punctuation of every sentence but the last.
SENTENCE_BOUNDARY = r"[.!?]\s+"


@F.udtf(returnType="pos int, sentence string, n_words int")
class SplitSentences:
    """True Python UDTF (Spark 4 table function): one input document →
    N output rows, one per sentence — the UDTF shape that
    explode(split()) can't express once per-row state or multi-column
    output enters (here: position + per-sentence word count).

    Used via lateral join: SQL ``SELECT * FROM docs, LATERAL
    split_sentences(text)`` (after ``spark.udtf.register``).
    """

    def eval(self, text: str):
        if text is None:
            return
        import re

        for pos, part in enumerate(re.split(SENTENCE_BOUNDARY, text.strip())):
            yield pos, part, len(part.split())


@F.pandas_udf(T.DoubleType())
def compression_ratio(text: pd.Series) -> pd.Series:
    """zlib-compressed size over raw utf-8 size, level pinned to 6 —
    the Gopher/RefinedWeb repetitiveness signal (boilerplate and
    looped text compress far below prose). zlib is C-speed; the Arrow
    batch transfer is what makes this viable at corpus scale (a row
    UDF would serialize per value). Deterministic for a fixed zlib
    version+level, so tests pin exact values."""
    import zlib

    def ratio(s) -> float:
        b = s.encode("utf-8") if isinstance(s, str) else b""
        return float(len(zlib.compress(b, 6))) / float(max(len(b), 1))

    return text.map(ratio)


try:  # Spark 4.1+: Arrow-native UDFs skip the pandas conversion layer
    import pyarrow as pa

    @F.arrow_udf(T.DoubleType())
    def digit_density(text: pa.Array) -> pa.Array:
        """Arrow-NATIVE scalar UDF (Spark 4.1 ``arrow_udf``): fraction
        of characters that are digits, computed with pyarrow compute
        kernels directly on the Arrow batch — no Arrow→pandas→Arrow
        round-trip, which is the residual overhead ``pandas_udf``
        still pays. Preference order update for §2.10: builtin >
        arrow_udf > pandas_udf > applyInPandas/mapInPandas.
        """
        import pyarrow.compute as pc

        total = pc.utf8_length(text)
        non_digits = pc.utf8_length(pc.replace_substring_regex(text, r"[0-9]", ""))
        return pc.if_else(
            pc.equal(total, 0),
            pa.scalar(0.0, type=pa.float64()),
            pc.divide(
                pc.cast(pc.subtract(total, non_digits), pa.float64()),
                pc.cast(total, pa.float64()),
            ),
        )

    HAS_ARROW_UDF = True
except (ImportError, AttributeError):  # pragma: no cover - older Spark
    HAS_ARROW_UDF = False
