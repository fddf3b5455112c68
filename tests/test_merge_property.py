"""Property-based parity: precedence_merge (distributed join+coalesce)
vs a literal pandas reimplementation of the reference's per-row merge
loop (/root/reference/gule_test_job.py:124-163) over hypothesis-random
inputs — duplicate fallback keys, NULL/NaN cells, disjoint columns,
unmatched rows on both sides.
"""

from __future__ import annotations

import math

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from rds_glue_s3_etl_pipeline_spark.operators.merge import precedence_merge

# Cell values: None (NULL), NaN (float-missing), small ints/floats/strs.
_vals = st.one_of(
    st.none(),
    st.just(float("nan")),
    st.floats(-100, 100, allow_nan=False),
    st.text(alphabet="abc", min_size=0, max_size=3),
)
_ids = st.integers(min_value=0, max_value=6)  # small domain -> collisions


def _frame(ids, cells, cols):
    rows = [
        {"id": i, **{c: cells[(k, j)] for j, c in enumerate(cols)}}
        for k, i in enumerate(ids)
    ]
    return pd.DataFrame(rows, columns=["id", *cols])


def _reference_merge(s3: pd.DataFrame, rds: pd.DataFrame) -> pd.DataFrame:
    """The reference's loop, transcribed: one output row per S3 row;
    first RDS match only; per cell S3-if-notna else RDS else None;
    output columns = S3 columns then RDS-only columns."""
    all_cols = list(s3.columns) + [c for c in rds.columns if c not in s3.columns]
    out = []
    for _, s3_row in s3.iterrows():
        match = rds[rds["id"] == s3_row["id"]]
        row = {}
        for col in all_cols:
            if col == "id":
                row[col] = s3_row["id"]
            elif col in s3.columns and pd.notna(s3_row[col]):
                row[col] = s3_row[col]
            elif not match.empty and col in rds.columns:
                row[col] = match.iloc[0][col]
            else:
                row[col] = None
        out.append(row)
    return pd.DataFrame(out, columns=all_cols)


def _canon(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return None
    if isinstance(v, float):
        return round(v, 9)
    return v


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(data=st.data())
def test_precedence_merge_matches_reference_loop(spark, data):
    n_p = data.draw(st.integers(1, 5), label="n_primary")
    n_f = data.draw(st.integers(0, 5), label="n_fallback")
    p_ids = data.draw(st.lists(_ids, min_size=n_p, max_size=n_p, unique=True))
    f_ids = data.draw(st.lists(_ids, min_size=n_f, max_size=n_f))  # dups allowed
    p_cells = {
        (k, j): data.draw(_vals) for k in range(n_p) for j in range(2)
    }
    f_cells = {
        (k, j): data.draw(_vals) for k in range(n_f) for j in range(3)
    }
    # shared columns x,y; fallback-only z
    p_pdf = _frame(p_ids, p_cells, ["x", "y"])
    f_pdf = _frame(f_ids, f_cells, ["x", "y", "z"])

    schema_p = "id long, x string, y string"
    schema_f = "id long, x string, y string, z string"
    # strings carry NaN as None; draw floats as strings for type stability
    for c in ("x", "y"):
        p_pdf[c] = p_pdf[c].map(lambda v: None if v is None or (isinstance(v, float) and math.isnan(v)) else str(_canon(v)))
    for c in ("x", "y", "z"):
        f_pdf[c] = f_pdf[c].map(lambda v: None if v is None or (isinstance(v, float) and math.isnan(v)) else str(_canon(v)))

    primary = spark.createDataFrame(p_pdf, schema_p)
    # preserve the fallback's physical row order for iloc[0] parity
    f_pdf2 = f_pdf.copy()
    f_pdf2["__ord"] = range(len(f_pdf2))
    fallback = spark.createDataFrame(f_pdf2, schema_f + ", __ord long")

    got = precedence_merge(
        primary, fallback, fallback_order_col="__ord"
    ).toPandas()
    want = _reference_merge(p_pdf, f_pdf)

    assert list(got.columns) == list(want.columns)
    got_set = {
        tuple(_canon(v) for v in row)
        for row in got.itertuples(index=False, name=None)
    }
    want_set = {
        tuple(_canon(v) for v in row)
        for row in want.itertuples(index=False, name=None)
    }
    assert got_set == want_set
