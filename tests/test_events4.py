"""q177/q178 semantics on a hand-built event log with known sessions
and transitions."""

from __future__ import annotations

import datetime as dt
import hashlib

import pytest

from rds_glue_s3_etl_pipeline_spark.queries.events4 import (
    q177_session_transcript,
    q178_event_markov,
)


def _mk_events(spark, tmp_path, rows):
    d = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string"
    )
    out = str(tmp_path / "ev")
    d.coalesce(1).write.mode("overwrite").parquet(f"{out}/events.parquet")
    return out


T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _t(minutes):
    return T0 + dt.timedelta(minutes=minutes)


def test_q177_assembles_ordered_transcripts_per_session(spark, tmp_path):
    # User 1: two sessions (40-min gap splits); user 2: one session.
    rows = [
        (1, _t(0), 1, "view", 1.5, "{}"),
        (2, _t(10), 1, "click", 2.25, "{}"),
        (3, _t(60), 1, "purchase", 10.0, "{}"),  # 50-min gap -> new session
        (4, _t(5), 2, "view", 3.0, "{}"),
    ]
    sf = _mk_events(spark, tmp_path, rows)
    out = {
        (r["user_id"], r["session_id"]): r.asDict()
        for r in q177_session_transcript(spark, sf).collect()
    }
    assert set(out) == {(1, 1), (1, 2), (2, 1)}
    s11 = out[(1, 1)]
    assert s11["n_events"] == 2
    txt = "view=1.50\nclick=2.25"
    assert s11["transcript_fp"] == hashlib.md5(txt.encode()).hexdigest()
    assert s11["n_chars"] == len(txt)
    assert s11["start_ms"] == int(T0.timestamp() * 1000)
    s12 = out[(1, 2)]
    assert s12["n_events"] == 1
    assert s12["transcript_fp"] == hashlib.md5(b"purchase=10.00").hexdigest()


def test_q178_rows_are_exact_ratios_summing_to_one(spark, tmp_path):
    rows = [
        (1, _t(0), 1, "view", 0.0, "{}"),
        (2, _t(1), 1, "click", 0.0, "{}"),
        (3, _t(2), 1, "view", 0.0, "{}"),
        (4, _t(3), 1, "click", 0.0, "{}"),
        (5, _t(4), 1, "purchase", 0.0, "{}"),
        (6, _t(0), 2, "view", 0.0, "{}"),
        (7, _t(1), 2, "view", 0.0, "{}"),
    ]
    sf = _mk_events(spark, tmp_path, rows)
    out = {(r["cur"], r["nxt"]): r.asDict() for r in q178_event_markov(spark, sf).collect()}
    # user1: view->click, click->view, view->click, click->purchase
    # user2: view->view
    assert out[("view", "click")]["n_transitions"] == 2
    assert out[("view", "view")]["n_transitions"] == 1
    assert out[("click", "view")]["n_transitions"] == 1
    assert out[("click", "purchase")]["n_transitions"] == 1
    assert out[("view", "click")]["p"] == pytest.approx(2 / 3)
    bycur = {}
    for (cur, _), r in out.items():
        bycur[cur] = bycur.get(cur, 0.0) + r["p"]
    for cur, s in bycur.items():
        assert s == pytest.approx(1.0)
