"""Exact-substring (repeated-span) dedup — q170/q171 semantics on a
hand-built corpus where every expected span is known by construction.

Window width is text5._W = 8 tokens, stride 1; a window duplicated
anywhere in the corpus marks its positions; islands merge on start
gaps <= W; q171 deletes every occurrence except the globally first
(min (doc_id, start))."""

from __future__ import annotations

import hashlib

import pytest

from rds_glue_s3_etl_pipeline_spark.queries.text5 import (
    _W,
    q170_repeated_spans,
    q171_span_scrub,
)


def _mk_docs(spark, tmp_path, rows):
    d = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = str(tmp_path / "docs")
    d.coalesce(1).write.mode("overwrite").parquet(f"{out}/documents.parquet")
    return out


# A 12-token passage shared verbatim between docs 1 and 2 (so every
# stride-1 8-gram inside it is duplicated), embedded in otherwise
# unique text. Doc 3 is unique; doc 4 is shorter than one window.
_SHARED = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
_DOC1 = f"one two three {_SHARED} four five six"
_DOC2 = f"seven eight {_SHARED} nine ten eleven twelve"
_DOC3 = "totally unique words that appear nowhere else in this corpus at all honestly"
_DOC4 = "tiny doc"


@pytest.fixture(scope="module")
def span_fixture(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("spans")
    sf = _mk_docs(
        spark,
        tmp,
        [(1, _DOC1), (2, _DOC2), (3, _DOC3), (4, _DOC4)],
    )
    return sf


def test_q170_finds_exactly_the_planted_span(spark, span_fixture):
    rows = {r["doc_id"]: r.asDict() for r in q170_repeated_spans(spark, span_fixture).collect()}
    # Only the two docs sharing the passage report spans.
    assert set(rows) == {1, 2}
    for doc_id, prefix_len in ((1, 3), (2, 2)):
        r = rows[doc_id]
        assert r["n_dup_spans"] == 1
        # The duplicated 8-gram windows start at prefix_len .. prefix_len+4
        # (12-token shared run => 5 duplicated windows), covering
        # positions prefix_len .. prefix_len+11 => 12 tokens.
        assert r["dup_tokens"] == 12
        assert r["longest_span"] == 12
        assert r["dup_frac"] == pytest.approx(12 / r["n_tokens"])


def test_q170_merges_adjacent_windows_into_one_island(spark, span_fixture):
    # 5 overlapping duplicated windows must merge to ONE maximal span,
    # not report 5 spans — that is the gaps-and-islands contract.
    out = q170_repeated_spans(spark, span_fixture).collect()
    assert all(r["n_dup_spans"] == 1 for r in out)


def test_q171_keep_first_scrubs_second_occurrence_only(spark, span_fixture):
    rows = {r["doc_id"]: r.asDict() for r in q171_span_scrub(spark, span_fixture).collect()}
    assert set(rows) == {1, 2, 3, 4}
    # Doc 1 holds the first occurrence (doc_id order) — fully kept.
    assert rows[1]["n_kept"] == rows[1]["n_tokens"]
    exp1 = hashlib.md5(_DOC1.encode()).hexdigest()
    assert rows[1]["scrub_fp"] == exp1
    # Doc 2 loses exactly the 12 shared tokens.
    assert rows[2]["n_kept"] == rows[2]["n_tokens"] - 12
    exp2 = hashlib.md5(b"seven eight nine ten eleven twelve").hexdigest()
    assert rows[2]["scrub_fp"] == exp2
    # Unique and sub-window docs are untouched.
    assert rows[3]["n_kept"] == rows[3]["n_tokens"]
    assert rows[4]["n_kept"] == rows[4]["n_tokens"] == 2
    assert rows[4]["scrub_fp"] == hashlib.md5(_DOC4.encode()).hexdigest()


def test_q171_within_doc_repeat_is_cut(spark, tmp_path_factory):
    # The same 8-gram twice INSIDE one doc: second occurrence cut.
    tmp = tmp_path_factory.mktemp("spans_within")
    eight = "a b c d e f g h"
    text = f"{eight} x y z {eight} tail"
    sf = _mk_docs(spark, tmp, [(1, text)])
    r = q171_span_scrub(spark, sf).collect()[0]
    assert r["n_tokens"] == 20
    assert r["n_kept"] == 12  # 8 + 'x y z' + 'tail'
    exp = hashlib.md5(f"{eight} x y z tail".encode()).hexdigest()
    assert r["scrub_fp"] == exp


def test_q170_empty_when_no_duplicates(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("spans_none")
    sf = _mk_docs(
        spark,
        tmp,
        [(1, "w1 w2 w3 w4 w5 w6 w7 w8 w9"), (2, "v1 v2 v3 v4 v5 v6 v7 v8 v9")],
    )
    assert q170_repeated_spans(spark, sf).count() == 0
    assert _W == 8  # tests above hard-code the width; fail loudly if it moves


def test_q175_flags_only_contaminated_train_docs(spark, tmp_path_factory):
    from rds_glue_s3_etl_pipeline_spark.queries.text5 import (
        q175_eval_decontaminate,
    )

    tmp = tmp_path_factory.mktemp("decon")
    eval_text = f"benchmark intro {_SHARED} benchmark outro"
    train_hit = f"stolen passage {_SHARED} more words here"
    train_clean = "completely original training text with no overlap at all ok"
    d = spark.createDataFrame(
        [
            (1, eval_text, "src0"),
            (2, train_hit, "src1"),
            (3, train_clean, "src2"),
        ],
        "doc_id bigint, text string, source string",
    )
    out = str(tmp / "docs")
    d.coalesce(1).write.mode("overwrite").parquet(f"{out}/documents.parquet")
    rows = {r["doc_id"]: r.asDict() for r in q175_eval_decontaminate(spark, out).collect()}
    assert set(rows) == {2}
    r = rows[2]
    # the 12-token shared run yields 5 shared 8-gram hashes
    assert r["n_shared_windows"] == 5
    assert r["n_windows"] == 17 - _W + 1  # train_hit has 17 tokens
    assert r["contamination_frac"] == pytest.approx(5 / 10)


def test_q180_families_link_through_shared_spans(spark, tmp_path_factory):
    from rds_glue_s3_etl_pipeline_spark.queries.text5 import (
        q180_template_families,
    )

    tmp = tmp_path_factory.mktemp("fam")
    # Docs 1-2 share _SHARED (12 tokens -> 5 shared windows >= 3);
    # docs 2-3 share a second 12-token run; 1-3 share nothing directly
    # but must land in ONE family transitively. Doc 4 is isolated.
    other = "n1 n2 n3 n4 n5 n6 n7 n8 n9 n10 n11 n12"
    sf = _mk_docs(
        spark,
        tmp,
        [
            (1, f"one two {_SHARED} three"),
            (2, f"{_SHARED} mid words {other}"),
            (3, f"{other} tail tokens here"),
            (4, "iso a b c d e f g h i j"),
        ],
    )
    rows = {r["doc_id"]: r.asDict() for r in q180_template_families(spark, sf).collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[1]["family_id"] == rows[2]["family_id"] == rows[3]["family_id"] == 1
    assert all(r["family_size"] == 3 for r in rows.values())


def test_q181_agreement_counts_on_clone_pair(spark, tmp_path_factory):
    from rds_glue_s3_etl_pipeline_spark.queries.text5 import (
        q181_dedup_agreement,
    )

    tmp = tmp_path_factory.mktemp("agree")
    clone = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon"
    )
    # Two identical docs (span coverage 1.0 on both; MinHash drops one)
    # plus an unrelated doc neither signal touches. n_chars must
    # exist: q124 ranks survivors by it.
    d = spark.createDataFrame(
        [
            (1, clone, len(clone)),
            (2, clone, len(clone)),
            (3, "completely different words that never repeat anywhere at all", 60),
        ],
        "doc_id bigint, text string, n_chars bigint",
    )
    out = str(tmp / "docs")
    d.coalesce(1).write.mode("overwrite").parquet(f"{out}/documents.parquet")
    r = q181_dedup_agreement(spark, out).collect()[0]
    assert r["n_span_flagged"] == 2  # both clones fully covered
    assert r["n_minhash_dropped"] == 1  # keep-best retains one
    assert r["n_both"] == 1
    assert r["n_span_only"] == 1
    assert r["n_minhash_only"] == 0
    assert r["jaccard"] == 0.5


def test_q218_containment_catches_embedded_eval_item(spark, tmp_path_factory):
    from rds_glue_s3_etl_pipeline_spark.queries.text5 import (
        q218_containment_decontaminate,
    )

    tmp = tmp_path_factory.mktemp("contain")
    # Eval item (6 tokens -> 4 distinct trigrams) embedded verbatim in a
    # LONG train doc: Jaccard is tiny (4 shared / ~30 union) but
    # containment is 4/4 = 1.0 — the case q23-style symmetric dedup
    # misses by construction.
    eval_text = "alpha beta gamma delta epsilon zeta"
    train_hit = (
        "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 "
        "alpha beta gamma delta epsilon zeta "
        "w11 w12 w13 w14 w15 w16 w17 w18 w19 w20"
    )
    train_clean = "totally different words everywhere in this training document"
    eval_clean = "another benchmark item with zero overlap anywhere at all"
    d = spark.createDataFrame(
        [
            (1, eval_text, "src0"),
            (2, train_hit, "src1"),
            (3, train_clean, "src2"),
            (4, eval_clean, "src0"),
        ],
        "doc_id bigint, text string, source string",
    )
    out = str(tmp / "docs")
    d.coalesce(1).write.mode("overwrite").parquet(f"{out}/documents.parquet")
    rows = {
        r["eval_doc"]: r.asDict()
        for r in q218_containment_decontaminate(spark, out).collect()
    }
    assert set(rows) == {1, 4}  # every eval doc gets a row
    assert rows[1]["n_flagged"] == 1
    assert rows[1]["max_containment"] == 1.0
    assert rows[1]["best_train_doc"] == 2
    assert rows[4]["n_flagged"] == 0
    assert rows[4]["max_containment"] == 0.0
    assert rows[4]["best_train_doc"] is None
