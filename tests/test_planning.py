"""q172/q173/q174 semantics on hand-built corpora where the plan,
threshold, and ranking are known by construction."""

from __future__ import annotations

import math

import pytest

from rds_glue_s3_etl_pipeline_spark.queries.planning import (
    _BM25_B,
    _BM25_K1,
    _BM25_TERMS,
    _KEEP_TOP,
    _MIX_WEIGHTS,
    q172_mixture_plan,
    q173_quality_calibration,
    q174_bm25_topk,
)

SF = "/root/testdata/sf0.001"


def test_q172_plan_math(spark):
    rows = {r["lang"]: r.asDict() for r in q172_mixture_plan(spark, SF).collect()}
    total = sum(r["available_chars"] for r in rows.values())
    budget = total // 2
    for lang, r in rows.items():
        w = _MIX_WEIGHTS.get(lang, 0.0)
        assert r["weight"] == w
        assert r["target_chars"] == math.floor(budget * w)
        assert r["sampling_rate"] == pytest.approx(
            r["target_chars"] / r["available_chars"]
        )
        assert r["n_epochs"] == math.ceil(r["sampling_rate"])
        assert r["oversampled"] == (r["sampling_rate"] > 1.0)
    # The full-weight languages must all be present in the fixture.
    assert set(_MIX_WEIGHTS) <= set(rows)


def test_q173_threshold_is_exact_rank_and_keep_rate_holds(spark):
    out = q173_quality_calibration(spark, SF).collect()
    assert len(out) > 0
    ths = {r["threshold"] for r in out}
    assert len(ths) == 1  # one global bar
    th = ths.pop()
    n = sum(r["n_docs"] for r in out)
    kept = sum(r["n_kept"] for r in out)
    # Keep rate is >= the target (ties at the bar only ADD docs) and
    # within one doc of it from below.
    assert kept >= math.floor(_KEEP_TOP * n)
    # The threshold is an actual quality value with exactly
    # ceil((1-KEEP)*n) docs at-or-below it when qualities are unique;
    # verify against an independent recompute.
    from rds_glue_s3_etl_pipeline_spark.catalog import load
    from rds_glue_s3_etl_pipeline_spark.functions import text as X

    q = sorted(
        r["q"]
        for r in load(spark, SF, "documents")
        .select(X.quality_score("text").alias("q"))
        .collect()
    )
    k = math.ceil((1.0 - _KEEP_TOP) * len(q))
    assert th == q[k - 1]
    assert kept == sum(1 for v in q if v >= th)


def test_q174_bm25_ranks_term_rich_docs_first(spark, tmp_path):
    d = spark.createDataFrame(
        [
            (1, "spark table join spark table join spark"),  # all terms, high tf
            (2, "spark filler words here and there"),  # one term
            (3, "nothing relevant at all in this text"),  # no terms
            (4, "table join table join"),  # two terms
        ],
        "doc_id bigint, text string",
    )
    out = str(tmp_path / "bm")
    d.coalesce(1).write.mode("overwrite").parquet(f"{out}/documents.parquet")
    rows = q174_bm25_topk(spark, out).collect()
    order = [r["doc_id"] for r in rows]
    # Doc 3 scores 0 but still appears (top-15 over 4 docs); the
    # term-rich docs must rank above the term-free one.
    assert order.index(1) < order.index(3)
    assert order.index(4) < order.index(3)
    assert rows[0]["doc_id"] in (1, 4)
    # Independent scoring check for the top doc.
    texts = {1: 7, 2: 6, 3: 7, 4: 4}  # token counts
    avgdl = sum(texts.values()) / 4
    toks = {
        1: ["spark", "table", "join", "spark", "table", "join", "spark"],
        2: ["spark", "filler", "words", "here", "and", "there"],
        3: ["nothing", "relevant", "at", "all", "in", "this", "text"],
        4: ["table", "join", "table", "join"],
    }
    def bm25(doc):
        s = 0.0
        for t in _BM25_TERMS:
            tf = toks[doc].count(t)
            df = sum(1 for d_ in toks.values() if t in d_)
            idf = math.log(1 + (4 - df + 0.5) / (df + 0.5))
            term = idf * tf * (_BM25_K1 + 1) / (
                tf + _BM25_K1 * (1 - _BM25_B + _BM25_B * texts[doc] / avgdl)
            )
            # mirror the 8dp decimal truncation
            s += math.floor(term * 1e8) / 1e8
        return s

    got = {r["doc_id"]: r["bm25"] for r in rows}
    for doc in (1, 2, 3, 4):
        assert got[doc] == pytest.approx(bm25(doc), abs=2e-8)


def test_q176_executes_plan_deterministically(spark):
    from rds_glue_s3_etl_pipeline_spark.queries.planning import (
        q176_mixture_execute,
    )

    a = sorted(
        (r["lang"], r["epoch"], r["n_docs"], r["chars"])
        for r in q176_mixture_execute(spark, SF).collect()
    )
    b = sorted(
        (r["lang"], r["epoch"], r["n_docs"], r["chars"])
        for r in q176_mixture_execute(spark, SF).collect()
    )
    assert a == b  # counter-based draw: bit-identical across runs
    plan = {r["lang"]: r.asDict() for r in q172_mixture_plan(spark, SF).collect()}
    by_lang = {}
    for lang, epoch, n_docs, chars in a:
        by_lang.setdefault(lang, []).append((epoch, chars))
        assert 0 <= epoch < plan[lang]["n_epochs"]
    for lang, rows in by_lang.items():
        got = sum(c for _, c in rows)
        target = plan[lang]["target_chars"]
        avail = plan[lang]["available_chars"]
        full = int(plan[lang]["sampling_rate"])
        # sampled mass lands within one partial-epoch's doc jitter of
        # the target: full epochs are exact, the partial epoch is a
        # Bernoulli subset, so allow +-40% of one epoch's chars.
        assert abs(got - target) <= max(0.4 * avail, 1000)
        # every FULL epoch carries the whole slice
        for e, c in rows:
            if e < full:
                assert c == avail


def test_q182_flags_eval_vectors_with_train_neighbors(spark, tmp_path):
    from rds_glue_s3_etl_pipeline_spark.queries.planning import (
        q182_split_leakage,
    )

    # md5-prefix split fences put 0,1,2 in train; 3 in val; 44 in test
    # (verified against q138's fences). Same label = candidate block.
    # Vec 3 is nearly vec 0 (leak); vec 44 is orthogonal to everything.
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0], 1),
        (1, [0.0, 1.0, 0.0, 0.0], 1),
        (2, [0.0, 0.0, 1.0, 0.0], 1),
        (3, [0.99, 0.1, 0.0, 0.0], 1),   # val, near vec 0  -> leaked
        (44, [0.0, 0.0, 0.0, 1.0], 1),   # test, orthogonal -> clean
        (64, [0.0, 0.0, -1.0, 0.0], 1),  # val, anti-parallel -> clean
    ]
    d = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    )
    out = str(tmp_path / "emb")
    d.coalesce(1).write.mode("overwrite").parquet(f"{out}/embeddings.parquet")
    got = {r["split"]: r.asDict() for r in q182_split_leakage(spark, out).collect()}
    assert got["val"]["n_vectors"] == 2
    assert got["val"]["n_leaked"] == 1
    assert got["val"]["leak_rate"] == 0.5
    assert got["test"]["n_vectors"] == 1
    assert got["test"]["n_leaked"] == 0


def test_q216_repairs_the_leak_by_cluster_assignment(spark, tmp_path):
    from rds_glue_s3_etl_pipeline_spark.queries.planning import (
        q216_leakage_safe_split,
    )

    # Same fixture as the q182 test: under the per-vector split, vec 3
    # (val) leaks against vec 0 (train). Under the cluster split, the
    # {0, 3} component hashes ONE id (0 -> train), so both land in
    # train and every split's n_leaked is 0 by construction.
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0], 1),
        (1, [0.0, 1.0, 0.0, 0.0], 1),
        (2, [0.0, 0.0, 1.0, 0.0], 1),
        (3, [0.99, 0.1, 0.0, 0.0], 1),   # clustered with vec 0
        (44, [0.0, 0.0, 0.0, 1.0], 1),   # test singleton
        (64, [0.0, 0.0, -1.0, 0.0], 1),  # val singleton
    ]
    d = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    )
    out = str(tmp_path / "emb")
    d.coalesce(1).write.mode("overwrite").parquet(f"{out}/embeddings.parquet")
    got = {
        r["split"]: r.asDict()
        for r in q216_leakage_safe_split(spark, out).collect()
    }
    assert got["train"]["n_vectors"] == 4          # 0,1,2 + repaired 3
    assert got["train"]["n_clusters"] == 3         # {0,3}, {1}, {2}
    assert got["val"]["n_vectors"] == 1            # 64 stays
    assert got["test"]["n_vectors"] == 1           # 44 stays
    assert all(v["n_leaked"] == 0 for v in got.values())


def test_q226_allocation_is_row_exact_at_awkward_n(spark, tmp_path):
    """n = 26 per stratum: floor(0.8*26) = 20 train, floor(2.6) = 2
    val, 4 test — the case where double division would mis-cut the val
    fence (20.8 + 2.6 = 23.4 rounds the wrong way)."""
    from rds_glue_s3_etl_pipeline_spark.queries.planning import (
        q226_stratified_split_exact,
    )

    rows = [(i, f"doc {i}", f"s{i % 2}") for i in range(52)]  # 26 per source
    d = spark.createDataFrame(rows, "doc_id bigint, text string, source string")
    out = str(tmp_path / "docs")
    d.coalesce(1).write.mode("overwrite").parquet(f"{out}/documents.parquet")
    got = {
        (r["source"], r["split"]): r["n_docs"]
        for r in q226_stratified_split_exact(spark, out).collect()
    }
    for s in ("s0", "s1"):
        assert got[(s, "train")] == 20
        assert got[(s, "val")] == 2
        assert got[(s, "test")] == 4


def test_q219_dbscan_roles_on_a_planted_chain(spark, tmp_path):
    """5-vector picture: a dense triangle {0,1,2} (all cores), a
    pendant 3 attached to the triangle (border), and an isolated 4
    (noise). Same-label so the label blocking is not the variable."""
    from rds_glue_s3_etl_pipeline_spark.queries.vector6 import (
        q219_dbscan_embeddings,
    )

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0], 1),
        (1, [0.99, 0.14, 0.0, 0.0], 1),   # ~cos 0.99 to 0
        (2, [0.99, 0.0, 0.14, 0.0], 1),   # ~cos 0.99 to 0, 0.98 to 1
        (3, [0.9, 0.43, 0.0, 0.0], 1),    # close to 1 and 0 but we check role math below
        (4, [0.0, 0.0, 0.0, 1.0], 1),     # orthogonal: noise
    ]
    d = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    )
    out = str(tmp_path / "emb")
    d.coalesce(1).write.mode("overwrite").parquet(f"{out}/embeddings.parquet")
    got = {
        r["vec_id"]: (r["role"], r["cluster_id"])
        for r in q219_dbscan_embeddings(spark, out).collect()
    }
    # 0,1,2,3 are mutually within eps (cos >= 0.3): all have >= 2
    # neighbors -> all core, one cluster rooted at min id 0.
    for v in (0, 1, 2, 3):
        assert got[v] == ("core", 0)
    assert got[4] == ("noise", None)


def test_q219_border_vs_noise_distinction(spark, tmp_path):
    """A vector within eps of exactly ONE core is border (inherits the
    core's cluster); a vector whose only neighbor is NON-core stays
    noise — the classic DBSCAN asymmetry."""
    from rds_glue_s3_etl_pipeline_spark.queries.vector6 import (
        q219_dbscan_embeddings,
    )

    rows = [
        # dense pair + hub: 0 has neighbors 1,2 (core); 1,2 have 0 and
        # each other? make 1,2 orthogonal to each other, only near 0:
        # deg(0)=2 core; deg(1)=deg(2)=1 non-core -> border via 0.
        (0, [1.0, 1.0, 0.0, 0.0], 1),
        (1, [1.0, 0.0, 0.0, 0.0], 1),
        (2, [0.0, 1.0, 0.0, 0.0], 1),
        # 5 is near ONLY 6 (non-core, deg 1): both noise.
        (5, [0.0, 0.0, 1.0, 0.05], 1),
        (6, [0.0, 0.0, 1.0, -0.05], 1),
    ]
    d = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    )
    out = str(tmp_path / "emb")
    d.coalesce(1).write.mode("overwrite").parquet(f"{out}/embeddings.parquet")
    got = {
        r["vec_id"]: (r["role"], r["cluster_id"])
        for r in q219_dbscan_embeddings(spark, out).collect()
    }
    assert got[0] == ("core", 0)        # singleton-core cluster = own id
    assert got[1] == ("border", 0)
    assert got[2] == ("border", 0)
    # 5 and 6 see each other (cos ~0.995) but neither is core:
    # deg 1 < 2 -> both noise, never a cluster.
    assert got[5] == ("noise", None)
    assert got[6] == ("noise", None)
