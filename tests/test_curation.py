"""q183-q186 semantics verified against independent recomputes and
closed-form invariants (the oracle sweep covers value equality; these
pin the CONTRACTS: caps, rank formulas, normalization, df counting)."""

from __future__ import annotations

import hashlib

import pandas as pd
import pytest

from rds_glue_s3_etl_pipeline_spark.queries.curation import (
    _CB_CAP,
    _RRF_C,
    _RRF_POOL,
    _RRF_QVEC,
    _RRF_TOPK,
    _SHINGLE_N,
    _TEMP_ALPHA,
    q183_cluster_balanced_sample,
    q184_hybrid_retrieval_rrf,
    q185_domain_temperature_mix,
    q186_ngram_novelty,
)

SF = "/root/testdata/sf0.001"


def test_q183_cap_holds_and_matches_kmeans_assignment(spark):
    out = q183_cluster_balanced_sample(spark, SF).collect()
    assert out
    by_cell: dict[int, list] = {}
    for r in out:
        by_cell.setdefault(r["c_id"], []).append(r)
    for c_id, rows in by_cell.items():
        # Cap enforced, ranks are 1..kept with no gaps, cell_n consistent.
        assert len(rows) <= _CB_CAP
        ranks = sorted(r["keep_rank"] for r in rows)
        assert ranks == list(range(1, len(rows) + 1))
        cell_n = {r["cell_n"] for r in rows}
        assert len(cell_n) == 1
        n = cell_n.pop()
        assert len(rows) == min(n, _CB_CAP)
    # The kept set is a subset of the q142 trained assignment with the
    # SAME cell for every vector.
    from rds_glue_s3_etl_pipeline_spark.queries.vector3 import q142_kmeans_ivf

    assign = {
        r["vec_id"]: r["c_id"] for r in q142_kmeans_ivf(spark, SF).collect()
    }
    for r in out:
        assert assign[r["vec_id"]] == r["c_id"]
    # md5-rank determinism: within a cell the kept members are exactly
    # the cell's lowest md5(vec_id) values.
    full_cells: dict[int, list] = {}
    for vec_id, c_id in assign.items():
        full_cells.setdefault(c_id, []).append(vec_id)
    for c_id, members in full_cells.items():
        expect = sorted(
            members, key=lambda v: (hashlib.md5(str(v).encode()).hexdigest(), v)
        )[: min(len(members), _CB_CAP)]
        got = [
            r["vec_id"]
            for r in sorted(by_cell[c_id], key=lambda r: r["keep_rank"])
        ]
        assert got == expect


def test_q184_rrf_formula_and_ordering(spark):
    out = q184_hybrid_retrieval_rrf(spark, SF).collect()
    assert 0 < len(out) <= _RRF_TOPK
    for r in out:
        expect = 0.0
        if r["bm25_rank"] is not None:
            assert 1 <= r["bm25_rank"] <= _RRF_POOL
            expect += 1.0 / (_RRF_C + r["bm25_rank"])
        if r["cos_rank"] is not None:
            assert 1 <= r["cos_rank"] <= _RRF_POOL
            expect += 1.0 / (_RRF_C + r["cos_rank"])
        assert r["rrf_score"] == pytest.approx(expect, abs=0.0)
        assert r["bm25_rank"] is not None or r["cos_rank"] is not None
    # Output is the TOP of the fused ranking: descending, doc_id ties.
    keys = [(-r["rrf_score"], r["doc_id"]) for r in out]
    assert keys == sorted(keys)
    # Query-by-document: the query vector is its own nearest dense hit.
    self_row = [r for r in out if r["doc_id"] == _RRF_QVEC]
    assert self_row and self_row[0]["cos_rank"] == 1


def test_q185_weights_normalize_and_flatten(spark):
    out = q185_domain_temperature_mix(spark, SF).collect()
    assert len(out) > 1
    assert sum(r["weight"] for r in out) == pytest.approx(1.0, abs=1e-9)
    assert sum(r["share"] for r in out) == pytest.approx(1.0, abs=1e-9)
    for r in out:
        assert r["weight"] == pytest.approx(
            r["share"] ** _TEMP_ALPHA
            / sum(x["share"] ** _TEMP_ALPHA for x in out),
            rel=1e-6,
        )
        assert r["boost"] == pytest.approx(r["weight"] / r["share"], rel=1e-12)
    # alpha < 1 flattens: the biggest domain is downweighted relative
    # to the smallest (boost strictly decreases with share).
    big = max(out, key=lambda r: r["share"])
    small = min(out, key=lambda r: r["share"])
    assert big["boost"] < 1.0 < small["boost"]
    # Monotone: weight preserves the share ordering (x^alpha is
    # increasing), boost reverses it.
    by_share = sorted(out, key=lambda r: r["share"])
    weights = [r["weight"] for r in by_share]
    boosts = [r["boost"] for r in by_share]
    assert weights == sorted(weights)
    assert boosts == sorted(boosts, reverse=True)


def test_q186_novelty_matches_pandas_recompute(spark):
    out = {r["doc_id"]: r for r in q186_ngram_novelty(spark, SF).collect()}
    docs = pd.read_parquet(f"{SF}/documents.parquet")[["doc_id", "text"]]
    shingles: dict[int, set] = {}
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        toks = text.strip().split()
        shingles[doc_id] = {
            " ".join(toks[i : i + _SHINGLE_N])
            for i in range(len(toks) - _SHINGLE_N + 1)
        }
    df: dict[str, int] = {}
    for shs in shingles.values():
        for sh in shs:
            df[sh] = df.get(sh, 0) + 1
    for doc_id, shs in shingles.items():
        if not shs:
            assert doc_id not in out
            continue
        n_novel = sum(1 for sh in shs if df[sh] == 1)
        r = out[doc_id]
        assert r["n_shingles"] == len(shs)
        assert r["n_novel"] == n_novel
        assert r["novelty"] == pytest.approx(n_novel / len(shs), abs=0.0)
    assert set(out) <= set(shingles)


def test_q190_gate_precedence_and_composition(spark):
    """q190's verdicts recompute exactly from its three component
    queries: q124 (survivors), q20 (quality), q186 (novelty)."""
    from rds_glue_s3_etl_pipeline_spark.queries.curation import (
        _CP_NOVELTY_MIN,
        _CP_QUALITY_MIN,
        q190_curation_pipeline,
    )
    from rds_glue_s3_etl_pipeline_spark.queries.events3 import (
        q124_dedup_keep_best,
    )
    from rds_glue_s3_etl_pipeline_spark.queries.text import q20_quality_score

    out = {r["doc_id"]: r for r in q190_curation_pipeline(spark, SF).collect()}
    survivors = {
        r["kept_doc_id"] for r in q124_dedup_keep_best(spark, SF).collect()
    }
    quality = {
        r["doc_id"]: r["quality"] for r in q20_quality_score(spark, SF).collect()
    }
    novelty = {
        r["doc_id"]: r["novelty"]
        for r in q186_ngram_novelty(spark, SF).collect()
    }
    assert set(out) == set(quality)  # one verdict per document
    n_kept = 0
    for doc_id, r in out.items():
        nv = novelty.get(doc_id, 1.0)
        if doc_id not in survivors:
            expect = "dup_loser"
        elif quality[doc_id] < _CP_QUALITY_MIN:
            expect = "low_quality"
        elif nv < _CP_NOVELTY_MIN:
            expect = "low_novelty"
        else:
            expect = "kept"
            n_kept += 1
        assert r["verdict"] == expect, (doc_id, r["verdict"], expect)
        assert r["quality"] == pytest.approx(quality[doc_id], abs=0.0)
        assert r["novelty"] == pytest.approx(nv, abs=0.0)
    # The pipeline keeps a meaningful majority and every gate fires
    # somewhere on the smoke fixture.
    verdicts = {r["verdict"] for r in out.values()}
    assert n_kept > 0 and "dup_loser" in verdicts


def test_q191_metrics_recompute_from_arms(spark):
    """MRR/NDCG recompute exactly from the two arm queries' outputs."""
    import math

    from rds_glue_s3_etl_pipeline_spark.queries.curation import (
        q191_retrieval_metrics,
    )
    from rds_glue_s3_etl_pipeline_spark.queries.vector import q24_cosine_topk
    from rds_glue_s3_etl_pipeline_spark.queries.vector2 import q59_ivf_topk

    rel: dict[int, set] = {}
    for r in q24_cosine_topk(spark, SF).collect():
        if r["vec_id"] != r["q_id"]:
            rel.setdefault(r["q_id"], set()).add(r["vec_id"])
    ivf: dict[int, list] = {}
    for r in q59_ivf_topk(spark, SF).collect():
        ivf.setdefault(r["q_id"], []).append((r["rank"], r["vec_id"]))
    out = {r["q_id"]: r for r in q191_retrieval_metrics(spark, SF).collect()}
    assert set(out) == set(rel)
    for q_id, relevant in rel.items():
        hits = sorted(
            (rank for rank, v in ivf.get(q_id, []) if v in relevant)
        )
        r = out[q_id]
        assert r["n_rel"] == len(relevant)
        assert r["n_hits"] == len(hits)
        assert r["mrr"] == pytest.approx(
            1.0 / hits[0] if hits else 0.0, abs=0.0
        )
        dcg = sum(1.0 / math.log2(rank + 1) for rank in hits)
        idcg = sum(
            1.0 / math.log2(i + 2) for i in range(min(len(relevant), 5))
        )
        assert r["ndcg"] == pytest.approx(dcg / idcg, rel=1e-12)
    # The gate is non-trivial: nprobe=1 IVF misses some exact hits.
    assert any(r["n_hits"] < r["n_rel"] for r in out.values())


def test_q194_mix_report_recomputes_from_q190(spark):
    import pandas as pd

    from rds_glue_s3_etl_pipeline_spark.queries.curation import (
        q190_curation_pipeline,
        q194_curation_mix_report,
    )

    docs = pd.read_parquet(f"{SF}/documents.parquet")[
        ["doc_id", "lang", "n_chars"]
    ].set_index("doc_id")
    expect: dict[tuple, list] = {}
    for r in q190_curation_pipeline(spark, SF).collect():
        key = (docs.loc[r["doc_id"], "lang"], r["verdict"])
        expect.setdefault(key, []).append(int(docs.loc[r["doc_id"], "n_chars"]))
    got = {
        (r["lang"], r["verdict"]): (r["n_docs"], r["n_chars"])
        for r in q194_curation_mix_report(spark, SF).collect()
    }
    assert got == {
        k: (len(v), sum(v)) for k, v in expect.items()
    }
