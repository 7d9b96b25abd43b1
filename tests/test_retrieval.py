"""Lexical retrieval: BM25 and TF-IDF against hand-computed numpy oracles
on engineered corpora, plus plan-shape checks (no Python in the hot path,
top-k via TakeOrderedAndProject rather than a global sort)."""

from __future__ import annotations

import math

import pytest


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


CORPUS = [
    (1, "spark engine runs fast spark spark"),
    (2, "the quick brown fox jumps over the lazy dog"),
    (3, "distributed data processing with a distributed engine"),
    (4, "data data data everywhere and nothing to process"),
    (5, "an engine for data"),
]


def _bm25_oracle(query_terms, k1=1.2, b=0.75):
    docs = {i: t.lower().split() for i, t in CORPUS}
    n = len(docs)
    avgdl = sum(len(w) for w in docs.values()) / n
    scores = {}
    for t in query_terms:
        df = sum(1 for w in docs.values() if t in w)
        if df == 0:
            continue
        idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
        for i, w in docs.items():
            tf = w.count(t)
            if tf:
                scores[i] = scores.get(i, 0.0) + idf * tf * (k1 + 1) / (
                    tf + k1 * (1 - b + b * len(w) / avgdl)
                )
    return scores


def test_bm25_matches_hand_oracle(spark):
    from taxahfe_spark.operators.retrieval import bm25_topk

    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    got = {r["doc_id"]: r["score"] for r in bm25_topk(df, "spark data engine", k=5).collect()}
    want = _bm25_oracle(["spark", "data", "engine"])
    assert set(got) == set(want)
    for i in want:
        assert got[i] == pytest.approx(want[i], rel=1e-9)


def test_bm25_k_cut_and_tiebreak(spark):
    from taxahfe_spark.operators.retrieval import bm25_topk

    # identical docs -> identical scores; the (score desc, id asc) cut must
    # keep the smallest ids deterministically
    rows = [(i, "same words here exactly") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = [r["doc_id"] for r in bm25_topk(df, "same words", k=3).collect()]
    assert got == [0, 1, 2]


def test_bm25_query_term_dedup_and_empty_query(spark):
    from taxahfe_spark.operators.retrieval import bm25_topk, query_terms

    assert query_terms("Spark, spark SPARK data!") == ["spark", "data"]
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    a = {r["doc_id"]: r["score"] for r in bm25_topk(df, "spark spark spark", k=5).collect()}
    b = {r["doc_id"]: r["score"] for r in bm25_topk(df, "spark", k=5).collect()}
    assert a == b  # each distinct term scored once
    with pytest.raises(ValueError):
        bm25_topk(df, "!!! ???", k=5)
    # no term matches anything -> empty result, not an error
    assert bm25_topk(df, "zzzqqq", k=5).count() == 0


def test_tfidf_matches_sklearn_form(spark):
    from taxahfe_spark.operators.retrieval import tfidf_weights

    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    got = {(r["doc_id"], r["word"]): r for r in tfidf_weights(df).collect()}
    # doc 1: 'spark' tf=3; df('spark')=1; n=5
    r = got[(1, "spark")]
    assert r["tf"] == 3 and r["df"] == 1
    assert r["tfidf"] == pytest.approx(3 * (math.log(6.0 / 2.0) + 1.0), rel=1e-9)
    # 'data' appears in docs 3,4,5
    assert got[(4, "data")]["df"] == 3
    assert got[(4, "data")]["tf"] == 3


def test_bm25_plan_shape(spark):
    """Hot path stays JVM-side and the cut is TakeOrderedAndProject (local
    heap top-k per partition, driver merge — never a global sort). Audits
    the REAL operator plan via materialize=False."""
    from taxahfe_spark.operators.retrieval import bm25_topk

    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    out = bm25_topk(df, "spark data", k=2, materialize=False)
    plan = _plan(out)
    assert "TakeOrderedAndProject" in plan, plan
    assert "PythonUDF" not in plan and "BatchEvalPython" not in plan, plan
    # lazy and eager paths agree
    lazy = {(r["doc_id"], round(r["score"], 9)) for r in out.collect()}
    eager = {
        (r["doc_id"], round(r["score"], 9))
        for r in bm25_topk(df, "spark data", k=2).collect()
    }
    assert lazy == eager


def test_dsir_prefers_target_like_docs(spark):
    """Importance log-weights rank target-like raw docs above off-domain
    ones; zero-word docs score exactly 0; the whole thing is deterministic
    in (id, seed)."""
    from taxahfe_spark.operators.selection import dsir_logweights, dsir_select

    target_rows = [(100 + i, f"spark engine shuffle partition executor task stage {i}")
                   for i in range(6)]
    raw_rows = [
        (1, "spark executor shuffle stage partition engine"),
        (2, "spark engine task stage executor"),
        (3, "cats dogs birds fish hamsters turtles"),
        (4, "recipe flour sugar butter oven bake"),
        (5, "!!! ..."),
    ]
    raw = spark.createDataFrame(raw_rows, "doc_id long, text string")
    tgt = spark.createDataFrame(target_rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           dsir_logweights(raw, tgt, n_buckets=256, seed=3).collect()}
    assert set(got) == {1, 2, 3, 4, 5}
    assert got[5]["logw"] == 0.0
    assert min(got[1]["logw"], got[2]["logw"]) > max(got[3]["logw"], got[4]["logw"])
    again = {r["doc_id"]: r["gumbel_key"] for r in
             dsir_logweights(raw, tgt, n_buckets=256, seed=3).collect()}
    assert again == {d: r["gumbel_key"] for d, r in got.items()}
    # md5 lane agrees on the ORDER preference (bucket ids differ, ranking holds)
    md5got = {r["doc_id"]: r["logw"] for r in
              dsir_logweights(raw, tgt, n_buckets=256, seed=3, hash_fn="md5").collect()}
    assert min(md5got[1], md5got[2]) > max(md5got[3], md5got[4])
    sel = dsir_select(
        dsir_logweights(raw, tgt, n_buckets=256, seed=3), k=2)
    assert sel.count() == 2


def test_dsir_plan_no_python_and_broadcast_lam(spark):
    """Scoring joins the exploded feature stream against the BROADCAST
    bucket log-ratio frame — no Python, no shuffle of text."""
    from taxahfe_spark.operators.selection import dsir_logweights

    raw = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "delta epsilon zeta")],
        "doc_id long, text string")
    out = dsir_logweights(raw, raw, n_buckets=64, seed=1)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PythonUDF" not in plan and "BatchEvalPython" not in plan, plan
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan
