"""Pure-numpy pinning of _local_topk (the blocked Arrow scorer core) against
a deliberately different lexsort reference — exact set equality of each
query's top-k under (round(cosine,8) desc, id asc), including tie floods,
zero-norm rows, self-exclusion, and blocking boundaries."""

from __future__ import annotations

import numpy as np
import pytest

from taxahfe_spark.operators.similarity import _local_topk


def _ref_topk(Q, q_ids, C, ids, k, exclude_self):
    """Reference: per-query lexsort, no hashing, no blocking."""
    qn = np.sqrt((Q * Q).sum(axis=1))
    cn = np.sqrt((C * C).sum(axis=1))
    out = {}
    for j in range(len(Q)):
        if qn[j] <= 0:
            out[q_ids[j]] = []
            continue
        with np.errstate(divide="ignore", invalid="ignore"):
            col = np.round((C @ Q[j]) / np.where(cn > 0, cn * qn[j], np.nan), 8)
        mask = ~np.isnan(col)
        if exclude_self:
            mask &= ids != q_ids[j]
        cand = np.flatnonzero(mask)
        order = cand[np.lexsort((ids[cand], -col[cand]))][:k]
        out[q_ids[j]] = [(ids[i], col[i]) for i in order]
    return out


def _got_topk(Q, q_ids, C, ids, k, exclude_self):
    qn = np.sqrt((Q * Q).sum(axis=1))
    cn = np.sqrt((C * C).sum(axis=1))
    qa, ma, ca = _local_topk(Q, q_ids, qn, C, ids, cn, k, exclude_self)
    out = {qid: [] for qid in q_ids}
    for q, m, c in zip(qa, ma, ca):
        out[q].append((m, c))
    # _local_topk returns the SET unordered (global window sorts downstream)
    for q in out:
        out[q].sort(key=lambda t: (-t[1], t[0]))
    return out


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("exclude_self", [True, False])
def test_local_topk_matches_lexsort_reference(seed, exclude_self):
    rng = np.random.default_rng(seed)
    n, nq, d, k = 500, 37, 8, 5
    C = rng.standard_normal((n, d))
    # flood ties: replicate some corpus rows exactly (distinct ids)
    C[100:200] = C[0:100]
    C[3] = 0.0  # zero-norm corpus row -> never matches
    Q = np.vstack([rng.standard_normal((nq - 2, d)), C[:2]])  # self overlap
    ids = rng.permutation(n).astype(np.int64)
    q_ids = np.concatenate(
        [np.arange(10_000, 10_000 + nq - 2), ids[:2]]
    ).astype(np.int64)
    ref = _ref_topk(Q, q_ids, C, ids, k, exclude_self)
    got = _got_topk(Q, q_ids, C, ids, k, exclude_self)
    for q in ref:
        assert got[q] == ref[q], q


def test_local_topk_blocking_boundary():
    # force multiple blocks: n large enough that bs < nq
    rng = np.random.default_rng(7)
    n, nq, d, k = 40_000, 40, 4, 3  # bs = 4e6/(8*40000) = 12 -> 4 blocks
    C = rng.standard_normal((n, d))
    Q = rng.standard_normal((nq, d))
    ids = np.arange(n).astype(np.int64)
    q_ids = np.arange(50_000, 50_000 + nq).astype(np.int64)
    ref = _ref_topk(Q, q_ids, C, ids, k, True)
    got = _got_topk(Q, q_ids, C, ids, k, True)
    for q in ref:
        assert got[q] == ref[q]


def test_local_topk_zero_norm_query_and_small_corpus():
    Q = np.array([[0.0, 0.0], [1.0, 0.0]])
    q_ids = np.array([1, 2], dtype=np.int64)
    C = np.array([[1.0, 1.0], [2.0, 0.0]])
    ids = np.array([5, 6], dtype=np.int64)
    got = _got_topk(Q, q_ids, C, ids, 10, False)
    assert got[1] == []  # zero-norm query matches nothing
    assert [m for m, _ in got[2]] == [6, 5]  # cos 1.0 beats 0.7071...
