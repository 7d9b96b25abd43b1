"""Property-based tests (hypothesis) over the pure compute kernels.

These target the Spark-free functions whose contracts the distributed plans
lean on: correlation math, competition decision rules, collinearity pruning,
label binning, per-group slopes, name cleaning, and the media decoders.
Spark-side equivalents are covered by the example-based suites; here the
input space is explored adversarially.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays

SET = settings(max_examples=60, deadline=None)


# -- correlation kernel -------------------------------------------------------


@SET
@given(
    arrays(np.float64, st.tuples(st.integers(4, 30), st.integers(2, 6)),
           elements=st.floats(-50, 50, allow_nan=False)),
)
def test_corr_with_parent_matches_numpy(mat):
    from taxahfe_spark.operators.competition import _corr_with_parent

    got = _corr_with_parent(mat, "pearson")
    for j in range(1, mat.shape[1]):
        a, b = mat[:, 0], mat[:, j]
        scale = max(np.abs(mat).max(), 1e-30)
        if a.std() == 0 or b.std() == 0:
            assert np.isnan(got[j - 1])  # constant column -> NaN (never prunes)
        elif min(a.std(), b.std()) > 1e-7 * scale:
            # away from the degenerate regime both formulas agree; inside it
            # numpy's own corrcoef is cancellation noise, so no comparison
            assert abs(got[j - 1] - np.corrcoef(a, b)[0, 1]) < 1e-7


@SET
@given(
    arrays(np.float64, st.tuples(st.integers(4, 20), st.integers(2, 5)),
           elements=st.floats(-10, 10, allow_nan=False)),
)
def test_corr_spearman_is_pearson_on_ranks(mat):
    from taxahfe_spark.operators.competition import _corr_with_parent

    got = _corr_with_parent(mat, "spearman")
    ranked = np.column_stack(
        [pd.Series(mat[:, j]).rank(method="average") for j in range(mat.shape[1])]
    )
    want = _corr_with_parent(ranked, "pearson")
    assert np.allclose(got, want, equal_nan=True)


# -- competition decision rules ----------------------------------------------


@SET
@given(
    st.integers(2, 8),
    st.lists(st.floats(-5, 5, allow_nan=False), min_size=8, max_size=8),
)
def test_decide_parent_descendant_invariants(k, imps):
    from taxahfe_spark.operators.competition import _decide_parent_descendant

    names = [f"n{i}" for i in range(k)]
    imp = np.array(imps[:k])
    parent = names[0]
    winners = _decide_parent_descendant(names, imp.copy(), parent)
    assert winners, "winner set never empty"
    if winners == [parent]:
        # parent wins alone only when top-1 (after any tie nudge)
        assert imp[0] >= imp[1:].max() - 1e-6
    else:
        # every winner is a descendant with importance >= parent's
        assert parent not in winners
        d = {n: v for n, v in zip(names, imp)}
        assert all(d[w] >= d[parent] for w in winners)


@SET
@given(st.lists(st.floats(-5, 5, allow_nan=False), min_size=2, max_size=12))
def test_decide_final_strictly_above_mean_and_zero(imps):
    from taxahfe_spark.operators.competition import _decide_final

    names = [f"n{i}" for i in range(len(imps))]
    imp = np.array(imps)
    winners = set(_decide_final(names, imp))
    m = imp.mean()
    for n, v in zip(names, imp):
        assert (n in winners) == (v > m and v > 0)


# -- collinearity pruning ------------------------------------------------------


@SET
@given(
    arrays(np.float64, st.tuples(st.integers(12, 30), st.integers(3, 7)),
           elements=st.floats(-3, 3, allow_nan=False)),
    st.floats(0.3, 0.95),
)
def test_find_correlated_leaves_no_pair_above_threshold(X, thr):
    from taxahfe_spark.dietml import _find_correlated

    # add a planted duplicate column so the pruner has work
    X = np.column_stack([X, X[:, 0] + 1e-9])
    with np.errstate(invalid="ignore"):
        corr = np.corrcoef(X, rowvar=False)
    cols = [f"c{i}" for i in range(X.shape[1])]
    dropped = set(_find_correlated(corr, cols, thr))
    keep = [i for i, c in enumerate(cols) if c not in dropped]
    a = np.abs(np.nan_to_num(corr))
    np.fill_diagonal(a, 0.0)
    sub = a[np.ix_(keep, keep)]
    assert sub.size == 0 or sub.max() <= thr + 1e-12


# -- kmeans label binning ------------------------------------------------------


@SET
@given(
    st.lists(st.floats(-100, 100, allow_nan=False), min_size=12, max_size=60,
             unique=True),
    st.integers(2, 4),
)
def test_discretize_label_bins_are_monotone(ys, k):
    from taxahfe_spark.pipeline import discretize_label

    pdf = pd.DataFrame(
        {"subject_id": [f"s{i}" for i in range(len(ys))], "feature_of_interest": ys}
    )
    out = discretize_label(pdf, k=k, seed=3)
    lab = out["feature_of_interest"].str.rsplit("_", n=1).str[-1].astype(int)
    # bin index must be monotone in the underlying value: sort by y, labels
    # must be nondecreasing (center-sorted relabeling contract, G10)
    order = np.argsort(np.asarray(ys))
    assert (np.diff(lab.to_numpy()[order]) >= 0).all()
    assert lab.between(1, k).all()


# -- per-group slopes ----------------------------------------------------------


@SET
@given(st.data())
def test_group_slopes_match_polyfit(data):
    from taxahfe_spark.operators.competition import _group_slopes

    n_groups = data.draw(st.integers(1, 5))
    n = data.draw(st.integers(2, 40))
    rng = np.random.default_rng(data.draw(st.integers(0, 10_000)))
    gidx = rng.integers(0, n_groups, n)
    t = rng.normal(0, 2, n)
    X = rng.normal(0, 1, (n, 2))
    got = _group_slopes(X, t, gidx, n_groups)
    for g in range(n_groups):
        m = gidx == g
        for j in range(2):
            if m.sum() >= 2 and t[m].std() > 1e-9:
                want = np.polyfit(t[m], X[m, j], 1)[0]
                assert abs(got[g, j] - want) < 1e-6
            else:
                assert got[g, j] == 0.0  # degenerate -> 0 like replace_na


# -- name cleaning -------------------------------------------------------------


@SET
@given(st.text(max_size=40))
def test_clean_name_contract(s):
    from taxahfe_spark.naming import clean_name

    c = clean_name(s)
    assert c and c == clean_name(c)  # idempotent, never empty
    assert c == c.lower()
    assert all(ch.isalnum() or ch == "_" for ch in c)
    assert not c[0].isdigit() and c[0] != "_" and c[-1] != "_"


@SET
@given(st.lists(st.text(max_size=12), min_size=1, max_size=12))
def test_clean_names_unique(names):
    from taxahfe_spark.naming import clean_names

    out = clean_names(names)
    assert len(out) == len(names) and len(set(out)) == len(out)


# -- media decoders ------------------------------------------------------------


@SET
@given(
    st.integers(1, 2),
    st.lists(st.integers(-32768, 32767), min_size=2, max_size=400),
)
def test_wav_roundtrip_property(channels, samples):
    from taxahfe_spark.operators.multimodal import decode_wav

    n = (len(samples) // channels) * channels
    if n == 0:
        return
    pcm = np.array(samples[:n], dtype="<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, channels, 8000, 8000 * 2 * channels,
                      2 * channels, 16)
    chunks = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(pcm)) + pcm
    got, rate = decode_wav(b"RIFF" + struct.pack("<I", len(chunks)) + chunks)
    assert rate == 8000 and got.shape == (n // channels, channels)
    assert np.allclose(
        got.ravel(), np.array(samples[:n]) / 32768.0
    )


@SET
@given(st.integers(1, 12), st.integers(1, 12), st.integers(0, 10_000))
def test_ppm_roundtrip_property(w, h, seed):
    from taxahfe_spark.operators.multimodal import decode_ppm

    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    payload = b"P6\n%d %d\n255\n" % (w, h) + px.tobytes()
    img = decode_ppm(payload)
    assert np.array_equal((img * 255).round().astype(np.uint8), px)
