"""As-of join tests: both physical strategies vs a pandas.merge_asof oracle,
plus the leakage property and salted-path equivalence."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from taxahfe_spark.operators.asof import asof_join

RNG = np.random.default_rng(21)


def _fixtures():
    # events: out-of-order arrivals, duplicate timestamps, keys with no snapshots
    n_ev = 400
    ev = pd.DataFrame(
        {
            "doc_id": RNG.choice([f"d{i}" for i in range(12)], n_ev),
            "ts": RNG.integers(0, 1000, n_ev).astype("int64"),
            "val": RNG.normal(size=n_ev).round(3),
        }
    )
    ev.loc[:10, "ts"] = ev.loc[11:21, "ts"].to_numpy()  # force duplicate ts
    # snapshots: multiple versions per key; d11 has none; one key's mapping
    # CHANGES between snapshots so leakage is detectable
    snaps = []
    for i in range(11):
        for v, sts in enumerate(sorted(RNG.choice(range(0, 900, 7), 5, replace=False))):
            snaps.append((f"d{i}", int(sts), f"taxon_{i}_v{v}"))
    sn = pd.DataFrame(snaps, columns=["doc_id", "snapshot_ts", "clade"])
    return ev, sn


def _oracle(ev: pd.DataFrame, sn: pd.DataFrame, exact=True) -> pd.DataFrame:
    ev2 = ev.sort_values("ts", kind="mergesort").reset_index(drop=True)
    sn2 = sn.sort_values("snapshot_ts", kind="mergesort").reset_index(drop=True)
    m = pd.merge_asof(
        ev2,
        sn2,
        left_on="ts",
        right_on="snapshot_ts",
        by="doc_id",
        allow_exact_matches=exact,
    )
    return m[["doc_id", "ts", "val", "clade"]]


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    return (
        pdf.fillna({"clade": "<NA>"})
        .sort_values(["doc_id", "ts", "val", "clade"], kind="mergesort")
        .reset_index(drop=True)
    )


@pytest.fixture(scope="module")
def frames(spark):
    ev, sn = _fixtures()
    return (
        spark.createDataFrame(ev),
        spark.createDataFrame(sn),
        ev,
        sn,
    )


@pytest.mark.parametrize("strategy", ["union", "broadcast"])
def test_asof_matches_pandas_oracle(frames, strategy):
    ev_df, sn_df, ev, sn = frames
    got = asof_join(
        ev_df, sn_df, on="doc_id", left_ts="ts", right_ts="snapshot_ts",
        value_cols=["clade"], strategy=strategy,
    ).toPandas()
    expect = _oracle(ev, sn)
    pd.testing.assert_frame_equal(
        _canon(got[["doc_id", "ts", "val", "clade"]]), _canon(expect)
    )


def test_asof_no_exact_matches(frames):
    ev_df, sn_df, ev, sn = frames
    got = asof_join(
        ev_df, sn_df, on="doc_id", left_ts="ts", right_ts="snapshot_ts",
        value_cols=["clade"], allow_exact_matches=False,
    ).toPandas()
    expect = _oracle(ev, sn, exact=False)
    pd.testing.assert_frame_equal(
        _canon(got[["doc_id", "ts", "val", "clade"]]), _canon(expect)
    )


def test_asof_salted_equals_unsalted(frames):
    ev_df, sn_df, ev, sn = frames
    got = asof_join(
        ev_df, sn_df, on="doc_id", left_ts="ts", right_ts="snapshot_ts",
        value_cols=["clade"], n_salt=4,
    ).toPandas()
    expect = _oracle(ev, sn)
    pd.testing.assert_frame_equal(
        _canon(got[["doc_id", "ts", "val", "clade"]]), _canon(expect)
    )


def test_zero_temporal_leakage(frames):
    """No matched snapshot may postdate the event: snapshot version string
    encodes its ordinal, so a leaked join is measurably different."""
    ev_df, sn_df, ev, sn = frames
    got = asof_join(
        ev_df, sn_df, on="doc_id", left_ts="ts", right_ts="snapshot_ts",
        value_cols=["clade", "snapshot_ts"],
    ).toPandas()
    matched = got.dropna(subset=["snapshot_ts"])
    assert (matched["snapshot_ts"] <= matched["ts"]).all()
    # keys with no snapshots must appear with null clade, not be dropped
    d11 = got[got["doc_id"] == "d11"]
    assert len(d11) == len(ev[ev["doc_id"] == "d11"])
    assert d11["clade"].isna().all()


def test_asof_tolerance(frames):
    ev_df, sn_df, ev, sn = frames
    got = asof_join(
        ev_df, sn_df, on="doc_id", left_ts="ts", right_ts="snapshot_ts",
        value_cols=["snapshot_ts"], tolerance_seconds=50,
    ).toPandas()
    matched = got.dropna(subset=["snapshot_ts"])
    assert ((matched["ts"] - matched["snapshot_ts"]) <= 50).all()
