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


@pytest.mark.parametrize("strategy", ["union", "broadcast"])
@pytest.mark.parametrize("direction", ["forward", "nearest"])
@pytest.mark.parametrize("exact", [True, False])
def test_asof_directions_match_pandas(frames, strategy, direction, exact):
    """direction='forward'/'nearest' parity with pandas.merge_asof on the
    duplicate-ts / missing-key fixture, both physical strategies."""
    sev, ssn, ev, sn = frames
    got = asof_join(
        sev, ssn, on="doc_id", left_ts="ts", right_ts="snapshot_ts",
        value_cols=["clade"], strategy=strategy, direction=direction,
        allow_exact_matches=exact,
    ).toPandas()
    ev2 = ev.sort_values("ts", kind="mergesort").reset_index(drop=True)
    sn2 = sn.sort_values("snapshot_ts", kind="mergesort").reset_index(drop=True)
    want = pd.merge_asof(
        ev2, sn2, left_on="ts", right_on="snapshot_ts", by="doc_id",
        allow_exact_matches=exact, direction=direction,
    )[["doc_id", "ts", "val", "clade"]]
    pd.testing.assert_frame_equal(
        _canon(got[["doc_id", "ts", "val", "clade"]]), _canon(want)
    )


@pytest.mark.parametrize("strategy", ["union", "broadcast"])
def test_asof_directions_tolerance(frames, strategy):
    """tolerance bounds the match distance on BOTH sides of nearest and on
    forward — pandas parity with tolerance set."""
    sev, ssn, ev, sn = frames
    ev2 = ev.sort_values("ts", kind="mergesort").reset_index(drop=True)
    sn2 = sn.sort_values("snapshot_ts", kind="mergesort").reset_index(drop=True)
    for direction in ("forward", "nearest"):
        got = asof_join(
            sev, ssn, on="doc_id", left_ts="ts", right_ts="snapshot_ts",
            value_cols=["clade"], strategy=strategy, direction=direction,
            tolerance_seconds=25,
        ).toPandas()
        want = pd.merge_asof(
            ev2, sn2, left_on="ts", right_on="snapshot_ts", by="doc_id",
            direction=direction, tolerance=25,
        )[["doc_id", "ts", "val", "clade"]]
        pd.testing.assert_frame_equal(
            _canon(got[["doc_id", "ts", "val", "clade"]]), _canon(want)
        )


def test_asof_salted_directions_equal_unsalted(frames):
    sev, ssn, *_ = frames
    for direction in ("forward", "nearest"):
        a = asof_join(
            sev, ssn, on="doc_id", left_ts="ts", right_ts="snapshot_ts",
            value_cols=["clade"], direction=direction,
        ).toPandas()
        b = asof_join(
            sev, ssn, on="doc_id", left_ts="ts", right_ts="snapshot_ts",
            value_cols=["clade"], direction=direction, n_salt=4,
        ).toPandas()
        pd.testing.assert_frame_equal(
            _canon(a[["doc_id", "ts", "val", "clade"]]),
            _canon(b[["doc_id", "ts", "val", "clade"]]),
        )


def test_asof_bad_direction_raises(frames):
    sev, ssn, *_ = frames
    with pytest.raises(ValueError):
        asof_join(sev, ssn, on="doc_id", left_ts="ts", right_ts="snapshot_ts",
                  direction="sideways")


def test_asof_nearest_union_single_exchange(spark):
    """nearest in the union strategy: ONE Exchange, two in-partition sorts,
    two Window passes — the second direction never re-shuffles."""
    import re

    df_l = spark.createDataFrame([(1, "a", 5)], "id long, k string, ts long")
    df_r = spark.createDataFrame([("a", 3, 1.0)], "k string, sts long, v double")
    out = asof_join(df_l, df_r, on="k", left_ts="ts", right_ts="sts",
                    value_cols=["v"], direction="nearest")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"Exchange", plan)) == 1, plan
    assert len(re.findall(r"\bWindow \[", plan)) == 2, plan


def test_asof_timestamp_ntz_tolerance(spark):
    """Regression: TIMESTAMP_NTZ has no direct double cast; the distance
    math must route through timestamp_ltz (pinned against pandas on real
    datetimes for every direction)."""
    ev = pd.DataFrame({
        "k": ["a"] * 4,
        "ts": pd.to_datetime(["2024-01-01 00:00:05", "2024-01-01 00:00:20",
                               "2024-01-01 00:01:00", "2024-01-01 00:02:00"]),
        "x": [1, 2, 3, 4],
    })
    sn = pd.DataFrame({
        "k": ["a"] * 3,
        "sts": pd.to_datetime(["2024-01-01 00:00:10", "2024-01-01 00:00:50",
                                "2024-01-01 00:03:00"]),
        "v": [10.0, 50.0, 180.0],
    })
    sev = spark.createDataFrame(ev)
    ssn = spark.createDataFrame(sn)
    assert dict(sev.dtypes)["ts"].startswith("timestamp")
    for direction in ("backward", "forward", "nearest"):
        for tol in (None, 30.0):
            got = asof_join(
                sev, ssn, on="k", left_ts="ts", right_ts="sts",
                value_cols=["v"], direction=direction,
                tolerance_seconds=tol,
            ).toPandas().sort_values("x").reset_index(drop=True)
            want = pd.merge_asof(
                ev.sort_values("ts"), sn.sort_values("sts"),
                left_on="ts", right_on="sts", by="k", direction=direction,
                tolerance=None if tol is None else pd.Timedelta(seconds=tol),
            ).sort_values("x").reset_index(drop=True)
            assert list(got["v"].fillna(-1)) == list(want["v"].fillna(-1)), (
                direction, tol, got, want)
