"""Window feature tests: lag/lead, sessionization, LOCF/NOCB, slope — vs
pandas oracles on the real events testdata."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from taxahfe_spark.operators.windows import (
    lag_lead_features,
    locf,
    nocb,
    per_key_slope,
    session_stats,
    sessionize,
)


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet").cache()


def test_lag_lead(events):
    got = (
        lag_lead_features(events, "user_id", "ts", ["value"], tiebreak="event_id")
        .select("user_id", "ts", "event_id", "value", "value_lag1", "value_lead1", "value_delta")
        .toPandas()
        .sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        .reset_index(drop=True)
    )
    pdf = events.toPandas().sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    g = pdf.groupby("user_id")["value"]
    expect_lag = g.shift(1).reset_index(drop=True)
    expect_lead = g.shift(-1).reset_index(drop=True)
    assert np.allclose(got["value_lag1"], expect_lag, equal_nan=True)
    assert np.allclose(got["value_lead1"], expect_lead, equal_nan=True)
    assert np.allclose(
        got["value_delta"], got["value"] - got["value_lag1"], equal_nan=True
    )


def test_sessionize_oracle(events):
    gap = 3600.0
    got = (
        sessionize(events, "user_id", "ts", gap, tiebreak="event_id")
        .select("user_id", "ts", "event_id", "session_id")
        .toPandas()
        .sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        .reset_index(drop=True)
    )
    pdf = events.toPandas().sort_values(["user_id", "ts", "event_id"], kind="mergesort")

    def sess(g):
        t = g["ts"].astype("int64") / 1e9
        return ((t.diff().isna()) | (t.diff() > gap)).cumsum() - 1

    expect = pdf.groupby("user_id", group_keys=False).apply(sess).reset_index(drop=True)
    assert (got["session_id"].to_numpy() == expect.to_numpy()).all()


def test_session_stats(events):
    st = session_stats(
        events, "user_id", "ts", 3600.0, agg_cols={"value": "sum"}, tiebreak="event_id"
    ).toPandas()
    assert (st["n_events"] >= 1).all()
    assert (st["duration_seconds"] >= 0).all()
    # sessions per user are dense 0..k
    for _, g in st.groupby("user_id"):
        assert sorted(g["session_id"]) == list(range(len(g)))
    # total events preserved
    assert st["n_events"].sum() == events.count()


def test_locf_nocb(events):
    # null out 'value' for non-click events, then fill
    holey = events.withColumn(
        "value", F.when(F.col("event_type") == "click", F.col("value"))
    )
    f = locf(holey, "user_id", "ts", ["value"], tiebreak="event_id")
    b = nocb(holey, "user_id", "ts", ["value"], tiebreak="event_id")
    gotf = f.toPandas().sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    gotb = b.toPandas().sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    expectf = gotf.groupby("user_id")["value"].ffill()
    expectb = gotb.groupby("user_id")["value"].bfill()
    assert np.allclose(gotf["value_filled"], expectf, equal_nan=True)
    assert np.allclose(gotb["value_bfilled"], expectb, equal_nan=True)


def test_per_key_slope(events):
    got = per_key_slope(events, "user_id", "ts", "value").toPandas()
    pdf = events.toPandas()
    for uid, g in pdf.groupby("user_id"):
        t = g["ts"].astype("int64").to_numpy() / 1e9
        v = g["value"].to_numpy()
        expect = 0.0 if len(g) < 2 or t.std() == 0 else np.polyfit(t, v, 1)[0]
        gotv = got.loc[got["user_id"] == uid, "slope"].iloc[0]
        assert gotv == pytest.approx(expect, rel=1e-6, abs=1e-9)
