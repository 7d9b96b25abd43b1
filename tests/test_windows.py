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


def test_rolling_stats_matches_pandas(spark):
    import pandas as pd

    from taxahfe_spark.operators.windows import rolling_stats

    rows = []
    base = pd.Timestamp("2024-01-01 00:00:00")
    import random

    rng = random.Random(7)
    for u in (1, 2):
        for i in range(40):
            rows.append((u, base + pd.Timedelta(seconds=rng.randint(0, 600)),
                         float(rng.randint(0, 100))))
    pdf = pd.DataFrame(rows, columns=["user_id", "ts", "value"])
    df = spark.createDataFrame(pdf)
    got = rolling_stats(df, "user_id", "ts", "value", window_seconds=120).toPandas()
    # pandas replay: value-based trailing frame, ties all included
    for _, r in got.iterrows():
        m = pdf[(pdf.user_id == r.user_id)
                & (pdf.ts >= r.ts - pd.Timedelta(seconds=120))
                & (pdf.ts <= r.ts)]
        assert r.w_count == len(m)
        assert abs(r.w_sum - m.value.sum()) < 1e-9
        assert abs(r.w_mean - m.value.mean()) < 1e-9
        assert r.w_min == m.value.min() and r.w_max == m.value.max()


def test_rolling_stats_plan_single_exchange(spark):
    import re

    import pandas as pd

    from taxahfe_spark.operators.windows import rolling_stats

    pdf = pd.DataFrame({"user_id": [1, 2], "ts": [pd.Timestamp("2024-01-01")] * 2,
                        "value": [1.0, 2.0]})
    out = rolling_stats(spark.createDataFrame(pdf), "user_id", "ts", "value", 60)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan
    assert "BatchEvalPython" not in plan


def test_rolling_stats_numeric_ts(spark):
    """ADVICE r7: the numeric-ts branch passed a float delta to
    Window.rangeBetween (Py4J: no such method) — now numeric ts scales into
    integer microsecond units like the timestamp branch. Pandas replay."""
    import pandas as pd

    from taxahfe_spark.operators.windows import rolling_stats

    import random

    rng = random.Random(11)
    rows = [
        (u, float(rng.randint(0, 600)) + rng.choice([0.0, 0.25, 0.5]),
         float(rng.randint(0, 100)))
        for u in (1, 2) for _ in range(40)
    ]
    pdf = pd.DataFrame(rows, columns=["user_id", "ts", "value"])
    df = spark.createDataFrame(pdf)
    got = rolling_stats(df, "user_id", "ts", "value", window_seconds=120.5).toPandas()
    for _, r in got.iterrows():
        m = pdf[(pdf.user_id == r.user_id)
                & (pdf.ts >= r.ts - 120.5) & (pdf.ts <= r.ts)]
        assert r.w_count == len(m), (r, m)
        assert abs(r.w_sum - m.value.sum()) < 1e-9
        assert r.w_min == m.value.min() and r.w_max == m.value.max()
