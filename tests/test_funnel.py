"""Funnel (stages/funnel.py) and time-weighted mean (stages/scan.py):
hand-built corpora exercising the ordering/tie/degenerate semantics the
SQL twins pin down."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray

from conftest import to_pdf

T0 = 1_704_067_200_000_000


def _ts(*offsets_s):
    return pd.to_datetime([T0 + int(o * 1e6) for o in offsets_s], unit="us")


def test_funnel_semantics():
    """Strictly-after ordering: ties don't advance; stage events BEFORE
    the previous stage's completion don't count; missing middle stage
    blocks the rest even when the last stage exists."""
    from s_tsfe_dl_ray.stages.funnel import funnel

    rows = []
    # u1: clean A(0) -> B(10) -> C(20)
    rows += [("u1", 0, "view"), ("u1", 10, "click"), ("u1", 20, "purchase")]
    # u2: click BEFORE view, then no later click -> stops after view
    rows += [("u2", 0, "click"), ("u2", 5, "view"), ("u2", 9, "purchase")]
    # wait - u2's purchase at 9 is after view(5) but there's no click > 5;
    # stages_reached must be 1
    # u3: click tied with view at the same microsecond -> tie blocks
    rows += [("u3", 0, "view"), ("u3", 0, "click"), ("u3", 7, "purchase")]
    # u4: view only
    rows += [("u4", 3, "view")]
    # u5: second click after view counts even though first was before
    rows += [("u5", 4, "click"), ("u5", 6, "view"), ("u5", 8, "click"),
             ("u5", 9, "purchase")]
    df = pd.DataFrame(rows, columns=["user_id", "off", "event_type"])
    df["ts"] = _ts(*df.pop("off"))
    out = to_pdf(funnel(
        ray.data.from_pandas(df).repartition(4),
        key="user_id", ts_col="ts", type_col="event_type",
        stages=["view", "click", "purchase"],
    )).set_index("user_id").sort_index()
    assert out.stages_reached.tolist() == [3, 1, 1, 1, 3]
    assert out.loc["u1", "ts_purchase"] == _ts(20)[0]
    assert pd.isna(out.loc["u2", "ts_click"]) and pd.isna(out.loc["u2", "ts_purchase"])
    assert pd.isna(out.loc["u3", "ts_click"])  # same-µs tie does not advance
    assert out.loc["u5", "ts_click"] == _ts(8)[0]
    assert out.loc["u5", "ts_purchase"] == _ts(9)[0]


def test_funnel_validation():
    import pytest

    from s_tsfe_dl_ray.stages.funnel import funnel

    with pytest.raises(ValueError):
        funnel(ray.data.range(1), key="k", ts_col="t", type_col="c", stages=["a"])
    with pytest.raises(ValueError):
        funnel(ray.data.range(1), key="k", ts_col="t", type_col="c",
               stages=["a", "a"])


def test_time_weighted_mean_hand_case():
    """LOCF weighting: value 10 held 1s then 0 held 3s -> twa 2.5 (the
    arithmetic mean would say 5); singleton keys dropped; all-same-ts
    keys survive with NULL twa."""
    from s_tsfe_dl_ray.stages.scan import time_weighted_mean

    df = pd.DataFrame({
        "k": ["a", "a", "a", "b", "c", "c"],
        "ts": _ts(0, 1, 4, 0, 2, 2),
        "v": [10.0, 0.0, 99.0, 5.0, 1.0, 3.0],
    })
    df["event_id"] = range(len(df))
    out = to_pdf(time_weighted_mean(
        ray.data.from_pandas(df).repartition(3),
        key="k", ts_col="ts", value_col="v", order_by=["ts", "event_id"],
    )).set_index("k").sort_index()
    assert out.index.tolist() == ["a", "c"]  # b has one row -> dropped
    assert out.loc["a", "n_segments"] == 2
    np.testing.assert_allclose(out.loc["a", "twa"], 2.5, atol=1e-12)
    assert out.loc["c", "n_segments"] == 1
    assert np.isnan(out.loc["c", "twa"])  # zero total duration


def test_cusum_matches_sequential_recurrence():
    """The vectorized reflected-walk identity equals the literal
    s = max(0, s + x - k) fold, per key, under multi-block input."""
    from s_tsfe_dl_ray.stages.scan import cusum

    rng = np.random.default_rng(7)
    n = 4000
    df = pd.DataFrame({
        "k": rng.integers(0, 20, n),
        "ts": _ts(*np.sort(rng.uniform(0, 1e6, n))),
        "v": rng.normal(5.0, 2.0, n),
    })
    df["event_id"] = range(n)
    out = to_pdf(cusum(
        ray.data.from_pandas(df).repartition(8),
        key="k", order_by=["ts", "event_id"], value_col="v", target=5.5,
    )).sort_values(["k", "event_id"]).reset_index(drop=True)
    exp = []
    for k, g in df.sort_values(["k", "ts", "event_id"]).groupby("k"):
        s = 0.0
        for x in g["v"]:
            s = max(0.0, s + x - 5.5)
            exp.append(s)
    np.testing.assert_allclose(out["cusum"].to_numpy(), np.array(exp),
                               rtol=1e-9, atol=1e-9)


def test_cusum_salted_parity():
    """Mega-key mode: per-chunk (total, min-prefix) carries reproduce the
    key-complete statistic across chunk boundaries."""
    import ray as _ray

    from s_tsfe_dl_ray.sources.parquet import read_table
    from s_tsfe_dl_ray.stages.scan import cusum

    from conftest import SF_CHECK

    EVENTS = f"{SF_CHECK}/events.parquet"
    kw = dict(key="user_id", order_by=["ts", "event_id"],
              value_col="value", target=50.0)
    cols = ["event_id", "user_id", "ts", "value"]
    base = to_pdf(cusum(read_table(EVENTS, columns=cols), **kw)) \
        .sort_values("event_id").reset_index(drop=True)
    salted = to_pdf(cusum(read_table(EVENTS, columns=cols), **kw,
                          salt_every_us=2 * 86_400_000_000)) \
        .sort_values("event_id").reset_index(drop=True)
    assert len(base) == len(salted) > 0
    np.testing.assert_allclose(base.cusum.to_numpy(), salted.cusum.to_numpy(),
                               rtol=1e-9, atol=1e-9)


def test_series_health_report_planted_drift():
    """A key with a mid-series level shift alarms (positive slope,
    alerts present); stationary keys stay silent; cool-down throttles
    alerts."""
    from s_tsfe_dl_ray.pipelines.health import series_health_report

    rng = np.random.default_rng(21)
    t0 = 1_704_067_200_000_000
    rows = []
    eid = 0
    for k in ("calm1", "calm2", "drifty"):
        for i in range(400):
            v = float(rng.normal(0, 1))
            if k == "drifty" and i >= 200:
                v += 8.0
            rows.append((k, t0 + i * 3_600_000_000, v, eid))
            eid += 1
    df = pd.DataFrame(rows, columns=["k", "ts_us", "v", "eid"])
    df["ts"] = pd.to_datetime(df.pop("ts_us"), unit="us")
    out = to_pdf(series_health_report(
        ray.data.from_pandas(df).repartition(6),
        key="k", ts_col="ts", value_col="v", event_id_col="eid",
        ref_ts_us=1_704_067_200_000_000, cusum_threshold=50.0, slack=0.5,
        cooldown_us=24 * 3_600_000_000,
    ))
    assert out.k.tolist() == ["drifty"]
    r = out.iloc[0]
    assert r.n_alerts >= 1
    assert r.peak_cusum > 50.0
    assert r.slope_per_day > 0
    # cool-down: alerts can't exceed span/cooldown + 1
    assert r.n_alerts <= 400 // 24 + 1


def test_funnel_conversion_window():
    """max_gap_us: a stage completing after the window does not count;
    within the window it does; entry stage is exempt."""
    from s_tsfe_dl_ray.stages.funnel import funnel

    rows = [
        ("fast", 0, "view"), ("fast", 5, "click"),
        ("slow", 0, "view"), ("slow", 100, "click"),
    ]
    df = pd.DataFrame(rows, columns=["user_id", "off", "event_type"])
    df["ts"] = _ts(*df.pop("off"))
    out = to_pdf(funnel(
        ray.data.from_pandas(df).repartition(2),
        key="user_id", ts_col="ts", type_col="event_type",
        stages=["view", "click"], max_gap_us=10 * 1_000_000,
    )).set_index("user_id").sort_index()
    assert out.loc["fast", "stages_reached"] == 2
    assert out.loc["slow", "stages_reached"] == 1
    assert pd.isna(out.loc["slow", "ts_click"])
