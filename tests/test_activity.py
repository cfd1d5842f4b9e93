"""Property tests for the active-user analytics ops (stages/activity.py)
and funnel latency (stages/funnel.funnel_latency)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from s_tsfe_dl_ray.stages.activity import active_users, new_vs_returning


def _events(seed=7, n=4000, users=60, days=20):
    rng = np.random.default_rng(seed)
    day = rng.integers(0, days, n)
    within = rng.integers(0, 86_400_000_000, n)
    ts = (day * 86_400_000_000 + within).astype("datetime64[us]")
    return pa.table({
        "user_id": pa.array(rng.integers(1, users + 1, n)),
        "ts": pa.array(ts),
    })


def test_window1_wau_equals_dau():
    t = _events()
    ds = ray.data.from_arrow(t)
    out = active_users(ds, window=1).to_pandas().sort_values("day")
    assert (out["dau"] == out["wau"]).all()
    assert np.allclose(out["stickiness"], 1.0)


def test_wau_monotone_bounds_and_split_consistency():
    t = _events(seed=11)
    ds = ray.data.from_arrow(t)
    au = active_users(ds, window=7).to_pandas().sort_values("day")
    # WAU >= DAU always; WAU <= sum of the window's DAUs
    assert (au["wau"] >= au["dau"]).all()
    dau = au.set_index("day")["dau"]
    for d, w in zip(au["day"], au["wau"]):
        lo = d - pd.Timedelta(days=6)
        assert w <= dau[(dau.index >= lo) & (dau.index <= d)].sum()
    nr = new_vs_returning(ds).to_pandas().sort_values("day")
    m = au.merge(nr, on="day")
    assert (m["new_users"] + m["returning_users"] == m["dau"]).all()
    # every user is new exactly once
    assert nr["new_users"].sum() == pd.DataFrame(
        {"u": t["user_id"].to_numpy()})["u"].nunique()
    # day 1 actives are all new
    assert nr.iloc[0]["returning_users"] == 0


def test_funnel_latency_matches_per_key_funnel():
    from s_tsfe_dl_ray.stages.funnel import funnel, funnel_latency

    rng = np.random.default_rng(3)
    n = 3000
    ts = np.sort(rng.integers(0, 10**12, n)).astype("datetime64[us]")
    t = pa.table({
        "user_id": pa.array(rng.integers(1, 80, n)),
        "ts": pa.array(ts),
        "event_type": pa.array(
            rng.choice(["view", "click", "purchase", "noise"], n)),
    })
    ds = ray.data.from_arrow(t)
    stages = ["view", "click", "purchase"]
    per_key = funnel(ds, key="user_id", ts_col="ts",
                     type_col="event_type", stages=stages).to_pandas()
    out = funnel_latency(
        ray.data.from_arrow(t), key="user_id", ts_col="ts",
        type_col="event_type", stages=stages,
    ).to_pandas().set_index(["stage_from", "stage_to"])
    for a, b in zip(stages[:-1], stages[1:]):
        lat = (per_key[f"ts_{b}"] - per_key[f"ts_{a}"]).dropna()
        lat_us = lat.to_numpy().astype("timedelta64[us]").astype(np.int64)
        row = out.loc[(a, b)]
        assert row["n_converted"] == len(lat_us)
        assert row["mean_s"] == float(lat_us.sum()) / len(lat_us) / 1e6
        s = np.sort(lat_us)
        assert row["q_50_us"] == s[max(int(np.ceil(len(s) * 0.5)), 1) - 1]
        assert row["q_90_us"] == s[max(int(np.ceil(len(s) * 0.9)), 1) - 1]


def test_wau_hll_error_envelope():
    from s_tsfe_dl_ray.stages.activity import active_users_approx

    t = _events(seed=23, n=20000, users=900, days=25)
    ds = ray.data.from_arrow(t)
    exact = active_users(ds, window=7).to_pandas().set_index("day")["wau"]
    approx = (
        active_users_approx(ray.data.from_arrow(t), window=7, p=12)
        .to_pandas().set_index("day")["wau_approx"]
    )
    assert set(exact.index) == set(approx.index)
    rel = (approx - exact).abs() / exact
    # 1.04/sqrt(4096) ~ 1.6%; allow 4 sigma
    assert rel.max() < 0.065, rel.sort_values().tail()


def test_theil_contributions_decomposition():
    """Per-key Theil terms sum to the classic Theil-T index computed
    locally; equal shares give zero terms; zero keys are excluded."""
    import numpy as np
    import pandas as pd
    import ray.data

    from s_tsfe_dl_ray.stages.activity import theil_contributions

    df = pd.DataFrame({"k": [1, 1, 2, 3, 4],
                       "v": [100, 200, 300, 300, 0]})
    out = theil_contributions(ray.data.from_pandas(df).repartition(2),
                              key_col="k", value_col="v").to_pandas()
    assert list(out["k"]) == [1, 2, 3]          # zero key dropped
    x = np.array([300.0, 300.0, 300.0]); X = x.sum(); n = 4.0
    exp = (x / X) * np.log(n * x / X)
    np.testing.assert_allclose(out["theil_term"], exp, rtol=1e-12)

    eq = pd.DataFrame({"k": [1, 2, 3], "v": [5, 5, 5]})
    oeq = theil_contributions(ray.data.from_pandas(eq),
                              key_col="k", value_col="v").to_pandas()
    np.testing.assert_allclose(oeq["theil_term"], 0.0, atol=1e-15)
