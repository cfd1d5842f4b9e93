"""Per-key OLS trend (stages/trend.py) and M4 downsample
(stages/downsample.py): multi-block exactness vs DuckDB, degenerate-key
NULL semantics, and tie determinism of the extreme (value, ts) pairs."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray

from conftest import SF_CHECK, assert_frames_match, to_pdf

EVENTS = f"{SF_CHECK}/events.parquet"
REF_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z


def test_linear_trend_multi_batch(ddb):
    """Raw-moment partials merged across 16 blocks reproduce DuckDB's
    regr_slope/regr_intercept/corr per key."""
    from s_tsfe_dl_ray.sources.parquet import read_table
    from s_tsfe_dl_ray.stages.trend import grouped_linear_trend

    ds = read_table(EVENTS, columns=["user_id", "ts", "value"]).repartition(16)
    actual = to_pdf(grouped_linear_trend(
        ds, key="user_id", ts_col="ts", value_col="value", ref_ts_us=REF_US,
    ))
    expected = ddb.sql(f"""
        SELECT user_id, count(*) AS n_events,
               regr_slope(value, x) AS slope_per_day,
               regr_intercept(value, x) AS intercept,
               corr(value, x) AS corr_xy
        FROM (SELECT user_id, value,
                     epoch(ts - TIMESTAMP '2024-01-01') / 86400.0 AS x
              FROM '{EVENTS}')
        GROUP BY 1
    """).df()
    assert_frames_match(actual, expected, atol=1e-9, rtol=1e-9)


def test_linear_trend_degenerate_keys_null():
    """n=1 and zero-time-variance keys yield NULL fit columns (SQL
    regr_*/corr semantics), never inf/nan leaking into the output."""
    from s_tsfe_dl_ray.stages.trend import grouped_linear_trend

    t0 = REF_US
    df = pd.DataFrame({
        "k": ["solo", "flat", "flat", "ok", "ok", "ok"],
        "ts": pd.to_datetime(
            [t0, t0 + 5_000_000, t0 + 5_000_000,
             t0, t0 + 86_400_000_000, t0 + 2 * 86_400_000_000], unit="us"),
        "v": [1.0, 2.0, 4.0, 1.0, 2.0, 3.0],
    })
    out = to_pdf(grouped_linear_trend(
        ray.data.from_pandas(df).repartition(3),
        key="k", ts_col="ts", value_col="v", ref_ts_us=REF_US,
    )).set_index("k")
    assert np.isnan(out.loc["solo", "slope_per_day"])
    assert np.isnan(out.loc["flat", "slope_per_day"])  # var(x) == 0
    np.testing.assert_allclose(out.loc["ok", "slope_per_day"], 1.0, atol=1e-12)
    np.testing.assert_allclose(out.loc["ok", "intercept"], 1.0, atol=1e-12)
    np.testing.assert_allclose(out.loc["ok", "corr_xy"], 1.0, atol=1e-12)


def test_trailing_zscore_matches_duckdb(ddb):
    """Trailing z-score vs the RANGE-window SQL twin: NULL for n<2 and
    for zero-variance windows, values to float64 precision."""
    from s_tsfe_dl_ray.sources.parquet import read_table
    from s_tsfe_dl_ray.stages.scan import trailing_zscore

    ds = read_table(EVENTS, columns=["event_id", "user_id", "ts", "value"])
    actual = to_pdf(trailing_zscore(
        ds, key="user_id", ts_col="ts", value_col="value",
        window_us=6 * 3_600_000_000))
    expected = ddb.sql(f"""
        SELECT event_id, user_id, ts, value,
               avg(value) OVER w AS trailing_mean,
               stddev_samp(value) OVER w AS trailing_std,
               (value - avg(value) OVER w)
                 / stddev_samp(value) OVER w AS zscore
        FROM '{EVENTS}'
        WINDOW w AS (PARTITION BY user_id ORDER BY ts
                     RANGE BETWEEN INTERVAL 6 HOUR PRECEDING AND CURRENT ROW)
    """).df()
    assert_frames_match(actual, expected, atol=1e-8, rtol=1e-8)


def test_trailing_zscore_salted_parity():
    """Mega-key mode (halo carry) reproduces the partitioned answer."""
    from s_tsfe_dl_ray.sources.parquet import read_table
    from s_tsfe_dl_ray.stages.scan import trailing_zscore

    kw = dict(key="user_id", ts_col="ts", value_col="value",
              window_us=3_600_000_000)
    base = to_pdf(trailing_zscore(
        read_table(EVENTS, columns=["event_id", "user_id", "ts", "value"]),
        **kw)).sort_values("event_id").reset_index(drop=True)
    salted = to_pdf(trailing_zscore(
        read_table(EVENTS, columns=["event_id", "user_id", "ts", "value"]),
        **kw, salt_every_us=4 * 3_600_000_000,
    )).sort_values("event_id").reset_index(drop=True)
    assert len(base) == len(salted)
    for c in ("trailing_mean", "trailing_std", "zscore"):
        np.testing.assert_allclose(
            base[c].to_numpy(), salted[c].to_numpy(), rtol=1e-9, atol=1e-12)


def test_m4_multi_batch(ddb):
    """M4 pairs merged across 16 blocks match the lexicographic
    struct-min/max oracle on the real events table."""
    from s_tsfe_dl_ray.sources.parquet import read_table
    from s_tsfe_dl_ray.stages.downsample import m4_downsample

    ds = read_table(EVENTS, columns=["user_id", "ts", "value"]).repartition(16)
    actual = to_pdf(m4_downsample(
        ds, key="user_id", ts_col="ts", value_col="value", tier="1h"))
    expected = ddb.sql(f"""
        SELECT user_id, window_start, n_rows,
               pmin.v AS v_min,  pmin.t AS ts_at_min,
               pmax.v AS v_max,  pmax.t AS ts_at_max,
               pfirst.v AS v_first, pfirst.t AS ts_first,
               plast.v AS v_last,  plast.t AS ts_last
        FROM (
          SELECT user_id, date_trunc('hour', ts) AS window_start,
                 count(*) AS n_rows,
                 min(struct_pack(v := value, t := ts)) AS pmin,
                 max(struct_pack(v := value, t := ts)) AS pmax,
                 min(struct_pack(t := ts, v := value)) AS pfirst,
                 max(struct_pack(t := ts, v := value)) AS plast
          FROM '{EVENTS}' GROUP BY 1, 2
        )
    """).df()
    assert_frames_match(actual, expected, atol=0, rtol=0)


def test_m4_tie_determinism():
    """Duplicate extreme values and duplicate timestamps within a window
    resolve by the documented lexicographic rule under ANY blocking."""
    from s_tsfe_dl_ray.stages.downsample import m4_downsample

    t0 = 1_704_067_200_000_000
    # one key, one window: min value 1.0 at two ts; max 9.0 at two ts;
    # two rows share the earliest ts with different values
    df = pd.DataFrame({
        "k": ["a"] * 6,
        "ts": pd.to_datetime(
            [t0, t0, t0 + 1_000_000, t0 + 2_000_000,
             t0 + 3_000_000, t0 + 4_000_000], unit="us"),
        "v": [5.0, 3.0, 1.0, 9.0, 1.0, 9.0],
    })
    for nblocks in (1, 3, 6):
        out = to_pdf(m4_downsample(
            ray.data.from_pandas(df).repartition(nblocks),
            key="k", ts_col="ts", value_col="v", tier="1h"))
        assert len(out) == 1
        r = out.iloc[0]
        assert r.v_min == 1.0 and r.ts_at_min == pd.Timestamp(t0 + 1_000_000, unit="us")
        assert r.v_max == 9.0 and r.ts_at_max == pd.Timestamp(t0 + 4_000_000, unit="us")
        assert r.v_first == 3.0 and r.ts_first == pd.Timestamp(t0, unit="us")
        assert r.v_last == 9.0 and r.ts_last == pd.Timestamp(t0 + 4_000_000, unit="us")
        assert r.n_rows == 6


def test_seasonal_adjust_day_of_week():
    """day_of_week phase uses SQL dayofweek numbering (0=Sunday) and the
    residual removes the per-(key, phase) mean exactly."""
    from s_tsfe_dl_ray.stages.trend import seasonal_adjust

    # 2024-01-07 was a Sunday
    base = pd.Timestamp("2024-01-07")
    df = pd.DataFrame({
        "k": ["a"] * 4,
        "ts": [base, base + pd.Timedelta(days=1),
               base + pd.Timedelta(days=7), base + pd.Timedelta(days=8)],
        "v": [1.0, 10.0, 3.0, 20.0],
    })
    out = to_pdf(seasonal_adjust(
        ray.data.from_pandas(df).repartition(2),
        key="k", ts_col="ts", value_col="v", period="day_of_week",
    )).sort_values("ts").reset_index(drop=True)
    assert out.phase.tolist() == [0, 1, 0, 1]  # Sun, Mon, Sun, Mon
    np.testing.assert_allclose(out.seasonal_mean.tolist(), [2.0, 15.0, 2.0, 15.0])
    np.testing.assert_allclose(out.residual.tolist(), [-1.0, -5.0, 1.0, 5.0])


def test_pairwise_corr_semantics():
    """Perfect/anti/zero correlations, NULL-row dropping, degenerate
    constant column -> NULL corr, multi-block merge exactness."""
    from s_tsfe_dl_ray.stages.trend import pairwise_corr

    n = 64
    a = np.arange(n, dtype=np.float64)
    df = pd.DataFrame({
        "a": a, "b": 2 * a + 3, "c": -a, "d": np.full(n, 7.0),
    })
    df.loc[5, "a"] = np.nan  # drops the whole row
    out = to_pdf(pairwise_corr(
        ray.data.from_pandas(df).repartition(8), cols=["a", "b", "c", "d"],
    ))
    assert out.col_a.tolist() == ["a", "a", "a", "b", "b", "c"]
    assert out.col_b.tolist() == ["b", "c", "d", "c", "d", "d"]
    assert (out.n_rows == n - 1).all()
    got = dict(zip(zip(out.col_a, out.col_b), out["corr"]))
    np.testing.assert_allclose(got[("a", "b")], 1.0, atol=1e-12)
    np.testing.assert_allclose(got[("a", "c")], -1.0, atol=1e-12)
    assert np.isnan(got[("a", "d")])  # constant column
    np.testing.assert_allclose(got[("b", "c")], -1.0, atol=1e-12)


def test_interarrival_burstiness_hand_cases():
    """Perfect clock -> burstiness -1; singleton keys dropped; sample
    std NULL for a single gap."""
    from s_tsfe_dl_ray.stages.trend import interarrival_stats

    t0 = REF_US
    df = pd.DataFrame({
        "k": ["clock"] * 5 + ["one"] + ["pair"] * 2,
        "ts": pd.to_datetime(
            [t0, t0 + 10_000_000, t0 + 20_000_000, t0 + 30_000_000,
             t0 + 40_000_000, t0, t0, t0 + 3_000_000], unit="us"),
    })
    df["event_id"] = range(len(df))
    out = to_pdf(interarrival_stats(
        ray.data.from_pandas(df).repartition(3),
        key="k", ts_col="ts", order_by=["ts", "event_id"],
    )).set_index("k").sort_index()
    assert out.index.tolist() == ["clock", "pair"]
    assert out.loc["clock", "n_gaps"] == 4
    np.testing.assert_allclose(out.loc["clock", "gap_mean_s"], 10.0)
    np.testing.assert_allclose(out.loc["clock", "burstiness"], -1.0)
    assert out.loc["pair", "n_gaps"] == 1
    assert np.isnan(out.loc["pair", "gap_std_s"])


def test_lag1_autocorr_hand_cases():
    """Alternating series -> autocorr -1; smooth ramp -> +1; constant
    series -> NULL (zero variance side)."""
    from s_tsfe_dl_ray.stages.trend import lag1_autocorr

    t0 = REF_US
    rows = []
    for i, v in enumerate([1.0, -1.0, 1.0, -1.0, 1.0, -1.0]):
        rows.append(("alt", t0 + i * 1_000_000, v))
    for i in range(6):
        rows.append(("ramp", t0 + i * 1_000_000, float(i)))
    for i in range(4):
        rows.append(("const", t0 + i * 1_000_000, 5.0))
    df = pd.DataFrame(rows, columns=["k", "ts_us", "v"])
    df["ts"] = pd.to_datetime(df.pop("ts_us"), unit="us")
    df["event_id"] = range(len(df))
    out = to_pdf(lag1_autocorr(
        ray.data.from_pandas(df).repartition(4),
        key="k", value_col="v", order_by=["ts", "event_id"],
    )).set_index("k").sort_index()
    np.testing.assert_allclose(out.loc["alt", "autocorr"], -1.0, atol=1e-12)
    np.testing.assert_allclose(out.loc["ramp", "autocorr"], 1.0, atol=1e-12)
    assert np.isnan(out.loc["const", "autocorr"])


def test_holt_winters_converges_on_seasonal_series():
    """On y = base + slope*t + season[p], the fitted state converges to
    the true slope and the forecasts to the true future values."""
    import pandas as pd
    import ray

    from conftest import to_pdf
    from s_tsfe_dl_ray.stages.trend import holt_winters

    m = 24
    n = 24 * 40
    season = np.sin(np.arange(m) / m * 2 * np.pi) * 5.0
    t0 = 1_700_000 * 3600  # seconds, hour-aligned
    rows = []
    for i in range(n):
        hr = t0 // 3600 + i
        # counts must be ints: encode the signal as event multiplicity
        yv = int(round(20 + 0.1 * i + season[hr % m]))
        for _ in range(yv):
            rows.append({"event_type": "s", "ts": np.datetime64(
                (t0 + i * 3600) * 1_000_000, "us")})
    ds = ray.data.from_pandas(pd.DataFrame(rows))
    out = to_pdf(holt_winters(ds)).set_index("event_type")
    assert out.loc["s", "n_hours"] == n
    assert abs(out.loc["s", "trend"] - 0.1) < 0.02
    # forecast error small relative to the signal range (~±5 season)
    last_hr = t0 // 3600 + n - 1
    for h in (1, 2, 3):
        truth = 20 + 0.1 * (n - 1 + h) + season[(last_hr + h) % m]
        got = out.loc["s", f"forecast_h{h}"]
        assert abs(got - truth) < 1.5, (h, got, truth)


def test_holt_winters_short_series_null_state():
    import pandas as pd
    import ray

    from conftest import to_pdf
    from s_tsfe_dl_ray.stages.trend import holt_winters

    ds = ray.data.from_pandas(pd.DataFrame({
        "event_type": ["x"] * 10,
        "ts": pd.date_range("2024-01-01", periods=10, freq="h",
                            unit="us"),
    }))
    out = to_pdf(holt_winters(ds))
    assert len(out) == 1 and np.isnan(out.level.iloc[0])


def test_kleinberg_bursts_recovers_planted_burst():
    """A 10x-rate 12-hour segment inside a 10-day baseline is labeled
    as one coherent burst episode covering (roughly) those hours."""
    import pandas as pd
    import ray

    from conftest import to_pdf
    from s_tsfe_dl_ray.stages.trend import kleinberg_bursts

    rng = np.random.default_rng(3)
    hours = 240
    t0_us = 1_700_000 * 3600 * 1_000_000
    rows = []
    for h in range(hours):
        rate = 50 if 100 <= h < 112 else 5
        n = rng.poisson(rate)
        for _ in range(n):
            rows.append({"event_type": "a", "ts": np.datetime64(
                t0_us + h * 3_600_000_000 + 7, "us")})
    ds = ray.data.from_pandas(pd.DataFrame(rows))
    out = to_pdf(kleinberg_bursts(ds)).set_index("event_type")
    r = out.loc["a"]
    assert r.n_bursts == 1, out
    assert 10 <= r.burst_hours <= 14
    assert r.longest_burst == r.burst_hours
    lo = pd.Timestamp(t0_us + 100 * 3_600_000_000, unit="us")
    hi = pd.Timestamp(t0_us + 112 * 3_600_000_000, unit="us")
    assert lo <= r.peak_hour < hi


def test_kleinberg_quiet_series_no_bursts():
    import pandas as pd
    import ray

    from conftest import to_pdf
    from s_tsfe_dl_ray.stages.trend import kleinberg_bursts

    rng = np.random.default_rng(9)
    t0_us = 1_700_000 * 3600 * 1_000_000
    rows = [{"event_type": "q", "ts": np.datetime64(
        t0_us + int(h) * 3_600_000_000, "us")}
        for h in range(100) for _ in range(int(rng.poisson(5)))]
    ds = ray.data.from_pandas(pd.DataFrame(rows))
    out = to_pdf(kleinberg_bursts(ds)).set_index("event_type")
    assert out.loc["q", "n_bursts"] == 0
    assert pd.isna(out.loc["q", "peak_hour"])


def test_dtw_identity_and_shift_tolerance():
    """DTW(x, x) == 0, and a phase-shifted copy of the mean scores far
    below an unrelated series (the property Euclidean distance lacks)."""
    import pandas as pd
    import ray

    from conftest import to_pdf
    from s_tsfe_dl_ray.stages.trend import dtw_to_mean

    rng = np.random.default_rng(21)
    hours = 24 * 10
    t0 = 1_700_000 * 3600
    base = 20 + 10 * np.sin(np.arange(hours) / 24 * 2 * np.pi)
    rows = []

    def emit(name, series):
        for h, v in enumerate(series):
            for _ in range(max(int(round(v)), 0)):
                rows.append({"event_type": name, "ts": np.datetime64(
                    (t0 + h * 3600) * 1_000_000, "us")})

    emit("base", base)                       # defines most of the mean
    emit("same", base)                       # identical shape
    emit("shift", np.roll(base, 3))          # 3h phase shift
    emit("noise", rng.integers(5, 60, hours).astype(float))  # unrelated
    ds = ray.data.from_pandas(pd.DataFrame(rows))
    out = to_pdf(dtw_to_mean(ds, band=6)).set_index("event_type")
    # identical series: tiny distance to the 4-series mean is impossible,
    # but same == base so their distances are equal
    assert abs(out.loc["same", "dtw_dist"] - out.loc["base", "dtw_dist"]) < 1e-9
    # the shifted copy warps onto the mean far better than noise
    assert out.loc["shift", "dtw_per_step"] < out.loc["noise", "dtw_per_step"]


def test_dtw_self_distance_zero():
    import pandas as pd
    import ray

    from conftest import to_pdf
    from s_tsfe_dl_ray.stages.trend import dtw_to_mean

    # single key: the mean series IS the key's series -> distance 0
    t0 = 1_700_000 * 3600
    rows = [{"event_type": "only", "ts": np.datetime64(
        (t0 + h * 3600) * 1_000_000, "us")}
        for h in range(48) for _ in range(h % 5 + 1)]
    ds = ray.data.from_pandas(pd.DataFrame(rows))
    out = to_pdf(dtw_to_mean(ds, band=4)).set_index("event_type")
    assert abs(out.loc["only", "dtw_dist"]) < 1e-12


def _chain_events(seq_by_user: dict) -> "ray.data.Dataset":
    import pyarrow as pa
    import ray
    rows_u, rows_t, rows_s, rows_e = [], [], [], []
    eid = 0
    for u, seq in seq_by_user.items():
        for i, s in enumerate(seq):
            rows_u.append(u)
            rows_t.append(1_700_000_000_000_000 + i * 1_000_000)
            rows_s.append(s)
            rows_e.append(eid)
            eid += 1
    return ray.data.from_arrow(pa.table({
        "user_id": pa.array(rows_u, pa.int64()),
        "ts": pa.array(np.array(rows_t, dtype="datetime64[us]")),
        "event_type": pa.array(rows_s, pa.string()),
        "event_id": pa.array(rows_e, pa.int64())}))


def test_markov_stationary_alternating_is_half_half():
    from s_tsfe_dl_ray.stages.trend import markov_stationary

    ds = _chain_events({1: ["a", "b"] * 20})
    out = markov_stationary(ds, key="user_id", state_col="event_type",
                            order_by=["ts", "event_id"]).to_pandas()
    assert set(out["state"]) == {"a", "b"}
    np.testing.assert_allclose(out["stationary"].to_numpy(), 0.5,
                               rtol=1e-12)


def test_markov_stationary_closed_form_two_state():
    from s_tsfe_dl_ray.stages.trend import markov_stationary

    # transition counts a->a 9, a->b 1, b->b 1, b->a 1:
    # P = [[.9,.1],[.5,.5]] -> stationary (5/6, 1/6)
    seq = ["a"] * 10 + ["b", "b", "a"]
    ds = _chain_events({7: seq})
    out = markov_stationary(ds, key="user_id", state_col="event_type",
                            order_by=["ts", "event_id"]) \
        .to_pandas().set_index("state")
    np.testing.assert_allclose(out.loc["a", "stationary"], 5 / 6,
                               rtol=1e-9)
    np.testing.assert_allclose(out.loc["b", "stationary"], 1 / 6,
                               rtol=1e-9)
    assert abs(out["stationary"].sum() - 1.0) < 1e-12


def test_markov_stationary_vocab_is_per_key_and_short_keys_drop():
    from s_tsfe_dl_ray.stages.trend import markov_stationary

    ds = _chain_events({
        1: ["a", "b", "a", "b"],      # never sees 'c'
        2: ["c", "c", "c"],           # never sees 'a'/'b'
        3: ["a"],                     # no transition -> no rows
    })
    out = markov_stationary(ds, key="user_id", state_col="event_type",
                            order_by=["ts", "event_id"]).to_pandas()
    assert set(out[out.user_id == 1]["state"]) == {"a", "b"}
    assert set(out[out.user_id == 2]["state"]) == {"c"}
    assert (out.user_id != 3).all()
    sums = out.groupby("user_id")["stationary"].sum()
    np.testing.assert_allclose(sums.to_numpy(), 1.0, rtol=1e-12)
