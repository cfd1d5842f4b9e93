"""Salted mega-key scans: salted == unsalted for sessionize / ordered
scan / rolling mean on a key whose history spans ~100 salt chunks.

The mega-key guarantee under test (stages/salted.py): no partition ever
holds more than one time-chunk of a key, yet the output matches the
key-complete path exactly (scan/sessionize) or to float64 rolling
precision (rolling mean).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from conftest import to_pdf

SALT_US = 3_600_000_000  # 1h chunks


def _corpus() -> pd.DataFrame:
    """One mega key spanning ~100 one-hour chunks + two small keys.

    Timestamp steps are irregular and include inactivity gaps placed to
    cross chunk boundaries (the hard case for salted sessionize)."""
    rng = np.random.default_rng(3)
    rows = []
    t = np.int64(1_700_000_000_000_000)  # µs epoch
    for i in range(4000):
        # mostly 30-120s steps; every ~200 rows a 40-90min gap (> 30m
        # session gap, and long enough to skip whole 1h chunks sometimes)
        if i % 200 == 199:
            t += rng.integers(40 * 60, 90 * 60) * 1_000_000
        else:
            t += rng.integers(30, 120) * 1_000_000
        rows.append({"user_id": "mega", "event_id": i,
                     "ts": pd.Timestamp(t, unit="us"),
                     "value": float(rng.normal(10, 3))})
    t2 = np.int64(1_700_050_000_000_000)
    for k in ("small-a", "small-b"):
        for i in range(37):
            t2 += rng.integers(10, 4000) * 1_000_000
            rows.append({"user_id": k, "event_id": 10_000 + i,
                         "ts": pd.Timestamp(t2, unit="us"),
                         "value": float(rng.normal(5, 1))})
    return pd.DataFrame(rows)


def _span_chunks(df: pd.DataFrame) -> int:
    ts_us = df[df.user_id == "mega"].ts.astype("datetime64[us]").astype("int64")
    return int(ts_us.max() // SALT_US - ts_us.min() // SALT_US) + 1


def test_salted_ordered_scan_exact():
    from s_tsfe_dl_ray.stages.scan import ordered_scan

    df = _corpus()
    assert _span_chunks(df) >= 80  # genuinely many chunks
    scans = {"run_sum": ("value", "cumsum"), "run_max": ("value", "cummax"),
             "run_n": ("value", "cumcount"),
             # lag/delta carry the previous chunk's LAST value across the
             # boundary — exact, incl. NaN on each key's first row
             "val_prev": ("value", "lag"), "val_delta": ("value", "delta")}
    base = to_pdf(ordered_scan(ray.data.from_pandas(df), keys=["user_id"],
                               order_by=["ts", "event_id"], scans=scans))
    salted = to_pdf(ordered_scan(ray.data.from_pandas(df), keys=["user_id"],
                                 order_by=["ts", "event_id"], scans=scans,
                                 salt_every_us=SALT_US))
    b = base.sort_values(["user_id", "event_id"]).reset_index(drop=True)
    s = salted.sort_values(["user_id", "event_id"]).reset_index(drop=True)
    assert len(b) == len(s) == len(df)
    assert (b.run_n.to_numpy() == s.run_n.to_numpy()).all()
    np.testing.assert_allclose(b.run_sum.to_numpy(), s.run_sum.to_numpy(), rtol=1e-12)
    np.testing.assert_array_equal(b.run_max.to_numpy(), s.run_max.to_numpy())
    np.testing.assert_allclose(b.val_prev.to_numpy(), s.val_prev.to_numpy(),
                               rtol=0, atol=0, equal_nan=True)
    np.testing.assert_allclose(b.val_delta.to_numpy(), s.val_delta.to_numpy(),
                               rtol=0, atol=0, equal_nan=True)


def test_salted_rolling_mean_matches():
    from s_tsfe_dl_ray.stages.transform import rolling_mean

    df = _corpus()
    base = to_pdf(rolling_mean(ray.data.from_pandas(df), keys=["user_id"],
                               order_by=["ts", "event_id"], col="value", window=5))
    salted = to_pdf(rolling_mean(ray.data.from_pandas(df), keys=["user_id"],
                                 order_by=["ts", "event_id"], col="value", window=5,
                                 salt_every_us=SALT_US))
    b = base.sort_values(["user_id", "event_id"]).reset_index(drop=True)
    s = salted.sort_values(["user_id", "event_id"]).reset_index(drop=True)
    assert len(b) == len(s) == len(df)
    np.testing.assert_allclose(b.value_ma5.to_numpy(), s.value_ma5.to_numpy(),
                               rtol=1e-9)


def test_salted_sessionize_exact():
    from s_tsfe_dl_ray.stages.sessionize import sessionize

    df = _corpus()
    base = to_pdf(sessionize(ray.data.from_pandas(df), keys=["user_id"],
                             ts_col="ts", order_by=["ts", "event_id"], gap="30m"))
    salted = to_pdf(sessionize(ray.data.from_pandas(df), keys=["user_id"],
                               ts_col="ts", order_by=["ts", "event_id"], gap="30m",
                               salt_every_us=SALT_US))
    cols = ["user_id", "session_id", "session_start", "session_end", "n_rows",
            "duration_sec"]
    b = base[cols].sort_values(["user_id", "session_id"]).reset_index(drop=True)
    s = salted[cols].sort_values(["user_id", "session_id"]).reset_index(drop=True)
    # sessions must exist that span a chunk boundary for this to be a
    # meaningful test
    starts = b[b.user_id == "mega"].session_start.astype("datetime64[us]").astype("int64")
    ends = b[b.user_id == "mega"].session_end.astype("datetime64[us]").astype("int64")
    assert ((starts // SALT_US) != (ends // SALT_US)).any()
    pd.testing.assert_frame_equal(b, s, check_dtype=False)


def test_salted_gapfill_matches_unsalted():
    """Salted gap-fill == unsalted for ffill AND interp on a key whose
    grid spans ~150 one-hour chunks with multi-chunk dead zones (whole
    salt chunks with zero observed windows — the fold must emit them)."""
    from s_tsfe_dl_ray.stages.gapfill import gapfill

    rng = np.random.default_rng(11)
    rows = []
    base = np.int64(1_700_000_000_000_000)
    base -= base % 60_000_000  # align to the 1m grid
    w = base
    for i in range(300):
        # mostly 1-5 minute hops; every ~40 windows a 2-5 HOUR dead zone
        if i % 40 == 39:
            w += rng.integers(120, 300) * 60_000_000
        else:
            w += rng.integers(1, 5) * 60_000_000
        rows.append({"user_id": "mega", "window_start": pd.Timestamp(w, unit="us"),
                     "n_events": int(rng.integers(1, 9)),
                     "value_sum": int(rng.integers(0, 500)),
                     "value_min": float(rng.normal(1, 1)),
                     "value_max": float(rng.normal(9, 1)),
                     "value_mean": float(rng.normal(5, 2))})
    w2 = base + 7 * 3_600_000_000
    for k in ("small-a", "small-b"):
        for i in range(9):
            w2 += rng.integers(1, 90) * 60_000_000
            rows.append({"user_id": k, "window_start": pd.Timestamp(w2, unit="us"),
                         "n_events": 1, "value_sum": 7, "value_min": 0.5,
                         "value_max": 2.5, "value_mean": 1.5})
    df = pd.DataFrame(rows)

    kw = dict(keys=["user_id"], tier="1m", count_cols=["n_events"],
              sum_cols=["value_sum"], null_cols=["value_min", "value_max"],
              carry_cols=["value_mean"])
    for mode in ("ffill", "interp"):
        plain = to_pdf(gapfill(ray.data.from_pandas(df), mode=mode, **kw))
        salted = to_pdf(gapfill(ray.data.from_pandas(df), mode=mode,
                                salt_every_us=SALT_US, **kw))
        sort = ["user_id", "window_start"]
        p = plain.sort_values(sort).reset_index(drop=True)
        s = salted.sort_values(sort).reset_index(drop=True)[p.columns]
        assert len(p) == len(s) and len(p) > 2000, (mode, len(p), len(s))
        pd.testing.assert_frame_equal(p, s, check_exact=True), mode


def test_salted_sliding_windows_match():
    """Salted sliding windows == unsalted across stride/dilation combos on
    the mega key (windows spanning chunk boundaries read halo values from
    the fold carry; emission positions are global)."""
    from s_tsfe_dl_ray.stages.slide import sliding_window_features

    df = _corpus()
    kw = dict(keys=["user_id"], order_by=["ts", "event_id"], value_col="value",
              stats=("mean", "min", "max", "sum", "std"))
    for length, stride, rate in ((32, 7, 1), (12, 5, 4), (64, 64, 1)):
        plain = to_pdf(sliding_window_features(
            ray.data.from_pandas(df), length=length, stride=stride,
            sampling_rate=rate, **kw))
        salted = to_pdf(sliding_window_features(
            ray.data.from_pandas(df), length=length, stride=stride,
            sampling_rate=rate, salt_every_us=SALT_US, **kw))
        srt = ["user_id", "event_id"]
        p = plain.sort_values(srt).reset_index(drop=True)
        s = salted.sort_values(srt).reset_index(drop=True)[p.columns]
        assert len(p) == len(s) > 50, (length, stride, rate, len(p), len(s))
        # min/max/window-end are selections — exact; mean/sum/std compare
        # to float64 tolerance (pandas rolling vs numpy reduce when r==1)
        for c in ("value_wmin", "value_wmax", "window_end_value"):
            assert p[c].tolist() == s[c].tolist(), (c, length)
        for c in ("value_wmean", "value_wsum", "value_wstd"):
            np.testing.assert_allclose(p[c], s[c], rtol=1e-12, atol=1e-12)


def test_salted_trailing_agg_matches():
    """Trailing RANGE window in mega-key mode: the halo carry (previous
    chunk's last-window rows) reproduces the key-complete answer across
    ~100 chunk boundaries; counts exact, sums to float64 precision."""
    from s_tsfe_dl_ray.stages.scan import trailing_agg

    df = _corpus()
    kw = dict(key="user_id", ts_col="ts", value_col="value",
              window_us=10 * 60 * 1_000_000, sum_col="vs", count_col="n")
    base = to_pdf(trailing_agg(ray.data.from_pandas(df), **kw))
    salted = to_pdf(trailing_agg(ray.data.from_pandas(df), **kw,
                                 salt_every_us=SALT_US))
    b = base.sort_values(["user_id", "event_id"]).reset_index(drop=True)
    s = salted.sort_values(["user_id", "event_id"]).reset_index(drop=True)
    assert len(b) == len(s) == len(df)
    np.testing.assert_array_equal(b.n.to_numpy(), s.n.to_numpy())
    np.testing.assert_allclose(b.vs.to_numpy(), s.vs.to_numpy(), rtol=1e-12)


def test_salted_bollinger_exact():
    from s_tsfe_dl_ray.stages.transform import bollinger_bands

    df = _corpus()
    kw = dict(keys=["user_id"], order_by=["ts", "event_id"], col="value",
              window=5)
    plain = to_pdf(bollinger_bands(ray.data.from_pandas(df), **kw)) \
        .sort_values(["user_id", "ts", "event_id"]).reset_index(drop=True)
    salted = to_pdf(bollinger_bands(ray.data.from_pandas(df),
                                    salt_every_us=SALT_US, **kw)) \
        .sort_values(["user_id", "ts", "event_id"]).reset_index(drop=True)
    for c in ("bb_mean", "bb_std", "bb_upper", "bb_lower"):
        a = plain[c].to_numpy()
        b = salted[c].to_numpy()
        # EXACT: every window sees identical contents; stats are
        # deterministic two-pass (no accumulator drift across chunks)
        assert ((a == b) | (np.isnan(a) & np.isnan(b))).all(), c


def test_salted_rolling_quantile_exact():
    """Order statistics have no accumulator drift — the salted rolling
    p90 must equal the unsalted one BIT-EXACTLY."""
    from s_tsfe_dl_ray.stages.transform import rolling_quantile

    df = _corpus()
    base = to_pdf(rolling_quantile(
        ray.data.from_pandas(df), keys=["user_id"],
        order_by=["ts", "event_id"], col="value", window=7, q=0.9))
    salted = to_pdf(rolling_quantile(
        ray.data.from_pandas(df), keys=["user_id"],
        order_by=["ts", "event_id"], col="value", window=7, q=0.9,
        salt_every_us=SALT_US))
    b = base.sort_values(["user_id", "event_id"]).reset_index(drop=True)
    s = salted.sort_values(["user_id", "event_id"]).reset_index(drop=True)
    assert len(b) == len(s) == len(df)
    np.testing.assert_allclose(b.value_p90w7.to_numpy(),
                               s.value_p90w7.to_numpy(),
                               rtol=0, atol=0, equal_nan=True)
