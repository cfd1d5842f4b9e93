"""Property tests for the round-4d/4e operator waves (TPC-H completion
is covered by the entry-contract oracle rehearsal; here are the
behavioral invariants the SQL twins can't express)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data


def _ds(df: pd.DataFrame):
    return ray.data.from_arrow(pa.Table.from_pandas(df, preserve_index=False))


# ---------------------------------------------------------------- perm entropy

def test_perm_entropy_monotone_ramp_is_zero():
    from s_tsfe_dl_ray.stages.features import permutation_entropy

    n = 200
    df = pd.DataFrame({
        "user_id": np.zeros(n, dtype=np.int64),
        "ts": pd.date_range("2024-01-01", periods=n, freq="1min"),
        "event_id": np.arange(n, dtype=np.int64),
        "value": np.arange(n, dtype=np.float64),
    })
    out = permutation_entropy(_ds(df), key="user_id", value_col="value",
                              order_by=["ts", "event_id"]).to_pandas()
    assert len(out) == 1
    assert out.n_triples.iloc[0] == n - 2
    assert out.perm_entropy.iloc[0] == pytest.approx(0.0, abs=1e-12)


def test_perm_entropy_short_series_emit_nothing_and_noise_near_ln6():
    from s_tsfe_dl_ray.stages.features import permutation_entropy

    rng = np.random.default_rng(7)
    n = 3000
    noise = pd.DataFrame({
        "user_id": np.ones(n, dtype=np.int64),
        "ts": pd.date_range("2024-01-01", periods=n, freq="1min"),
        "event_id": np.arange(n, dtype=np.int64),
        "value": rng.normal(size=n),
    })
    short = pd.DataFrame({
        "user_id": np.full(2, 9, dtype=np.int64),
        "ts": pd.date_range("2024-01-01", periods=2, freq="1min"),
        "event_id": np.arange(2, dtype=np.int64),
        "value": [1.0, 2.0],
    })
    out = permutation_entropy(_ds(pd.concat([noise, short])),
                              key="user_id", value_col="value",
                              order_by=["ts", "event_id"]).to_pandas()
    assert set(out.user_id) == {1}          # the 2-point key emits nothing
    ent = out.perm_entropy.iloc[0]
    assert abs(ent - np.log(6)) < 0.05      # iid noise ≈ uniform patterns


# ---------------------------------------------------------------------- AR(2)

def test_ar2_recovers_planted_coefficients():
    from s_tsfe_dl_ray.stages.trend import ar2_yule_walker

    rng = np.random.default_rng(3)
    phi1, phi2, n = 0.55, -0.3, 20_000
    x = np.zeros(n)
    eps = rng.normal(size=n)
    for t in range(2, n):
        x[t] = phi1 * x[t - 1] + phi2 * x[t - 2] + eps[t]
    df = pd.DataFrame({
        "user_id": np.zeros(n, dtype=np.int64),
        "ts": pd.date_range("2024-01-01", periods=n, freq="1s"),
        "event_id": np.arange(n, dtype=np.int64),
        "value": x,
    })
    out = ar2_yule_walker(_ds(df), key="user_id", value_col="value",
                          order_by=["ts", "event_id"]).to_pandas()
    assert out.phi1.iloc[0] == pytest.approx(phi1, abs=0.03)
    assert out.phi2.iloc[0] == pytest.approx(phi2, abs=0.03)


def test_ar2_nulls_for_short_and_constant_series():
    from s_tsfe_dl_ray.stages.trend import ar2_yule_walker

    df = pd.DataFrame({
        "user_id": [1, 1, 2, 2, 2, 2],
        "ts": pd.date_range("2024-01-01", periods=6, freq="1min"),
        "event_id": np.arange(6, dtype=np.int64),
        "value": [1.0, 2.0, 5.0, 5.0, 5.0, 5.0],
    })
    out = (ar2_yule_walker(_ds(df), key="user_id", value_col="value",
                           order_by=["ts", "event_id"])
           .to_pandas().set_index("user_id"))
    assert np.isnan(out.loc[1, "phi1"])     # n < 3
    assert np.isnan(out.loc[2, "phi2"])     # constant → zero denominator


# -------------------------------------------------------------- contamination

def test_contamination_planted_overlap_exact():
    from s_tsfe_dl_ray.stages.text import ngram_contamination

    # group A: 2 docs sharing a trigram internally (counted once);
    # group B: one doc overlapping A on exactly one trigram
    df = pd.DataFrame({
        "source": ["A", "A", "B"],
        "text": ["a b c d",            # grams: "a b c", "b c d"
                 "a b c",              # gram:  "a b c" (dup within A)
                 "b c d e f"],         # grams: "b c d", "c d e", "d e f"
    })
    out = ngram_contamination(_ds(df), group_col="source").to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (r.source_a, r.source_b) == ("A", "B")
    assert r.n_shared == 1                       # "b c d"
    assert r.overlap_coef == pytest.approx(1 / 2)  # |A|=2, |B|=3
    assert r.jaccard == pytest.approx(1 / 4)


def test_contamination_disjoint_groups_emit_no_pair():
    from s_tsfe_dl_ray.stages.text import ngram_contamination

    df = pd.DataFrame({
        "source": ["A", "B"],
        "text": ["a b c d", "x y z w"],
    })
    out = ngram_contamination(_ds(df), group_col="source").to_pandas()
    assert len(out) == 0


# -------------------------------------------------------------- context budget

def test_context_budget_hand_case():
    from s_tsfe_dl_ray.stages.dialog import context_budget

    df = pd.DataFrame({
        "conv_id": ["c1"] * 4 + ["c2"],
        "turn_idx": [0, 1, 2, 3, 0],
        "ts": pd.date_range("2024-01-01", periods=5, freq="1min"),
        # token counts: 3, 2, 4, 1 | 2
        "text": ["x y z", "a b", "p q r s", "k", "m n"],
    })
    out = (context_budget(_ds(df), budget_tokens=5)
           .to_pandas().set_index("conv_id"))
    # c1 prefix sums 3,5,9,10 → first two fit, 5 of 10 tokens dropped
    assert out.loc["c1", "n_turns"] == 4
    assert out.loc["c1", "n_fit"] == 2
    assert out.loc["c1", "tokens_total"] == 10
    assert out.loc["c1", "tokens_dropped"] == 5
    assert out.loc["c2", "n_fit"] == 1
    assert out.loc["c2", "tokens_dropped"] == 0


# ------------------------------------------------------------- watermark drop

def test_watermark_rollup_hand_case():
    from s_tsfe_dl_ray.stages.stream import watermark_rollup

    # arrival order 0..4; event times (minutes): 0, 10, 3, 9, 20
    # watermark before each: -, 0, 10, 10, 10 ; lateness 5 min
    #   t=3  arrives with wm=10 → 10-3=7 > 5  → LATE (dropped)
    #   t=9  arrives with wm=10 → 1 ≤ 5       → on time
    ts = pd.to_datetime(["2024-01-01 00:00", "2024-01-01 00:10",
                         "2024-01-01 00:03", "2024-01-01 00:09",
                         "2024-01-01 00:20"])
    df = pd.DataFrame({"k": ["a"] * 5,
                       "arr": np.arange(5, dtype=np.int64),
                       "ts": ts,
                       "v": [1.0, 2.0, 4.0, 8.0, 16.0]})
    out = watermark_rollup(_ds(df), key="k", ts_col="ts", arrival_col="arr",
                           value_col="v", window="1h",
                           allowed_lateness_us=5 * 60_000_000).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert r.n_events == 4 and r.n_late_dropped == 1
    assert r.value_sum == pytest.approx(1 + 2 + 8 + 16)


def test_watermark_all_late_window_has_null_sum():
    from s_tsfe_dl_ray.stages.stream import watermark_rollup

    # second hour's only event arrives 2 h behind the watermark → its
    # window exists with n_events 0 and NULL value_sum
    ts = pd.to_datetime(["2024-01-01 03:00", "2024-01-01 01:30"])
    df = pd.DataFrame({"k": ["a", "a"],
                       "arr": np.array([0, 1], dtype=np.int64),
                       "ts": ts, "v": [1.0, 99.0]})
    out = (watermark_rollup(_ds(df), key="k", ts_col="ts", arrival_col="arr",
                            value_col="v", window="1h",
                            allowed_lateness_us=60_000_000)
           .to_pandas().sort_values("window_start").reset_index(drop=True))
    assert out.n_events.tolist() == [0, 1]
    assert out.n_late_dropped.tolist() == [1, 0]
    assert np.isnan(out.value_sum.iloc[0]) and out.value_sum.iloc[1] == 1.0


# ------------------------------------------------------------- spectral power

def test_spectral_power_detects_planted_daily_cycle():
    from s_tsfe_dl_ray.stages.features import spectral_power

    n = 24 * 14  # two weeks hourly
    t = np.arange(n) * 3600.0
    df = pd.DataFrame({
        "user_id": np.zeros(n, dtype=np.int64),
        "ts": pd.Timestamp("2024-01-01") + pd.to_timedelta(t, unit="s"),
        "value": 5.0 + np.sin(2 * np.pi * t / 86_400.0),
    })
    out = spectral_power(_ds(df), key="user_id", ts_col="ts",
                         value_col="value").to_pandas()
    r = out.iloc[0]
    # a pure unit sinusoid at bin frequency → power = amplitude²/4 = 0.25
    assert r.power_1d == pytest.approx(0.25, abs=0.01)
    assert r.power_7d < 0.02


# ------------------------------------------------------------- column profile

def test_column_profile_hand_case():
    from s_tsfe_dl_ray.stages.distinct import column_profile

    df = pd.DataFrame({
        "k": ["a", "b", "a", None],
        "x": [1.0, 2.0, np.nan, 2.0],
    })
    out = (column_profile(_ds(df), columns=["k", "x"])
           .to_pandas().set_index("col"))
    assert out.loc["k", "n_rows"] == 4 and out.loc["k", "n_nulls"] == 1
    assert out.loc["k", "n_distinct"] == 2
    assert out.loc["k", "min_str"] == "a" and out.loc["k", "max_str"] == "b"
    assert np.isnan(out.loc["k", "min_num"])
    assert out.loc["x", "n_nulls"] == 1 and out.loc["x", "n_distinct"] == 2
    assert out.loc["x", "min_num"] == 1.0 and out.loc["x", "max_num"] == 2.0


# ---------------------------------------------------------- peak sliding rate

def test_peak_sliding_rate_hand_case():
    from s_tsfe_dl_ray.stages.stream import peak_sliding_rate

    # bursts: three events within 10 min, then a lone one hours later
    ts = pd.to_datetime(["2024-01-01 00:00", "2024-01-01 00:05",
                         "2024-01-01 00:10", "2024-01-01 09:00",
                         # second key: two simultaneous events (RANGE peers)
                         "2024-01-01 00:00", "2024-01-01 00:00"])
    df = pd.DataFrame({"k": ["a"] * 4 + ["b"] * 2, "ts": ts})
    out = (peak_sliding_rate(_ds(df), key="k", ts_col="ts",
                             window_us=3_600_000_000)
           .to_pandas().set_index("k"))
    assert out.loc["a", "peak_count"] == 3
    assert out.loc["a", "peak_at"] == pd.Timestamp("2024-01-01 00:10")
    # both b-rows share a timestamp → each counts the other (peers rule)
    assert out.loc["b", "peak_count"] == 2


# -------------------------------------------------------------- decayed counts

def test_decayed_counts_halves_per_half_life():
    from s_tsfe_dl_ray.stages.distinct import decayed_counts

    # horizon = last event; ages: 2hl, 1hl, 0 → weights 0.25, 0.5, 1.0
    hl = 3_600_000_000
    ts = pd.to_datetime(["2024-01-01 00:00", "2024-01-01 01:00",
                         "2024-01-01 02:00"])
    df = pd.DataFrame({"k": ["x", "x", "x"], "ts": ts})
    out = decayed_counts(_ds(df), key_col="k", ts_col="ts",
                         half_life_us=hl).to_pandas()
    assert out.n_events.iloc[0] == 3
    assert out.decayed_count.iloc[0] == pytest.approx(1.75, abs=1e-12)


# ------------------------------------------------------ tiered quantile digest

def test_tiered_quantile_digest_cascade_rank_error_bounded():
    from s_tsfe_dl_ray.stages.quantile import tiered_quantile_digest

    rng = np.random.default_rng(11)
    n = 60_000
    ts = (pd.Timestamp("2024-01-01")
          + pd.to_timedelta(rng.integers(0, 6 * 3600, n), unit="s"))
    df = pd.DataFrame({"ts": ts, "value": rng.lognormal(0.0, 1.0, n)})
    tiers = tiered_quantile_digest(_ds(df), ts_col="ts", value_col="value",
                                   tiers=("1m", "1h"), delta=128)
    got = tiers["1h"].to_pandas().sort_values("window_start")
    assert len(got) == 6
    # exact counts must survive the double compression exactly
    exact_n = df.groupby(df.ts.dt.floor("1h")).size()
    assert got.set_index("window_start").n_events.sort_index().tolist() \
        == exact_n.sort_index().tolist()
    # rank error of each estimate within its window ≤ 3% (delta=128,
    # double-compressed ⇒ a few × 1/delta)
    for _, row in got.iterrows():
        w = df[df.ts.dt.floor("1h") == row.window_start].value.to_numpy()
        for q, col in [(0.5, "q_50"), (0.95, "q_95"), (0.99, "q_99")]:
            rank = (w <= row[col]).mean()
            assert abs(rank - q) < 0.03, (row.window_start, col, rank)


def test_tiered_digest_cascade_close_to_direct_digest():
    from s_tsfe_dl_ray.stages.quantile import (grouped_quantiles_approx,
                                               tiered_quantile_digest)

    rng = np.random.default_rng(5)
    n = 30_000
    ts = (pd.Timestamp("2024-01-01")
          + pd.to_timedelta(rng.integers(0, 2 * 3600, n), unit="s"))
    df = pd.DataFrame({"ts": ts, "value": rng.normal(size=n)})
    casc = (tiered_quantile_digest(_ds(df), ts_col="ts", value_col="value",
                                   tiers=("1m", "1h"))["1h"]
            .to_pandas().sort_values("window_start").reset_index(drop=True))
    df2 = df.assign(window_start=df.ts.dt.floor("1h"))
    direct = (grouped_quantiles_approx(_ds(df2[["window_start", "value"]]),
                                       value_col="value",
                                       keys=["window_start"])
              .to_pandas().sort_values("window_start").reset_index(drop=True))
    for col in ["q_50", "q_95", "q_99"]:
        assert np.allclose(casc[col], direct[col], atol=0.08)


# ----------------------------------------------------------- chi² independence

def test_chi2_perfect_association_and_independence():
    from s_tsfe_dl_ray.stages.distinct import chi2_independence

    # perfect association: b == a → V = 1
    df = pd.DataFrame({"a": ["x", "y"] * 50, "b": ["x", "y"] * 50})
    out = chi2_independence(_ds(df), col_a="a", col_b="b").to_pandas()
    assert out.cramers_v.iloc[0] == pytest.approx(1.0)
    assert out.dof.iloc[0] == 1 and out.n.iloc[0] == 100

    # exact independence: uniform product table → chi2 = 0
    a = np.repeat(["x", "y"], 50)
    b = np.tile(np.repeat(["p", "q"], 25), 2)
    out2 = chi2_independence(_ds(pd.DataFrame({"a": a, "b": b})),
                             col_a="a", col_b="b").to_pandas()
    assert out2.chi2.iloc[0] == pytest.approx(0.0, abs=1e-12)
