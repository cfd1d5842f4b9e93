"""Semantic property tests for the round-4 operator wave (oracle parity
at driver scale lives in test_entry_contract.py; these pin the
ALGORITHMIC claims — robustness, symbol semantics, exactness edges —
on constructed inputs where the right answer is known a priori)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
import ray.data

from conftest import to_pdf


def _ds(df: pd.DataFrame) -> "ray.data.Dataset":
    return ray.data.from_pandas(df)


# ---------------------------------------------------------------------------
# robust stats
# ---------------------------------------------------------------------------


def test_mad_flags_planted_outliers():
    from s_tsfe_dl_ray.stages.robust import grouped_mad

    rng = np.random.default_rng(7)
    base = rng.normal(100.0, 1.0, 400)
    vals = np.concatenate([base, [500.0, -300.0]])  # 2 gross outliers
    df = pd.DataFrame({"k": np.repeat("u1", len(vals)), "v": vals})
    out = to_pdf(grouped_mad(_ds(df), key="k", value_col="v"))
    assert len(out) == 1
    row = out.iloc[0]
    assert abs(row["med"] - np.median(vals)) < 1e-12
    dev = np.abs(vals - np.median(vals))
    assert abs(row["mad"] - np.median(dev)) < 1e-12
    expected_out = int((dev > 3 * 1.4826 * np.median(dev)).sum())
    assert row["n_outliers"] == expected_out  # bit-identical threshold
    assert expected_out >= 2  # the two planted spikes are always flagged


def test_theil_sen_ignores_outlier_ols_chases_it():
    from s_tsfe_dl_ray.stages.robust import theil_sen

    n = 60
    ts = pd.to_datetime(np.arange(n), unit="s")
    v = 2.0 * np.arange(n, dtype=float)  # slope exactly 2/s
    v[30] = 1e6  # one gross spike
    df = pd.DataFrame({"k": "a", "ts": ts, "v": v, "id": np.arange(n)})
    out = to_pdf(theil_sen(_ds(df), key="k", ts_col="ts", value_col="v",
                           id_col="id"))
    assert abs(out.iloc[0]["sen_slope"] - 2.0) < 1e-9  # median unmoved
    assert out.iloc[0]["n_pairs"] == n * (n - 1) // 2


def test_theil_sen_singleton_key_dropped_and_cap_raises():
    from s_tsfe_dl_ray.stages.robust import theil_sen

    df = pd.DataFrame({
        "k": ["solo", "pair", "pair"],
        "ts": pd.to_datetime([0, 0, 1], unit="s"),
        "v": [1.0, 1.0, 3.0],
        "id": [0, 1, 2],
    })
    out = to_pdf(theil_sen(_ds(df), key="k", ts_col="ts", value_col="v",
                           id_col="id"))
    assert set(out["k"]) == {"pair"}  # n<2 key absent, like the SQL twin
    with pytest.raises(Exception, match="max_key_rows"):
        big = pd.DataFrame({
            "k": "hot", "ts": pd.to_datetime(np.arange(50), unit="s"),
            "v": np.arange(50.0), "id": np.arange(50)})
        to_pdf(theil_sen(_ds(big), key="k", ts_col="ts", value_col="v",
                         id_col="id", max_key_rows=10))


def test_spearman_monotone_series_is_plus_minus_one():
    from s_tsfe_dl_ray.stages.robust import spearman_monotonicity

    n = 40
    ts = pd.to_datetime(np.arange(n), unit="s")
    df = pd.DataFrame({
        "k": np.repeat(["up", "down", "const"], n),
        "ts": np.tile(ts, 3),
        "v": np.concatenate([np.exp(np.arange(n, dtype=float)),  # monotone ↑
                             -np.arange(n, dtype=float),          # monotone ↓
                             np.ones(n)]),                        # all tied
        "id": np.arange(3 * n),
    })
    out = to_pdf(spearman_monotonicity(
        _ds(df), key="k", ts_col="ts", value_col="v", id_col="id"))
    got = out.set_index("k")["spearman"]
    assert got["up"] == pytest.approx(1.0)
    assert got["down"] == pytest.approx(-1.0)
    assert np.isnan(got["const"])  # zero rank variance → NULL


# ---------------------------------------------------------------------------
# symbolic compression
# ---------------------------------------------------------------------------


def test_paa_segments_and_ragged_tail():
    from s_tsfe_dl_ray.stages.symbolic import paa

    v = np.arange(10, dtype=float)  # segments of 4: [0..3],[4..7],[8,9]
    df = pd.DataFrame({"k": "a", "ts": pd.to_datetime(np.arange(10), unit="s"),
                       "v": v, "id": np.arange(10)})
    out = to_pdf(paa(_ds(df), key="k", order_by=["ts", "id"], value_col="v",
                     seg_len=4)).sort_values("seg")
    assert list(out["n_in_seg"]) == [4, 4, 2]
    assert list(out["seg_mean"]) == [1.5, 5.5, 8.5]


def test_sax_symbols_and_null_rules():
    from s_tsfe_dl_ray.stages.symbolic import sax

    # key "w": one value per segment (seg_len=1) spanning the alphabet
    v = np.array([-10.0, -0.1, 0.1, 10.0, 0.0])
    dfs = [pd.DataFrame({"k": "w", "ts": pd.to_datetime(np.arange(5), unit="s"),
                         "v": v, "id": np.arange(5)}),
           # n<2 → std NULL → symbol NULL
           pd.DataFrame({"k": "single", "ts": pd.to_datetime([99], unit="s"),
                         "v": [5.0], "id": [99]}),
           # zero variance → x/0 → symbol NULL
           pd.DataFrame({"k": "flat", "ts": pd.to_datetime([200, 201], unit="s"),
                         "v": [3.0, 3.0], "id": [200, 201]})]
    out = to_pdf(sax(_ds(pd.concat(dfs, ignore_index=True)), key="k",
                     order_by=["ts", "id"], value_col="v", seg_len=1))
    w = out[out["k"] == "w"].sort_values("seg")["symbol"].tolist()
    assert w[0] == "a" and w[3] == "d"  # extremes hit the outer buckets
    assert out[out["k"] == "single"]["symbol"].isna().all()
    assert out[out["k"] == "flat"]["symbol"].isna().all()


# ---------------------------------------------------------------------------
# bollinger / histogram / mode
# ---------------------------------------------------------------------------


def test_bollinger_zero_variance_window_is_exactly_zero():
    from s_tsfe_dl_ray.stages.transform import bollinger_bands

    df = pd.DataFrame({"k": "a", "ts": pd.to_datetime(np.arange(8), unit="s"),
                       "v": [0.1] * 8, "id": np.arange(8)})
    out = to_pdf(bollinger_bands(_ds(df), keys=["k"], order_by=["ts", "id"],
                                 col="v", window=5)).sort_values("id")
    assert np.isnan(out.iloc[0]["bb_std"])  # n=1 → stddev_samp NULL
    # constant window: two-pass std is EXACTLY 0.0 (no accumulator leak)
    assert (out.iloc[1:]["bb_std"] == 0.0).all()
    # bands collapse onto the mean (which is the FLOAT mean — DuckDB's
    # avg over [0.1]*k is equally non-exact, so we pin band == mean)
    assert (out.iloc[1:]["bb_upper"] == out.iloc[1:]["bb_mean"]).all()
    assert (out.iloc[1:]["bb_lower"] == out.iloc[1:]["bb_mean"]).all()


def test_histogram_counts_cover_all_rows():
    from s_tsfe_dl_ray.stages.quantile import fixed_histogram

    rng = np.random.default_rng(3)
    v = np.concatenate([rng.uniform(-50, 100, 5000), [-50.0, 0.0, 25.0]])
    out = to_pdf(fixed_histogram(_ds(pd.DataFrame({"v": v})), value_col="v",
                                 width=25.0))
    assert out["n_rows"].sum() == len(v)
    assert (out["bin_lo"] == out["bin"] * 25.0).all()
    lo = out.set_index("bin")["bin_lo"]
    assert lo.loc[-2] == -50.0 and lo.loc[1] == 25.0  # exact edges bin left


def test_mode_tiebreak_is_lexicographic():
    from s_tsfe_dl_ray.stages.distinct import mode_per_key

    df = pd.DataFrame({"k": [1, 1, 1, 1, 2, 2],
                       "c": ["b", "b", "a", "a", "z", "y"]})
    out = to_pdf(mode_per_key(_ds(df), key="k", cat_col="c")).set_index("k")
    assert out.loc[1, "mode_type"] == "a" and out.loc[1, "n_mode"] == 2
    assert out.loc[2, "mode_type"] == "y" and out.loc[2, "n_mode"] == 1


# ---------------------------------------------------------------------------
# text
# ---------------------------------------------------------------------------


def test_bigrams_respect_doc_boundaries_and_space_runs():
    from s_tsfe_dl_ray.stages.text import top_bigrams

    df = pd.DataFrame({"doc_id": [1, 2, 3],
                       "text": ["a b c", "c a b", "x  y"]})
    out = to_pdf(top_bigrams(_ds(df), k=10))
    got = dict(zip(out["bigram"], out["n"]))
    assert got == {"a b": 2, "b c": 1, "c a": 1}  # no "c c" bridge, no "x y"


def test_zipf_slope_recovers_planted_exponent():
    from s_tsfe_dl_ray.stages.text import zipf_slope

    # corpus where token t_r appears round(1000/r) times → slope ≈ −1
    words = []
    for r in range(1, 101):
        words += [f"tok{r:03d}"] * round(1000 / r)
    rng = np.random.default_rng(11)
    rng.shuffle(words)
    docs = [" ".join(words[i::20]) for i in range(20)]
    out = to_pdf(zipf_slope(
        _ds(pd.DataFrame({"doc_id": range(20), "text": docs})), top_n=100))
    assert out.iloc[0]["n_tokens"] == 100
    assert out.iloc[0]["zipf_slope"] == pytest.approx(-1.0, abs=0.05)


# ---------------------------------------------------------------------------
# embeddings / cross-series
# ---------------------------------------------------------------------------


def test_cosine_to_centroid_axes():
    from s_tsfe_dl_ray.stages.similarity import cosine_to_centroid

    # 3 copies of e1 + 1 of e2: centroid = (0.75, 0.25); zero vec → NULL
    emb = [[1.0, 0.0]] * 3 + [[0.0, 1.0], [0.0, 0.0]]
    df = pd.DataFrame({"vec_id": range(5), "embedding": emb})
    out = to_pdf(cosine_to_centroid(_ds(df))).set_index("vec_id")["cos_centroid"]
    c = np.array([0.75, 0.25])
    c = c / np.linalg.norm(c)
    assert out.loc[0] == pytest.approx(c[0])
    assert out.loc[3] == pytest.approx(c[1])
    assert np.isnan(out.loc[4])


def test_cross_series_corr_planted_lead():
    from s_tsfe_dl_ray.stages.trend import cross_series_corr

    # clicks at hour h predict purchases at h+1 exactly; lag0 decorrelated
    rng = np.random.default_rng(5)
    hours = 48
    clicks = rng.integers(1, 20, hours)
    rows = []
    t0 = pd.Timestamp("2026-01-01")
    for h in range(hours):
        for _ in range(int(clicks[h])):
            rows.append((t0 + pd.Timedelta(hours=h), "click"))
        if h >= 1:
            for _ in range(int(clicks[h - 1])):
                rows.append((t0 + pd.Timedelta(hours=h), "purchase"))
    df = pd.DataFrame(rows, columns=["ts", "event_type"])
    out = to_pdf(cross_series_corr(_ds(df), ts_col="ts",
                                   type_col="event_type", type_a="click",
                                   type_b="purchase", tier="1h"))
    row = out.iloc[0]
    assert row["n_windows"] == hours
    assert row["corr_lag1"] == pytest.approx(1.0)
    assert abs(row["corr_lag0"]) < 0.5


# ---------------------------------------------------------------------------
# wave 2: changepoint / acf / lttb
# ---------------------------------------------------------------------------


def test_changepoint_finds_planted_level_shift():
    from s_tsfe_dl_ray.stages.robust import binary_changepoint

    rng = np.random.default_rng(9)
    n = 80
    v = np.concatenate([10.0 + rng.uniform(-0.5, 0.5, 50),
                        20.0 + rng.uniform(-0.5, 0.5, 30)])
    v = np.round(v, 2)  # the operator's 2-decimal exactness contract
    df = pd.DataFrame({"k": "a", "ts": pd.to_datetime(np.arange(n), unit="s"),
                       "v": v, "id": np.arange(n)})
    out = to_pdf(binary_changepoint(_ds(df), key="k", ts_col="ts",
                                    value_col="v", id_col="id"))
    row = out.iloc[0]
    assert row["split_k"] == 50  # exact planted boundary
    assert abs(row["mean_left"] - v[:50].mean()) < 1e-9
    assert abs(row["mean_right"] - v[50:].mean()) < 1e-9


def test_changepoint_singleton_dropped_constant_tie_breaks_smallest_k():
    from s_tsfe_dl_ray.stages.robust import binary_changepoint

    df = pd.DataFrame({
        "k": ["solo"] + ["flat"] * 4,
        "ts": pd.to_datetime([0, 1, 2, 3, 4], unit="s"),
        "v": [1.0, 2.0, 2.0, 2.0, 2.0],
        "id": range(5),
    })
    out = to_pdf(binary_changepoint(_ds(df), key="k", ts_col="ts",
                                    value_col="v", id_col="id"))
    assert set(out["k"]) == {"flat"}   # n<2 key has no split
    row = out.set_index("k").loc["flat"]
    assert row["score"] == 0.0 and row["split_k"] == 1  # all-tied → first k


def test_acf_period2_series():
    from s_tsfe_dl_ray.stages.trend import acf

    n = 40
    v = np.tile([0.0, 1.0], n // 2)  # perfect period 2
    df = pd.DataFrame({"k": "a", "ts": pd.to_datetime(np.arange(n), unit="s"),
                       "v": v, "id": np.arange(n)})
    out = to_pdf(acf(_ds(df), key="k", value_col="v",
                     order_by=["ts", "id"], lags=(1, 2))).set_index("lag")
    assert out.loc[1, "autocorr"] == pytest.approx(-1.0)
    assert out.loc[2, "autocorr"] == pytest.approx(1.0)
    assert out.loc[1, "n_pairs"] == n - 1 and out.loc[2, "n_pairs"] == n - 2


def test_acf_short_key_emits_null_rows():
    from s_tsfe_dl_ray.stages.trend import acf

    df = pd.DataFrame({"k": ["s", "s"], "ts": pd.to_datetime([0, 1], unit="s"),
                       "v": [1.0, 2.0], "id": [0, 1]})
    out = to_pdf(acf(_ds(df), key="k", value_col="v", order_by=["ts", "id"],
                     lags=(1, 3))).set_index("lag")
    assert out.loc[3, "n_pairs"] == 0 and np.isnan(out.loc[3, "autocorr"])
    assert out.loc[1, "n_pairs"] == 1 and np.isnan(out.loc[1, "autocorr"])


def test_lttb_anchors_count_and_spike_retention():
    from s_tsfe_dl_ray.stages.symbolic import lttb

    rng = np.random.default_rng(2)
    n = 500
    v = rng.normal(0, 0.1, n)
    v[137] = 50.0  # a spike a mean-downsample would flatten
    df = pd.DataFrame({"k": np.repeat("a", n),
                       "ts": pd.to_datetime(np.arange(n), unit="s"),
                       "v": v, "id": np.arange(n)})
    # plus a short key that must pass through untouched
    short = pd.DataFrame({"k": "tiny", "ts": pd.to_datetime([0, 1], unit="s"),
                          "v": [1.0, 2.0], "id": [1000, 1001]})
    out = to_pdf(lttb(_ds(pd.concat([df, short], ignore_index=True)),
                      key="k", ts_col="ts", value_col="v", n_out=20,
                      id_col="id"))
    a = out[out["k"] == "a"].sort_values("id")
    assert len(a) == 20
    assert a["id"].iloc[0] == 0 and a["id"].iloc[-1] == n - 1  # anchors
    assert 137 in set(a["id"])  # the spike survives
    assert len(out[out["k"] == "tiny"]) == 2  # n <= n_out passes through


# ---------------------------------------------------------------------------
# wave 3: mann-whitney / js divergence
# ---------------------------------------------------------------------------


def test_mann_whitney_separated_groups_hit_extremes():
    from s_tsfe_dl_ray.stages.robust import mann_whitney_u

    # every A value beats every B → U = na*nb, rank_biserial = -1
    df = pd.DataFrame({
        "k": ["u"] * 8,
        "g": ["A"] * 4 + ["B"] * 4,
        "v": [10.0, 11.0, 12.0, 13.0, 1.0, 2.0, 3.0, 4.0],
    })
    out = to_pdf(mann_whitney_u(_ds(df), key="k", group_col="g",
                                value_col="v", group_a="A", group_b="B"))
    row = out.iloc[0]
    # R_a = ranks 5..8 = 26; U = 26 - 4*5/2 = 16 = na*nb
    assert row["u_stat"] == 16.0
    assert row["rank_biserial"] == -1.0
    # one-sided key → NULL effect size
    df2 = pd.DataFrame({"k": ["x"] * 3, "g": ["A"] * 3, "v": [1.0, 2.0, 3.0]})
    out2 = to_pdf(mann_whitney_u(_ds(df2), key="k", group_col="g",
                                 value_col="v", group_a="A", group_b="B"))
    assert out2.iloc[0]["n_b"] == 0 and np.isnan(out2.iloc[0]["rank_biserial"])


def test_js_divergence_identical_zero_disjoint_ln2():
    from s_tsfe_dl_ray.stages.text import js_divergence

    same = pd.DataFrame({"source": ["src0", "src1"],
                         "text": ["a b c a", "a b c a"]})
    out = to_pdf(js_divergence(_ds(same)))
    assert out.iloc[0]["js_div"] == pytest.approx(0.0, abs=1e-12)
    disjoint = pd.DataFrame({"source": ["src0", "src1"],
                             "text": ["a a b", "x y z"]})
    out2 = to_pdf(js_divergence(_ds(disjoint)))
    assert out2.iloc[0]["js_div"] == pytest.approx(np.log(2.0))
    assert out2.iloc[0]["n_tokens"] == 5


# ---------------------------------------------------------------------------
# wave 4: ks test / locf resample
# ---------------------------------------------------------------------------


def test_ks_disjoint_distributions_hit_one():
    from s_tsfe_dl_ray.stages.robust import ks_test

    df = pd.DataFrame({
        "k": ["u"] * 8 + ["onlya"] * 2,
        "g": (["A"] * 4 + ["B"] * 4) + ["A"] * 2,
        "v": [1.0, 2.0, 3.0, 4.0, 10.0, 11.0, 12.0, 13.0] + [1.0, 2.0],
    })
    out = to_pdf(ks_test(_ds(df), key="k", group_col="g", value_col="v",
                         group_a="A", group_b="B"))
    assert set(out["k"]) == {"u"}  # one-sided key emits nothing
    assert out.iloc[0]["ks_d"] == 1.0  # fully separated supports


def test_ks_identical_distributions_zero():
    from s_tsfe_dl_ray.stages.robust import ks_test

    v = [1.0, 2.0, 3.0]
    df = pd.DataFrame({"k": "u", "g": ["A"] * 3 + ["B"] * 3, "v": v + v})
    out = to_pdf(ks_test(_ds(df), key="k", group_col="g", value_col="v",
                         group_a="A", group_b="B"))
    assert out.iloc[0]["ks_d"] == 0.0


def test_resample_locf_grid_and_carry():
    from s_tsfe_dl_ray.stages.gapfill import resample_locf

    # events at 00:30, 02:15 → hourly grid 00:00..02:00:
    # 00:00 → NULL (before first), 01:00 → 00:30's value, 02:00 → same
    df = pd.DataFrame({
        "k": ["a", "a"],
        "ts": pd.to_datetime(["2026-01-01 00:30", "2026-01-01 02:15"]),
        "v": [7.0, 9.0],
        "id": [1, 2],
    })
    out = to_pdf(resample_locf(_ds(df), key="k", ts_col="ts", value_col="v",
                               id_col="id", tier="1h")).sort_values("sample_ts")
    assert len(out) == 3
    assert np.isnan(out.iloc[0]["value_locf"])
    assert out.iloc[1]["value_locf"] == 7.0 and out.iloc[2]["value_locf"] == 7.0
    # grid point == event ts takes that event, latest id among ties
    df2 = pd.DataFrame({
        "k": ["b"] * 3,
        "ts": pd.to_datetime(["2026-01-01 01:00", "2026-01-01 01:00",
                              "2026-01-01 02:00"]),
        "v": [1.0, 2.0, 3.0],
        "id": [10, 11, 12],
    })
    out2 = to_pdf(resample_locf(_ds(df2), key="k", ts_col="ts", value_col="v",
                                id_col="id", tier="1h")).sort_values("sample_ts")
    assert out2.iloc[0]["value_locf"] == 2.0  # tie → largest id
    assert out2.iloc[1]["value_locf"] == 3.0


# ---------------------------------------------------------------------------
# wave 5: drawdown / vocab stats
# ---------------------------------------------------------------------------


def test_max_drawdown_peak_to_trough():
    from s_tsfe_dl_ray.stages.robust import max_drawdown

    df = pd.DataFrame({
        "k": ["a"] * 6 + ["up"] * 3,
        "ts": pd.to_datetime(list(range(6)) + list(range(3)), unit="s"),
        "v": [10.0, 50.0, 20.0, 40.0, 5.0, 30.0] + [1.0, 2.0, 3.0],
        "id": range(9),
    })
    out = to_pdf(max_drawdown(_ds(df), key="k", ts_col="ts", value_col="v",
                              id_col="id")).set_index("k")
    assert out.loc["a", "max_drawdown"] == 45.0  # 50 → 5
    assert out.loc["up", "max_drawdown"] == 0.0  # monotone rise


def test_vocab_stats_counts():
    from s_tsfe_dl_ray.stages.text import vocab_stats

    df = pd.DataFrame({"doc_id": [1, 2],
                       "text": ["a a b c", "b d"]})
    out = to_pdf(vocab_stats(_ds(df))).iloc[0]
    assert out["n_instances"] == 6
    assert out["n_vocab"] == 4      # a b c d
    assert out["n_hapax"] == 2      # c, d
    assert out["type_token_ratio"] == pytest.approx(4 / 6)
    assert out["hapax_ratio"] == pytest.approx(0.5)


def test_hopping_windows_contain_tumbling_and_conserve_mass():
    from s_tsfe_dl_ray.pipelines.events_rollup import EVENTS_SPEC, events_tier
    from s_tsfe_dl_ray.stages.rollup import hopping_rollup
    from s_tsfe_dl_ray.sources.parquet import read_events

    sf = "/root/testdata/sf0.001"
    hop = to_pdf(hopping_rollup(
        read_events(sf, columns=["user_id", "ts", "value"]),
        EVENTS_SPEC, size="1h", hop=15 * 60 * 1_000_000))
    tumb = to_pdf(events_tier(sf, "1h"))
    # every event lands in exactly size/hop = 4 windows
    assert hop["n_events"].sum() == 4 * tumb["n_events"].sum()
    # hour-aligned hopping windows ARE the tumbling 1h rollup
    aligned = hop[hop["window_start"].dt.minute == 0]
    m = aligned.merge(tumb, on=["user_id", "window_start"],
                      suffixes=("_h", "_t"))
    assert len(m) == len(tumb) == len(aligned)
    assert (m["n_events_h"] == m["n_events_t"]).all()
    assert np.allclose(m["value_sum_h"], m["value_sum_t"], rtol=0, atol=1e-9)


# ---------------------------------------------------------------------------
# wave 6: dominant period / sample packing
# ---------------------------------------------------------------------------


def test_dominant_period_finds_planted_cycle():
    from s_tsfe_dl_ray.stages.trend import dominant_period

    n = 72
    v = np.sin(2 * np.pi * np.arange(n) / 6) + 5.0  # exact period 6
    df = pd.DataFrame({"k": "a", "ts": pd.to_datetime(np.arange(n), unit="s"),
                       "v": v, "id": np.arange(n)})
    out = to_pdf(dominant_period(_ds(df), key="k", value_col="v",
                                 order_by=["ts", "id"], max_lag=12))
    row = out.iloc[0]
    assert row["period"] == 6
    assert row["acf_peak"] > 0.99
    # a 2-row key has every lag's corr NULL → emits nothing
    tiny = pd.DataFrame({"k": "t", "ts": pd.to_datetime([0, 1], unit="s"),
                         "v": [1.0, 2.0], "id": [0, 1]})
    out2 = to_pdf(dominant_period(_ds(tiny), key="k", value_col="v",
                                  order_by=["ts", "id"], max_lag=12))
    assert len(out2) == 0


def test_pack_sequences_budget_coverage_determinism():
    from s_tsfe_dl_ray.stages.text import pack_sequences

    rng = np.random.default_rng(13)
    texts = [" ".join(["w"] * int(k)) for k in rng.integers(5, 200, 300)]
    texts += [" ".join(["w"] * 700), ""]  # one oversize, one empty doc
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    out = to_pdf(pack_sequences(_ds(df), budget=512))
    # every doc assigned exactly once
    assert sorted(out["doc_id"]) == list(range(len(texts)))
    # token counts correct (empty doc = 0 tokens)
    assert out.set_index("doc_id").loc[len(texts) - 1, "n_tokens"] == 0
    assert out.set_index("doc_id").loc[len(texts) - 2, "n_tokens"] == 700
    # budget respected for every non-oversize bin
    g = out[~out["oversize"]].groupby("bin_id")["n_tokens"].sum()
    assert (g <= 512).all()
    # oversize docs sit alone in their bin, flagged
    over = out[out["oversize"]]
    assert len(over) == 1
    assert (out["bin_id"] == over["bin_id"].iloc[0]).sum() == 1
    # deterministic across runs
    out2 = to_pdf(pack_sequences(_ds(df), budget=512))
    a = out.sort_values("doc_id").reset_index(drop=True)
    b = out2.sort_values("doc_id").reset_index(drop=True)
    assert (a["bin_id"].to_numpy() == b["bin_id"].to_numpy()).all()
    # packing is dense: utilization of closed bins is decent for FFD
    util = g.sum() / (512 * len(g))
    assert util > 0.6


def test_categorical_concentration_extremes():
    from s_tsfe_dl_ray.stages.distinct import categorical_concentration

    df = pd.DataFrame({
        "g": ["mono"] * 4 + ["uni"] * 4,
        "m": ["x"] * 4 + ["a", "b", "c", "d"],
    })
    out = to_pdf(categorical_concentration(_ds(df), group_col="g",
                                           member_col="m")).set_index("g")
    assert out.loc["mono", "hhi"] == 1.0 and out.loc["mono", "entropy"] == 0.0
    assert out.loc["mono", "top_share"] == 1.0
    assert out.loc["uni", "hhi"] == pytest.approx(0.25)
    assert out.loc["uni", "entropy"] == pytest.approx(np.log(4.0))
    assert out.loc["uni", "n_members"] == 4


def test_4g_ops_blocking_invariance():
    """The 4g per-key ops give IDENTICAL results at 1 input block and
    at 7 — partitioning must never leak into values (the combiner /
    key-complete-partition contracts)."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    from conftest import to_pdf
    from s_tsfe_dl_ray.stages.activity import activity_gini, hour_entropy
    from s_tsfe_dl_ray.stages.robust import psi_daily, runs_test, trimmed_mean
    from s_tsfe_dl_ray.stages.scan import out_of_order_stats, record_highs
    from s_tsfe_dl_ray.stages.trend import ljung_box, stl_lite

    rng = np.random.default_rng(17)
    n = 3000
    t = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(np.sort(rng.integers(
            1_700_000_000_000_000, 1_700_600_000_000_000, n)
        ).astype("datetime64[us]")),
        "user_id": pa.array(rng.integers(1, 30, n)),
        "event_type": pa.array(rng.choice(["a", "b", "c"], n)),
        "value": pa.array(rng.normal(10, 3, n)),
    })
    path = "/tmp/blockinv_4g.parquet"
    pq.write_table(t, path)

    def run(blocks):
        ds = ray.data.read_parquet(path, override_num_blocks=blocks)
        return {
            "gini": to_pdf(activity_gini(ds)),
            "hent": to_pdf(hour_entropy(ds).sort("user_id")),
            "runs": to_pdf(runs_test(ds, key="user_id", value_col="value",
                                     order_by=["ts", "event_id"])
                           .sort("user_id")),
            "trim": to_pdf(trimmed_mean(ds, key="user_id",
                                        value_col="value",
                                        id_col="event_id")),
            "psi": to_pdf(psi_daily(ds).sort("day")),
            "ooo": to_pdf(out_of_order_stats(ds)),
            "rec": to_pdf(record_highs(ds)),
            "stl": to_pdf(stl_lite(ds, key="event_type")),
            "lb": to_pdf(ljung_box(ds, key="user_id", value_col="value",
                                   order_by=["ts", "event_id"])
                         .sort("user_id")),
        }

    a, b = run(1), run(7)
    for k in a:
        pd.testing.assert_frame_equal(
            a[k].reset_index(drop=True), b[k].reset_index(drop=True),
            check_exact=True, obj=k)


def test_4h_ops_blocking_invariance():
    """The 4h wave gives IDENTICAL results at 1 input block and at 7 —
    combiner partials and key-complete partitions must never leak the
    blocking into values (ECDF counts, tail-share cents, OLS moments,
    Hurst chunks, Hill histogram, rolling-quantile windows, Granger
    window counts)."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    from conftest import to_pdf
    from s_tsfe_dl_ray.stages.quantile import grouped_ecdf_at
    from s_tsfe_dl_ray.stages.robust import hill_tail_index, tail_value_share
    from s_tsfe_dl_ray.stages.transform import rolling_quantile
    from s_tsfe_dl_ray.stages.trend import granger_probe, grouped_ols_xy, hurst_rs

    rng = np.random.default_rng(23)
    n = 3000
    t = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(np.sort(rng.integers(
            1_700_000_000_000_000, 1_700_600_000_000_000, n)
        ).astype("datetime64[us]")),
        "user_id": pa.array(rng.integers(1, 20, n)),
        "event_type": pa.array(rng.choice(["a", "b", "c"], n)),
        "value": pa.array(np.round(rng.normal(50, 20, n), 2)),
    })
    path = "/tmp/blockinv_4h.parquet"
    pq.write_table(t, path)

    def run(blocks):
        ds = ray.data.read_parquet(path, override_num_blocks=blocks)
        return {
            "ecdf": to_pdf(grouped_ecdf_at(
                ds, key="event_type", value_col="value",
                thresholds=(20.0, 50.0, 80.0))
                .sort(["event_type", "threshold"])),
            "tail": to_pdf(tail_value_share(
                ds, key="event_type", value_col="value", q=0.95)
                .sort("event_type")),
            # float-moment partials (like grouped_linear_trend) are
            # blocking-stable only to ~1e-13 relative — assert at the
            # 6-decimal contract the oracle guarantees, not bit-exact
            "ols~6": to_pdf(grouped_ols_xy(
                ds, key="event_type", x_col="event_id", y_col="value")
                .sort("event_type")).round(6),
            "hurst": to_pdf(hurst_rs(
                ds, key="user_id", value_col="value",
                order_by=["ts", "event_id"])),
            "hill": to_pdf(hill_tail_index(
                ds, key="event_type", value_col="value", k=50)),
            "rq": to_pdf(rolling_quantile(
                ds, keys=["user_id"], order_by=["ts", "event_id"],
                col="value", window=10, q=0.9)
                .sort(["user_id", "ts", "event_id"])),
            "granger": to_pdf(granger_probe(
                ds, ts_col="ts", type_col="event_type",
                type_cause="a", type_effect="b")),
        }

    a, b = run(1), run(7)
    for k in a:
        pd.testing.assert_frame_equal(
            a[k].reset_index(drop=True), b[k].reset_index(drop=True),
            check_exact=True, obj=k)


def test_4jk_ops_blocking_invariance():
    """Survival/experimentation/MI wave: bit-identical at 1 vs 7 input
    blocks (exact-count histograms merged before any sequential fold)."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray

    from conftest import to_pdf
    from s_tsfe_dl_ray.stages.cohort import (
        cumulative_hazard, logrank_test, survival_km)
    from s_tsfe_dl_ray.stages.distinct import mutual_information
    from s_tsfe_dl_ray.stages.metrics import (
        ab_ztest, cuped_ab, isotonic_calibration, multiclass_prf)

    rng = np.random.default_rng(31)
    n = 3000
    t = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(np.sort(rng.integers(
            1_700_000_000_000_000, 1_700_600_000_000_000, n)
        ).astype("datetime64[us]")),
        "user_id": pa.array(rng.integers(1, 40, n)),
        "event_type": pa.array(rng.choice(
            ["view", "click", "purchase"], n)),
        "value": pa.array(np.round(rng.normal(50, 20, n), 2)),
    })
    path = "/tmp/blockinv_4jk.parquet"
    pq.write_table(t, path)

    def run(blocks):
        ds = ray.data.read_parquet(path, override_num_blocks=blocks)
        ev = ds.map_batches(
            lambda b: pa.table({
                "user_id": b["user_id"], "ts": b["ts"],
                "event": pc.equal(b["event_type"], "purchase"),
                "grp": pc.equal(b["event_type"], "view"),
                "success": pc.equal(b["event_type"], "purchase"),
                "lab": pc.greater(b["value"], pa.scalar(60.0)),
                "score": b["value"],
                "vband": pc.cast(pc.less(b["value"],
                                         pa.scalar(50.0)), pa.int64()),
                "event_type": b["event_type"],
                "pred_type": pc.if_else(
                    pc.greater(b["value"], pa.scalar(55.0)),
                    pa.scalar("purchase"), b["event_type"])}),
            batch_format="pyarrow")
        return {
            "km": to_pdf(survival_km(ev, key="user_id", ts_col="ts",
                                     event_col="event").sort("bucket")),
            "haz": to_pdf(cumulative_hazard(
                ev, key="user_id", ts_col="ts",
                event_col="event").sort("bucket")),
            "lr": to_pdf(logrank_test(ev, key="user_id", ts_col="ts",
                                      event_col="event",
                                      group_col="grp")),
            "ab": to_pdf(ab_ztest(ev, unit_col="user_id",
                                  success_col="success")),
            "cuped": to_pdf(cuped_ab(ev, unit_col="user_id",
                                     ts_col="ts")),
            "mi": to_pdf(mutual_information(ev, col_a="event_type",
                                            col_b="vband")),
            "prf": to_pdf(multiclass_prf(
                ev, true_col="event_type", pred_col="pred_type")),
            "iso": to_pdf(isotonic_calibration(
                ev, score_col="score", label_col="lab")),
        }

    a, b = run(1), run(7)
    for k in a:
        pd.testing.assert_frame_equal(
            a[k].reset_index(drop=True), b[k].reset_index(drop=True),
            check_exact=True, obj=k)


def test_4n_ops_blocking_invariance():
    """The 4n wave gives IDENTICAL results at 1 input block and at 7 —
    ordered scans, exact-moment folds and the segment document-frequency
    count must never leak partitioning into values."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    from conftest import to_pdf
    from s_tsfe_dl_ray.stages.metrics import ndcg_at_k
    from s_tsfe_dl_ray.stages.robust import (page_hinkley, tukey_hsd,
                                             welch_ttest)
    from s_tsfe_dl_ray.stages.text import boilerplate_segments
    from s_tsfe_dl_ray.stages.trend import adf_test

    rng = np.random.default_rng(41)
    n = 3000
    t = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(np.sort(rng.integers(
            1_700_000_000_000_000, 1_700_600_000_000_000, n)
        ).astype("datetime64[us]")),
        "user_id": pa.array(rng.integers(1, 30, n)),
        "event_type": pa.array(rng.choice(["a", "b", "c"], n)),
        "value": pa.array(np.round(rng.normal(10, 3, n), 2)),
    })
    path = "/tmp/blockinv_4n.parquet"
    pq.write_table(t, path)

    words = rng.choice(["alpha", "beta", "gamma", "delta", "eps"], (60, 24))
    texts = [" ".join(r) for r in words]
    texts += texts[:10]  # planted cross-doc repeats
    docs = pa.table({
        "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
        "text": pa.array(texts),
    })
    dpath = "/tmp/blockinv_4n_docs.parquet"
    pq.write_table(docs, dpath)

    def run(blocks):
        ds = ray.data.read_parquet(path, override_num_blocks=blocks)
        dd = ray.data.read_parquet(dpath, override_num_blocks=blocks)
        return {
            "ph": to_pdf(page_hinkley(ds, key="user_id", ts_col="ts",
                                      value_col="value",
                                      id_col="event_id").sort("user_id")),
            "adf": to_pdf(adf_test(ds, key="user_id", value_col="value",
                                   order_by=["ts", "event_id"])
                          .sort("user_id")),
            "welch": to_pdf(welch_ttest(ds, group_col="event_type",
                                        value_col="value",
                                        group_a="a", group_b="b")),
            "tukey": to_pdf(tukey_hsd(ds, group_col="event_type",
                                      value_col="value")
                            .sort(["group_a", "group_b"])),
            "ndcg": to_pdf(ndcg_at_k(ds, key="user_id",
                                     item_col="event_type", ts_col="ts",
                                     id_col="event_id").sort("user_id")),
            "boiler": to_pdf(boilerplate_segments(dd, seg_len=8,
                                                  min_docs=2, k=10)),
        }

    a, b = run(1), run(7)
    assert len(a["boiler"]) > 0  # planted repeats must surface
    for k in a:
        pd.testing.assert_frame_equal(
            a[k].reset_index(drop=True), b[k].reset_index(drop=True),
            check_exact=True, obj=k)


def test_4p_ops_blocking_invariance():
    """The 4p wave gives IDENTICAL results at 1 input block and at 7 —
    the cointegration moment fold, the croston SES chains and the
    self-repetition first-turn attribution must never leak partitioning
    into values."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    from conftest import to_pdf
    from s_tsfe_dl_ray.stages.dialog import self_repetition
    from s_tsfe_dl_ray.stages.trend import (cointegration_probe,
                                            croston_forecast)

    rng = np.random.default_rng(43)
    n = 3000
    t = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(np.sort(rng.integers(
            1_700_000_000_000_000, 1_700_600_000_000_000, n)
        ).astype("datetime64[us]")),
        "user_id": pa.array(rng.integers(1, 30, n)),
        "event_type": pa.array(rng.choice(
            ["click", "purchase", "view"], n)),
        "value": pa.array(np.round(rng.normal(10, 3, n), 2)),
    })
    path = "/tmp/blockinv_4p.parquet"
    pq.write_table(t, path)

    words = rng.choice(["alpha", "beta", "gamma", "delta"], (400, 12))
    texts = [" ".join(r) for r in words]
    turns = pa.table({
        "conv_id": pa.array([f"c{i % 40}" for i in range(400)]),
        "turn_idx": pa.array(np.arange(400) // 40, pa.int32()),
        "text": pa.array(texts),
    })
    tpath = "/tmp/blockinv_4p_turns.parquet"
    pq.write_table(turns, tpath)

    def run(blocks):
        ds = ray.data.read_parquet(path, override_num_blocks=blocks)
        tt = ray.data.read_parquet(tpath, override_num_blocks=blocks)
        return {
            "coint": to_pdf(cointegration_probe(
                ds, ts_col="ts", type_col="event_type",
                type_x="click", type_y="purchase", tier="1h")),
            "croston": to_pdf(croston_forecast(
                ds, key="user_id", ts_col="ts").sort("user_id")),
            "selfrep": to_pdf(self_repetition(tt).sort("conv_id")),
        }

    a, b = run(1), run(7)
    assert a["selfrep"]["n_repeated"].sum() > 0  # repeats must surface
    for k in a:
        pd.testing.assert_frame_equal(
            a[k].reset_index(drop=True), b[k].reset_index(drop=True),
            check_exact=True, obj=k)


def test_croston_matches_naive_recursion():
    """Croston vs an independent naive per-key Python recursion
    (z_1 = d_1, q_1 = 1, SES on demand sizes and integer day gaps)."""
    import pandas as pd
    import pyarrow as pa
    import ray

    from conftest import to_pdf
    from s_tsfe_dl_ray.stages.trend import croston_forecast

    rng = np.random.default_rng(44)
    n = 2000
    day = 86_400_000_000
    t0 = 1_700_000_000_000_000
    ts = t0 + rng.integers(0, 60, n) * day + rng.integers(0, day, n)
    t = pa.table({
        "user_id": pa.array(rng.integers(1, 25, n)),
        "ts": pa.array(np.sort(ts).astype("datetime64[us]")),
    })
    out = to_pdf(croston_forecast(
        ray.data.from_arrow(t), key="user_id", ts_col="ts",
        alpha=0.3, tier="1d").sort("user_id"))

    df = t.to_pandas()
    df["widx"] = (df["ts"].astype("int64") // day).astype(np.int64)
    alpha = 0.3
    rows = []
    for uid, g in df.groupby("user_id", sort=True):
        per = g.groupby("widx", sort=True).size()
        widx = per.index.to_numpy(np.int64)
        d = per.to_numpy(np.float64)
        z, p = d[0], 1.0
        for k in range(1, len(d)):
            z = ((1 - alpha) * z + alpha * d[k]) / ((1 - alpha) + alpha)
            q = float(widx[k] - widx[k - 1])
            p = ((1 - alpha) * p + alpha * q) / ((1 - alpha) + alpha)
        rows.append((uid, len(d), z, p, z / p))
    exp = pd.DataFrame(rows, columns=["user_id", "n_demand_periods",
                                      "z_hat", "p_hat",
                                      "forecast_per_period"])
    got = out[["user_id", "n_demand_periods", "z_hat", "p_hat",
               "forecast_per_period"]].reset_index(drop=True)
    np.testing.assert_allclose(got["z_hat"], exp["z_hat"], rtol=1e-12)
    np.testing.assert_allclose(got["p_hat"], exp["p_hat"], rtol=1e-12)
    np.testing.assert_allclose(got["forecast_per_period"],
                               exp["forecast_per_period"], rtol=1e-12)
    assert (got["n_demand_periods"].to_numpy()
            == exp["n_demand_periods"].to_numpy()).all()


def test_4q_ops_blocking_invariance():
    """The 4q wave gives IDENTICAL results at 1 input block and at 7 —
    int-cent extreme moments, the chi-square grid fold and the
    last-turn argmax must never leak partitioning into values."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    from conftest import to_pdf
    from s_tsfe_dl_ray.stages.dialog import abandonment_by_hour
    from s_tsfe_dl_ray.stages.robust import category_mix_drift, grubbs_test

    rng = np.random.default_rng(45)
    n = 3000
    t = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(np.sort(rng.integers(
            1_700_000_000_000_000, 1_710_000_000_000_000, n)
        ).astype("datetime64[us]")),
        "user_id": pa.array(rng.integers(1, 30, n)),
        "event_type": pa.array(rng.choice(["a", "b", "c"], n)),
        "value": pa.array(np.round(rng.normal(10, 3, n), 2)),
    })
    path = "/tmp/blockinv_4q.parquet"
    pq.write_table(t, path)

    nt = 600
    turns = pa.table({
        "conv_id": pa.array([f"c{i % 50}" for i in range(nt)]),
        "turn_idx": pa.array(np.arange(nt) // 50, pa.int32()),
        "role": pa.array(rng.choice(["user", "assistant", "tool"], nt)),
        "ts": pa.array(np.sort(rng.integers(
            1_700_000_000_000_000, 1_700_100_000_000_000, nt)
        ).astype("datetime64[us]")),
    })
    tpath = "/tmp/blockinv_4q_turns.parquet"
    pq.write_table(turns, tpath)

    def run(blocks):
        ds = ray.data.read_parquet(path, override_num_blocks=blocks)
        tt = ray.data.read_parquet(tpath, override_num_blocks=blocks)
        return {
            "grubbs": to_pdf(grubbs_test(
                ds, group_col="event_type",
                value_col="value").sort("event_type")),
            "drift": to_pdf(category_mix_drift(
                ds, ts_col="ts", cat_col="event_type",
                period="1mo").sort("period_start")),
            "abandon": to_pdf(abandonment_by_hour(tt).sort("hour")),
        }

    a, b = run(1), run(7)
    assert a["drift"]["chi2"].notna().any()
    for k in a:
        pd.testing.assert_frame_equal(
            a[k].reset_index(drop=True), b[k].reset_index(drop=True),
            check_exact=True, obj=k)


def test_4r_ops_blocking_invariance():
    """The 4r wave gives IDENTICAL results at 1 input block and at 7 —
    the log-odds totals closure, the distinct-window availability fold
    and the per-partition adoption denominator must never leak
    partitioning into values."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    from conftest import to_pdf
    from s_tsfe_dl_ray.stages.activity import availability_profile
    from s_tsfe_dl_ray.stages.dialog import tool_adoption
    from s_tsfe_dl_ray.stages.text import distinctive_tokens

    rng = np.random.default_rng(46)
    n = 3000
    t = pa.table({
        "user_id": pa.array(rng.integers(1, 30, n)),
        "ts": pa.array(np.sort(rng.integers(
            1_700_000_000_000_000, 1_700_600_000_000_000, n)
        ).astype("datetime64[us]")),
    })
    path = "/tmp/blockinv_4r.parquet"
    pq.write_table(t, path)

    words = rng.choice(["alpha", "beta", "gamma", "delta", "eps"],
                       (300, 20))
    docs = pa.table({
        "source": pa.array([f"s{i % 3}" for i in range(300)]),
        "text": pa.array([" ".join(r) for r in words]),
    })
    dpath = "/tmp/blockinv_4r_docs.parquet"
    pq.write_table(docs, dpath)

    nt = 600
    turns = pa.table({
        "conv_id": pa.array([f"c{i % 50}" for i in range(nt)]),
        "turn_idx": pa.array(np.arange(nt) // 50, pa.int32()),
        "tool": pa.array(np.where(rng.random(nt) < 0.2,
                                  rng.choice(["bash", "sql"], nt),
                                  "").astype(object)),
    })
    tpath = "/tmp/blockinv_4r_turns.parquet"
    pq.write_table(turns, tpath)

    def run(blocks):
        ds = ray.data.read_parquet(path, override_num_blocks=blocks)
        dd = ray.data.read_parquet(dpath, override_num_blocks=blocks)
        tt = ray.data.read_parquet(tpath, override_num_blocks=blocks)
        return {
            "avail": to_pdf(availability_profile(
                ds, key="user_id", ts_col="ts").sort("user_id")),
            "dtok": to_pdf(distinctive_tokens(dd).sort(
                ["source", "score", "token"],
                descending=[False, True, False])),
            "adopt": to_pdf(tool_adoption(tt).sort("tool")),
        }

    a, b = run(1), run(7)
    assert len(a["dtok"]) > 0 and len(a["adopt"]) > 0
    for k in a:
        pd.testing.assert_frame_equal(
            a[k].reset_index(drop=True), b[k].reset_index(drop=True),
            check_exact=True, obj=k)


def test_4s_ops_blocking_invariance():
    """The 4s wave gives IDENTICAL results at 1 input block and at 7 —
    the dense-grid trailing moments, the cohort cumsum and the pair
    dot/norm folds must never leak partitioning into values."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    from conftest import to_pdf
    from s_tsfe_dl_ray.stages.cohort import cohort_ltv
    from s_tsfe_dl_ray.stages.text import source_style_cosine
    from s_tsfe_dl_ray.stages.trend import rolling_grid_corr

    rng = np.random.default_rng(47)
    n = 3000
    t = pa.table({
        "user_id": pa.array(rng.integers(1, 30, n)),
        "ts": pa.array(np.sort(rng.integers(
            1_700_000_000_000_000, 1_700_600_000_000_000, n)
        ).astype("datetime64[us]")),
        "event_type": pa.array(rng.choice(
            ["click", "purchase", "view"], n)),
        "value": pa.array(np.round(rng.normal(10, 3, n), 2)),
    })
    path = "/tmp/blockinv_4s.parquet"
    pq.write_table(t, path)

    words = rng.choice(["alpha", "beta", "gamma", "delta", "eps"],
                       (300, 20))
    docs = pa.table({
        "source": pa.array([f"s{i % 3}" for i in range(300)]),
        "text": pa.array([" ".join(r) for r in words]),
    })
    dpath = "/tmp/blockinv_4s_docs.parquet"
    pq.write_table(docs, dpath)

    def run(blocks):
        ds = ray.data.read_parquet(path, override_num_blocks=blocks)
        dd = ray.data.read_parquet(dpath, override_num_blocks=blocks)
        return {
            "corr": to_pdf(rolling_grid_corr(
                ds, ts_col="ts", type_col="event_type",
                type_a="click", type_b="purchase")),
            "ltv": to_pdf(cohort_ltv(
                ds, key="user_id", ts_col="ts", value_col="value")
                .sort(["cohort_day", "age_days"])),
            "style": to_pdf(source_style_cosine(dd)
                            .sort(["source_a", "source_b"])),
        }

    a, b = run(1), run(7)
    assert len(a["corr"]) > 0 and len(a["ltv"]) > 0 and len(a["style"]) == 3
    for k in a:
        pd.testing.assert_frame_equal(
            a[k].reset_index(drop=True), b[k].reset_index(drop=True),
            check_exact=True, obj=k)


def test_4t_ops_blocking_invariance():
    """The 4t wave gives IDENTICAL results at 1 input block and at 7 —
    the SES chain, the pooled ECDF grid and the rank-decile cut must
    never leak partitioning into values."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    from conftest import to_pdf
    from s_tsfe_dl_ray.stages.activity import lorenz_deciles
    from s_tsfe_dl_ray.stages.robust import pairwise_ks
    from s_tsfe_dl_ray.stages.trend import theta_forecast

    rng = np.random.default_rng(48)
    n = 3000
    t = pa.table({
        "user_id": pa.array(rng.integers(1, 30, n)),
        "ts": pa.array(np.sort(rng.integers(
            1_700_000_000_000_000, 1_703_000_000_000_000, n)
        ).astype("datetime64[us]")),
    })
    path = "/tmp/blockinv_4t.parquet"
    pq.write_table(t, path)

    docs = pa.table({
        "source": pa.array([f"s{i % 4}" for i in range(800)]),
        "n_chars": pa.array(rng.integers(10, 200, 800)),
    })
    dpath = "/tmp/blockinv_4t_docs.parquet"
    pq.write_table(docs, dpath)

    def run(blocks):
        ds = ray.data.read_parquet(path, override_num_blocks=blocks)
        dd = ray.data.read_parquet(dpath, override_num_blocks=blocks)
        return {
            "theta": to_pdf(theta_forecast(
                ds, key="user_id", ts_col="ts").sort("user_id")),
            "lorenz": to_pdf(lorenz_deciles(ds, key_col="user_id")),
            "ks": to_pdf(pairwise_ks(
                dd, group_col="source", value_col="n_chars")
                .sort(["source_a", "source_b"])),
        }

    a, b = run(1), run(7)
    assert len(a["theta"]) > 0 and len(a["ks"]) == 6
    for k in a:
        pd.testing.assert_frame_equal(
            a[k].reset_index(drop=True), b[k].reset_index(drop=True),
            check_exact=True, obj=k)


def test_conv_compressibility_golden_and_invariance():
    """conv_compressibility: zlib golden pinned per conversation, and
    bit-identical at 1 vs 7 input blocks (text crosses one conv-hash
    exchange; ordering inside the fold must make it deterministic)."""
    import zlib

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    from conftest import to_pdf
    from s_tsfe_dl_ray.stages.dialog import conv_compressibility

    rng = np.random.default_rng(49)
    nt = 400
    words = rng.choice(["alpha", "beta", "gamma", "repeat repeat"],
                       (nt, 15))
    texts = [" ".join(r) for r in words]
    turns = pa.table({
        "conv_id": pa.array([f"c{i % 25}" for i in range(nt)]),
        "turn_idx": pa.array(np.arange(nt) // 25, pa.int32()),
        "text": pa.array(texts),
    })
    tpath = "/tmp/blockinv_4u_turns.parquet"
    pq.write_table(turns, tpath)

    def run(blocks):
        tt = ray.data.read_parquet(tpath, override_num_blocks=blocks)
        return to_pdf(conv_compressibility(tt).sort("conv_id"))

    a, b = run(1), run(7)
    pd.testing.assert_frame_equal(a.reset_index(drop=True),
                                  b.reset_index(drop=True),
                                  check_exact=True)

    # independent golden: recompute conv c3 by hand
    df = turns.to_pandas()
    g = df[df.conv_id == "c3"].sort_values("turn_idx")
    blob = "\n".join(g.text.tolist()).encode()
    row = a[a.conv_id == "c3"].iloc[0]
    assert int(row.raw_bytes) == len(blob)
    assert int(row.compressed_bytes) == len(zlib.compress(blob, 6))
    assert int(row.n_turns) == len(g)
    # templated text must compress hard
    assert row.compression_ratio < 0.5


def test_pagerank_properties_and_invariance():
    """pagerank: sums to ~1 on a connected graph, ranks the hub of a
    star highest, and is bit-identical at 1 vs 7 input blocks."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    from conftest import to_pdf
    from s_tsfe_dl_ray.stages.cluster import pagerank_exact

    # star: node 0 connected to 1..10, plus a 11-12-13 triangle
    a = [0] * 10 + [11, 12, 13]
    b = list(range(1, 11)) + [12, 13, 11]
    edges = pa.table({"member_a": pa.array(a, pa.int64()),
                      "member_b": pa.array(b, pa.int64())})
    path = "/tmp/blockinv_4x_edges.parquet"
    pq.write_table(edges, path)

    def run(blocks):
        e = ray.data.read_parquet(path, override_num_blocks=blocks)
        return to_pdf(pagerank_exact(e).sort("node"))

    one, seven = run(1), run(7)
    pd.testing.assert_frame_equal(one.reset_index(drop=True),
                                  seven.reset_index(drop=True),
                                  check_exact=True)
    assert abs(one.pagerank.sum() - 1.0) < 1e-9
    ranks = dict(zip(one.node, one.pagerank))
    assert ranks[0] == max(ranks.values())          # star hub dominates
    assert abs(ranks[11] - ranks[12]) < 1e-15       # triangle symmetry
