"""Empty-input robustness: every round-4f operator degrades to an empty
(or degenerate single-row) result instead of crashing when the input has
zero rows — the behavior a partition-pruned read produces in production."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray


def _empty_events() -> "ray.data.Dataset":
    t = pa.table({
        "event_id": pa.array([], pa.int64()),
        "user_id": pa.array([], pa.int64()),
        "ts": pa.array([], pa.timestamp("us")),
        "event_type": pa.array([], pa.string()),
        "value": pa.array([], pa.float64()),
    })
    return ray.data.from_arrow(t)


def test_activity_ops_empty():
    from s_tsfe_dl_ray.stages.activity import (
        active_users, active_users_approx, new_vs_returning)

    ds = _empty_events()
    assert len(active_users(ds).to_pandas()) == 0
    assert len(new_vs_returning(ds).to_pandas()) == 0
    assert len(active_users_approx(ds).to_pandas()) == 0


def test_interval_and_rank_ops_empty():
    from s_tsfe_dl_ray.stages.metrics import grouped_auc
    from s_tsfe_dl_ray.stages.trend import (
        hrv_stats, naive_forecast_ratio, poincare_descriptors)

    ds = _empty_events()
    for out in (
        naive_forecast_ratio(ds, key="user_id", order_by=["ts", "event_id"],
                             value_col="value"),
        poincare_descriptors(ds, key="user_id",
                             order_by=["ts", "event_id"], ts_col="ts"),
        hrv_stats(ds, key="user_id", order_by=["ts", "event_id"],
                  ts_col="ts"),
        grouped_auc(ds.map_batches(
            lambda t: pa.table({"user_id": t["user_id"],
                                "score": t["value"],
                                "y": pa.array([], pa.bool_())}),
            batch_format="pyarrow"),
            key="user_id", score_col="score", label_col="y"),
    ):
        assert len(out.to_pandas()) == 0


def test_scalar_fold_ops_empty_or_degenerate():
    from s_tsfe_dl_ray.stages.robust import anova_oneway
    from s_tsfe_dl_ray.stages.sessionize import session_conversion

    # zero upstream groups mean the final fold never fires: an empty
    # frame (not a crash) is the documented degradation; if a row does
    # come out it must be the all-zero degenerate
    ds = _empty_events()
    out = session_conversion(ds, keys=["user_id"], ts_col="ts",
                             type_col="event_type", target="purchase",
                             order_by=["ts", "event_id"]).to_pandas()
    assert len(out) == 0 or out.iloc[0]["n_sessions"] == 0
    out = anova_oneway(ds, group_col="event_type",
                       value_col="value").to_pandas()
    assert len(out) == 0 or out.iloc[0]["n_rows"] == 0


def test_round4g_ops_empty():
    """The 4g wave degrades cleanly on 0-row input (no crash; empty or
    schema-stable output)."""
    import pandas as pd
    import pyarrow as pa
    import ray

    from s_tsfe_dl_ray.stages.activity import activity_gini, hour_entropy
    from s_tsfe_dl_ray.stages.robust import psi_daily, runs_test, trimmed_mean
    from s_tsfe_dl_ray.stages.scan import out_of_order_stats, record_highs
    from s_tsfe_dl_ray.stages.trend import holt_winters, ljung_box, stl_lite

    empty = ray.data.from_arrow(pa.table({
        "event_id": pa.array([], pa.int64()),
        "ts": pa.array([], pa.timestamp("us")),
        "user_id": pa.array([], pa.int64()),
        "event_type": pa.array([], pa.string()),
        "value": pa.array([], pa.float64()),
    }))
    for out in [
        activity_gini(empty),
        hour_entropy(empty),
        runs_test(empty, key="user_id", value_col="value",
                  order_by=["ts", "event_id"]),
        trimmed_mean(empty, key="user_id", value_col="value",
                     id_col="event_id"),
        psi_daily(empty),
        out_of_order_stats(empty),
        record_highs(empty),
        stl_lite(empty),
        ljung_box(empty, key="user_id", value_col="value",
                  order_by=["ts", "event_id"]),
        holt_winters(empty),
    ]:
        df = out.to_pandas()
        assert len(df) == 0


def test_ecdf_ols_tailshare_empty():
    from s_tsfe_dl_ray.stages.quantile import grouped_ecdf_at
    from s_tsfe_dl_ray.stages.robust import tail_value_share
    from s_tsfe_dl_ray.stages.trend import grouped_ols_xy

    ds = _empty_events()
    for out in [
        grouped_ecdf_at(ds, key="event_type", value_col="value",
                        thresholds=(1.0, 10.0)),
        tail_value_share(ds, key="event_type", value_col="value"),
        grouped_ols_xy(ds, key="event_type", x_col="event_id",
                       y_col="value"),
    ]:
        assert len(out.to_pandas()) == 0


def test_hill_tail_empty_and_nonpositive():
    import ray

    from s_tsfe_dl_ray.stages.robust import hill_tail_index

    assert len(hill_tail_index(_empty_events(), key="event_type",
                               value_col="value").to_pandas()) == 0
    # all-nonpositive values → no positive histogram → no rows
    neg = ray.data.from_arrow(pa.table({
        "event_type": pa.array(["a"] * 8),
        "value": pa.array([-1.0, 0.0] * 4),
    }))
    assert len(hill_tail_index(neg, key="event_type",
                               value_col="value").to_pandas()) == 0


def test_multiclass_prf_empty():
    import ray

    from s_tsfe_dl_ray.stages.metrics import multiclass_prf

    empty = ray.data.from_arrow(pa.table({
        "y": pa.array([], pa.string()),
        "yhat": pa.array([], pa.string())}))
    out = multiclass_prf(empty, true_col="y", pred_col="yhat").to_pandas()
    assert len(out) == 0


def test_hurst_empty_and_short():
    import ray

    from s_tsfe_dl_ray.stages.trend import hurst_rs

    assert len(hurst_rs(_empty_events(), key="user_id",
                        value_col="value",
                        order_by=["ts", "event_id"]).to_pandas()) == 0
    # below one full chunk → no row (matches the SQL twin's m=32 filter)
    short = ray.data.from_arrow(pa.table({
        "event_id": pa.array(list(range(10)), pa.int64()),
        "user_id": pa.array([1] * 10, pa.int64()),
        "ts": pa.array(np.arange(10).astype("datetime64[us]")),
        "value": pa.array(np.linspace(1, 2, 10)),
    }))
    assert len(hurst_rs(short, key="user_id", value_col="value",
                        order_by=["ts", "event_id"]).to_pandas()) == 0


def test_granger_empty_or_degenerate():
    from s_tsfe_dl_ray.stages.trend import granger_probe

    out = granger_probe(_empty_events(), ts_col="ts",
                        type_col="event_type", type_cause="click",
                        type_effect="purchase").to_pandas()
    # zero blocks (fold never fires) or the degenerate 0-pair row
    assert len(out) == 0 or (out.iloc[0]["n_pairs"] == 0
                             and pd.isna(out.iloc[0]["f_stat"]))


def test_survival_experiment_ops_empty():
    import pyarrow as pa
    import ray

    from s_tsfe_dl_ray.stages.cohort import (
        cumulative_hazard, logrank_test, survival_km)
    from s_tsfe_dl_ray.stages.distinct import mutual_information
    from s_tsfe_dl_ray.stages.metrics import (
        ab_ztest, cuped_ab, isotonic_calibration)

    empty = ray.data.from_arrow(pa.table({
        "user_id": pa.array([], pa.int64()),
        "ts": pa.array([], pa.timestamp("us")),
        "event": pa.array([], pa.bool_()),
        "grp": pa.array([], pa.bool_()),
        "success": pa.array([], pa.bool_()),
        "a": pa.array([], pa.string()),
        "b": pa.array([], pa.int64()),
        "score": pa.array([], pa.float64()),
        "lab": pa.array([], pa.bool_()),
    }))
    assert len(survival_km(empty, key="user_id", ts_col="ts",
                           event_col="event").to_pandas()) == 0
    assert len(cumulative_hazard(empty, key="user_id", ts_col="ts",
                                 event_col="event").to_pandas()) == 0
    assert len(logrank_test(empty, key="user_id", ts_col="ts",
                            event_col="event",
                            group_col="grp").to_pandas()) == 0
    assert len(mutual_information(empty, col_a="a",
                                  col_b="b").to_pandas()) == 0
    assert len(isotonic_calibration(empty, score_col="score",
                                    label_col="lab").to_pandas()) == 0
    ab = ab_ztest(empty, unit_col="user_id",
                  success_col="success").to_pandas()
    assert len(ab) == 0 or int(ab.iloc[0]["n_a"] + ab.iloc[0]["n_b"]) == 0
    cp = cuped_ab(empty, unit_col="user_id", ts_col="ts").to_pandas()
    assert len(cp) == 0


def test_round4m_ops_empty():
    from s_tsfe_dl_ray.stages.activity import active_interval_counts
    from s_tsfe_dl_ray.stages.metrics import pareto_coverage, wilson_rate_ci
    from s_tsfe_dl_ray.stages.robust import gumbel_return_level
    from s_tsfe_dl_ray.stages.sessionize import session_paths
    from s_tsfe_dl_ray.stages.stream import rate_limit_drops
    from s_tsfe_dl_ray.stages.transform import loo_target_encoding
    from s_tsfe_dl_ray.stages.trend import lead_lag_xcorr

    ds = _empty_events()
    for out in (
        wilson_rate_ci(ds, ts_col="ts", type_col="event_type",
                       success_value="error"),
        lead_lag_xcorr(ds, ts_col="ts", type_col="event_type",
                       type_a="click", type_b="purchase"),
        loo_target_encoding(ds, key_col="event_type", value_col="value",
                            id_col="event_id"),
        pareto_coverage(ds, key_col="user_id", value_col="value"),
        active_interval_counts(ds, key="user_id", ts_col="ts"),
        rate_limit_drops(ds, key="user_id", ts_col="ts", limit=2),
        gumbel_return_level(ds, ts_col="ts", value_col="value"),
        session_paths(ds, key="user_id", ts_col="ts",
                      type_col="event_type",
                      order_by=["ts", "event_id"]),
    ):
        assert len(out.to_pandas()) == 0


def test_round4n_ops_empty():
    from s_tsfe_dl_ray.stages.metrics import ndcg_at_k
    from s_tsfe_dl_ray.stages.robust import (page_hinkley, tukey_hsd,
                                             welch_ttest)
    from s_tsfe_dl_ray.stages.text import boilerplate_segments
    from s_tsfe_dl_ray.stages.trend import adf_test

    ds = _empty_events()
    for out in (
        page_hinkley(ds, key="user_id", ts_col="ts", value_col="value",
                     id_col="event_id"),
        adf_test(ds, key="user_id", value_col="value",
                 order_by=["ts", "event_id"]),
        ndcg_at_k(ds, key="user_id", item_col="event_type", ts_col="ts",
                  id_col="event_id"),
        tukey_hsd(ds, group_col="event_type", value_col="value"),
    ):
        assert len(out.to_pandas()) == 0

    # welch over zero rows: one row of NULLs with zero counts (the
    # single-row scalar-fold degradation, like ab_ztest)
    w = welch_ttest(ds, group_col="event_type", value_col="value",
                    group_a="click", group_b="purchase").to_pandas()
    if len(w):
        assert int(w.n_a.iloc[0]) == 0 and int(w.n_b.iloc[0]) == 0
        assert np.isnan(w.t_stat.iloc[0])

    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "text": pa.array([], pa.string())}))
    assert len(boilerplate_segments(docs).to_pandas()) == 0

    turns = ray.data.from_arrow(pa.table({
        "conv_id": pa.array([], pa.string()),
        "turn_idx": pa.array([], pa.int32()),
        "role": pa.array([], pa.string()),
        "text": pa.array([], pa.string())}))
    from s_tsfe_dl_ray.stages.dialog import verbosity_trend
    assert len(verbosity_trend(turns).to_pandas()) == 0


def test_round4p_ops_empty():
    from s_tsfe_dl_ray.stages.dialog import self_repetition
    from s_tsfe_dl_ray.stages.trend import (cointegration_probe,
                                            croston_forecast)

    ds = _empty_events()
    assert len(croston_forecast(ds, key="user_id",
                                ts_col="ts").to_pandas()) == 0

    # cointegration over zero rows: the single-row scalar-fold
    # degradation — n_windows = 0, every statistic NULL
    c = cointegration_probe(ds, ts_col="ts", type_col="event_type",
                            type_x="click", type_y="purchase").to_pandas()
    if len(c):
        assert int(c.n_windows.iloc[0]) == 0
        assert np.isnan(c.beta.iloc[0]) and np.isnan(c.df_t.iloc[0])

    turns = ray.data.from_arrow(pa.table({
        "conv_id": pa.array([], pa.string()),
        "turn_idx": pa.array([], pa.int32()),
        "text": pa.array([], pa.string())}))
    assert len(self_repetition(turns).to_pandas()) == 0


def test_round4q_ops_empty():
    from s_tsfe_dl_ray.stages.dialog import abandonment_by_hour
    from s_tsfe_dl_ray.stages.robust import category_mix_drift, grubbs_test
    from s_tsfe_dl_ray.stages.text import flesch_readability

    ds = _empty_events()
    assert len(grubbs_test(ds, group_col="event_type",
                           value_col="value").to_pandas()) == 0
    assert len(category_mix_drift(ds, ts_col="ts", cat_col="event_type",
                                  period="1mo").to_pandas()) == 0

    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "text": pa.array([], pa.string())}))
    assert len(flesch_readability(docs).to_pandas()) == 0

    turns = ray.data.from_arrow(pa.table({
        "conv_id": pa.array([], pa.string()),
        "turn_idx": pa.array([], pa.int32()),
        "role": pa.array([], pa.string()),
        "ts": pa.array([], pa.timestamp("us"))}))
    assert len(abandonment_by_hour(turns).to_pandas()) == 0


def test_round4r_ops_empty():
    from s_tsfe_dl_ray.stages.activity import availability_profile
    from s_tsfe_dl_ray.stages.dialog import tool_adoption
    from s_tsfe_dl_ray.stages.text import distinctive_tokens

    ds = _empty_events()
    assert len(availability_profile(ds, key="user_id",
                                    ts_col="ts").to_pandas()) == 0

    docs = ray.data.from_arrow(pa.table({
        "source": pa.array([], pa.string()),
        "text": pa.array([], pa.string())}))
    assert len(distinctive_tokens(docs).to_pandas()) == 0

    turns = ray.data.from_arrow(pa.table({
        "conv_id": pa.array([], pa.string()),
        "turn_idx": pa.array([], pa.int32()),
        "tool": pa.array([], pa.string())}))
    assert len(tool_adoption(turns).to_pandas()) == 0


def test_round4s_ops_empty():
    from s_tsfe_dl_ray.stages.cohort import cohort_ltv
    from s_tsfe_dl_ray.stages.text import source_style_cosine
    from s_tsfe_dl_ray.stages.trend import rolling_grid_corr

    ds = _empty_events()
    assert len(rolling_grid_corr(ds, ts_col="ts", type_col="event_type",
                                 type_a="click",
                                 type_b="purchase").to_pandas()) == 0
    assert len(cohort_ltv(ds, key="user_id", ts_col="ts",
                          value_col="value").to_pandas()) == 0

    docs = ray.data.from_arrow(pa.table({
        "source": pa.array([], pa.string()),
        "text": pa.array([], pa.string())}))
    assert len(source_style_cosine(docs).to_pandas()) == 0


def test_round4t_ops_empty():
    from s_tsfe_dl_ray.stages.activity import lorenz_deciles
    from s_tsfe_dl_ray.stages.robust import pairwise_ks
    from s_tsfe_dl_ray.stages.trend import theta_forecast

    ds = _empty_events()
    assert len(theta_forecast(ds, key="user_id",
                              ts_col="ts").to_pandas()) == 0
    assert len(lorenz_deciles(ds, key_col="user_id").to_pandas()) == 0

    docs = ray.data.from_arrow(pa.table({
        "source": pa.array([], pa.string()),
        "n_chars": pa.array([], pa.int64())}))
    assert len(pairwise_ks(docs, group_col="source",
                           value_col="n_chars").to_pandas()) == 0


def test_round4u_ops_empty():
    from s_tsfe_dl_ray.stages.dialog import conv_compressibility
    from s_tsfe_dl_ray.stages.similarity import dim_participation

    emb = ray.data.from_arrow(pa.table({
        "embedding": pa.array([], pa.list_(pa.float32()))}))
    out = dim_participation(emb).to_pandas()
    assert len(out) == 0

    turns = ray.data.from_arrow(pa.table({
        "conv_id": pa.array([], pa.string()),
        "turn_idx": pa.array([], pa.int32()),
        "text": pa.array([], pa.string())}))
    assert len(conv_compressibility(turns).to_pandas()) == 0


def test_round4v_ops_empty():
    from s_tsfe_dl_ray.stages.dialog import two_step_transitions
    from s_tsfe_dl_ray.stages.text import quality_pass_rate

    ds = _empty_events()
    assert len(two_step_transitions(
        ds, conv_col="user_id", role_col="event_type",
        order_by=["ts", "event_id"]).to_pandas()) == 0

    docs = ray.data.from_arrow(pa.table({
        "source": pa.array([], pa.string()),
        "text": pa.array([], pa.string())}))
    assert len(quality_pass_rate(docs).to_pandas()) == 0


def test_round4w_ops_empty():
    from s_tsfe_dl_ray.stages.quantile import interarrival_quantiles

    ds = _empty_events()
    assert len(interarrival_quantiles(
        ds, key="event_type", ts_col="ts",
        order_by=["ts", "event_id"]).to_pandas()) == 0


def test_round4x_ops_empty():
    from s_tsfe_dl_ray.stages.cluster import pagerank_exact

    edges = ray.data.from_arrow(pa.table({
        "member_a": pa.array([], pa.int64()),
        "member_b": pa.array([], pa.int64())}))
    assert len(pagerank_exact(edges).to_pandas()) == 0


def test_round4y_ops_empty():
    from s_tsfe_dl_ray.stages.dialog import readability_by_role
    from s_tsfe_dl_ray.stages.text import heaps_law

    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "text": pa.array([], pa.string())}))
    assert len(heaps_law(docs).to_pandas()) == 0

    turns = ray.data.from_arrow(pa.table({
        "role": pa.array([], pa.string()),
        "text": pa.array([], pa.string())}))
    assert len(readability_by_role(turns).to_pandas()) == 0


def test_round4z_ops_empty():
    from s_tsfe_dl_ray.stages.funnel import linear_attribution

    assert len(linear_attribution(_empty_events()).to_pandas()) == 0


def test_round5a_ops_empty():
    from s_tsfe_dl_ray.stages.dialog import echo_rate
    from s_tsfe_dl_ray.stages.trend import grid_lag_autocorr

    ds = _empty_events()
    assert len(grid_lag_autocorr(ds, ts_col="ts", tier="1d",
                                 lag=7).to_pandas()) == 0

    turns = ray.data.from_arrow(pa.table({
        "conv_id": pa.array([], pa.string()),
        "turn_idx": pa.array([], pa.int32()),
        "role": pa.array([], pa.string()),
        "text": pa.array([], pa.string())}))
    assert len(echo_rate(turns).to_pandas()) == 0


def test_round5b_ops_empty():
    from s_tsfe_dl_ray.stages.activity import activity_streaks

    ds = _empty_events()
    assert len(activity_streaks(ds, key="user_id",
                                ts_col="ts").to_pandas()) == 0


def test_round5c_ops_empty():
    from s_tsfe_dl_ray.stages.dialog import prompt_response_curve

    turns = ray.data.from_arrow(pa.table({
        "conv_id": pa.array([], pa.string()),
        "turn_idx": pa.array([], pa.int32()),
        "role": pa.array([], pa.string()),
        "text": pa.array([], pa.string())}))
    assert len(prompt_response_curve(turns).to_pandas()) == 0


def test_round5f_ops_empty():
    from s_tsfe_dl_ray.stages.text import collocations_pmi

    docs = ray.data.from_arrow(pa.table({
        "text": pa.array([], pa.string())}))
    assert len(collocations_pmi(docs).to_pandas()) == 0


def test_round5h_ops_empty():
    from s_tsfe_dl_ray.stages.scan import type_persistence
    from s_tsfe_dl_ray.stages.trend import forecast_backtest

    ds = _empty_events()
    assert len(forecast_backtest(ds, ts_col="ts",
                                 key_col="event_type").to_pandas()) == 0
    assert len(type_persistence(
        ds, key="user_id", type_col="event_type",
        order_by=["ts", "event_id"]).to_pandas()) == 0


def test_round5l_ops_empty():
    from s_tsfe_dl_ray.stages.distinct import categorical_association
    from s_tsfe_dl_ray.stages.quantile import grouped_value_profile

    ds = _empty_events()
    assert len(categorical_association(
        ds, col_a="event_type", col_b="user_id").to_pandas()) == 0
    cust = ray.data.from_arrow(pa.table({
        "c_mktsegment": pa.array([], pa.string()),
        "c_acctbal": pa.array([], pa.float64())}))
    assert len(grouped_value_profile(
        cust, value_col="c_acctbal",
        keys=["c_mktsegment"]).to_pandas()) == 0


def test_round5m_ops_empty():
    from s_tsfe_dl_ray.stages.robust import kruskal_wallis

    ds = _empty_events()
    assert len(kruskal_wallis(
        ds, group_col="event_type", value_col="value").to_pandas()) == 0


def test_round5n_ops_empty():
    from s_tsfe_dl_ray.stages.text import ngram_novelty

    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "source": pa.array([], pa.string()),
        "text": pa.array([], pa.string())}))
    assert len(ngram_novelty(docs).to_pandas()) == 0


def test_round5o_ops_empty():
    from s_tsfe_dl_ray.stages.dedup import edit_distance_pairs

    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "text": pa.array([], pa.string())}))
    assert len(edit_distance_pairs(docs).to_pandas()) == 0


def test_round5p_ops_empty():
    from s_tsfe_dl_ray.stages.distinct import chi2_independence
    from s_tsfe_dl_ray.stages.robust import mann_kendall

    daily = ray.data.from_arrow(pa.table({
        "user_id": pa.array([], pa.int64()),
        "d": pa.array([], pa.int64()),
        "sv": pa.array([], pa.int64())}))
    assert len(mann_kendall(daily, key="user_id", order_col="d",
                            value_col="sv").to_pandas()) == 0
    cats = ray.data.from_arrow(pa.table({
        "a": pa.array([], pa.string()),
        "b": pa.array([], pa.string())}))
    assert len(chi2_independence(cats, col_a="a",
                                 col_b="b").to_pandas()) == 0


def test_round5q_ops_empty():
    from s_tsfe_dl_ray.stages.robust import friedman_test, ordinal_association

    binned = ray.data.from_arrow(pa.table({
        "qa": pa.array([], pa.int64()),
        "db": pa.array([], pa.int64())}))
    assert len(ordinal_association(binned, col_a="qa",
                                   col_b="db").to_pandas()) == 0
    cells = ray.data.from_arrow(pa.table({
        "d": pa.array([], pa.int64()),
        "ty": pa.array([], pa.string()),
        "ci": pa.array([], pa.int64())}))
    assert len(friedman_test(cells, block_col="d", treat_col="ty",
                             value_col="ci").to_pandas()) == 0


def test_round5r_ops_empty():
    from s_tsfe_dl_ray.stages.robust import cliffs_delta, durbin_watson

    pairs = ray.data.from_arrow(pa.table({
        "g": pa.array([], pa.int64()),
        "v": pa.array([], pa.int64())}))
    assert len(cliffs_delta(pairs, group_col="g",
                            value_col="v").to_pandas()) == 0
    daily = ray.data.from_arrow(pa.table({
        "user_id": pa.array([], pa.int64()),
        "d": pa.array([], pa.int64()),
        "sv": pa.array([], pa.int64())}))
    assert len(durbin_watson(daily, key="user_id", order_col="d",
                             value_col="sv").to_pandas()) == 0


def test_round5t_ops_empty():
    from s_tsfe_dl_ray.stages.robust import yuen_trimmed_t

    pairs = ray.data.from_arrow(pa.table({
        "g": pa.array([], pa.int64()),
        "v": pa.array([], pa.int64())}))
    assert len(yuen_trimmed_t(pairs, group_col="g",
                              value_col="v").to_pandas()) == 0


def test_round5u_ops_empty():
    from s_tsfe_dl_ray.stages.robust import (binary_runs_test,
                                             seasonal_mann_kendall)

    daily = ray.data.from_arrow(pa.table({
        "season": pa.array([], pa.int64()),
        "d": pa.array([], pa.int64()),
        "sv": pa.array([], pa.int64())}))
    assert len(seasonal_mann_kendall(
        daily, season_col="season", order_col="d",
        value_col="sv").to_pandas()) == 0
    seq = ray.data.from_arrow(pa.table({
        "conv_id": pa.array([], pa.int64()),
        "ts": pa.array([], pa.timestamp("us")),
        "turn_idx": pa.array([], pa.int64()),
        "b": pa.array([], pa.int64())}))
    assert len(binary_runs_test(seq, key="conv_id", flag_col="b",
                                order_by=["ts", "turn_idx"])
               .to_pandas()) == 0


def test_round5v_decile_slope_empty():
    from s_tsfe_dl_ray.stages.dedup import _grouped_min

    partials = ray.data.from_arrow(pa.table({
        "qty_bin": pa.array([], pa.int64()),
        "n": pa.array([], pa.int64()),
        "sx": pa.array([], pa.int64()),
        "sy": pa.array([], pa.int64()),
        "sxx": pa.array([], pa.int64()),
        "sxy": pa.array([], pa.int64())}))
    merged = _grouped_min(partials, group_cols=["qty_bin"],
                          agg_cols=[("n", "sum")], pkey_col="qty_bin",
                          num_partitions=4)
    assert len(merged.to_pandas()) == 0


def test_round6a_median_test_empty():
    from s_tsfe_dl_ray.stages.robust import median_test

    ds = ray.data.from_arrow(pa.table({
        "event_type": pa.array([], pa.string()),
        "value": pa.array([], pa.float64())}))
    assert len(median_test(ds, group_col="event_type",
                           value_col="value").to_pandas()) == 0


def test_round5_ops_empty():
    """Round-5 additions degrade to empty results on zero-row input:
    window_pairs, xicor, theil_contributions, vocab_simpson,
    collocations_pmi (post keyed-join rewrite)."""
    from s_tsfe_dl_ray.stages.activity import theil_contributions
    from s_tsfe_dl_ray.stages.robust import xicor
    from s_tsfe_dl_ray.stages.slide import window_pairs
    from s_tsfe_dl_ray.stages.text import collocations_pmi, vocab_simpson

    ds = _empty_events()
    iv = ds.map_batches(
        lambda t: pa.table({"user_id": t["user_id"], "ts": t["ts"],
                            "event_id": t["event_id"],
                            "y": pa.array([], pa.int64())}),
        batch_format="pyarrow")
    assert len(window_pairs(iv, keys=["user_id"],
                            order_by=["ts", "event_id"], value_col="y",
                            length=3, length_target=2).to_pandas()) == 0
    assert len(xicor(iv, key="user_id", order_by=["ts", "event_id"],
                     value_col="y").to_pandas()) == 0
    assert len(theil_contributions(iv, key_col="user_id",
                                   value_col="y").to_pandas()) == 0

    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "source": pa.array([], pa.string()),
        "text": pa.array([], pa.string())}))
    assert len(vocab_simpson(docs, group_col="source").to_pandas()) == 0
    assert len(collocations_pmi(docs).to_pandas()) == 0
