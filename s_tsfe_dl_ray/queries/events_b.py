"""Events-table query bodies, second half (stats batteries, metrics, drift).

Mechanically split out of ``__ray_entry__.py`` (VERDICT r4 #8): every
``q_*`` callable keeps its original closure shape inside :func:`build`;
the driver's recorded-50 ordering lives in ``registry.py``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ._common import (_LANGS, _STOP, _dd_round6, _events_gapfill,
                      _round_floats, _transcripts_for)

__all__ = ["build"]


def build() -> dict:
    from s_tsfe_dl_ray.pipelines.events_rollup import (
        events_tier, events_tiers, events_top_windows, events_type_rate,
    )
    from s_tsfe_dl_ray.pipelines.relational import pricing_summary
    from s_tsfe_dl_ray.pipelines.transcript_rollup import transcript_tiers
    from s_tsfe_dl_ray.sources.parquet import read_events, read_table
    from s_tsfe_dl_ray.stages.dedup import (
        exact_dedup_ids, first_per_key, minhash_dedup_pairs, simhash_signatures,
    )
    from s_tsfe_dl_ray.stages.gapfill import gapfill
    from s_tsfe_dl_ray.stages.scan import ordered_scan
    from s_tsfe_dl_ray.stages.sessionize import sessionize
    from s_tsfe_dl_ray.stages.similarity import (
        embedding_neardup_pairs, knn_bruteforce, knn_ivf,
    )
    from s_tsfe_dl_ray.stages.text import (
        lang_id, md5_fingerprint, quality_score, rolling_fingerprint, token_stats,
    )
    from s_tsfe_dl_ray.state.encode import decode_series, encode_series

    def q_events_spectral_power(sf):
        """Per-user single-bin DFT power at daily/weekly periods
        (Goertzel probe over mean-centered values, per-key epoch) —
        stages/features.spectral_power."""
        from s_tsfe_dl_ray.stages.features import spectral_power

        ds = read_events(sf, columns=["user_id", "ts", "value"])
        return _round_floats(spectral_power(
            ds, key="user_id", ts_col="ts", value_col="value"))

    def q_events_column_profile(sf):
        """Data-quality profile of the events table: per-column row/null
        counts, exact distinct cardinality, typed min/max
        (stages/distinct.column_profile)."""
        from s_tsfe_dl_ray.stages.distinct import column_profile

        ds = read_events(sf, columns=["user_id", "event_type", "value"])
        return _round_floats(column_profile(
            ds, columns=["user_id", "event_type", "value"]))

    def q_events_peak_rate_1h(sf):
        """Per-user peak sliding-1h event rate (rate-limit audit):
        RANGE-window count argmax via per-key-lifted binary search, µs
        integers end-to-end (stages/stream.peak_sliding_rate)."""
        from s_tsfe_dl_ray.stages.stream import peak_sliding_rate

        ds = read_events(sf, columns=["user_id", "ts"])
        return peak_sliding_rate(ds, key="user_id", ts_col="ts",
                                 window_us=3_600_000_000)

    def q_events_decayed_type_counts(sf):
        """Time-decayed popularity per event type (half-life 12 h,
        horizon = corpus max ts) — stages/distinct.decayed_counts."""
        from s_tsfe_dl_ray.stages.distinct import decayed_counts

        ds = read_events(sf, columns=["event_type", "ts"])
        return _round_floats(decayed_counts(
            ds, key_col="event_type", ts_col="ts",
            half_life_us=43_200_000_000))

    def q_events_quantile_tiers_1h(sf):
        """Continuous-aggregate percentiles: hourly p50/p95/p99 produced
        by MERGING the 1m tier's t-digest state (raw data read once) —
        stages/quantile.tiered_quantile_digest.  Rows-only: sketch
        estimates are state-dependent; the cascade-vs-exact envelope is
        property-tested."""
        from s_tsfe_dl_ray.stages.quantile import tiered_quantile_digest

        ds = read_events(sf, columns=["ts", "value"])
        tiers = tiered_quantile_digest(ds, ts_col="ts", value_col="value",
                                       tiers=("1m", "1h"))
        return _round_floats(tiers["1h"].sort("window_start"))

    def q_events_rollup_1h_delta(sf):
        """Hour-over-hour change per user: the 1h rollup tier composed
        with the lag/delta ordered scan — continuous-aggregate output
        consumed as a first-class input (stage composition)."""
        tier = events_tiers(sf, ("1m", "1h"))["1h"]
        narrow = tier.select_columns(["user_id", "window_start",
                                      "n_events"])
        return _round_floats(ordered_scan(
            narrow, keys=["user_id"], order_by=["window_start"],
            scans={"n_prev": ("n_events", "lag"),
                   "n_delta": ("n_events", "delta")}))

    def q_events_active_users(sf):
        """Per-day exact DAU / trailing-7-day WAU / stickiness via the
        pair-expansion distinct-window op (stages/activity.active_users)."""
        from s_tsfe_dl_ray.stages.activity import active_users

        ds = read_events(sf, columns=["user_id", "ts"])
        return _round_floats(active_users(ds).sort("day"))

    def q_events_new_returning(sf):
        """Per-day new-vs-returning distinct user split
        (stages/activity.new_vs_returning)."""
        from s_tsfe_dl_ray.stages.activity import new_vs_returning

        ds = read_events(sf, columns=["user_id", "ts"])
        return new_vs_returning(ds).sort("day")

    def q_events_funnel_latency(sf):
        """Time-to-convert per funnel stage pair: count, exact mean
        seconds, exact discrete p50/p90 latency in microseconds
        (stages/funnel.funnel_latency)."""
        from s_tsfe_dl_ray.stages.funnel import funnel_latency

        ds = read_events(sf, columns=["user_id", "ts", "event_type"])
        return _round_floats(funnel_latency(
            ds, key="user_id", ts_col="ts", type_col="event_type",
            stages=["view", "click", "purchase"],
        ).sort("stage_from"))

    def q_events_anova_f(sf):
        """One-way ANOVA F / eta-squared of value across event types
        (stages/robust.anova_oneway)."""
        from s_tsfe_dl_ray.stages.robust import anova_oneway

        ds = read_events(sf, columns=["event_type", "value"])
        return _round_floats(anova_oneway(
            ds, group_col="event_type", value_col="value"))

    def q_events_wau_hll(sf):
        """Approximate trailing-7-day active users via HLL pane
        composition — the long-window scale path for active_users
        (stages/activity.active_users_approx).  Rows-only: sketch
        estimates have no SQL twin; tests/test_activity.py pins the
        error envelope against the exact op."""
        from s_tsfe_dl_ray.stages.activity import active_users_approx

        ds = read_events(sf, columns=["user_id", "ts"])
        return active_users_approx(ds).sort("day")

    def q_events_type_cond_entropy(sf):
        """Conditional next-type entropy H(next|from) in bits per source
        event type — predictability of the per-user event-type Markov
        chain (stages/dialog.transition_entropy)."""
        from s_tsfe_dl_ray.stages.dialog import transition_entropy

        ds = read_events(sf, columns=["event_id", "user_id", "ts",
                                      "event_type"])
        return _round_floats(transition_entropy(
            ds, conv_col="user_id", role_col="event_type",
            order_by=["ts", "event_id"]))

    def q_events_session_conversion(sf):
        """Share of 30m inactivity-gap sessions containing a purchase
        (stages/sessionize.session_conversion)."""
        from s_tsfe_dl_ray.stages.sessionize import session_conversion

        ds = read_events(sf, columns=["event_id", "user_id", "ts",
                                      "event_type"])
        return _round_floats(session_conversion(
            ds, keys=["user_id"], ts_col="ts", type_col="event_type",
            target="purchase", order_by=["ts", "event_id"], gap="30m"))

    def q_events_weekly_profile(sf):
        """Hour-of-week seasonality profile: event count and mean value
        per (day-of-week, hour-of-day) cell — one combiner pass over a
        derived 168-cell key (pipelines/relational.grouped_aggregate)."""
        from s_tsfe_dl_ray.pipelines.relational import grouped_aggregate

        ds = read_events(sf, columns=["ts", "value"])

        def derive(t: pa.Table) -> pa.Table:
            us = pc.cast(pc.cast(t["ts"], pa.timestamp("us")),
                         pa.int64()).to_numpy(zero_copy_only=False)
            days = us // 86_400_000_000
            # epoch day 0 = Thursday; ISO dow (Mon=1..Sun=7)
            dow = ((days + 3) % 7) + 1
            hour = (us // 3_600_000_000) % 24
            import numpy as np
            return pa.table({
                "dow": pa.array(dow.astype(np.int64)),
                "hour": pa.array(hour.astype(np.int64)),
                "value": t["value"],
            })

        cells = ds.map_batches(derive, batch_format="pyarrow",
                               zero_copy_batch=True)
        agg = grouped_aggregate(
            cells, keys=["dow", "hour"],
            aggs={"n_events": ("value", "count"),
                  "value_sum": ("value", "sum")})

        def fin(t: pa.Table) -> pa.Table:
            return pa.table({
                "dow": t["dow"], "hour": t["hour"],
                "n_events": t["n_events"],
                "value_mean": pc.divide(
                    pc.cast(t["value_sum"], pa.float64()),
                    pc.cast(t["n_events"], pa.float64())),
            })

        return _round_floats(agg.map_batches(fin, batch_format="pyarrow")
                             .sort(["dow", "hour"]))

    def q_events_mase(sf):
        """Per-user seasonal-naive vs persistence forecast skill ratio
        at lag 24 (stages/trend.naive_forecast_ratio)."""
        from s_tsfe_dl_ray.stages.trend import naive_forecast_ratio

        ds = read_events(sf, columns=["event_id", "user_id", "ts", "value"])
        return _round_floats(naive_forecast_ratio(
            ds, key="user_id", order_by=["ts", "event_id"],
            value_col="value", season_lag=24))

    def q_events_priority_sample(sf):
        """Deterministic distributed uniform sample: the 100 events with
        the smallest md5(event_id) priority — cluster-size- and
        layout-invariant (stages/transform.priority_sample)."""
        from s_tsfe_dl_ray.stages.transform import priority_sample

        ds = read_events(sf, columns=["event_id", "value"])
        return _round_floats(priority_sample(ds, id_col="event_id", k=100))

    def q_events_cms_user_counts(sf):
        """Count-min point-frequency estimates for five probe users —
        the sketch-family frequency member
        (stages/distinct.count_min_sketch).  Rows-only: estimates are
        hash-dependent; tests/test_distinct.py pins the never-undercount
        and bounded-overcount guarantees."""
        from s_tsfe_dl_ray.stages.distinct import count_min_sketch

        ds = read_events(sf, columns=["user_id"])
        return count_min_sketch(
            ds, col="user_id",
            query_items=[1, 2, 3, 500, 999]).sort("item")

    def q_events_k_anonymity(sf):
        """k-anonymity audit (k=5) of the (event_type, hour-of-day,
        day) quasi-identifier combination
        (stages/distinct.k_anonymity_audit)."""
        from s_tsfe_dl_ray.stages.distinct import k_anonymity_audit

        ds = read_events(sf, columns=["event_type", "ts"])

        def derive(t: pa.Table) -> pa.Table:
            us = pc.cast(pc.cast(t["ts"], pa.timestamp("us")),
                         pa.int64()).to_numpy(zero_copy_only=False)
            import numpy as np
            return pa.table({
                "event_type": t["event_type"],
                "day": pa.array((us // 86_400_000_000).astype(np.int64)),
                "hour": pa.array(((us // 3_600_000_000) % 24)
                                 .astype(np.int64)),
            })

        qi = ds.map_batches(derive, batch_format="pyarrow",
                            zero_copy_batch=True)
        return k_anonymity_audit(qi, qi_cols=["event_type", "day", "hour"],
                                 k=5)

    def q_events_auc_by_user(sf):
        """Stratified exact mid-rank ROC-AUC per user segment — value as
        score, purchase as positive (stages/metrics.grouped_auc)."""
        from s_tsfe_dl_ray.stages.metrics import grouped_auc

        ds = read_events(sf, columns=["user_id", "event_type", "value"])

        def lab(t: pa.Table) -> pa.Table:
            return pa.table({
                "user_id": t["user_id"], "score": t["value"],
                "y": pc.equal(t["event_type"], pa.scalar("purchase")),
            })

        labeled = ds.map_batches(lab, batch_format="pyarrow",
                                 zero_copy_batch=True)
        return _round_floats(grouped_auc(
            labeled, key="user_id", score_col="score", label_col="y"))

    def q_events_poincare(sf):
        """Poincaré SD1/SD2 variability descriptors of per-user
        inter-event intervals — the HRV summary of the reference's
        RR-interval domain (stages/trend.poincare_descriptors)."""
        from s_tsfe_dl_ray.stages.trend import poincare_descriptors

        ds = read_events(sf, columns=["event_id", "user_id", "ts"])
        return _round_floats(poincare_descriptors(
            ds, key="user_id", order_by=["ts", "event_id"], ts_col="ts"))

    def q_events_hrv(sf):
        """RMSSD / pNN(60s) successive-difference interval stats per
        user (stages/trend.hrv_stats)."""
        from s_tsfe_dl_ray.stages.trend import hrv_stats

        ds = read_events(sf, columns=["event_id", "user_id", "ts"])
        return _round_floats(hrv_stats(
            ds, key="user_id", order_by=["ts", "event_id"], ts_col="ts",
            pnn_threshold_s=60.0))

    def q_events_wilson_ci(sf):
        """Daily error-rate with Wilson 95% score interval: one combiner
        fold to exact (n, successes) counts, closed-form finalize as a
        fixed float64 expression tree (stages/metrics.wilson_rate_ci)."""
        from s_tsfe_dl_ray.stages.metrics import wilson_rate_ci

        ds = read_events(sf, columns=["ts", "event_type"])
        return _round_floats(wilson_rate_ci(
            ds, ts_col="ts", type_col="event_type",
            success_value="error", tier="1d"))

    def q_events_lead_lag(sf):
        """Lead-lag Pearson sweep (lags −3..+3 hours) between the click
        and purchase hourly count series on the DENSE zero-filled grid —
        which signal moves first (stages/trend.lead_lag_xcorr)."""
        from s_tsfe_dl_ray.stages.trend import lead_lag_xcorr

        ds = read_events(sf, columns=["ts", "event_type"])
        return _round_floats(lead_lag_xcorr(
            ds, ts_col="ts", type_col="event_type",
            type_a="click", type_b="purchase", tier="1h", max_lag=3))

    def q_events_target_encoding(sf):
        """Leave-one-out target encoding of event_type by value: int-cent
        category fold broadcast back as a shuffle-free per-row map
        (stages/transform.loo_target_encoding)."""
        from s_tsfe_dl_ray.stages.transform import loo_target_encoding

        ds = read_events(sf, columns=["event_id", "event_type", "value"])
        return _round_floats(loo_target_encoding(
            ds, key_col="event_type", value_col="value", id_col="event_id"))

    def q_events_pareto(sf):
        """Pareto concentration: smallest user set covering 80% of total
        value — per-key int-cent fold + one ordered finalize; k defined
        by counting (not argmax) so both sides agree even with negative
        values (stages/metrics.pareto_coverage)."""
        from s_tsfe_dl_ray.stages.metrics import pareto_coverage

        ds = read_events(sf, columns=["user_id", "value"])
        return _round_floats(pareto_coverage(
            ds, key_col="user_id", value_col="value", share=0.8))

    def q_events_rate_limit(sf):
        """Fixed-window rate-limiter dry run: windows where a per-user
        budget of 2 events/hour would drop traffic — one combiner fold,
        all-integer (stages/stream.rate_limit_drops)."""
        from s_tsfe_dl_ray.stages.stream import rate_limit_drops

        ds = read_events(sf, columns=["user_id", "ts"])
        return rate_limit_drops(ds, key="user_id", ts_col="ts",
                                tier="1h", limit=2)

    def q_events_top_paths(sf):
        """User-journey mining: top-20 session entry paths (first 5 event
        types per 30m-gap session, joined a>b>c) with session counts —
        one key exchange + combiner count, deterministic top-k cut
        (stages/sessionize.session_paths)."""
        from s_tsfe_dl_ray.stages.sessionize import session_paths

        ds = read_events(sf, columns=["event_id", "user_id", "ts",
                                      "event_type"])
        return session_paths(ds, key="user_id", ts_col="ts",
                             type_col="event_type",
                             order_by=["ts", "event_id"], gap="30m",
                             max_steps=5, k=20)

    def q_events_return_level(sf):
        """Tail-risk extrapolation: Gumbel method-of-moments over daily
        block maxima → 100-day return level — exact int-cent maxima and
        moment sums, shared constant literals both sides
        (stages/robust.gumbel_return_level)."""
        from s_tsfe_dl_ray.stages.robust import gumbel_return_level

        ds = read_events(sf, columns=["ts", "value"])
        return _round_floats(gumbel_return_level(
            ds, ts_col="ts", value_col="value", tier="1d",
            return_period=100.0))

    def q_events_page_hinkley(sf):
        """Per-user Page-Hinkley drift statistic over the running mean -
        ordered cumulative folds bit-identical to the windowed SQL twin
        (stages/robust.page_hinkley)."""
        from s_tsfe_dl_ray.stages.robust import page_hinkley

        ds = read_events(sf, columns=["user_id", "ts", "event_id", "value"])
        return _round_floats(page_hinkley(
            ds, key="user_id", ts_col="ts", value_col="value",
            id_col="event_id", delta=0.05, threshold=5.0))

    def q_events_adf(sf):
        """Lag-0 Dickey-Fuller stationarity probe per user: unit-root
        coefficient + t-stat from exact int-cent segment moments
        (stages/trend.adf_test)."""
        from s_tsfe_dl_ray.stages.trend import adf_test

        ds = read_events(sf, columns=["user_id", "ts", "event_id", "value"])
        return _round_floats(adf_test(
            ds, key="user_id", value_col="value",
            order_by=["ts", "event_id"]))

    def q_events_welch_ttest(sf):
        """Welch unequal-variance t-test click-vs-purchase value means,
        with Satterthwaite dof - exact int-cent moments, fixed float
        tree (stages/robust.welch_ttest)."""
        from s_tsfe_dl_ray.stages.robust import welch_ttest

        ds = read_events(sf, columns=["event_type", "value"])
        return _round_floats(welch_ttest(
            ds, group_col="event_type", value_col="value",
            group_a="click", group_b="purchase"))

    def q_events_tukey_hsd(sf):
        """Tukey HSD post-hoc pair table after the ANOVA: which event-type
        value means differ - studentized-range q per pair from exact
        int-cent moments (stages/robust.tukey_hsd)."""
        from s_tsfe_dl_ray.stages.robust import tukey_hsd

        ds = read_events(sf, columns=["event_type", "value"])
        return _round_floats(tukey_hsd(
            ds, group_col="event_type", value_col="value"))

    def q_events_ndcg(sf):
        """Per-user NDCG@5 of the frequency-baseline recommender: rank
        types by first-half counts, score against second-half counts
        (stages/metrics.ndcg_at_k)."""
        from s_tsfe_dl_ray.stages.metrics import ndcg_at_k

        ds = read_events(sf, columns=["user_id", "event_type", "ts",
                                      "event_id"])
        return _round_floats(ndcg_at_k(
            ds, key="user_id", item_col="event_type", ts_col="ts",
            id_col="event_id", k=5))

    def q_events_gini_users(sf):
        """Gini coefficient of per-user activity inside each event type —
        counts fold combiner-side, rank sum exact int64
        (stages/activity.activity_gini)."""
        from s_tsfe_dl_ray.stages.activity import activity_gini

        ds = read_events(sf, columns=["event_type", "user_id"])
        return _round_floats(activity_gini(ds))

    def q_events_record_highs(sf):
        """All-time-high record statistics per user (count, last record
        time, standing record) — ordered per-key scan, vectorized
        shifted cummax (stages/scan.record_highs)."""
        from s_tsfe_dl_ray.stages.scan import record_highs

        ds = read_events(sf, columns=["event_id", "ts", "user_id", "value"])
        return _round_floats(record_highs(ds))

    def q_events_stl_strength(sf):
        """MA-detrended STL-lite per event type: seasonal/trend strength
        from the residual variance (stages/trend.stl_lite) — combiner
        hour counts, per-key vectorized decomposition."""
        from s_tsfe_dl_ray.stages.trend import stl_lite

        ds = read_events(sf, columns=["event_type", "ts"])
        return _round_floats(stl_lite(ds))

    def q_events_ljung_box(sf):
        """Ljung–Box white-noise Q per user (standard full-series-moment
        acf estimator, lags 1–3) — the forecastability gate in front of
        holt/ar2 (stages/trend.ljung_box)."""
        from s_tsfe_dl_ray.stages.trend import ljung_box

        ds = read_events(sf, columns=["event_id", "ts", "user_id", "value"])
        return _round_floats(ljung_box(
            ds, key="user_id", value_col="value",
            order_by=["ts", "event_id"]).sort("user_id"))

    def q_events_als_factors(sf):
        """ALS matrix factorization of the (user × event_type) activity
        matrix — per-user taste factors from alternating optimization,
        user factors recomputed per pass, never stored
        (stages/similarity.als_factorize).  Rows-only (iterative);
        planted-block-recovery pytest."""
        import pyarrow.compute as _pc

        from s_tsfe_dl_ray.stages.similarity import als_factorize

        ds = read_events(sf, columns=["user_id", "event_type"])
        ones = ds.map_batches(
            lambda t: t.append_column(
                "r", _pc.cast(_pc.equal(t["event_type"], t["event_type"]),
                              pa.float64())),
            batch_format="pyarrow")
        uf, _vf = als_factorize(ones, user_col="user_id",
                                item_col="event_type", rating_col="r",
                                rank=3, n_iter=6)
        return _round_floats(uf.sort("user_id"))

    def q_events_markov_stationary(sf):
        """Per-user stationary distribution of the event-type Markov
        chain — the long-run behavior mix the user's DYNAMICS converge
        to (vs the observed frequency mix); batched power iteration
        across all keys of a partition (stages/trend.markov_stationary).
        Rows-only (eigenvector); closed-form-chain pytest."""
        from s_tsfe_dl_ray.stages.trend import markov_stationary

        ds = read_events(sf, columns=["event_id", "ts", "user_id",
                                      "event_type"])
        return _round_floats(markov_stationary(
            ds, key="user_id", state_col="event_type",
            order_by=["ts", "event_id"]))

    def q_events_runs_test(sf):
        """Wald–Wolfowitz runs test per user (above/below exact lower
        median, integer run counts) — the order-only randomness sibling
        of ljung_box (stages/robust.runs_test)."""
        from s_tsfe_dl_ray.stages.robust import runs_test

        ds = read_events(sf, columns=["event_id", "ts", "user_id", "value"])
        return _round_floats(runs_test(
            ds, key="user_id", value_col="value",
            order_by=["ts", "event_id"]).sort("user_id"))

    def q_events_hour_entropy(sf):
        """Shannon entropy of each user's hour-of-day activity profile
        (cron-like vs human timing) — pure combiner, ≤24 rows per user
        per batch (stages/activity.hour_entropy)."""
        from s_tsfe_dl_ray.stages.activity import hour_entropy

        ds = read_events(sf, columns=["user_id", "ts"])
        return _round_floats(hour_entropy(ds).sort("user_id"))

    def q_events_holt_winters(sf):
        """Additive Holt–Winters (level+trend+24h season) per event type
        over the dense hourly grid; rows-only (recursive state — no SQL
        twin; convergence + short-series pytest in tests/test_trend.py)
        — stages/trend.holt_winters."""
        from s_tsfe_dl_ray.stages.trend import holt_winters

        ds = read_events(sf, columns=["event_type", "ts"])
        return _round_floats(holt_winters(ds))

    def q_events_psi_daily(sf):
        """Population Stability Index per observed day vs previous day
        (10 equal-width global bins, Laplace-smoothed) — the
        distribution-drift monitor (stages/robust.psi_daily)."""
        from s_tsfe_dl_ray.stages.robust import psi_daily

        ds = read_events(sf, columns=["ts", "value"])
        return _round_floats(psi_daily(ds).sort("day"))

    def q_events_out_of_order(sf):
        """Ingestion-order audit per user: late-event share and worst
        lateness in arrival (event_id) order — the watermark-tuning
        measurement (stages/scan.out_of_order_stats)."""
        from s_tsfe_dl_ray.stages.scan import out_of_order_stats

        ds = read_events(sf, columns=["event_id", "ts", "user_id"])
        return _round_floats(out_of_order_stats(ds))

    def q_events_trimmed_mean(sf):
        """10%-trimmed mean per user (deterministic (value, event_id)
        cut) — the robust location estimate between mean and median
        (stages/robust.trimmed_mean)."""
        from s_tsfe_dl_ray.stages.robust import trimmed_mean

        ds = read_events(sf, columns=["event_id", "user_id", "value"])
        return _round_floats(trimmed_mean(
            ds, key="user_id", value_col="value", id_col="event_id"))

    def q_events_session_type_pairs(sf):
        """Session-scoped event-type co-occurrence: label_sessions →
        pair_cooccurrence composition (which types happen in the SAME
        30m session, vs the per-user lifetime variant)."""
        import pyarrow.compute as _pc

        from s_tsfe_dl_ray.stages.distinct import pair_cooccurrence
        from s_tsfe_dl_ray.stages.sessionize import label_sessions

        ds = read_events(sf, columns=["event_id", "ts", "user_id",
                                      "event_type"])
        labeled = label_sessions(ds, key="user_id", ts_col="ts",
                                 order_by=["ts", "event_id"], gap="30m")

        def skey(t: pa.Table) -> pa.Table:
            sk = _pc.binary_join_element_wise(
                _pc.cast(t["user_id"], pa.string()),
                _pc.cast(t["session_id"], pa.string()), ":")
            return pa.table({"skey": sk, "event_type": t["event_type"]})

        pairs = pair_cooccurrence(
            labeled.map_batches(skey, batch_format="pyarrow"),
            group_col="skey", member_col="event_type")
        return _round_floats(pairs.sort(["member_a", "member_b"]))

    def q_events_user_lifetime(sf):
        """Per-user lifetime summary: first/last seen, inclusive
        calendar tenure, exact active-day count — one combiner pass
        (stages/activity.user_lifetime)."""
        from s_tsfe_dl_ray.stages.activity import user_lifetime

        ds = read_events(sf, columns=["user_id", "ts"])
        return _round_floats(user_lifetime(ds))

    def q_events_bursts(sf):
        """Kleinberg two-state burst episodes per event type over the
        dense hourly grid (Viterbi over Poisson costs); rows-only —
        planted-burst recovery pinned in tests/test_trend.py
        (stages/trend.kleinberg_bursts)."""
        from s_tsfe_dl_ray.stages.trend import kleinberg_bursts

        ds = read_events(sf, columns=["event_type", "ts"])
        return kleinberg_bursts(ds)

    def q_events_peak_detect(sf):
        """R-peak-style detection per user: strict interior local maxima
        above the exact per-user p90, 60s greedy refractory period —
        the reference's QRS anchor loop as a distributed op
        (stages/scan.peak_detect)."""
        from s_tsfe_dl_ray.stages.scan import peak_detect

        ds = read_events(sf, columns=["event_id", "ts", "user_id", "value"])
        return _round_floats(peak_detect(ds))

    def q_events_rr_intervals(sf):
        """RR-interval HRV summary over DETECTED peaks (the reference's
        literal R-peak → RR → HRV pipeline): mean interval + RMSSD per
        user (stages/scan.peak_intervals)."""
        from s_tsfe_dl_ray.stages.scan import peak_intervals

        ds = read_events(sf, columns=["event_id", "ts", "user_id", "value"])
        return _round_floats(peak_intervals(ds))

    def q_events_seasonal_outliers(sf):
        """Robust anomaly count on DESEASONALIZED values: hour-of-day
        profile removed (stages/trend.seasonal_adjust per type),
        then the MAD outlier battery on the residuals — the
        seasonal-aware anomaly count a raw-value MAD over-flags every
        morning peak on."""
        from s_tsfe_dl_ray.stages.robust import grouped_mad
        from s_tsfe_dl_ray.stages.trend import seasonal_adjust

        ds = read_events(sf, columns=["event_type", "ts", "value"])
        adj = seasonal_adjust(ds, key="event_type", ts_col="ts",
                              value_col="value", period="hour_of_day")
        return _round_floats(grouped_mad(
            adj.select_columns(["event_type", "residual"]),
            key="event_type", value_col="residual").sort("event_type"))

    def q_events_daily_type_entropy(sf):
        """Per-day traffic-mix entropy + dominant type/share (the
        mix-collapse monitor beside psi_daily's value drift) —
        stages/activity.daily_mix_entropy."""
        from s_tsfe_dl_ray.stages.activity import daily_mix_entropy

        ds = read_events(sf, columns=["event_type", "ts"])
        return _round_floats(daily_mix_entropy(ds).sort("day"))

    def q_events_arch_effect(sf):
        """Volatility clustering (ARCH-effect) probe per user: lag-1
        autocorrelation of |Δvalue| — composition of the ordered-scan
        delta, an abs kernel, and the multi-lag acf stage."""
        import pyarrow.compute as _pc

        from s_tsfe_dl_ray.stages.trend import acf

        ds = read_events(sf, columns=["event_id", "user_id", "ts", "value"])
        d = ordered_scan(
            ds, keys=["user_id"], order_by=["ts", "event_id"],
            scans={"vd": ("value", "delta")})

        def absd(t: pa.Table) -> pa.Table:
            out = pa.table({
                "event_id": t["event_id"], "user_id": t["user_id"],
                "ts": t["ts"], "ad": _pc.abs(t["vd"]),
            })
            return out.filter(_pc.is_valid(out["ad"]))

        series = d.map_batches(absd, batch_format="pyarrow")
        r = acf(series, key="user_id", value_col="ad",
                order_by=["ts", "event_id"], lags=(1,))

        def fin(t: pa.Table) -> pa.Table:
            return pa.table({"user_id": t["user_id"],
                             "n_pairs": t["n_pairs"],
                             "arch_corr": t["autocorr"]})

        return _round_floats(
            r.map_batches(fin, batch_format="pyarrow").sort("user_id"))

    def q_events_avg_precision(sf):
        """Exact PR-AUC (sklearn's step-interpolated average precision,
        tie-robust over the score histogram) — the imbalance-honest
        sibling of events_auc (stages/metrics.average_precision)."""
        import pyarrow.compute as _pc

        from s_tsfe_dl_ray.stages.metrics import average_precision

        def derive(t: pa.Table) -> pa.Table:
            return t.append_column(
                "label", _pc.equal(t["event_type"], "purchase"))

        ds = read_events(sf, columns=["value", "event_type"]) \
            .map_batches(derive, batch_format="pyarrow")
        return _round_floats(average_precision(
            ds, score_col="value", label_col="label"))

    def q_events_expectations(sf):
        """Declarative data-contract sweep over the events drop
        (not-null, PK-unique, enum membership, range, RE2 shape) —
        one read, per-rule combiner folds (schema.expectations_report)."""
        from s_tsfe_dl_ray.schema import expectations_report

        ds = read_events(sf, columns=["event_id", "ts", "user_id",
                                      "event_type", "value", "props"])
        rules = [
            {"rule": "not_null", "col": "value"},
            {"rule": "unique", "col": "event_id"},
            {"rule": "in_set", "col": "event_type",
             "values": ["view", "click", "purchase", "signup", "error"]},
            {"rule": "range", "col": "value", "lo": -1000.0, "hi": 1000.0},
            {"rule": "regex", "col": "props", "pattern": r"\{.*\}"},
        ]
        return expectations_report(ds, rules)

    def q_events_dtw_shape(sf):
        """Banded DTW distance from each type's hourly series to the
        corpus mean series (shape-anomaly ranking; Sakoe–Chiba band) —
        rows-only (DP argmin; identity/shift-tolerance pytest in
        tests/test_trend.py) — stages/trend.dtw_to_mean."""
        from s_tsfe_dl_ray.stages.trend import dtw_to_mean

        ds = read_events(sf, columns=["event_type", "ts"])
        return _round_floats(dtw_to_mean(ds))

    def q_events_value_ecdf(sf):
        """Exact per-type empirical CDF at fixed probe values — the
        inverse view of the quantile ops (value → share instead of
        share → value); K+2 exact int64 counts per key per batch cross
        the exchange (stages/quantile.grouped_ecdf_at)."""
        from s_tsfe_dl_ray.stages.quantile import grouped_ecdf_at

        ds = read_events(sf, columns=["event_type", "value"])
        return _round_floats(grouped_ecdf_at(
            ds, key="event_type", value_col="value",
            thresholds=(1.0, 5.0, 20.0, 50.0, 100.0, 250.0),
        ).sort(["event_type", "threshold"]))

    def q_events_hill_tail(sf):
        """Per-type Hill estimator of the heavy-tail index over the
        top-100 order statistics (positive values; histogram-folded, no
        row expansion) — the tail-SHAPE probe completing
        tail_value_share/gini/HHI (stages/robust.hill_tail_index)."""
        from s_tsfe_dl_ray.stages.robust import hill_tail_index

        ds = read_events(sf, columns=["event_type", "value"])
        return _round_floats(hill_tail_index(
            ds, key="event_type", value_col="value", k=100))

    def q_events_isotonic(sf):
        """Isotonic (PAV) calibration of value → P(purchase): monotone
        nonparametric calibrator over the exact score histogram
        (stages/metrics.isotonic_calibration).  Rows-only (sequential
        pooling); monotonicity/mass/golden pytest."""
        import pyarrow.compute as _pc

        from s_tsfe_dl_ray.stages.metrics import isotonic_calibration

        ds = read_events(sf, columns=["value", "event_type"])
        lab = ds.map_batches(
            lambda t: pa.table({
                "value": t["value"],
                "label": _pc.equal(t["event_type"], "purchase")}),
            batch_format="pyarrow")
        return _round_floats(isotonic_calibration(
            lab, score_col="value", label_col="label"))

    def q_events_ab_ztest(sf):
        """A/B experiment readout: deterministic md5 50/50 user split,
        conversion = any purchase, pooled two-proportion z statistic
        (stages/metrics.ab_ztest)."""
        import pyarrow.compute as _pc

        from s_tsfe_dl_ray.stages.metrics import ab_ztest

        ds = read_events(sf, columns=["user_id", "event_type"])
        conv = ds.map_batches(
            lambda t: pa.table({
                "user_id": t["user_id"],
                "success": _pc.equal(t["event_type"], "purchase")}),
            batch_format="pyarrow")
        return _round_floats(ab_ztest(
            conv, unit_col="user_id", success_col="success",
            split_fraction=0.5))

    def q_events_survival_km(sf):
        """Kaplan–Meier time-to-first-purchase curve per user (hour
        buckets; users who never purchase are right-censored at their
        last activity) — the product-limit conversion-latency estimate
        (stages/cohort.survival_km)."""
        import pyarrow.compute as _pc

        from s_tsfe_dl_ray.stages.cohort import survival_km

        ds = read_events(sf, columns=["user_id", "ts", "event_type"])
        ev = ds.map_batches(
            lambda t: pa.table({
                "user_id": t["user_id"], "ts": t["ts"],
                "event": _pc.equal(t["event_type"], "purchase")}),
            batch_format="pyarrow")
        return _round_floats(survival_km(
            ev, key="user_id", ts_col="ts",
            event_col="event").sort("bucket"))

    def q_events_gains(sf):
        """Cumulative gains / lift table: positives captured by the
        top-k decile of value-ranked rows, pro-rata tie handling from
        the exact score histogram (stages/metrics.gains_table)."""
        import pyarrow.compute as _pc

        from s_tsfe_dl_ray.stages.metrics import gains_table

        def derive(t: pa.Table) -> pa.Table:
            return t.append_column(
                "label", _pc.equal(t["event_type"], "purchase"))

        ds = read_events(sf, columns=["value", "event_type"]) \
            .map_batches(derive, batch_format="pyarrow")
        return _round_floats(gains_table(
            ds, score_col="value", label_col="label").sort("tile"))

    def q_events_brier(sf):
        """Brier score + Murphy decomposition (reliability / resolution
        / uncertainty) over the reliability bins — the proper-scoring
        companion of ECE (stages/metrics.brier_score)."""
        import pyarrow.compute as _pc

        from s_tsfe_dl_ray.stages.metrics import brier_score

        def derive(t: pa.Table) -> pa.Table:
            t = t.append_column(
                "label", _pc.equal(t["event_type"], "purchase"))
            return t.append_column("score", _pc.divide(t["value"], 100.0))

        ds = read_events(sf, columns=["value", "event_type"]) \
            .map_batches(derive, batch_format="pyarrow")
        return _round_floats(brier_score(
            ds, score_col="score", label_col="label"))

    def q_events_ece(sf):
        """ECE/MCE calibration summary over the reliability bins —
        same score/label derivation as events_calibration
        (stages/metrics.expected_calibration_error)."""
        import pyarrow.compute as _pc

        from s_tsfe_dl_ray.stages.metrics import expected_calibration_error

        def derive(t: pa.Table) -> pa.Table:
            t = t.append_column(
                "label", _pc.equal(t["event_type"], "purchase"))
            return t.append_column("score", _pc.divide(t["value"], 100.0))

        ds = read_events(sf, columns=["value", "event_type"]) \
            .map_batches(derive, batch_format="pyarrow")
        return _round_floats(expected_calibration_error(
            ds, score_col="score", label_col="label"))

    def q_events_recs_by_lift(sf):
        """'Users who did X also did Y': top-3 recommended event types
        per given type by association lift (ties by name) — the
        recommender read-out over the pair_cooccurrence op.  Ranking on
        the UNROUNDED lift, identical doubles both sides."""
        import numpy as _np
        import pandas as _pd

        from s_tsfe_dl_ray.stages.distinct import pair_cooccurrence

        ds = read_events(sf, columns=["user_id", "event_type"])
        pairs = pair_cooccurrence(ds, group_col="user_id",
                                  member_col="event_type")

        def rank(df: _pd.DataFrame) -> _pd.DataFrame:
            if len(df) == 0:
                return _pd.DataFrame({
                    "given": _pd.Series([], dtype="object"),
                    "rec": _pd.Series([], dtype="object"),
                    "lift": _pd.Series([], dtype="float64"),
                    "rnk": _pd.Series([], dtype="int64")})
            both = _pd.concat([
                df.rename(columns={"member_a": "given",
                                   "member_b": "rec"}),
                df.rename(columns={"member_b": "given",
                                   "member_a": "rec"})],
                ignore_index=True)[["given", "rec", "lift"]]
            both = both.sort_values(
                ["given", "lift", "rec"],
                ascending=[True, False, True]).reset_index(drop=True)
            both["rnk"] = both.groupby(
                "given", sort=False).cumcount().to_numpy() + 1
            out = both[both["rnk"] <= 3].reset_index(drop=True)
            out["rnk"] = out["rnk"].astype(_np.int64)
            return out

        # the type vocabulary is tiny — one final partition; at larger
        # vocabularies route through grouped_apply on `given`
        return _round_floats(
            pairs.repartition(1).map_batches(rank, batch_format="pandas",
                                             batch_size=None)
            .sort(["given", "rnk"]))

    def q_events_cuped(sf):
        """CUPED variance-reduced A/B readout: pre-midpoint activity
        absorbs between-user variance from the post-midpoint metric
        (stages/metrics.cuped_ab); exact int moments, md5 arms."""
        from s_tsfe_dl_ray.stages.metrics import cuped_ab

        ds = read_events(sf, columns=["user_id", "ts"])
        return _round_floats(cuped_ab(
            ds, unit_col="user_id", ts_col="ts", split_fraction=0.5))

    def q_events_type_value_mi(sf):
        """Mutual information between event type and the value band
        (7 fixed 50-wide bins) + normalized MI — feature-relevance
        screening next to the chi²/Cramér's-V op
        (stages/distinct.mutual_information)."""
        import numpy as _np

        from s_tsfe_dl_ray.stages.distinct import mutual_information

        ds = read_events(sf, columns=["event_type", "value"])

        def derive(t: pa.Table) -> pa.Table:
            v = t["value"].to_numpy(zero_copy_only=False)
            b = _np.minimum(_np.floor(v / 50.0), 6.0).astype(_np.int64)
            return pa.table({"event_type": t["event_type"],
                             "vband": pa.array(b)})

        return _round_floats(mutual_information(
            ds.map_batches(derive, batch_format="pyarrow"),
            col_a="event_type", col_b="vband"))

    def q_events_cum_hazard(sf):
        """Nelson–Aalen cumulative hazard of time-to-first-purchase —
        the additive sibling of the KM curve
        (stages/cohort.cumulative_hazard)."""
        import pyarrow.compute as _pc

        from s_tsfe_dl_ray.stages.cohort import cumulative_hazard

        ds = read_events(sf, columns=["user_id", "ts", "event_type"])
        ev = ds.map_batches(
            lambda t: pa.table({
                "user_id": t["user_id"], "ts": t["ts"],
                "event": _pc.equal(t["event_type"], "purchase")}),
            batch_format="pyarrow")
        return _round_floats(cumulative_hazard(
            ev, key="user_id", ts_col="ts",
            event_col="event").sort("bucket"))

    def q_events_logrank(sf):
        """Two-sample log-rank test on time-to-first-purchase between
        the two deterministic md5 A/B arms — the survival-curve
        companion of events_ab_ztest (same split, latency instead of
        rate; stages/cohort.logrank_test)."""
        import hashlib as _hl

        import pyarrow.compute as _pc

        from s_tsfe_dl_ray.stages.cohort import logrank_test

        ds = read_events(sf, columns=["user_id", "ts", "event_type"])

        def derive_t(t: pa.Table) -> pa.Table:
            import numpy as _np
            u = t["user_id"].to_numpy(zero_copy_only=False)
            grp = _np.array([
                _hl.md5(str(x).encode()).hexdigest()[:4] < "8000"
                for x in u])
            return pa.table({
                "user_id": t["user_id"], "ts": t["ts"],
                "event": _pc.equal(t["event_type"], "purchase"),
                "grp": pa.array(grp)})

        g = ds.map_batches(derive_t, batch_format="pyarrow")
        return _round_floats(logrank_test(
            g, key="user_id", ts_col="ts", event_col="event",
            group_col="grp"))

    def q_events_hurst(sf):
        """Per-user Hurst exponent via single-scale rescaled range
        (32-step chunks, int-cent exactness) — long-memory /
        persistence ranking (stages/trend.hurst_rs)."""
        from s_tsfe_dl_ray.stages.trend import hurst_rs

        ds = read_events(sf, columns=["event_id", "ts", "user_id",
                                      "value"])
        return _round_floats(hurst_rs(
            ds, key="user_id", value_col="value",
            order_by=["ts", "event_id"], chunk_len=32))

    def q_events_granger(sf):
        """Granger-style predictive probe on the hourly count grid: does
        last hour's click count predict this hour's purchase count beyond
        purchases' own lag?  Restricted-vs-full OLS from exact int64
        moment sums, fixed expression tree mirrored by the SQL twin
        (stages/trend.granger_probe)."""
        from s_tsfe_dl_ray.stages.trend import granger_probe

        ds = read_events(sf, columns=["ts", "event_type"])
        return _round_floats(granger_probe(
            ds, ts_col="ts", type_col="event_type",
            type_cause="click", type_effect="purchase", tier="1h"))

    def q_events_tail_value_share(sf):
        """Per-type share of rows and of total value above the exact
        global p99 (quantile_disc from the distinct-value histogram;
        int-cent sums) — the single-threshold Lorenz point
        (stages/robust.tail_value_share)."""
        from s_tsfe_dl_ray.stages.robust import tail_value_share

        ds = read_events(sf, columns=["event_type", "value"])
        return _round_floats(tail_value_share(
            ds, key="event_type", value_col="value", q=0.99,
        ).sort("event_type"))

    def q_events_cointegration(sf):
        """Engle–Granger cointegration probe click-vs-purchase on the
        hourly count grid: long-run OLS from exact int64 moments, then
        the lag-0 Dickey–Fuller t on its residuals
        (stages/trend.cointegration_probe)."""
        from s_tsfe_dl_ray.stages.trend import cointegration_probe

        ds = read_events(sf, columns=["ts", "event_type"])
        return _round_floats(cointegration_probe(
            ds, ts_col="ts", type_col="event_type",
            type_x="click", type_y="purchase", tier="1h"))

    def q_events_croston(sf):
        """Croston intermittent-demand forecast of daily purchases per
        user — twin SES chains (demand size + inter-demand interval)
        via the verified grouped ewm kernel
        (stages/trend.croston_forecast)."""
        from s_tsfe_dl_ray.stages.trend import croston_forecast

        ds = read_events(sf, columns=["user_id", "ts", "event_type"])
        ds = ds.map_batches(
            lambda t: t.filter(pc.equal(t["event_type"], "purchase")),
            batch_format="pyarrow")
        return _round_floats(croston_forecast(
            ds, key="user_id", ts_col="ts", alpha=0.3, tier="1d"))

    def q_events_grubbs(sf):
        """Grubbs' maximum-studentized-extreme outlier screen per event
        type: G = max deviation / sample sd from exact int-cent moments;
        the argmax extreme rides along (stages/robust.grubbs_test)."""
        from s_tsfe_dl_ray.stages.robust import grubbs_test

        ds = read_events(sf, columns=["event_type", "value"])
        return _round_floats(grubbs_test(
            ds, group_col="event_type", value_col="value"))

    def q_events_availability(sf):
        """Per-user hourly presence profile: active-hour share of the
        first-to-last span plus the longest silent stretch
        (stages/activity.availability_profile)."""
        from s_tsfe_dl_ray.stages.activity import availability_profile

        ds = read_events(sf, columns=["user_id", "ts"])
        return _round_floats(availability_profile(
            ds, key="user_id", ts_col="ts", tier="1h"))

    def q_events_rolling_corr(sf):
        """Trailing 24h Pearson correlation between hourly click and
        purchase counts on the DENSE hour grid — exact int64 trailing
        prefix moments (stages/trend.rolling_grid_corr)."""
        from s_tsfe_dl_ray.stages.trend import rolling_grid_corr

        ds = read_events(sf, columns=["ts", "event_type"])
        return _round_floats(rolling_grid_corr(
            ds, ts_col="ts", type_col="event_type",
            type_a="click", type_b="purchase", tier="1h", window=24))

    def q_events_cohort_ltv(sf):
        """Cohort lifetime-value curve: cumulative value (and per-member
        value) by signup cohort and age — exact int-cent cumsum
        (stages/cohort.cohort_ltv)."""
        from s_tsfe_dl_ray.stages.cohort import cohort_ltv

        ds = read_events(sf, columns=["user_id", "ts", "value"])
        return _round_floats(cohort_ltv(
            ds, key="user_id", ts_col="ts", value_col="value"))

    def q_events_theta(sf):
        """Theta-style one-step forecast per user over daily activity:
        SES level plus half the exact-moment OLS drift
        (stages/trend.theta_forecast)."""
        from s_tsfe_dl_ray.stages.trend import theta_forecast

        ds = read_events(sf, columns=["user_id", "ts"])
        return _round_floats(theta_forecast(
            ds, key="user_id", ts_col="ts", alpha=0.3, tier="1d"))

    def q_events_lorenz(sf):
        """Lorenz concentration table: per rank-decile of users (by
        event count desc) the share and cumulative share of all events
        (stages/activity.lorenz_deciles)."""
        from s_tsfe_dl_ray.stages.activity import lorenz_deciles

        ds = read_events(sf, columns=["user_id"])
        return _round_floats(lorenz_deciles(ds, key_col="user_id"))

    def q_events_weekend_effect(sf):
        """Welch t-test of event values weekday vs weekend — the
        calendar-effect screen, pure composition of a derived flag and
        the existing stage (stages/robust.welch_ttest)."""
        from s_tsfe_dl_ray.stages.robust import welch_ttest

        ds = read_events(sf, columns=["ts", "value"])

        def derive(t: pa.Table) -> pa.Table:
            us = pc.cast(pc.cast(t["ts"], pa.timestamp("us")),
                         pa.int64()).to_numpy(zero_copy_only=False)
            dow = ((us // 86_400_000_000 + 3) % 7) + 1  # ISO Mon=1
            import numpy as np
            return pa.table({
                "_wk": pa.array(np.where(dow >= 6, "weekend",
                                         "weekday").astype(object)),
                "value": t["value"]})

        flagged = ds.map_batches(derive, batch_format="pyarrow",
                                 zero_copy_batch=True)
        return _round_floats(welch_ttest(
            flagged, group_col="_wk", value_col="value",
            group_a="weekday", group_b="weekend"))

    def q_events_two_step_transitions(sf):
        """Two-step Markov matrix P² of the event-type chain —
        sequential mid-state fold bit-exact vs list_reduce
        (stages/dialog.two_step_transitions)."""
        from s_tsfe_dl_ray.stages.dialog import two_step_transitions

        ds = read_events(sf, columns=["event_id", "user_id", "ts",
                                      "event_type"])
        return _round_floats(two_step_transitions(
            ds, conv_col="user_id", role_col="event_type",
            order_by=["ts", "event_id"]))

    def q_events_interarrival_quantiles(sf):
        """Traffic-burstiness profile per event type: p50/p90 of the
        exact integer-µs gaps between consecutive events
        (stages/quantile.interarrival_quantiles)."""
        from s_tsfe_dl_ray.stages.quantile import interarrival_quantiles

        ds = read_events(sf, columns=["event_id", "ts", "event_type"])
        return _round_floats(interarrival_quantiles(
            ds, key="event_type", ts_col="ts",
            order_by=["ts", "event_id"]))

    def q_events_linear_attribution(sf):
        """Multi-touch linear attribution: each purchase splits one
        credit unit equally over the user's clicks in the preceding
        24h; credits aggregate by the click's hour-of-day with
        bit-exact ordered folds (stages/funnel.linear_attribution)."""
        from s_tsfe_dl_ray.stages.funnel import linear_attribution

        ds = read_events(sf, columns=["event_id", "user_id", "ts",
                                      "event_type"])
        return _round_floats(linear_attribution(ds))

    def q_events_weekly_acf(sf):
        """Weekly-seasonality strength: lag-7 Pearson autocorrelation of
        daily activity counts on the dense day grid — exact int64
        moments (stages/trend.grid_lag_autocorr)."""
        from s_tsfe_dl_ray.stages.trend import grid_lag_autocorr

        ds = read_events(sf, columns=["ts"])
        return _round_floats(grid_lag_autocorr(
            ds, ts_col="ts", tier="1d", lag=7))

    def q_events_activity_streaks(sf):
        """Consecutive-active-day streaks per user: longest run and the
        run ending at the user's final active day — gaps-and-islands
        (stages/activity.activity_streaks)."""
        from s_tsfe_dl_ray.stages.activity import activity_streaks

        ds = read_events(sf, columns=["user_id", "ts"])
        return _round_floats(activity_streaks(
            ds, key="user_id", ts_col="ts"))

    def q_events_value_deciles(sf):
        """Per-type decile table of event values — nine exact
        quantile_disc picks per type
        (stages/quantile.grouped_quantiles)."""
        from s_tsfe_dl_ray.stages.quantile import grouped_quantiles

        ds = read_events(sf, columns=["event_type", "value"])
        return _round_floats(grouped_quantiles(
            ds, value_col="value", keys=["event_type"],
            quantiles=(0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9),
        ).sort("event_type"))

    def q_events_daily_health(sf):
        """Composite per-day health table: volume, error rate, exact
        p95 value, distinct users, WoW volume delta
        (pipelines/events_rollup.daily_health)."""
        from s_tsfe_dl_ray.pipelines.events_rollup import daily_health

        return _round_floats(daily_health(sf))

    def q_events_trend_census(sf):
        """Population trend census: how many users trend up / down /
        flat by the SIGN of their 6-decimal-rounded OLS slope — the
        rounding is the driver's own contract, so the classification is
        bit-exact on both sides (stages/trend.grouped_linear_trend +
        a one-row sign fold)."""
        from s_tsfe_dl_ray.stages.trend import grouped_linear_trend

        ds = read_events(sf, columns=["user_id", "ts", "value"])
        tr = _round_floats(grouped_linear_trend(
            ds, key="user_id", ts_col="ts", value_col="value",
            ref_ts_us=1_704_067_200_000_000))

        def census(df):
            s = df["slope_per_day"] if len(df) else None
            vals = {
                "n_users": len(df),
                "n_up": int((s > 0).sum()) if len(df) else 0,
                "n_down": int((s < 0).sum()) if len(df) else 0,
                "n_flat": int((s == 0).sum()) if len(df) else 0,
                "n_undefined": int(s.isna().sum()) if len(df) else 0,
            }
            return pd.DataFrame(
                {k: pd.Series([v], dtype="int64")
                 for k, v in vals.items()})

        return tr.repartition(1).map_batches(
            census, batch_format="pandas", batch_size=None)

    def q_events_forecast_backtest(sf):
        """One-step forecast backtest per event type on the dense daily
        grid: EWMA-prefix vs naive-carry MAE with the skill ratio —
        bit-exact prefix folds both sides
        (stages/trend.forecast_backtest)."""
        from s_tsfe_dl_ray.stages.trend import forecast_backtest

        ds = read_events(sf, columns=["ts", "event_type"])
        return _round_floats(forecast_backtest(
            ds, ts_col="ts", key_col="event_type", tier="1d",
            alpha=0.3))

    def q_events_type_persistence(sf):
        """Per-user behavioral stickiness: share of consecutive event
        pairs repeating the same type (the diagonal mass of the user's
        own transition matrix) (stages/scan.type_persistence)."""
        from s_tsfe_dl_ray.stages.scan import type_persistence

        ds = read_events(sf, columns=["event_id", "user_id", "ts",
                                      "event_type"])
        return _round_floats(type_persistence(
            ds, key="user_id", type_col="event_type",
            order_by=["ts", "event_id"]))

    def q_events_type_mix_drift(sf):
        """Daily chi-square drift of the event-type mix vs the
        whole-corpus mix — the ops-monitoring daily sibling of
        orders_priority_drift (stages/robust.category_mix_drift,
        period='1d')."""
        from s_tsfe_dl_ray.stages.robust import category_mix_drift

        ds = read_events(sf, columns=["ts", "event_type"])
        return _round_floats(category_mix_drift(
            ds, ts_col="ts", cat_col="event_type", period="1d"))

    def q_events_type_weekday_assoc(sf):
        """Directional association between event type and ISO weekday:
        χ² + Cramér's V + Theil's U(A|B)/U(B|A) from one contingency
        fold — "does the weekday predict the event mix, or only the
        other way round?" (stages/distinct.categorical_association)."""
        from s_tsfe_dl_ray.stages.distinct import categorical_association

        ds = read_events(sf, columns=["ts", "event_type"])

        def dow(t: pa.Table) -> pa.Table:
            ts = t["ts"]
            if isinstance(ts, pa.ChunkedArray):
                ts = ts.combine_chunks()
            d = pd.Series(ts.to_pandas()).dt.dayofweek.to_numpy() + 1
            lab = np.char.add("d", d.astype(str))
            return pa.table({
                "event_type": t["event_type"],
                "dow": pa.array(lab.astype(object), pa.string())})

        return _round_floats(categorical_association(
            ds.map_batches(dow, batch_format="pyarrow"),
            col_a="event_type", col_b="dow"))

    def q_events_mann_kendall(sf):
        """Per-user Mann–Kendall trend TEST over daily value totals:
        S over day pairs, tie-corrected Var(S), continuity-corrected z
        (stages/robust.mann_kendall) — the distribution-free "is this
        user's spend actually trending" significance screen on top of
        the kendall_tau effect size.  Daily totals ride as cents-exact
        int partials, so every sign/tie comparison is bit-exact."""
        from s_tsfe_dl_ray.stages.robust import mann_kendall

        ds = read_table(f"{sf}/events.parquet",
                        columns=["user_id", "ts", "value"])

        def part(t: pa.Table) -> pd.DataFrame:
            us = pc.cast(pc.cast(t["ts"], pa.timestamp("us")),
                         pa.int64()).to_numpy(zero_copy_only=False)
            v = pc.cast(t["value"], pa.float64()).to_numpy(
                zero_copy_only=False)
            ci = np.copysign(np.floor(np.abs(v) * 100.0 + 0.5),
                             v).astype(np.int64)
            return pd.DataFrame({
                "user_id": t["user_id"].to_numpy(zero_copy_only=False),
                "d": us // 86_400_000_000,
                "sv": ci,
            }).groupby(["user_id", "d"], sort=False, as_index=False).sum()

        daily = ds.map_batches(part, batch_format="pyarrow")
        out = mann_kendall(daily, key="user_id", order_col="d",
                           value_col="sv", min_n=3)
        return _round_floats(out.sort("user_id"))

    def q_events_friedman_types(sf):
        """Friedman blocked-ranks test: do event types rank consistently
        differently across days (blocks = days, treatments = types,
        value = cents-exact daily total, absent cells = 0)?  The
        blocked sibling of the Kruskal–Wallis screen
        (stages/robust.friedman_test); mid-ranks are exact .5 multiples
        so the statistic matches the SQL window-rank twin bit-for-bit."""
        from s_tsfe_dl_ray.stages.robust import friedman_test

        ds = read_table(f"{sf}/events.parquet",
                        columns=["ts", "event_type", "value"])

        def derive(t: pa.Table) -> pa.Table:
            us = pc.cast(pc.cast(t["ts"], pa.timestamp("us")),
                         pa.int64()).to_numpy(zero_copy_only=False)
            v = pc.cast(t["value"], pa.float64()).to_numpy(
                zero_copy_only=False)
            ci = np.copysign(np.floor(np.abs(v) * 100.0 + 0.5),
                             v).astype(np.int64)
            return pa.table({"d": pa.array(us // 86_400_000_000),
                             "ty": t["event_type"],
                             "ci": pa.array(ci)})

        cells = ds.map_batches(derive, batch_format="pyarrow")
        return _round_floats(friedman_test(
            cells, block_col="d", treat_col="ty", value_col="ci"))

    def q_events_cliffs_delta(sf):
        """Cliff's delta of purchase vs click value (cents-exact): the
        distribution-free effect size behind the Mann–Whitney test —
        net share of cross-group pairs where a purchase outranks a
        click (stages/robust.cliffs_delta; exact cumulative pair
        counts over per-value cells, no materialized pairs)."""
        from s_tsfe_dl_ray.stages.robust import cliffs_delta

        ds = read_table(f"{sf}/events.parquet",
                        columns=["event_type", "value"])

        def derive(t: pa.Table) -> pa.Table:
            ty = t["event_type"]
            keep = pc.is_in(ty, value_set=pa.array(["click", "purchase"]))
            sub = t.filter(keep)
            v = pc.cast(sub["value"], pa.float64()).to_numpy(
                zero_copy_only=False)
            ci = np.copysign(np.floor(np.abs(v) * 100.0 + 0.5),
                             v).astype(np.int64)
            g = pc.equal(sub["event_type"], "purchase")
            return pa.table({
                "g": pc.cast(g, pa.int64()),
                "v": pa.array(ci)})

        pairs = ds.map_batches(derive, batch_format="pyarrow")
        return _round_floats(cliffs_delta(
            pairs, group_col="g", value_col="v"))

    def q_events_durbin_watson(sf):
        """Per-user Durbin–Watson over OLS-detrended daily value totals
        (stages/robust.durbin_watson): is what the user's trend line
        leaves behind serially correlated?  Daily totals ride as
        cents-exact int partials; slope and DW come from one fixed
        float expression tree over exact integer moments, shared with
        the SQL twin."""
        from s_tsfe_dl_ray.stages.robust import durbin_watson

        ds = read_table(f"{sf}/events.parquet",
                        columns=["user_id", "ts", "value"])

        def part(t: pa.Table) -> pd.DataFrame:
            us = pc.cast(pc.cast(t["ts"], pa.timestamp("us")),
                         pa.int64()).to_numpy(zero_copy_only=False)
            v = pc.cast(t["value"], pa.float64()).to_numpy(
                zero_copy_only=False)
            ci = np.copysign(np.floor(np.abs(v) * 100.0 + 0.5),
                             v).astype(np.int64)
            return pd.DataFrame({
                "user_id": t["user_id"].to_numpy(zero_copy_only=False),
                "d": us // 86_400_000_000,
                "sv": ci,
            }).groupby(["user_id", "d"], sort=False, as_index=False).sum()

        daily = ds.map_batches(part, batch_format="pyarrow")
        out = durbin_watson(daily, key="user_id", order_col="d",
                            value_col="sv", min_n=3)
        return _round_floats(out.sort("user_id"))

    def q_events_yuen_t(sf):
        """Yuen's trimmed-mean t-test, purchase vs click value: the
        robust location comparison that survives the heavy tails
        Welch's t chokes on (stages/robust.yuen_trimmed_t).  20% = N//5
        observations trimmed per end via exact order statistics on
        cents cells; t and df flow through one fixed float tree."""
        from s_tsfe_dl_ray.stages.robust import yuen_trimmed_t

        ds = read_table(f"{sf}/events.parquet",
                        columns=["event_type", "value"])

        def derive(t: pa.Table) -> pa.Table:
            keep = pc.is_in(t["event_type"],
                            value_set=pa.array(["click", "purchase"]))
            sub = t.filter(keep)
            v = pc.cast(sub["value"], pa.float64()).to_numpy(
                zero_copy_only=False)
            ci = np.copysign(np.floor(np.abs(v) * 100.0 + 0.5),
                             v).astype(np.int64)
            return pa.table({
                "g": pc.cast(pc.equal(sub["event_type"], "purchase"),
                             pa.int64()),
                "v": pa.array(ci)})

        pairs = ds.map_batches(derive, batch_format="pyarrow")
        return _round_floats(yuen_trimmed_t(
            pairs, group_col="g", value_col="v", trim_den=5))

    def q_events_seasonal_mk(sf):
        """Seasonal (Hirsch–Slack) Mann–Kendall over daily value totals
        with weekday seasons: per-weekday MK S and integer variance
        numerators summed exactly before the single /18.0, so the
        weekly cycle can't fake or mask a monotone trend
        (stages/robust.seasonal_mann_kendall)."""
        from s_tsfe_dl_ray.stages.robust import seasonal_mann_kendall

        ds = read_table(f"{sf}/events.parquet", columns=["ts", "value"])

        def part(t: pa.Table) -> pd.DataFrame:
            us = pc.cast(pc.cast(t["ts"], pa.timestamp("us")),
                         pa.int64()).to_numpy(zero_copy_only=False)
            v = pc.cast(t["value"], pa.float64()).to_numpy(
                zero_copy_only=False)
            ci = np.copysign(np.floor(np.abs(v) * 100.0 + 0.5),
                             v).astype(np.int64)
            d = us // 86_400_000_000
            return pd.DataFrame({
                "season": ((d + 3) % 7) + 1,   # ISO Mon=1..Sun=7
                "d": d,
                "sv": ci,
            }).groupby(["season", "d"], sort=False, as_index=False).sum()

        daily = ds.map_batches(part, batch_format="pyarrow")
        return _round_floats(seasonal_mann_kendall(
            daily, season_col="season", order_col="d", value_col="sv",
            min_n=2))

    def q_events_weekend_cliffs(sf):
        """Cliff's delta of weekend vs weekday DAILY value totals —
        the rank-robust sibling of events_weekend_effect (Welch): how
        often does a weekend day out-earn a weekday, net?  Daily cents
        ride as exact partials into the per-value cell fold
        (stages/robust.cliffs_delta reuse)."""
        from s_tsfe_dl_ray.stages.dedup import _grouped_min
        from s_tsfe_dl_ray.stages.robust import cliffs_delta

        ds = read_table(f"{sf}/events.parquet", columns=["ts", "value"])

        def part(t: pa.Table) -> pd.DataFrame:
            us = pc.cast(pc.cast(t["ts"], pa.timestamp("us")),
                         pa.int64()).to_numpy(zero_copy_only=False)
            v = pc.cast(t["value"], pa.float64()).to_numpy(
                zero_copy_only=False)
            ci = np.copysign(np.floor(np.abs(v) * 100.0 + 0.5),
                             v).astype(np.int64)
            return pd.DataFrame({
                "d": us // 86_400_000_000, "sv": ci,
            }).groupby("d", sort=False, as_index=False).sum()

        daily = _grouped_min(
            ds.map_batches(part, batch_format="pyarrow"),
            group_cols=["d"], agg_cols=[("sv", "sum")], pkey_col="d",
            num_partitions=8)

        def to_pairs(t: pa.Table) -> pa.Table:
            d = t["d"].to_numpy(zero_copy_only=False)
            dow = ((d + 3) % 7) + 1          # ISO Mon=1..Sun=7
            return pa.table({
                "g": pa.array((dow >= 6).astype(np.int64)),
                "v": t["sv"]})

        pairs = daily.map_batches(to_pairs, batch_format="pyarrow")
        return _round_floats(cliffs_delta(
            pairs, group_col="g", value_col="v"))

    def q_events_median_test(sf):
        """Brown–Mood median test across event types: per type, counts
        above vs at-or-below the POOLED cents median (exact
        quantile_disc element), then the k×2 chi-square — the
        median-based sibling of Kruskal–Wallis that only needs one
        order statistic (stages/robust.median_test)."""
        from s_tsfe_dl_ray.stages.robust import median_test

        ds = read_table(f"{sf}/events.parquet",
                        columns=["event_type", "value"])
        return _round_floats(median_test(
            ds, group_col="event_type", value_col="value", scale=100))

    def q_events_type_cliffs_matrix(sf):
        """Pairwise Cliff's delta matrix over the event types' DAILY
        cent totals: for every ordered type pair (a < b), the net share
        of day pairs where b's daily total beats a's — the full
        rank-robust effect-size grid behind the pairwise-KS matrix.
        Daily totals ride as exact int partials; the 5×5 grid
        finalizes on one tiny partition."""
        from s_tsfe_dl_ray.stages.dedup import _grouped_min

        ds = read_table(f"{sf}/events.parquet",
                        columns=["ts", "event_type", "value"])

        def part(t: pa.Table) -> pd.DataFrame:
            us = pc.cast(pc.cast(t["ts"], pa.timestamp("us")),
                         pa.int64()).to_numpy(zero_copy_only=False)
            v = pc.cast(t["value"], pa.float64()).to_numpy(
                zero_copy_only=False)
            ci = np.copysign(np.floor(np.abs(v) * 100.0 + 0.5),
                             v).astype(np.int64)
            return pd.DataFrame({
                "ty": t["event_type"].to_numpy(zero_copy_only=False),
                "d": us // 86_400_000_000, "sv": ci,
            }).groupby(["ty", "d"], sort=False, as_index=False).sum()

        daily = _grouped_min(
            ds.map_batches(part, batch_format="pyarrow"),
            group_cols=["ty", "d"], agg_cols=[("sv", "sum")],
            pkey_col="d", num_partitions=8)

        def fin(df: pd.DataFrame) -> pd.DataFrame:
            if len(df) == 0:
                return pd.DataFrame({
                    "ty_a": pd.Series([], dtype="object"),
                    "ty_b": pd.Series([], dtype="object"),
                    "n_a": pd.Series([], dtype="int64"),
                    "n_b": pd.Series([], dtype="int64"),
                    "delta": pd.Series([], dtype="float64")})
            g = (df.groupby(["ty", "d"], sort=True, as_index=False)
                 ["sv"].sum())
            types = sorted(g["ty"].unique())
            rows = []
            for i, ta in enumerate(types):
                va = g.loc[g["ty"] == ta, "sv"].to_numpy()
                for tb in types[i + 1:]:
                    vb = g.loc[g["ty"] == tb, "sv"].to_numpy()
                    diff = vb[:, None] - va[None, :]
                    conc = int((diff > 0).sum())
                    disc = int((diff < 0).sum())
                    rows.append((ta, tb, len(va), len(vb),
                                 (conc - disc)
                                 / np.float64(len(va) * len(vb))))
            return pd.DataFrame({
                "ty_a": [r[0] for r in rows],
                "ty_b": [r[1] for r in rows],
                "n_a": pd.Series([r[2] for r in rows], dtype="int64"),
                "n_b": pd.Series([r[3] for r in rows], dtype="int64"),
                "delta": [float(r[4]) for r in rows]})

        out = (daily.repartition(1)
               .map_batches(fin, batch_format="pandas", batch_size=None))
        return _round_floats(out.sort(["ty_a", "ty_b"]))

    def q_events_window_pairs(sf):
        """Supervised (input-window, label-window) pair generation — the
        reference's forecasting batch generator as a Dataset fan-out
        (stages/slide.window_pairs; timeseries_batch_generator.py:
        186-299): per user, series ordered by (ts, event_id), anchors
        every stride=4 rows emit input v[p-8:p] / label v[p:p+4] over
        int-cent values.  Windows ride as Arrow lists in the engine; the
        query stringifies them (array_to_string twin) so the driver's
        value hash sees scalar columns."""
        from s_tsfe_dl_ray.stages.slide import window_pairs

        ds = read_table(f"{sf}/events.parquet",
                        columns=["user_id", "ts", "event_id", "value"])

        def cents(t: pa.Table) -> pa.Table:
            v = pc.cast(t["value"], pa.float64()).to_numpy(
                zero_copy_only=False)
            ci = np.copysign(np.floor(np.abs(v) * 100.0 + 0.5),
                             v).astype(np.int64)
            return pa.table({"user_id": t["user_id"], "ts": t["ts"],
                             "event_id": t["event_id"],
                             "cv": pa.array(ci)})

        prep = ds.map_batches(cents, batch_format="pyarrow")
        out = window_pairs(prep, keys=["user_id"],
                           order_by=["ts", "event_id"], value_col="cv",
                           length=8, length_target=4, stride=4)

        def fmt(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df["input_win"] = [",".join(map(str, a))
                               for a in df["input_win"]]
            df["label_win"] = [",".join(map(str, a))
                               for a in df["label_win"]]
            return df

        return (out.map_batches(fmt, batch_format="pandas")
                .sort(["user_id", "anchor_idx"]))

    def q_events_xicor(sf):
        """Chatterjee's rank correlation xi of value against time order,
        per event type (stages/robust.xicor): does the metric depend on
        WHEN at all — monotone or not?  Integer tie-robust estimator
        over cents; one fixed float tree shared with the rank-window
        SQL twin."""
        from s_tsfe_dl_ray.stages.robust import xicor

        ds = read_table(f"{sf}/events.parquet",
                        columns=["event_type", "ts", "event_id", "value"])

        def part(t: pa.Table) -> pa.Table:
            v = pc.cast(t["value"], pa.float64()).to_numpy(
                zero_copy_only=False)
            ci = np.copysign(np.floor(np.abs(v) * 100.0 + 0.5),
                             v).astype(np.int64)
            return pa.table({"event_type": t["event_type"],
                             "ts": t["ts"], "event_id": t["event_id"],
                             "y": pa.array(ci)})

        prep = ds.map_batches(part, batch_format="pyarrow")
        out = xicor(prep, key="event_type", order_by=["ts", "event_id"],
                    value_col="y", min_n=3)
        return _round_floats(out.sort("event_type"))

    def q_events_theil_users(sf):
        """Per-user Theil-T decomposition of positive event-value mass
        (stages/activity.theil_contributions reuse on the events
        table): which users carry the value concentration; non-positive
        per-user sums drop exactly like the twin's WHERE."""
        from s_tsfe_dl_ray.stages.activity import theil_contributions

        ds = read_table(f"{sf}/events.parquet",
                        columns=["user_id", "value"])

        def part(t: pa.Table) -> pa.Table:
            v = pc.cast(t["value"], pa.float64()).to_numpy(
                zero_copy_only=False)
            ci = np.copysign(np.floor(np.abs(v) * 100.0 + 0.5),
                             v).astype(np.int64)
            return pa.table({"user_id": t["user_id"],
                             "cents": pa.array(ci)})

        prep = ds.map_batches(part, batch_format="pyarrow")
        return _round_floats(theil_contributions(
            prep, key_col="user_id", value_col="cents"))

    def q_events_kendall_w(sf):
        """Kendall's coefficient of concordance across event types over
        daily value ranks (stages/robust.kendalls_w): do all types
        agree which days are the big days?  Doubled average ranks ride
        as exact int64; one fixed float division."""
        from s_tsfe_dl_ray.stages.robust import kendalls_w

        ds = read_table(f"{sf}/events.parquet",
                        columns=["event_type", "ts", "value"])

        def part(t: pa.Table) -> pd.DataFrame:
            us = pc.cast(pc.cast(t["ts"], pa.timestamp("us")),
                         pa.int64()).to_numpy(zero_copy_only=False)
            v = pc.cast(t["value"], pa.float64()).to_numpy(
                zero_copy_only=False)
            ci = np.copysign(np.floor(np.abs(v) * 100.0 + 0.5),
                             v).astype(np.int64)
            return pd.DataFrame({
                "event_type": t["event_type"].to_numpy(
                    zero_copy_only=False),
                "d": us // 86_400_000_000,
                "cv": ci,
            }).groupby(["event_type", "d"], sort=False,
                       as_index=False).sum()

        daily = ds.map_batches(part, batch_format="pyarrow")
        return _round_floats(kendalls_w(
            daily, judge_col="event_type", object_col="d",
            value_col="cv"))

    return {k[2:]: v for k, v in locals().items() if k.startswith("q_")}
