"""Events-table query bodies, first half (rollups, gap-fill, scans, windows).

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

    def q_events_rollup_1m(sf):
        return _round_floats(events_tier(sf, "1m"))

    def q_events_rollup_1h(sf):
        return _round_floats(events_tiers(sf, ("1m", "1h"))["1h"])

    def q_events_rollup_1d(sf):
        return _round_floats(events_tiers(sf, ("1m", "1h", "1d"))["1d"])

    def q_events_gapfill_ffill_1h(sf):
        return _round_floats(_events_gapfill(sf, "ffill"))

    def q_events_gapfill_interp_1h(sf):
        return _round_floats(_events_gapfill(sf, "interp"))

    def q_events_error_rate_1d(sf):
        return _round_floats(events_type_rate(sf, event_type="error", tier="1d"))

    def q_events_top20_windows_1h(sf):
        return _round_floats(events_top_windows(sf, tier="1h", k=20))

    def q_events_sessionize_30m(sf):
        ds = read_events(sf, columns=["event_id", "user_id", "ts"])
        return _round_floats(
            sessionize(ds, keys=["user_id"], ts_col="ts",
                       order_by=["ts", "event_id"], gap="30m")
        )

    def q_events_running_sum(sf):
        ds = read_events(sf, columns=["event_id", "user_id", "ts", "value"])
        return _round_floats(ordered_scan(
            ds, keys=["user_id"], order_by=["ts", "event_id"],
            scans={"running_sum": ("value", "cumsum"),
                   "running_max": ("value", "cummax")},
        ))

    def q_events_value_delta(sf):
        """SQL lag/diff as ordered-scan kinds (stages/scan.py) — the
        engine's first-difference feature for change detection; carries
        across salt-chunk boundaries in mega-key mode (test_salted)."""
        ds = read_events(sf, columns=["event_id", "user_id", "ts", "value"])
        return _round_floats(ordered_scan(
            ds, keys=["user_id"], order_by=["ts", "event_id"],
            scans={"value_prev": ("value", "lag"),
                   "value_delta": ("value", "delta")},
        ))

    def q_events_trailing_1h(sf):
        """Trailing RANGE window (continuous sibling of the tumbling
        rollup): per event, sum/count over the user's last hour —
        offset-packed searchsorted + prefix sums, no per-key loop
        (stages/scan.trailing_agg)."""
        from s_tsfe_dl_ray.stages.scan import trailing_agg

        ds = read_events(sf, columns=["event_id", "user_id", "ts", "value"])
        return _round_floats(trailing_agg(
            ds, key="user_id", ts_col="ts", value_col="value",
            window_us=3_600_000_000,
            sum_col="value_sum_1h", count_col="n_events_1h",
        ))

    def q_events_first_per_key(sf):
        ds = read_events(sf, columns=["event_id", "user_id", "event_type", "ts", "value"])
        return _round_floats(first_per_key(
            ds, keys=["user_id", "event_type"], order_by=["ts", "event_id"]
        ))

    def q_events_latest_per_key(sf):
        """Late-data upsert: last-writer-wins per (user, type) — replays
        and corrections collapse to the newest version."""
        from s_tsfe_dl_ray.stages.dedup import latest_per_key

        ds = read_events(sf, columns=["event_id", "user_id", "event_type", "ts", "value"])
        return _round_floats(latest_per_key(
            ds, keys=["user_id", "event_type"], order_by=["ts", "event_id"]
        ))

    def q_events_rolling_mean5(sf):
        from s_tsfe_dl_ray.stages.transform import rolling_mean

        ds = read_events(sf, columns=["event_id", "user_id", "ts", "value"])
        return _round_floats(rolling_mean(
            ds, keys=["user_id"], order_by=["ts", "event_id"],
            col="value", window=5, out_col="value_ma5",
        ))

    def q_events_ewma(sf):
        """Per-user EWMA (alpha 0.3) in explicit (ts, event_id) order —
        the recency-weighted smoother for drift/anomaly baselines.
        Bitwise-identical to the DuckDB recursive-CTE twin (also pinned
        by pytest tests/test_ewma.py, incl. salted==unsalted)."""
        from s_tsfe_dl_ray.stages.transform import ewma

        ds = read_events(sf, columns=["event_id", "user_id", "ts", "value"])
        return _round_floats(ewma(
            ds, keys=["user_id"], order_by=["ts", "event_id"],
            col="value", alpha=0.3, out_col="value_ewma",
        ))

    def q_events_standardize(sf):
        from s_tsfe_dl_ray.stages.transform import standardize

        ds = read_events(sf, columns=["event_id", "user_id", "value"])
        return _round_floats(standardize(ds, cols=["value"]))

    def q_events_one_hot(sf):
        from s_tsfe_dl_ray.stages.transform import one_hot

        ds = read_events(sf, columns=["event_id", "event_type"])
        return one_hot(ds, col="event_type",
                       categories=["click", "view", "purchase", "signup", "error"])

    def q_events_segment_runs(sf):
        from s_tsfe_dl_ray.stages.sessionize import segment_runs

        ds = read_events(sf, columns=["event_id", "user_id", "event_type", "ts"])
        return segment_runs(ds, keys=["user_id"], value_col="event_type",
                            ts_col="ts", order_by=["ts", "event_id"])

    def q_events_hash_split(sf):
        from s_tsfe_dl_ray.stages.transform import hash_split

        ds = read_events(sf, columns=["event_id"])
        return hash_split(ds, id_col="event_id", test_fraction=0.2)

    def q_events_stratified_split(sf):
        from s_tsfe_dl_ray.stages.transform import stratified_hash_split

        ds = read_events(sf, columns=["event_id", "event_type"])
        return stratified_hash_split(
            ds, id_col="event_id", strata_col="event_type", test_fraction=0.2
        )

    def q_events_ensemble_mean(sf):
        """Ensemble execution (KimMinGu analog, models_keras.py:1169-1242):
        three member scorers over ONE input via independent actor pools,
        union, per-row soft-vote mean."""
        from s_tsfe_dl_ray.pipelines.ensemble import ensemble_mean, ensemble_scores

        # defined in function scope so cloudpickle ships the actor class
        # by VALUE — workers need not import this module under its
        # driver-side name
        class _EnsembleMember:
            """Deterministic demo scorer (stands in for a trained model's
            forward pass); state built once per actor."""

            def __init__(self, mode: str):
                self.mode = mode

            def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
                import numpy as np

                v = b["value"].to_numpy(dtype="float64")
                if self.mode == "double":
                    s = 2.0 * v
                elif self.mode == "shift":
                    s = v + 10.0
                else:
                    s = np.sqrt(np.abs(v))
                return pd.DataFrame({"event_id": b["event_id"], "score": s})

        ds = read_events(sf, columns=["event_id", "value"])
        scored = ensemble_scores(ds, {
            "double": (_EnsembleMember, {"mode": "double"}),
            "shift": (_EnsembleMember, {"mode": "shift"}),
            "root": (_EnsembleMember, {"mode": "root"}),
        })
        return _round_floats(ensemble_mean(scored, id_cols=["event_id"]))

    def q_events_asof_purchase(sf):
        from s_tsfe_dl_ray.stages.asof import asof_join_self

        ds = read_events(sf, columns=["event_id", "user_id", "event_type", "ts", "value"])
        return _round_floats(asof_join_self(
            ds, key="user_id", ts_col="ts",
            left_filter=("event_type", "click"),
            right_filter=("event_type", "purchase"),
            right_value_cols=["value"],
            order_tiebreak="event_id",
        ))

    def q_events_retention_1h(sf):
        from s_tsfe_dl_ray.stages.rollup import apply_retention

        tier = events_tier(sf, "1h")
        return _round_floats(apply_retention(
            tier, keep_from="2024-01-15T00:00:00"
        ))

    def q_events_type_counts(sf):
        from s_tsfe_dl_ray.pipelines.relational import grouped_aggregate

        ds = read_events(sf, columns=["event_type", "value"])
        return _round_floats(grouped_aggregate(
            ds, keys=["event_type"],
            aggs={
                "n_events": ("value", "count"),
                "value_sum": ("value", "sum"),
                "value_min": ("value", "min"),
                "value_max": ("value", "max"),
                "value_mean": ("value", "mean"),
            },
        ))

    def q_events_attention_pool(sf):
        """Attention-reweighting analog (reference §0: aggregate → weight
        → elementwise multiply; e.g. squeeze-excite/attention blocks):
        per-key softmax-weighted value pooling,
        out = Σ exp(v/100)·v / Σ exp(v/100), decomposed into associative
        sums via CustomAgg (the score is pre-scaled so exp() stays in
        range — same expression in the SQL twin)."""
        from s_tsfe_dl_ray.pipelines.relational import CustomAgg, grouped_aggregate

        ds = read_events(sf, columns=["user_id", "value"])

        def derive(t: pa.Table) -> pa.Table:
            es = pc.exp(pc.divide(t["value"], pa.scalar(100.0)))
            t = t.append_column("es", es)
            return t.append_column("esv", pc.multiply(es, t["value"]))

        ds = ds.map_batches(derive, batch_format="pyarrow")

        def fin(t: pa.Table):
            return pc.divide(t["__esv_sum"], t["__es_sum"])

        return _round_floats(grouped_aggregate(
            ds, keys=["user_id"],
            aggs={"n_events": ("value", "count")},
            custom={"value_attn": CustomAgg(
                bases=(("es", "sum"), ("esv", "sum")), finalize=fin,
            )},
        ))

    def q_events_sliding_features(sf):
        """Reference window-generator semantics (length=5, stride=3,
        full windows only) as per-window feature rows."""
        from s_tsfe_dl_ray.stages.slide import sliding_window_features

        ds = read_events(sf, columns=["event_id", "user_id", "ts", "value"])
        return _round_floats(sliding_window_features(
            ds, keys=["user_id"], order_by=["ts", "event_id"],
            value_col="value", length=5, stride=3,
        ))

    def q_events_reverse_series(sf):
        from s_tsfe_dl_ray.stages.slide import reverse_series

        ds = read_events(sf, columns=["event_id", "user_id", "ts", "value"])
        return _round_floats(reverse_series(
            ds, keys=["user_id"], order_by=["ts", "event_id"]
        ))

    def q_events_value_variance(sf):
        """Custom aggregate UDF injection (SURVEY.md §2.10): population
        variance + range as user-registered aggregates decomposed into
        associative bases (sum, sum-of-squares, count / min, max)."""
        from s_tsfe_dl_ray.pipelines.relational import CustomAgg, grouped_aggregate

        ds = read_events(sf, columns=["event_type", "value"])
        ds = ds.map_batches(
            lambda t: t.append_column("value_sq", pc.multiply(t["value"], t["value"])),
            batch_format="pyarrow",
        )

        def fin_var(t: pa.Table):
            n = pc.cast(t["__value_count"], pa.float64())
            mean = pc.divide(pc.cast(t["__value_sum"], pa.float64()), n)
            meansq = pc.divide(pc.cast(t["__value_sq_sum"], pa.float64()), n)
            return pc.subtract(meansq, pc.multiply(mean, mean))

        return _round_floats(grouped_aggregate(
            ds, keys=["event_type"],
            aggs={"n_events": ("value", "count")},
            custom={
                "value_var": CustomAgg(
                    bases=(("value", "sum"), ("value_sq", "sum"), ("value", "count")),
                    finalize=fin_var,
                ),
                "value_range": CustomAgg(
                    bases=(("value", "min"), ("value", "max")),
                    finalize=lambda t: pc.subtract(t["__value_max"], t["__value_min"]),
                ),
            },
        ))

    def q_events_click_attribution(sf):
        """Interval (range) join: each click resolves to the most recent
        1-hour purchase attribution window still active at click time —
        the range-predicate join Ray Data lacks natively
        (stages/asof.interval_join: co-partition + merge_asof + expiry)."""
        from s_tsfe_dl_ray.stages.asof import interval_join

        clicks = read_events(
            sf, columns=["event_id", "user_id", "event_type", "ts", "value"]
        ).map_batches(
            lambda t: t.filter(pc.equal(t["event_type"], "click"))
                       .select(["event_id", "user_id", "ts", "value"]),
            batch_format="pyarrow", zero_copy_batch=True,
        )

        def windows(t: pa.Table) -> pa.Table:
            t = t.filter(pc.equal(t["event_type"], "purchase"))
            end = pc.add(t["ts"], pa.scalar(3_600_000_000, pa.duration("us")))
            return pa.table({
                "user_id": t["user_id"], "win_start": t["ts"],
                "win_end": end, "purchase_value": t["value"],
            })

        intervals = read_events(
            sf, columns=["user_id", "event_type", "ts", "value"]
        ).map_batches(windows, batch_format="pyarrow", zero_copy_batch=True)
        return _round_floats(interval_join(
            clicks, intervals, key="user_id", point_ts="ts",
            start_col="win_start", end_col="win_end",
            interval_cols=["purchase_value"], how="left",
        ))

    def q_events_pivot_type_sums(sf):
        """Long→wide PIVOT: per-user value sums per event_type as columns
        (pipelines/relational.pivot_wide — indicator-multiply derive fused
        into the combiner; wide partials only cross the exchange)."""
        from s_tsfe_dl_ray.pipelines.relational import pivot_wide

        ds = read_events(sf, columns=["user_id", "event_type", "value"])
        return _round_floats(pivot_wide(
            ds, keys=["user_id"], pivot_col="event_type", value_col="value",
            categories=["click", "view", "purchase", "signup", "error"],
            count_alias="n_events",
        ))

    def q_events_linear_trend(sf):
        """Per-key OLS trend (slope/intercept/corr of value on days since
        2024-01-01) — seven raw moments per key per batch cross the
        exchange, closed-form finalize (stages/trend.grouped_linear_trend;
        the per-series model-fit analog of the reference's
        fit-per-unit loop, experiments/arrythmia_experiment.py:179)."""
        from s_tsfe_dl_ray.stages.trend import grouped_linear_trend

        ds = read_events(sf, columns=["user_id", "ts", "value"])
        return _round_floats(grouped_linear_trend(
            ds, key="user_id", ts_col="ts", value_col="value",
            ref_ts_us=1_704_067_200_000_000,  # 2024-01-01T00:00:00Z
        ))

    def q_events_m4_1h(sf):
        """M4 visualization downsample (Jugel et al., VLDB 2014): per
        (user, hour) min/max/first/last value WITH their timestamps;
        extreme (value, ts) pairs merge lexicographically so the one
        exchange carries 8 scalars per key-window per batch
        (stages/downsample.m4_downsample)."""
        from s_tsfe_dl_ray.stages.downsample import m4_downsample

        ds = read_events(sf, columns=["user_id", "ts", "value"])
        return _round_floats(m4_downsample(
            ds, key="user_id", ts_col="ts", value_col="value", tier="1h",
        ))

    def q_events_trailing_zscore(sf):
        """Trailing-window anomaly score: value standardized against the
        user's own last 6h (stream analog of the reference's
        reconstruction-error thresholding) — same offset-packed prefix-sum
        dataflow as trailing_agg, plus a value² prefix
        (stages/scan.trailing_zscore)."""
        from s_tsfe_dl_ray.stages.scan import trailing_zscore

        ds = read_events(sf, columns=["event_id", "user_id", "ts", "value"])
        return _round_floats(trailing_zscore(
            ds, key="user_id", ts_col="ts", value_col="value",
            window_us=6 * 3_600_000_000,
        ))

    def q_events_rolling_median5(sf):
        """Rolling MEDIAN (robust despiking smoother) over the user's 5
        most recent rows — order-statistic sibling of rolling_mean5, same
        grouped dataflow + salted mega-key mode
        (stages/transform.rolling_median)."""
        from s_tsfe_dl_ray.stages.transform import rolling_median

        ds = read_events(sf, columns=["event_id", "user_id", "ts", "value"])
        return _round_floats(rolling_median(
            ds, keys=["user_id"], order_by=["ts", "event_id"],
            col="value", window=5, out_col="value_med5",
        ))

    def q_events_rolling_p90(sf):
        """Trailing discrete p90 over the user's 20 most recent rows —
        the spike-envelope alerting threshold; exact quantile_disc
        selection per window (stages/transform.rolling_quantile)."""
        from s_tsfe_dl_ray.stages.transform import rolling_quantile

        ds = read_events(sf, columns=["event_id", "user_id", "ts", "value"])
        return _round_floats(rolling_quantile(
            ds, keys=["user_id"], order_by=["ts", "event_id"],
            col="value", window=20, q=0.9, out_col="value_p90",
        ))

    def q_events_unpivot_type_sums(sf):
        """Wide→long UNPIVOT closing the reshape loop: pivot_wide's
        per-type sum columns melted back to (user, variable, value_sum)
        rows — zero-copy column slices, no shuffle beyond the pivot's own
        (stages/transform.unpivot)."""
        from s_tsfe_dl_ray.pipelines.relational import pivot_wide
        from s_tsfe_dl_ray.stages.transform import unpivot

        cats = ["click", "view", "purchase", "signup", "error"]
        ds = read_events(sf, columns=["user_id", "event_type", "value"])
        wide = pivot_wide(
            ds, keys=["user_id"], pivot_col="event_type", value_col="value",
            categories=cats, count_alias="n_events",
        )
        return _round_floats(unpivot(
            wide, keys=["user_id"],
            value_cols=[f"value_sum_{c}" for c in cats],
            var_col="variable", value_col="value_sum",
        ))

    def q_events_twa(sf):
        """Per-user time-weighted (LOCF, duration-weighted) mean — the
        correct average for irregularly sampled series; lead/diff/
        weighted-sum vectorized over key-change boundaries in one
        co-partition (stages/scan.time_weighted_mean)."""
        from s_tsfe_dl_ray.stages.scan import time_weighted_mean

        ds = read_events(sf, columns=["event_id", "user_id", "ts", "value"])
        return _round_floats(time_weighted_mean(
            ds, key="user_id", ts_col="ts", value_col="value",
            order_by=["ts", "event_id"],
        ))

    def q_events_funnel(sf):
        """Ordered funnel view → click → purchase: first completion of
        each stage strictly after the previous one, one vectorized pass
        per stage, no per-key loop (stages/funnel.funnel)."""
        from s_tsfe_dl_ray.stages.funnel import funnel

        ds = read_events(sf, columns=["user_id", "ts", "event_type"])
        return funnel(
            ds, key="user_id", ts_col="ts", type_col="event_type",
            stages=["view", "click", "purchase"],
        )

    def q_events_cohort_retention(sf):
        """Cohort retention matrix (first-seen day × activity day user
        counts): both grains fused into one (user, day, min_ts) combiner
        partial, one user-hash exchange, tiny days² final merge
        (stages/cohort.cohort_retention)."""
        from s_tsfe_dl_ray.stages.cohort import cohort_retention

        ds = read_events(sf, columns=["user_id", "ts"])
        return cohort_retention(ds, key="user_id", ts_col="ts", tier="1d")

    def q_events_cusum(sf):
        """One-sided CUSUM drift statistic per user (Page 1954),
        vectorized via the reflected-walk identity s = c − min(0, min c)
        — two grouped cumulative kernels, no per-row recurrence; the same
        identity makes it a plain window-function SQL twin
        (stages/scan.cusum)."""
        from s_tsfe_dl_ray.stages.scan import cusum

        ds = read_events(sf, columns=["event_id", "user_id", "ts", "value"])
        return _round_floats(cusum(
            ds, key="user_id", order_by=["ts", "event_id"],
            value_col="value", target=50.0,
        ))

    def q_events_seasonal_adjust(sf):
        """Seasonal-naive decomposition: value minus the user's own
        hour-of-day mean (the residual anomaly detectors should consume
        for daily-patterned series); fit+transform fused into the one
        key-hash partition (stages/trend.seasonal_adjust)."""
        from s_tsfe_dl_ray.stages.trend import seasonal_adjust

        ds = read_events(sf, columns=["event_id", "user_id", "ts", "value"])
        return _round_floats(seasonal_adjust(
            ds, key="user_id", ts_col="ts", value_col="value",
            period="hour_of_day",
        ))

    def q_events_type_corr(sf):
        """Cross-series correlation matrix: pairwise Pearson corr of the
        per-user event-type value sums (pivot_wide → pairwise_corr) —
        K×K raw-moment partials per batch, one tiny final reduce
        (stages/trend.pairwise_corr)."""
        from s_tsfe_dl_ray.pipelines.relational import pivot_wide
        from s_tsfe_dl_ray.stages.trend import pairwise_corr

        cats = ["click", "view", "purchase", "signup", "error"]
        ds = read_events(sf, columns=["user_id", "event_type", "value"])
        wide = pivot_wide(
            ds, keys=["user_id"], pivot_col="event_type", value_col="value",
            categories=cats, count_alias="n_events",
        )
        return _round_floats(pairwise_corr(
            wide, cols=[f"value_sum_{c}" for c in cats]))

    def q_events_winsorize_p95(sf):
        """Per-user p95 clipping (one-sided winsorization): quantile_disc
        fit + clamp fused in one key-hash partition, vectorized rank
        indexing (stages/transform.winsorize)."""
        from s_tsfe_dl_ray.stages.transform import winsorize

        ds = read_events(sf, columns=["event_id", "user_id", "value"])
        return _round_floats(winsorize(
            ds, key="user_id", value_col="value", q=0.95,
            out_col="value_w95",
        ))

    def q_events_grouping_sets(sf):
        """GROUPING SETS in one input pass: (user, type) / (user) / grand
        total, each granularity's combiner partial from the same batch
        scan, SQL GROUPING() bitmask, sentinel-coalesced rolled-up keys
        (stages/grouping.grouping_sets)."""
        from s_tsfe_dl_ray.stages.grouping import grouping_sets

        ds = read_events(sf, columns=["user_id", "event_type", "value"])
        return _round_floats(grouping_sets(
            ds, keys=["user_id", "event_type"],
            sets=[["user_id", "event_type"], ["user_id"], []],
            value_col="value",
            sentinels={"user_id": -1, "event_type": ""},
            count_alias="n_events",
        ))

    def q_events_sample_per_user(sf):
        """Deterministic balanced subsample: 5 rows per user ranked by
        md5(event_id) — stable across cluster sizes / reruns / row order
        (stages/transform.sample_per_key)."""
        from s_tsfe_dl_ray.stages.transform import sample_per_key

        ds = read_events(sf, columns=["event_id", "user_id", "value"])
        return _round_floats(sample_per_key(
            ds, key="user_id", id_col="event_id", n=5))

    def q_events_value_quantiles_approx(sf):
        """Approximate per-user p50/p95/p99 of the CONTINUOUS value
        column: t-digest-style centroid sketch, O(keys × delta) exchange
        rows per batch, fully vectorized across keys (stages/
        quantile.grouped_quantiles_approx). Sketch-state-dependent ->
        rows-only; the rank-error envelope is pinned by pytest."""
        from s_tsfe_dl_ray.stages.quantile import grouped_quantiles_approx

        ds = read_events(sf, columns=["user_id", "value"])
        return _round_floats(grouped_quantiles_approx(
            ds, value_col="value", keys=["user_id"],
            quantiles=(0.5, 0.95, 0.99), delta=128,
        ))

    def q_events_burstiness(sf):
        """Per-user inter-event-gap distribution + Goh–Barabási
        burstiness index (σ−µ)/(σ+µ) — how far each key's firing pattern
        is from a uniform clock (stages/trend.interarrival_stats)."""
        from s_tsfe_dl_ray.stages.trend import interarrival_stats

        ds = read_events(sf, columns=["event_id", "user_id", "ts"])
        return _round_floats(interarrival_stats(
            ds, key="user_id", ts_col="ts", order_by=["ts", "event_id"]))

    def q_events_lag1_autocorr(sf):
        """Per-user lag-1 autocorrelation of value (noise vs momentum in
        one number); corr over (x, lag x) pairs with SQL NULL rules
        (stages/trend.lag1_autocorr)."""
        from s_tsfe_dl_ray.stages.trend import lag1_autocorr

        ds = read_events(sf, columns=["event_id", "user_id", "ts", "value"])
        return _round_floats(lag1_autocorr(
            ds, key="user_id", value_col="value",
            order_by=["ts", "event_id"]))

    def q_events_percent_rank(sf):
        """Per-user empirical-CDF rank transform (distribution-free
        normalization, min-rank ties) — one sort + cumulative-max run
        propagation, no per-key loop (stages/transform.percent_rank)."""
        from s_tsfe_dl_ray.stages.transform import percent_rank

        ds = read_events(sf, columns=["event_id", "user_id", "value"])
        return _round_floats(percent_rank(
            ds, key="user_id", value_col="value"))

    def q_events_impute_mean(sf):
        """Missing-value repair: error-turn values nulled (simulated
        sensor dropout) then imputed with the user's own mean —
        fit+fill fused in one key-hash partition
        (stages/transform.impute_mean)."""
        import pyarrow as pa
        import pyarrow.compute as pc

        from s_tsfe_dl_ray.stages.transform import impute_mean

        def null_errors(t: pa.Table) -> pa.Table:
            v = pc.if_else(pc.equal(t["event_type"], "error"),
                           pa.scalar(None, pa.float64()), t["value"])
            return t.drop_columns(["value", "event_type"]).append_column("value", v)

        ds = read_events(sf, columns=["event_id", "user_id", "event_type",
                                      "value"])
        ds = ds.map_batches(null_errors, batch_format="pyarrow")
        return _round_floats(impute_mean(ds, key="user_id", value_col="value"))

    def q_events_snapshot_diff(sf):
        """Snapshot reconciliation: two deterministic views of events
        (mod-rule deletions, insertions, and value edits) diffed to
        added/removed/changed rows per key — hash co-partition, NULL-
        safe compare (stages/join.snapshot_diff)."""
        import pyarrow as pa
        import pyarrow.compute as pc

        from s_tsfe_dl_ray.stages.join import snapshot_diff

        import numpy as np

        def old_view(t: pa.Table) -> pa.Table:
            ids = t["event_id"].to_numpy(zero_copy_only=False)
            return t.filter(pa.array(ids % 7 != 0))

        def new_view(t: pa.Table) -> pa.Table:
            ids = t["event_id"].to_numpy(zero_copy_only=False)
            t = t.filter(pa.array(ids % 5 != 0))
            ids = t["event_id"].to_numpy(zero_copy_only=False)
            v = pc.if_else(pa.array(ids % 11 == 0),
                           pc.add(t["value"], 1.0), t["value"])
            return t.drop_columns(["value"]).append_column("value", v)

        base = read_events(sf, columns=["event_id", "value"])
        old = base.map_batches(old_view, batch_format="pyarrow")
        new = read_events(sf, columns=["event_id", "value"]) \
            .map_batches(new_view, batch_format="pyarrow")
        return snapshot_diff(old, new, key="event_id",
                             compare_cols=["value"])

    def q_events_holt_forecast(sf):
        """Holt double-exponential smoothing per user (level + trend +
        one-step forecast) — the classical forecast baseline; affine
        (A^n, v) salted carries (stages/transform.holt_smooth).  The
        second-order recurrence is a two-state recursive CTE (l, b
        columns; 1−α and 1−β exact in IEEE754) — external oracle;
        literal-fold + salted-parity pytest still pin it."""
        from s_tsfe_dl_ray.stages.transform import holt_smooth

        ds = read_events(sf, columns=["event_id", "user_id", "ts", "value"])
        return _round_floats(holt_smooth(
            ds, keys=["user_id"], order_by=["ts", "event_id"],
            col="value", alpha=0.4, beta=0.2))

    def q_events_next_purchase(sf):
        """FORWARD as-of with staleness tolerance: for each click, the
        next purchase by the same user within 24h (NULL past the
        tolerance) — direction/tolerance extension of the as-of
        operator (stages/asof.asof_join_self)."""
        from s_tsfe_dl_ray.stages.asof import asof_join_self

        ds = read_events(sf, columns=["event_id", "user_id", "ts",
                                      "event_type"])
        out = asof_join_self(
            ds, key="user_id", ts_col="ts",
            left_filter=("event_type", "click"),
            right_filter=("event_type", "purchase"),
            right_value_cols=[], order_tiebreak="event_id",
            direction="forward", tolerance_us=24 * 3_600_000_000,
        )
        return out.drop_columns(["event_type"])

    def q_events_binary_metrics(sf):
        """Distributed confusion matrix + accuracy/precision/recall/F1
        (prediction: value >= 50, label: purchase) — four counts per
        batch, one tiny merge; the reference's metric tail as a
        distributed aggregate (stages/metrics.binary_metrics)."""
        import pyarrow as pa
        import pyarrow.compute as pc

        from s_tsfe_dl_ray.stages.metrics import binary_metrics

        def derive(t: pa.Table) -> pa.Table:
            return t.append_column(
                "label", pc.equal(t["event_type"], "purchase"))

        ds = read_events(sf, columns=["value", "event_type"]) \
            .map_batches(derive, batch_format="pyarrow")
        return _round_floats(binary_metrics(
            ds, score_col="value", label_col="label", threshold=50.0))

    def q_events_auc(sf):
        """Exact distributed ROC-AUC via the Mann–Whitney mid-rank form
        over the (score → n_pos, n_neg) value histogram — one row per
        distinct score crosses the exchange, never raw rows
        (stages/metrics.auc_roc)."""
        import pyarrow as pa
        import pyarrow.compute as pc

        from s_tsfe_dl_ray.stages.metrics import auc_roc

        def derive(t: pa.Table) -> pa.Table:
            return t.append_column(
                "label", pc.equal(t["event_type"], "purchase"))

        ds = read_events(sf, columns=["value", "event_type"]) \
            .map_batches(derive, batch_format="pyarrow")
        return _round_floats(auc_roc(ds, score_col="value", label_col="label"))

    def q_events_props_extract(sf):
        """Semi-structured payload ingestion: the JSON props column's
        $.k field extracted per row (vectorized Rust json_path_match,
        no per-row json.loads) then summed per user — extraction
        feeding the standard rollup combiner
        (stages/transform.json_extract_scalar)."""
        import pyarrow as pa

        from s_tsfe_dl_ray.pipelines.relational import grouped_aggregate
        from s_tsfe_dl_ray.stages.transform import json_extract_scalar

        ds = read_events(sf, columns=["user_id", "props"])
        ext = json_extract_scalar(
            ds, col="props", path="$.k", out_col="k_value",
            cast_to=pa.int64())
        return grouped_aggregate(
            ext, keys=["user_id"],
            aggs={"k_sum": ("k_value", "sum"),
                  "k_min": ("k_value", "min"),
                  "k_max": ("k_value", "max"),
                  "n_events": ("k_value", "count")},
        )

    def q_events_calibration(sf):
        """Reliability table (calibration diagnostic next to AUC): value
        rescaled to [0,1], 10 equal-width bins, per-bin count / mean
        score / positive rate (stages/metrics.calibration_bins)."""
        import pyarrow as pa
        import pyarrow.compute as pc

        from s_tsfe_dl_ray.stages.metrics import calibration_bins

        def derive(t: pa.Table) -> pa.Table:
            t = t.append_column("label", pc.equal(t["event_type"], "purchase"))
            return t.append_column("score", pc.divide(t["value"], 100.0))

        ds = read_events(sf, columns=["value", "event_type"]) \
            .map_batches(derive, batch_format="pyarrow")
        return _round_floats(calibration_bins(
            ds, score_col="score", label_col="label", n_bins=10))

    def q_events_top3_by_value(sf):
        """Generic per-key row selection: each user's 3 highest-value
        events (full rows), deterministic ties by event_id
        (stages/transform.top_n_per_key)."""
        from s_tsfe_dl_ray.stages.transform import top_n_per_key

        ds = read_events(sf, columns=["event_id", "user_id", "value"])
        return _round_floats(top_n_per_key(
            ds, key="user_id", score_col="value", n=3,
            tiebreak_col="event_id"))

    def q_events_debounce_1m(sf):
        """Greedy min-gap throttle (alert dedup): keep an event only if
        >= 60s since the user's last KEPT event; survivor-jump
        searchsorted walk, loop length == output size
        (stages/sessionize.debounce).  The greedy keep-chain is
        row-stepped-recursive — expressible as a recursive CTE with
        (kept, last_kept) state (the EWMA pattern), now an external
        oracle; literal-fold + blocking-invariance pytest still pin
        it."""
        from s_tsfe_dl_ray.stages.sessionize import debounce

        ds = read_events(sf, columns=["event_id", "user_id", "ts"])
        return debounce(ds, key="user_id", ts_col="ts",
                        min_gap_us=60_000_000, order_by=["ts", "event_id"])

    def q_events_health_report(sf):
        """Composite drift monitor (pipelines/health.series_health_report):
        seasonal_adjust → slacked CUSUM on residuals → threshold →
        debounced alerts → per-key report joined with the OLS trend —
        the round-3 timeseries operators composed end-to-end.  Contains
        debounce (greedy) -> rows-only; semantics pinned by the
        planted-drift pytest."""
        from s_tsfe_dl_ray.pipelines.health import series_health_report

        ds = read_events(sf, columns=["event_id", "user_id", "ts", "value"])
        return _round_floats(series_health_report(
            ds, key="user_id", ts_col="ts", value_col="value",
            event_id_col="event_id",
            ref_ts_us=1_704_067_200_000_000,
            cusum_threshold=250.0, slack=10.0,
        ))

    def q_events_standardize_per_user(sf):
        """Per-key z-score (each series normalized against ITSELF) —
        the grouped sibling of the global standardize; SQL stddev_samp
        NULL semantics (stages/transform.standardize_per_key)."""
        from s_tsfe_dl_ray.stages.transform import standardize_per_key

        ds = read_events(sf, columns=["event_id", "user_id", "value"])
        return _round_floats(standardize_per_key(
            ds, key="user_id", value_col="value", out_col="value_zk"))

    def q_events_funnel_24h(sf):
        """Funnel with a conversion window: click within 24h of the
        first view, purchase within 24h of that click — the bounded
        'converted in time' form (stages/funnel.funnel max_gap_us)."""
        from s_tsfe_dl_ray.stages.funnel import funnel

        ds = read_events(sf, columns=["user_id", "ts", "event_type"])
        return funnel(
            ds, key="user_id", ts_col="ts", type_col="event_type",
            stages=["view", "click", "purchase"],
            max_gap_us=24 * 3_600_000_000,
        )

    def q_events_longest_error_streak(sf):
        """Longest consecutive error run per user — pure composition:
        segment_runs (run-length segmentation) → filter → top_n_per_key
        argmax; oracle is the classic gaps-and-islands SQL."""
        import pyarrow.compute as pc

        from s_tsfe_dl_ray.stages.sessionize import segment_runs
        from s_tsfe_dl_ray.stages.transform import top_n_per_key

        ds = read_events(sf, columns=["event_id", "user_id", "ts",
                                      "event_type"])
        runs = segment_runs(
            ds, keys=["user_id"], value_col="event_type", ts_col="ts",
            order_by=["ts", "event_id"],
        ).map_batches(
            lambda t: t.filter(pc.equal(t["event_type"], "error")),
            batch_format="pyarrow",
        )
        best = top_n_per_key(
            runs, key="user_id", score_col="n_rows", n=1,
            tiebreak_col="run_start",
        )
        return best.select_columns(["user_id", "run_start", "run_end",
                                    "n_rows"])

    def q_events_incremental_1h(sf):
        """Continuous-aggregate refresh: history + delta rolled up
        independently, merged via ``merge_partials`` — must equal the
        direct full-table rollup (same oracle SQL shape as rollup_1h)."""
        from s_tsfe_dl_ray.pipelines.events_rollup import events_incremental_tier

        return _round_floats(events_incremental_tier(sf, "1h"))

    def q_events_distinct_users_1h(sf):
        from s_tsfe_dl_ray.pipelines.events_rollup import events_distinct_users

        return events_distinct_users(sf, tier="1h")

    def q_events_distinct_users_approx(sf):
        """HyperLogLog sketch path (rows-only: accuracy bounded, not exact;
        tolerance-tested against the exact op in tests/test_distinct.py)."""
        from s_tsfe_dl_ray.pipelines.events_rollup import events_distinct_users

        return events_distinct_users(sf, tier="1h", exact=False)

    def q_events_top_types_per_user(sf):
        from s_tsfe_dl_ray.pipelines.events_rollup import events_top_types_per_user

        return events_top_types_per_user(sf, k=3)

    def q_events_mad_per_user(sf):
        """Robust per-key location/scale: median, MAD, MAD-z outlier
        count (stages/robust.grouped_mad — one _pkey exchange, cython
        medians across all keys per partition)."""
        from s_tsfe_dl_ray.stages.robust import grouped_mad

        ds = read_events(sf, columns=["user_id", "value"])
        return _round_floats(grouped_mad(ds, key="user_id", value_col="value"))

    def q_events_theil_sen(sf):
        """Theil–Sen robust slope per key: median of pairwise slopes
        over exact µs time deltas (stages/robust.theil_sen)."""
        from s_tsfe_dl_ray.stages.robust import theil_sen

        ds = read_events(sf, columns=["event_id", "user_id", "ts", "value"])
        return _round_floats(theil_sen(
            ds, key="user_id", ts_col="ts", value_col="value",
            id_col="event_id"))

    def q_events_spearman_trend(sf):
        """Per-key Spearman rank corr of value vs time order — the
        scale-free monotonic-drift score (stages/robust)."""
        from s_tsfe_dl_ray.stages.robust import spearman_monotonicity

        ds = read_events(sf, columns=["event_id", "user_id", "ts", "value"])
        return _round_floats(spearman_monotonicity(
            ds, key="user_id", ts_col="ts", value_col="value",
            id_col="event_id"))

    def q_events_paa8(sf):
        """Piecewise Aggregate Approximation, segment length 8
        (stages/symbolic.paa — the pooling downsample as a transform)."""
        from s_tsfe_dl_ray.stages.symbolic import paa

        ds = read_events(sf, columns=["event_id", "user_id", "ts", "value"])
        return _round_floats(paa(
            ds, key="user_id", order_by=["ts", "event_id"],
            value_col="value", seg_len=8))

    def q_events_sax4(sf):
        """SAX symbolization: per-key z-norm → PAA(8) → 4-letter gaussian
        alphabet (stages/symbolic.sax)."""
        from s_tsfe_dl_ray.stages.symbolic import sax

        ds = read_events(sf, columns=["event_id", "user_id", "ts", "value"])
        return sax(ds, key="user_id", order_by=["ts", "event_id"],
                   value_col="value", seg_len=8)

    def q_events_value_histogram(sf):
        """Global fixed-width value histogram — pure combiner, O(bins)
        exchange (stages/quantile.fixed_histogram)."""
        from s_tsfe_dl_ray.stages.quantile import fixed_histogram

        ds = read_events(sf, columns=["value"])
        return _round_floats(fixed_histogram(ds, value_col="value", width=25.0))

    def q_events_mode_type(sf):
        """Per-user modal event type with deterministic tie-break
        (stages/distinct.mode_per_key)."""
        from s_tsfe_dl_ray.stages.distinct import mode_per_key

        ds = read_events(sf, columns=["user_id", "event_type"])
        return mode_per_key(ds, key="user_id", cat_col="event_type")

    def q_events_bollinger(sf):
        """Trailing Bollinger bands (rolling mean ± 2·sample-std over 5
        rows, min_periods=1) per user (stages/transform.bollinger_bands)."""
        from s_tsfe_dl_ray.stages.transform import bollinger_bands

        ds = read_events(sf, columns=["event_id", "user_id", "ts", "value"])
        out = bollinger_bands(ds, keys=["user_id"],
                              order_by=["ts", "event_id"], col="value",
                              window=5, k=2.0)
        return _round_floats(out.select_columns(
            ["event_id", "user_id", "bb_mean", "bb_std", "bb_upper",
             "bb_lower"]))

    def q_events_cross_corr_1h(sf):
        """Lead/lag coupling of click vs purchase hourly count series:
        Pearson corr at lag 0 and with clicks lagged one observed hour
        (stages/trend.cross_series_corr)."""
        from s_tsfe_dl_ray.stages.trend import cross_series_corr

        ds = read_events(sf, columns=["ts", "event_type"])
        return _round_floats(cross_series_corr(
            ds, ts_col="ts", type_col="event_type",
            type_a="click", type_b="purchase", tier="1h"))

    def q_events_changepoint(sf):
        """Single level-shift changepoint per key (binary segmentation's
        first split, exact scaled-int prefix sums so the argmax is
        bit-identical to SQL) — stages/robust.binary_changepoint."""
        from s_tsfe_dl_ray.stages.robust import binary_changepoint

        ds = read_events(sf, columns=["event_id", "user_id", "ts", "value"])
        return _round_floats(binary_changepoint(
            ds, key="user_id", ts_col="ts", value_col="value",
            id_col="event_id"))

    def q_events_acf(sf):
        """Autocorrelation function at lags 1–3 per key, long format
        (stages/trend.acf)."""
        from s_tsfe_dl_ray.stages.trend import acf

        ds = read_events(sf, columns=["event_id", "user_id", "ts", "value"])
        return _round_floats(acf(
            ds, key="user_id", value_col="value",
            order_by=["ts", "event_id"], lags=(1, 2, 3)))

    def q_events_lttb_20(sf):
        """LTTB visual downsample to ≤20 points per key — rows-only (the
        recursive previous-point dependence has no SQL twin; property
        tests pin anchors/count/spike retention)."""
        from s_tsfe_dl_ray.stages.symbolic import lttb

        ds = read_events(sf, columns=["event_id", "user_id", "ts", "value"])
        return lttb(ds, key="user_id", ts_col="ts", value_col="value",
                    n_out=20, id_col="event_id")

    def q_events_mannwhitney_u(sf):
        """Per-user Mann–Whitney U (purchase vs click values) + rank-
        biserial effect size — exact half-integer rank sums
        (stages/robust.mann_whitney_u)."""
        from s_tsfe_dl_ray.stages.robust import mann_whitney_u

        ds = read_events(sf, columns=["user_id", "event_type", "value"])
        return _round_floats(mann_whitney_u(
            ds, key="user_id", group_col="event_type", value_col="value",
            group_a="purchase", group_b="click"))

    def q_events_user_quantiles(sf):
        """Exact per-user p50/p95/p99 of value via the distributed
        value-histogram quantile op (stages/quantile.grouped_quantiles)."""
        from s_tsfe_dl_ray.stages.quantile import grouped_quantiles

        ds = read_events(sf, columns=["user_id", "value"])
        return grouped_quantiles(ds, value_col="value", keys=["user_id"],
                                 quantiles=(0.5, 0.95, 0.99))

    def q_events_ks_test(sf):
        """Per-user two-sample Kolmogorov–Smirnov D between view and
        error value distributions (stages/robust.ks_test) — exact
        rational ECDF steps, bit-identical max."""
        from s_tsfe_dl_ray.stages.robust import ks_test

        ds = read_events(sf, columns=["user_id", "event_type", "value"])
        return _round_floats(ks_test(
            ds, key="user_id", group_col="event_type", value_col="value",
            group_a="view", group_b="error"))

    def q_events_resample_locf(sf):
        """As-of resample onto the hourly grid: last observation carried
        forward at every grid instant between each user's first and last
        event (stages/gapfill.resample_locf)."""
        from s_tsfe_dl_ray.stages.gapfill import resample_locf

        ds = read_events(sf, columns=["event_id", "user_id", "ts", "value"])
        return _round_floats(resample_locf(
            ds, key="user_id", ts_col="ts", value_col="value",
            id_col="event_id", tier="1h"))

    def q_events_drawdown(sf):
        """Per-user maximum drawdown (worst peak-to-trough drop in time
        order) — bit-exact comparison scan (stages/robust.max_drawdown)."""
        from s_tsfe_dl_ray.stages.robust import max_drawdown

        ds = read_events(sf, columns=["event_id", "user_id", "ts", "value"])
        return _round_floats(max_drawdown(
            ds, key="user_id", ts_col="ts", value_col="value",
            id_col="event_id"))

    def q_events_hopping_1h_15m(sf):
        """Overlapping windows: 1h windows hopping every 15 min, via pane
        composition — rows combine once into 15 min panes, each merged
        pane feeds its 4 containing windows partition-locally
        (stages/rollup.hopping_rollup; exchange == tumbling-15m cost)."""
        from s_tsfe_dl_ray.pipelines.events_rollup import EVENTS_SPEC
        from s_tsfe_dl_ray.stages.rollup import hopping_rollup

        ds = read_events(sf, columns=["user_id", "ts", "value"])
        return _round_floats(hopping_rollup(
            ds, EVENTS_SPEC, size="1h", hop=15 * 60 * 1_000_000))

    def q_events_dominant_period(sf):
        """Per-user dominant period: argmax autocorrelation over lags
        1–12 (ties -> smallest lag) — seasonality probe on top of acf
        (stages/trend.dominant_period)."""
        from s_tsfe_dl_ray.stages.trend import dominant_period

        ds = read_events(sf, columns=["event_id", "user_id", "ts", "value"])
        return _round_floats(dominant_period(
            ds, key="user_id", value_col="value",
            order_by=["ts", "event_id"], max_lag=12))

    def q_events_type_concentration(sf):
        """Per-user behavioral concentration over event types: HHI,
        Shannon entropy, top share (stages/distinct.categorical_concentration)."""
        from s_tsfe_dl_ray.stages.distinct import categorical_concentration

        ds = read_events(sf, columns=["user_id", "event_type"])
        return _round_floats(categorical_concentration(
            ds, group_col="user_id", member_col="event_type"))

    def q_events_daily_user_hhi(sf):
        """Daily traffic concentration across users (is the day dominated
        by few users?) — same op, day-grid group."""
        from s_tsfe_dl_ray.functions.windows import window_start_us, window_to_timestamp
        from s_tsfe_dl_ray.stages.distinct import categorical_concentration

        ds = read_events(sf, columns=["ts", "user_id"])
        ds = ds.map_batches(
            lambda t: pa.table({
                "day": window_to_timestamp(window_start_us(t["ts"], "1d")),
                "user_id": t["user_id"],
            }),
            batch_format="pyarrow", zero_copy_batch=True)
        return _round_floats(categorical_concentration(
            ds, group_col="day", member_col="user_id"))

    def q_events_skew_kurtosis(sf):
        """Distributed 3rd/4th standardized central moments per key —
        two-pass centered sums (stages/features.grouped_moments)."""
        from s_tsfe_dl_ray.stages.features import grouped_moments

        ds = read_events(sf, columns=["user_id", "value"])
        return _round_floats(grouped_moments(ds, key="user_id", value_col="value"))

    def q_events_ts_features(sf):
        """tsfresh-style ordered-series battery: abs energy, mean abs
        change, mean crossings, count/longest-strike above mean, first
        location of max (stages/features.ts_feature_battery)."""
        from s_tsfe_dl_ray.stages.features import ts_feature_battery

        ds = read_events(sf, columns=["event_id", "user_id", "ts", "value"])
        return _round_floats(ts_feature_battery(
            ds, key="user_id", ts_col="ts", value_col="value",
            id_col="event_id"))

    def q_events_kendall_tau(sf):
        """Kendall tau-b of value vs time order per key — the bounded-
        influence trend score (stages/robust.kendall_tau)."""
        from s_tsfe_dl_ray.stages.robust import kendall_tau

        ds = read_events(sf, columns=["event_id", "user_id", "ts", "value"])
        return _round_floats(kendall_tau(
            ds, key="user_id", ts_col="ts", value_col="value",
            id_col="event_id"))

    def q_events_session_stats(sf):
        """Session-level summary per user: sessionize (30m gap) composed
        with the combiner aggregate — stage composition, no new kernel."""
        from s_tsfe_dl_ray.pipelines.relational import grouped_aggregate
        from s_tsfe_dl_ray.stages.sessionize import sessionize

        ds = read_events(sf, columns=["event_id", "user_id", "ts"])
        sess = sessionize(ds, keys=["user_id"], ts_col="ts",
                          order_by=["ts", "event_id"], gap="30m")
        return _round_floats(grouped_aggregate(
            sess, keys=["user_id"],
            aggs={
                "n_sessions": ("session_id", "count"),
                "avg_session_events": ("n_rows", "mean"),
                "max_session_events": ("n_rows", "max"),
                "avg_duration_sec": ("duration_sec", "mean"),
                "max_duration_sec": ("duration_sec", "max"),
            }))

    def q_events_type_cooccurrence(sf):
        """Pairwise event-type co-engagement across users: support, lift,
        Jaccard (stages/distinct.pair_cooccurrence — distinct base +
        in-partition self-merge + broadcast denominators)."""
        from s_tsfe_dl_ray.stages.distinct import pair_cooccurrence

        ds = read_events(sf, columns=["user_id", "event_type"])
        return _round_floats(pair_cooccurrence(
            ds, group_col="user_id", member_col="event_type"))

    def q_events_complexity(sf):
        """Nonlinearity/complexity battery per key: c3, time-reversal
        asymmetry, CID-CE, peak count, binned entropy
        (stages/features.ts_complexity_battery — exact scaled-int cubic
        sums for oracle parity)."""
        from s_tsfe_dl_ray.stages.features import ts_complexity_battery

        ds = read_events(sf, columns=["event_id", "user_id", "ts", "value"])
        return _round_floats(ts_complexity_battery(
            ds, key="user_id", ts_col="ts", value_col="value",
            id_col="event_id"))

    def q_events_location_features(sf):
        """Location/dispersion battery per key: extreme positions, index
        mass quantile, mean 2nd derivative, beyond-2σ ratio, uniqueness —
        every boundary comparison in exact ints
        (stages/features.ts_location_battery)."""
        from s_tsfe_dl_ray.stages.features import ts_location_battery

        ds = read_events(sf, columns=["event_id", "user_id", "ts", "value"])
        return _round_floats(ts_location_battery(
            ds, key="user_id", ts_col="ts", value_col="value",
            id_col="event_id"))

    def q_events_interarrival(sf):
        """Per-user event-cadence profile: gap count, mean/min/max and
        variance of inter-arrival seconds — exact µs integer core
        (stages/features.interarrival_stats)."""
        from s_tsfe_dl_ray.stages.features import interarrival_stats

        ds = read_events(sf, columns=["event_id", "user_id", "ts"])
        return _round_floats(interarrival_stats(
            ds, key="user_id", ts_col="ts", id_col="event_id"))

    def q_events_type_transitions(sf):
        """Event-type Markov transition matrix per user stream — the
        dialog transition op generalized to event streams with a
        (ts, event_id) order tiebreak (stages/dialog.role_transitions)."""
        from s_tsfe_dl_ray.stages.dialog import role_transitions

        ds = read_events(sf, columns=["event_id", "user_id", "ts",
                                      "event_type"])
        return _round_floats(role_transitions(
            ds, conv_col="user_id", role_col="event_type",
            order_by=["ts", "event_id"]))

    def q_events_benford(sf):
        """First-significant-digit distribution per event type vs
        Benford's law — digit from the exact scaled int, never float
        log10 (stages/distinct.benford_profile)."""
        from s_tsfe_dl_ray.stages.distinct import benford_profile

        ds = read_events(sf, columns=["event_type", "value"])
        return _round_floats(benford_profile(
            ds, group_col="event_type", value_col="value"))

    def q_events_key_skew(sf):
        """One-row skew diagnostic of user_id as a partition key —
        cardinality, rows-per-key quantiles, hottest-key share, HHI
        (stages/distinct.key_skew_profile; the numbers salting decisions
        are made from)."""
        from s_tsfe_dl_ray.stages.distinct import key_skew_profile

        ds = read_events(sf, columns=["user_id"])
        return _round_floats(key_skew_profile(ds, key="user_id"))

    def q_events_energy_chunks(sf):
        """NTILE(10)-segmented energy shares per user series — exact
        scaled-int energies, ntile remainders to the leading chunks
        (stages/features.energy_by_chunks)."""
        from s_tsfe_dl_ray.stages.features import energy_by_chunks

        ds = read_events(sf, columns=["event_id", "user_id", "ts", "value"])
        return _round_floats(energy_by_chunks(
            ds, key="user_id", ts_col="ts", value_col="value",
            id_col="event_id"))

    def q_events_perm_entropy(sf):
        """Per-user order-3 permutation entropy (Bandt–Pompe ordinal
        patterns; ties rank by recency) —
        stages/features.permutation_entropy."""
        from s_tsfe_dl_ray.stages.features import permutation_entropy

        ds = read_events(sf, columns=["event_id", "user_id", "ts", "value"])
        return _round_floats(permutation_entropy(
            ds, key="user_id", value_col="value",
            order_by=["ts", "event_id"]))

    def q_events_ar2(sf):
        """Per-user AR(2) Yule–Walker fit from mean-centered
        autocovariance sums (stages/trend.ar2_yule_walker)."""
        from s_tsfe_dl_ray.stages.trend import ar2_yule_walker

        ds = read_events(sf, columns=["event_id", "user_id", "ts", "value"])
        return _round_floats(ar2_yule_walker(
            ds, key="user_id", value_col="value",
            order_by=["ts", "event_id"]))

    return {k[2:]: v for k, v in locals().items() if k.startswith("q_")}
