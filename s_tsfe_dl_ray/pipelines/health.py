"""Series-health report: the round-3 timeseries operators composed into
one drift-monitoring pipeline (SURVEY.md §2.10 stage composition — every
stage is Dataset → Dataset, so the chain is just function application).

    seasonal_adjust      remove each key's hour-of-day profile
      → cusum            accumulate positive drift of the residual
      → threshold filter alarm rows where the statistic crosses
      → debounce         at most one alert per key per cool-down
      → per-key report   alert count / first alert / peak statistic
      → hash_join        with the key's OLS trend fit (slope, corr)

The shape a production drift monitor takes: detectors consume
DE-SEASONALIZED residuals (a daily pattern is not drift), alerts are
throttled, and the report carries the trend line that explains WHY a
key alarmed.  Reference analog: the anomaly experiment scores, then
thresholds, then summarizes (reference
experiments/keras_experiment.py:583-599) — here each step is a
distributed stage.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset


def series_health_report(
    ds: Dataset,
    *,
    key: str,
    ts_col: str,
    value_col: str,
    event_id_col: str,
    ref_ts_us: int,
    cusum_threshold: float,
    slack: float = 0.0,
    cooldown_us: int = 6 * 3_600_000_000,
) -> Dataset:
    """One row per key that ever alarmed: ``key, n_alerts,
    first_alert_ts, peak_cusum, slope_per_day, corr_xy``.  Keys whose
    drift statistic never crosses ``cusum_threshold`` are absent."""
    from ..stages.join import hash_join
    from ..stages.scan import cusum
    from ..stages.sessionize import debounce
    from ..stages.trend import grouped_linear_trend, seasonal_adjust
    from .relational import grouped_aggregate

    adjusted = seasonal_adjust(
        ds, key=key, ts_col=ts_col, value_col=value_col,
        period="hour_of_day",
    )
    # CUSUM slack: the residual is zero-mean BY CONSTRUCTION (profile
    # subtraction), so a reflected random walk over pure noise still
    # grows ~ sigma*sqrt(n); a positive slack drains noise and leaves
    # only sustained drift (the standard k parameter of CUSUM charts)
    drift = cusum(
        adjusted, key=key, order_by=[ts_col, event_id_col],
        value_col="residual", target=slack, out_col="drift",
    )

    def crossings(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater(t["drift"], cusum_threshold))

    alerts = debounce(
        drift.map_batches(crossings, batch_format="pyarrow"),
        key=key, ts_col=ts_col, min_gap_us=cooldown_us,
        order_by=[ts_col, event_id_col],
    )
    report = grouped_aggregate(
        alerts, keys=[key],
        aggs={"n_alerts": ("drift", "count"),
              "first_alert_ts": (ts_col, "min"),
              "peak_cusum": ("drift", "max")},
    )
    if report.schema() is None:  # no key ever alarmed — empty report
        return report
    trend = grouped_linear_trend(
        ds, key=key, ts_col=ts_col, value_col=value_col,
        ref_ts_us=ref_ts_us,
    ).drop_columns(["n_events", "intercept"])
    return hash_join(report, trend, left_on=key, right_on=key, how="left")
