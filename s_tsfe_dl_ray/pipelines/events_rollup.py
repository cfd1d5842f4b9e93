"""Rollup pipelines over the driver's ``events`` stream table.

Same engine core as the transcript pipeline, instantiated for
``events(event_id, ts, user_id, event_type, value, props)`` so every
operator has a DuckDB-oracle SQL twin (``__ray_entry__.oracle_sql``).
"""

from __future__ import annotations

import pyarrow as pa

from ray.data import Dataset

from ..sources.parquet import read_events
from ..stages.rollup import Metric, RollupSpec, cascade, finalize, rollup_partial
from ..functions.windows import TIER_ORDER

EVENTS_SPEC = RollupSpec(
    keys=("user_id",),
    ts_col="ts",
    metrics=(Metric("value", ("sum", "min", "max", "mean")),),
    count_alias="n_events",
)


def events_partials(sf_dir: str, tier: str = "1m", spec: RollupSpec = EVENTS_SPEC) -> Dataset:
    ds = read_events(sf_dir, columns=["user_id", "ts", "value"])
    return rollup_partial(ds, spec, tier)


def events_tier(sf_dir: str, tier: str = "1m") -> Dataset:
    """Public tier table: (user_id, window_start, n_events, value_*)."""
    return finalize(events_partials(sf_dir, tier), EVENTS_SPEC)


def events_type_rate(sf_dir: str, *, event_type: str = "error", tier: str = "1d") -> Dataset:
    """Per-user per-window rate of one event_type (engine rate machinery:
    indicator column summed by the combiner, divided by _n at finalize)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    spec = RollupSpec(
        keys=("user_id",),
        ts_col="ts",
        metrics=(Metric("is_match", ("sum",), public=False, indicator=True),),
        count_alias="n_events",
        rates={f"{event_type}_rate": "is_match"},
    )
    ds = read_events(sf_dir, columns=["user_id", "ts", "event_type"])
    ds = ds.map_batches(
        lambda t: t.append_column(
            "is_match", pc.cast(pc.equal(t["event_type"], event_type), pa.int64())
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return finalize(rollup_partial(ds, spec, tier), spec)


def events_top_windows(sf_dir: str, *, tier: str = "1h", k: int = 20) -> Dataset:
    """Global top-k (user, window) by value_sum — sort + limit shuffle
    (reference analog: top-k anomaly selection, keras_experiment.py:590-593).
    Deterministic tie-break on (user_id, window_start)."""
    tier_ds = events_tier(sf_dir, tier)
    return tier_ds.sort(
        ["value_sum", "user_id", "window_start"], descending=[True, False, False]
    ).limit(k)


def _with_window(ds: Dataset, tier: str, ts_col: str = "ts") -> Dataset:
    """Append a ``window_start: timestamp[us]`` tumbling-window column."""
    from ..functions.windows import window_start_us, window_to_timestamp

    def assign(t):
        return t.append_column(
            "window_start", window_to_timestamp(window_start_us(t[ts_col], tier))
        )

    return ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)


def events_distinct_users(sf_dir: str, *, tier: str = "1h", exact: bool = True) -> Dataset:
    """Distinct active users per (window, event_type) — exact two-stage
    count-distinct, or the HyperLogLog sketch path (``exact=False``) whose
    per-key state is bounded at any input size (stages/distinct.py)."""
    from ..stages.distinct import grouped_distinct_approx, grouped_distinct_count

    ds = _with_window(read_events(sf_dir, columns=["user_id", "ts", "event_type"]), tier)
    # window_start first: the merge shuffle hash-partitions on keys[0],
    # and windows (many, evenly loaded) balance partitions where the
    # handful of event_type values would not
    keys = ["window_start", "event_type"]
    if exact:
        return grouped_distinct_count(ds, keys=keys, member_col="user_id", out_col="n_users")
    return grouped_distinct_approx(ds, keys=keys, member_col="user_id", out_col="n_users_approx")


def events_top_types_per_user(sf_dir: str, *, k: int = 3) -> Dataset:
    """Per-user top-k event types by frequency (deterministic tie-break:
    count desc, type asc) — distributed argmax via count partials."""
    from ..stages.distinct import grouped_top_k

    ds = read_events(sf_dir, columns=["user_id", "event_type"])
    return grouped_top_k(
        ds, keys=["user_id"], member_col="event_type", k=k, count_col="n_events"
    )


def events_incremental_tier(
    sf_dir: str, tier: str = "1h", *, cutoff: str = "2024-01-15 00:00:00"
) -> Dataset:
    """Continuous-aggregate refresh demo: history (< cutoff) and delta
    (>= cutoff) are rolled up INDEPENDENTLY, then ``merge_partials`` joins
    the two partial sets — output is exactly ``events_tier(sf_dir, tier)``
    without any stage ever seeing both halves' raw rows.  At deployment
    the history side is the standing tier store and only the delta is
    (re)computed."""
    import numpy as np
    import pyarrow.compute as pc

    from ..stages.rollup import merge_partials

    cut = pa.scalar(np.datetime64(cutoff, "us"))

    def split(pred):
        ds = read_events(sf_dir, columns=["user_id", "ts", "value"])
        return ds.map_batches(
            lambda t: t.filter(pred(t["ts"])),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )

    old = rollup_partial(split(lambda c: pc.less(c, cut)), EVENTS_SPEC, tier)
    new = rollup_partial(split(lambda c: pc.greater_equal(c, cut)), EVENTS_SPEC, tier)
    return finalize(merge_partials([old, new], EVENTS_SPEC), EVENTS_SPEC)


def events_tiers(
    sf_dir: str, tiers: tuple[str, ...] = TIER_ORDER, *, materialize_partials: bool = True
) -> dict[str, Dataset]:
    """Full tier cascade — coarser tiers re-aggregate finer partials, never
    the raw input (exact for count/sum/min/max; mean from carried sums).

    Partials are materialized between tiers: they are small (bounded by
    (key, window) cardinality, not row count), and materializing prevents
    the lazy lineage from re-reading the raw input once per tier.
    """
    out: dict[str, Dataset] = {}
    partial = events_partials(sf_dir, tiers[0])
    if materialize_partials:
        partial = partial.materialize()
    out[tiers[0]] = finalize(partial, EVENTS_SPEC)
    for tier in tiers[1:]:
        partial = cascade(partial, EVENTS_SPEC, tier)
        if materialize_partials:
            partial = partial.materialize()
        out[tier] = finalize(partial, EVENTS_SPEC)
    return out


def daily_health(sf_dir: str, *, num_partitions: int = 64) -> Dataset:
    """Composite per-day operational health table — the one-glance
    dashboard a stream owner reads every morning: volume, error rate,
    p95 value, distinct users and the week-over-week volume delta, all
    exact (counts/int-cents combiner; exact distinct via (day, user)
    dedup; p95 = quantile_disc pick from the per-day value histogram;
    WoW from the observed-day sequence at lag 7).

    Three column-pruned combiner passes produce day-grained small
    sides (the BM25-stats precedent: day cardinality is bounded, so
    two of them ride into the final map as driver closures); nothing
    row-grained ever crosses to the driver.  Output per day:
    ``day (timestamp us), n_events (int64), n_errors (int64),
    error_rate, p95_value, n_users (int64), wow_events_delta``.
    """
    import numpy as np
    import pandas as pd
    import pyarrow.compute as pc

    from ..stages.quantile import grouped_quantiles

    day_us = 86_400_000_000

    base = read_events(sf_dir, columns=["ts", "event_type", "value",
                                        "user_id"])

    def day_partial(t: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(t["ts"], pa.timestamp("us")),
                     pa.int64()).to_numpy(zero_copy_only=False)
        d = (us // day_us) * day_us
        err = pc.cast(pc.equal(t["event_type"], "error"),
                      pa.int64())
        out = pa.table({
            "_d": pa.array(d),
            "_one": pa.array(np.ones(t.num_rows, np.int64)),
            "_err": err}).group_by(["_d"], use_threads=False) \
            .aggregate([("_one", "sum"), ("_err", "sum")])
        return out.rename_columns(["_d", "_n", "_e"])

    def user_partial(t: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(t["ts"], pa.timestamp("us")),
                     pa.int64()).to_numpy(zero_copy_only=False)
        d = (us // day_us) * day_us
        out = pa.table({"_d": pa.array(d), "_u": t["user_id"]}) \
            .group_by(["_d", "_u"], use_threads=False).aggregate([])
        return out

    def add_day(t: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(t["ts"], pa.timestamp("us")),
                     pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({"_d": pa.array((us // day_us) * day_us),
                         "value": t["value"]})

    # day-grained small sides (bounded by distinct days)
    users = (base.map_batches(user_partial, batch_format="pyarrow",
                              zero_copy_batch=True)
             .map_batches(lambda t: t.group_by(
                 ["_d", "_u"], use_threads=False).aggregate([]),
                 batch_format="pyarrow")
             .to_pandas().drop_duplicates(["_d", "_u"])
             .groupby("_d").size().rename("n_users"))
    p95 = grouped_quantiles(
        base.map_batches(add_day, batch_format="pyarrow",
                         zero_copy_batch=True),
        value_col="value", keys=["_d"], quantiles=(0.95,),
        num_partitions=num_partitions).to_pandas() \
        .set_index("_d")["q_95"]

    def final(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "day": pd.Series([], dtype="datetime64[us]"),
            "n_events": pd.Series([], dtype="int64"),
            "n_errors": pd.Series([], dtype="int64"),
            "error_rate": pd.Series([], dtype="float64"),
            "p95_value": pd.Series([], dtype="float64"),
            "n_users": pd.Series([], dtype="int64"),
            "wow_events_delta": pd.Series([], dtype="float64")})
        if len(df) == 0:
            return empty
        g = df.groupby("_d", sort=True, as_index=False)[["_n", "_e"]] \
            .sum()
        n = g["_n"].to_numpy(np.int64)
        e = g["_e"].to_numpy(np.int64)
        wow = np.full(len(g), np.nan)
        if len(g) > 7:
            prev = n[:-7].astype(np.float64)
            cur = n[7:].astype(np.float64)
            with np.errstate(invalid="ignore", divide="ignore"):
                r = (cur - prev) / prev
            wow[7:] = np.where(np.isfinite(r), r, np.nan)
        days = g["_d"].to_numpy(np.int64)
        return pd.DataFrame({
            "day": pd.Series(days).astype("datetime64[us]"),
            "n_events": n,
            "n_errors": e,
            "error_rate": e.astype(np.float64) / n.astype(np.float64),
            "p95_value": pd.Series(days).map(p95).to_numpy(np.float64),
            "n_users": pd.Series(days).map(users).fillna(0)
                       .to_numpy(np.int64),
            "wow_events_delta": wow})

    return base.map_batches(day_partial, batch_format="pyarrow",
                            zero_copy_batch=True) \
        .repartition(1) \
        .map_batches(final, batch_format="pandas", batch_size=None)
