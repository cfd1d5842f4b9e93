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
