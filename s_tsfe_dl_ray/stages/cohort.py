"""Cohort retention matrix: users bucketed by first-seen day, counted on
each later activity day.

The product/retention staple over event streams, and the two-grain
sibling of the engine's retention-by-position op (stages/rollup.py
retention): WHEN did a key first appear × WHEN was it active.

Scale design — one big exchange, both grains fused into ONE partial:

1. per-batch combiner: one pyarrow ``group_by`` to (user, activity_day)
   with ``min(ts)`` — simultaneously the distinct-activity partial AND
   the first-seen partial (a user's global min ts is the min of its
   per-day mins), so the user-hash shuffle carries one row per
   (user, active day, batch), never raw events;
2. per user-partition: global first-seen day per user (vectorized
   groupby-min + map), then count users per (cohort_day, activity_day);
3. the per-partition counts are partials of disjoint user sets, so the
   final exchange merges ~days² tiny rows (sum).

Output: ``cohort_day, activity_day, n_users`` (timestamp[us], int64).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data import Dataset

from ..functions.windows import window_start_us
from .rollup import _stable_pkey


def cohort_retention(
    ds: Dataset,
    *,
    key: str = "user_id",
    ts_col: str = "ts",
    tier: str = "1d",
    num_partitions: int = 64,
    final_partitions: int = 4,
) -> Dataset:
    def partial(t: pa.Table) -> pa.Table:
        day = window_start_us(t[ts_col], tier)
        ts = t[ts_col]
        if pa.types.is_timestamp(ts.type) and ts.type.unit != "us":
            import pyarrow.compute as pc

            ts = pc.cast(ts, pa.timestamp("us"))
        base = pa.table({key: t[key], "activity_day": day, "_ts": ts})
        out = base.group_by([key, "activity_day"], use_threads=False).aggregate(
            [("_ts", "min")]
        ).rename_columns([key, "activity_day", "_min_ts"])
        return out.append_column("_pkey", _stable_pkey(out[key], num_partitions))

    def per_user_partition(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby([key, "activity_day"], sort=False)["_min_ts"].min().reset_index()
        first = g.groupby(key, sort=False)["_min_ts"].transform("min")
        from ..functions.windows import TIER_US

        day_us = TIER_US[tier]
        f_us = first.to_numpy().astype("datetime64[us]").astype(np.int64)
        g["cohort_day"] = f_us - np.mod(np.mod(f_us, day_us) + day_us, day_us)
        out = (
            g.groupby(["cohort_day", "activity_day"], sort=False)
            .size().rename("_n").reset_index()
        )
        return out

    def final_merge(df: pd.DataFrame) -> pd.DataFrame:
        out = (
            df.groupby(["cohort_day", "activity_day"], sort=False)["_n"]
            .sum().rename("n_users").reset_index()
        )
        out["cohort_day"] = out["cohort_day"].astype("datetime64[us]")
        out["activity_day"] = out["activity_day"].astype("datetime64[us]")
        out["n_users"] = out["n_users"].astype(np.int64)
        return out

    def add_final_pkey(t: pa.Table) -> pa.Table:
        return t.append_column(
            "_pkey2", _stable_pkey(t["cohort_day"], final_partitions)
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_pkey")
        .map_groups(per_user_partition, batch_format="pandas")
        .map_batches(add_final_pkey, batch_format="pyarrow")
        .groupby("_pkey2")
        .map_groups(final_merge, batch_format="pandas")
    )


def survival_km(
    ds: Dataset,
    *,
    key: str = "user_id",
    ts_col: str = "ts",
    censor_days: int = 7,
    num_partitions: int = 64,
) -> Dataset:
    """Kaplan–Meier survival curve over per-key LIFETIMES (first-seen →
    last-seen, whole days): the product-limit estimate of "what share
    of users survive past t days", with right-censoring for keys still
    active within ``censor_days`` of the corpus end (their lifetime is
    a lower bound, not a churn) — the survival-analysis staple that the
    plain user_lifetime histogram gets wrong by treating active users
    as churned.

        S(t) = Π_{t_i ≤ t} (1 − d_i / n_i)

    over distinct OBSERVED churn durations t_i (d = churns at t_i, n =
    at-risk = keys with duration ≥ t_i, censored included until they
    drop).

    Three cheap passes: global max-ts combiner (one row), per-key
    (min, max) lifetimes (partials), then a duration histogram (day →
    churns, total) whose span-bounded rows fold once — suffix-sum
    at-risk, sequential cumulative product mirrored by the SQL twin's
    windowed ``product()`` (d = 0 rows contribute an exact ×1.0, so
    including them changes nothing on either side).

    Output: ``day (int64), n_risk (int64), n_events (int64), survival
    (float64)`` — one row per day with ≥ 1 observed churn, ascending.
    """
    from ..pipelines.relational import grouped_aggregate

    # pass 1: global max ts (the censoring anchor)
    def mx_part(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({
            "_all": pa.array([1], pa.int8()),
            "mx": pa.array([pc.max(pc.cast(t[ts_col],
                                           pa.timestamp("us"))).as_py()],
                           pa.timestamp("us"))})

    mx = grouped_aggregate(
        ds.map_batches(mx_part, batch_format="pyarrow",
                       zero_copy_batch=True),
        keys=["_all"], aggs={"mx": ("mx", "max")},
        num_partitions=1).to_pandas()
    if len(mx) == 0 or "mx" not in mx.columns or mx["mx"].isna().all():
        import ray.data

        return ray.data.from_pandas(pd.DataFrame({
            "day": pd.Series([], dtype="int64"),
            "n_risk": pd.Series([], dtype="int64"),
            "n_events": pd.Series([], dtype="int64"),
            "survival": pd.Series([], dtype="float64")}))
    cutoff_us = (pd.Timestamp(mx["mx"].iloc[0]).value // 1000
                 - censor_days * 86_400_000_000)

    # pass 2: per-key lifetime -> (duration-day, observed) -> histogram
    def life_part(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ts = pc.cast(pc.cast(t[ts_col], pa.timestamp("us")), pa.int64())
        out = (pa.table({key: t[key], "ts": ts})
               .group_by([key], use_threads=False)
               .aggregate([("ts", "min"), ("ts", "max")]))
        out = out.rename_columns([key, "lo", "hi"])
        return out.append_column(
            "_pkey", _stable_pkey(out[key], num_partitions))

    def life_merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(key, sort=False).agg(
            lo=("lo", "min"), hi=("hi", "max")).reset_index()
        dur = (g["hi"].to_numpy(np.int64) - g["lo"].to_numpy(np.int64)) \
            // 86_400_000_000
        obs = g["hi"].to_numpy(np.int64) <= cutoff_us
        h = pd.DataFrame({"dur": dur, "obs": obs})
        out = h.groupby("dur").agg(
            d=("obs", "sum"), tot=("obs", "size")).reset_index()
        out["d"] = out["d"].astype(np.int64)
        out["tot"] = out["tot"].astype(np.int64)
        return out

    hist = (ds.map_batches(life_part, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("_pkey")
            .map_groups(life_merge, batch_format="pandas"))

    # pass 3: span-bounded ordered fold
    def km(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "day": pd.Series([], dtype="int64"),
            "n_risk": pd.Series([], dtype="int64"),
            "n_events": pd.Series([], dtype="int64"),
            "survival": pd.Series([], dtype="float64")})
        if len(df) == 0:
            return empty
        g = df.groupby("dur", sort=True).agg(
            d=("d", "sum"), tot=("tot", "sum")).reset_index()
        tot = g["tot"].to_numpy(np.float64)
        d = g["d"].to_numpy(np.float64)
        n_risk = np.cumsum(tot[::-1])[::-1]        # at-risk: dur >= t
        surv = np.cumprod(1.0 - d / n_risk)        # d=0 rows multiply by 1
        keep = g["d"].to_numpy(np.int64) > 0
        return pd.DataFrame({
            "day": g["dur"].to_numpy(np.int64)[keep],
            "n_risk": n_risk[keep].astype(np.int64),
            "n_events": g["d"].to_numpy(np.int64)[keep],
            "survival": surv[keep]})

    return hist.repartition(1).map_batches(km, batch_format="pandas",
                                           batch_size=None)
