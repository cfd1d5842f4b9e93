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
