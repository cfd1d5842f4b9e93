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
    event_col: str = "event",
    bucket_us: int = 3_600_000_000,
    num_partitions: int = 64,
) -> Dataset:
    """Kaplan-Meier survival curve for TIME-TO-CONVERSION: per key, the
    duration from first activity to the first row with a truthy
    ``event_col`` (right-CENSORED at the key's last activity when the
    event never happens) -- the product-limit estimate of "what share
    of users have not yet converted after t buckets", the
    survival-analysis upgrade of the naive conversion-latency histogram
    (which silently drops never-converters and biases the curve down).

        S(t) = prod_{t_i <= t} (1 - d_i / n_i)

    over distinct observed conversion buckets t_i (d = conversions at
    t_i, n = at-risk = keys with duration >= t_i, censored included
    until they drop out).

    Two passes: per-key (first ts, first event ts, last ts) partials
    through one key-hash exchange, then a span-bounded duration
    histogram folds once -- suffix-sum at-risk, ascending sequential
    cumulative product mirrored by the SQL twin's windowed
    ``product()`` (d = 0 rows contribute an exact *1.0 on both sides).
    Durations bucket to ``bucket_us`` integer units (default hours), so
    the histogram is span-bounded at any key cardinality.

    Output: ``bucket (int64), n_risk (int64), n_events (int64),
    survival (float64)`` -- one row per bucket with >= 1 observed
    conversion, ascending.
    """
    hist = _lifetime_hist(ds, key=key, ts_col=ts_col, event_col=event_col,
                          bucket_us=bucket_us,
                          num_partitions=num_partitions, grouped=False)

    def km(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "bucket": pd.Series([], dtype="int64"),
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
            "bucket": g["dur"].to_numpy(np.int64)[keep],
            "n_risk": n_risk[keep].astype(np.int64),
            "n_events": g["d"].to_numpy(np.int64)[keep],
            "survival": surv[keep]})

    return hist.repartition(1).map_batches(km, batch_format="pandas",
                                           batch_size=None)


def _lifetime_hist(ds: Dataset, *, key: str, ts_col: str, event_col: str,
                   bucket_us: int, num_partitions: int,
                   grouped: bool, group_col: str = "grp") -> Dataset:
    """Shared KM/log-rank base: per-key (first ts, first event ts,
    last ts[, group]) partials -> one key-hash exchange -> span-bounded
    (duration-bucket[, group]) histogram.  duration = first-event-ts -
    first-ts when observed, last-ts - first-ts when censored."""

    def life_part(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ts = pc.cast(pc.cast(t[ts_col], pa.timestamp("us")), pa.int64())
        ev = pc.cast(t[event_col], pa.bool_())
        te = pc.if_else(ev, ts, pa.scalar(None, pa.int64()))
        cols = {key: t[key], "ts": ts, "te": te}
        aggs = [("ts", "min"), ("te", "min"), ("ts", "max")]
        names = [key, "lo", "te", "hi"]
        if grouped:
            cols["g"] = pc.cast(pc.cast(t[group_col], pa.bool_()),
                                pa.int8())
            aggs.append(("g", "max"))
            names.append("g")
        out = (pa.table(cols).group_by([key], use_threads=False)
               .aggregate(aggs))
        out = out.rename_columns(names)
        return out.append_column(
            "_pkey", _stable_pkey(out[key], num_partitions))

    def life_merge(df: pd.DataFrame) -> pd.DataFrame:
        aggs = dict(lo=("lo", "min"), te=("te", "min"), hi=("hi", "max"))
        if grouped:
            aggs["g"] = ("g", "max")
        g = df.groupby(key, sort=False).agg(**aggs).reset_index()
        lo = g["lo"].to_numpy(np.int64)
        hi = g["hi"].to_numpy(np.int64)
        te = g["te"].to_numpy()                    # float w/ NaN or int
        obs = pd.notna(g["te"]).to_numpy()
        end = np.where(obs, np.nan_to_num(
            g["te"].astype("float64").to_numpy()), hi).astype(np.int64)
        dur = (end - lo) // int(bucket_us)
        h = pd.DataFrame({"dur": dur, "obs": obs})
        if grouped:
            h["grp"] = g["g"].to_numpy(np.int8) > 0
            out = h.groupby("dur").agg(
                d1=("obs", lambda s: int((s & h.loc[s.index, "grp"])
                                         .sum())),
                d=("obs", "sum"),
                tot1=("grp", "sum"),
                tot=("grp", "size")).reset_index()
            cols = ("d1", "d", "tot1", "tot")
        else:
            out = h.groupby("dur").agg(
                d=("obs", "sum"), tot=("obs", "size")).reset_index()
            cols = ("d", "tot")
        for c in cols:
            out[c] = out[c].astype(np.int64)
        return out

    return (ds.map_batches(life_part, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("_pkey")
            .map_groups(life_merge, batch_format="pandas"))


def logrank_test(
    ds: Dataset,
    *,
    key: str = "user_id",
    ts_col: str = "ts",
    event_col: str = "event",
    group_col: str = "grp",
    bucket_us: int = 3_600_000_000,
    num_partitions: int = 64,
) -> Dataset:
    """Two-sample log-rank test on the time-to-conversion curves of two
    cohorts -- the inference companion of :func:`survival_km` (is the
    difference between the curves real?).  At every distinct observed
    conversion bucket t the observed group-1 conversions are compared
    with their hypergeometric expectation

        E1_t = d_t * n1_t / n_t,
        V_t  = d_t (n1_t/n_t)(1 - n1_t/n_t)(n_t - d_t)/(n_t - 1)

    and ``z = sum(d1 - E1) / sqrt(sum V)`` (chi-square = z^2).  A key's
    group is the ANY-true fold of the per-row boolean ``group_col``;
    censoring as in the KM op (never-converted keys are censored at
    their last activity).

    Same dataflow as the KM op with a group dimension; per-bucket
    arithmetic is a fixed expression tree mirrored by the SQL twin
    (suffix-sum at-risk per group over exact ints; n = 1 buckets pin
    the variance to an exact 0 on both sides).

    Output: one row -- ``n_buckets (int64), d1 (int64), e1 (float64),
    var (float64), z (float64)`` (NULL z when sum V = 0; empty input
    emits no row).
    """
    hist = _lifetime_hist(ds, key=key, ts_col=ts_col, event_col=event_col,
                          bucket_us=bucket_us,
                          num_partitions=num_partitions, grouped=True,
                          group_col=group_col)

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "n_buckets": pd.Series([], dtype="int64"),
            "d1": pd.Series([], dtype="int64"),
            "e1": pd.Series([], dtype="float64"),
            "var": pd.Series([], dtype="float64"),
            "z": pd.Series([], dtype="float64")})
        if len(df) == 0:
            return empty
        g = df.groupby("dur", sort=True).agg(
            d1=("d1", "sum"), d=("d", "sum"),
            tot1=("tot1", "sum"), tot=("tot", "sum")).reset_index()
        n = np.cumsum(g["tot"].to_numpy(np.float64)[::-1])[::-1]
        n1 = np.cumsum(g["tot1"].to_numpy(np.float64)[::-1])[::-1]
        d = g["d"].to_numpy(np.float64)
        d1 = g["d1"].to_numpy(np.float64)
        ev = d > 0
        n, n1, d, d1 = n[ev], n1[ev], d[ev], d1[ev]
        e1 = d * n1 / n
        with np.errstate(invalid="ignore", divide="ignore"):
            v = d * (n1 / n) * (1.0 - n1 / n) * (n - d) / (n - 1.0)
        v = np.where(np.isfinite(v), v, 0.0)   # n == 1 buckets: V = 0
        sv = float(v.sum())
        with np.errstate(invalid="ignore", divide="ignore"):
            z = float((d1.sum() - e1.sum()) / np.sqrt(sv))
        return pd.DataFrame({
            "n_buckets": pd.Series([int(ev.sum())], dtype="int64"),
            "d1": pd.Series([int(d1.sum())], dtype="int64"),
            "e1": [float(e1.sum())],
            "var": [sv],
            "z": [z if np.isfinite(z) else np.nan]})

    return hist.repartition(1).map_batches(fold, batch_format="pandas",
                                           batch_size=None)


def cumulative_hazard(
    ds: Dataset,
    *,
    key: str = "user_id",
    ts_col: str = "ts",
    event_col: str = "event",
    bucket_us: int = 3_600_000_000,
    num_partitions: int = 64,
) -> Dataset:
    """Nelson–Aalen cumulative hazard H(t) = Σ_{t_i ≤ t} d_i/n_i over
    the same time-to-conversion base as :func:`survival_km` — the
    additive view of the same curve (hazard increments sum; useful when
    comparing slopes or feeding a proportional-hazards check).  Same
    two passes; the ascending increment sum is mirrored by the SQL
    twin's window sum.  Output: ``bucket, n_risk, n_events, hazard``
    (rows with ≥ 1 observed conversion)."""

    hist = _lifetime_hist(ds, key=key, ts_col=ts_col, event_col=event_col,
                          bucket_us=bucket_us,
                          num_partitions=num_partitions, grouped=False)

    def na(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "bucket": pd.Series([], dtype="int64"),
            "n_risk": pd.Series([], dtype="int64"),
            "n_events": pd.Series([], dtype="int64"),
            "hazard": pd.Series([], dtype="float64")})
        if len(df) == 0:
            return empty
        g = df.groupby("dur", sort=True).agg(
            d=("d", "sum"), tot=("tot", "sum")).reset_index()
        tot = g["tot"].to_numpy(np.float64)
        d = g["d"].to_numpy(np.float64)
        n_risk = np.cumsum(tot[::-1])[::-1]
        hz = np.cumsum(d / n_risk)                 # d=0 rows add exact 0
        keep = g["d"].to_numpy(np.int64) > 0
        return pd.DataFrame({
            "bucket": g["dur"].to_numpy(np.int64)[keep],
            "n_risk": n_risk[keep].astype(np.int64),
            "n_events": g["d"].to_numpy(np.int64)[keep],
            "hazard": hz[keep]})

    return hist.repartition(1).map_batches(na, batch_format="pandas",
                                           batch_size=None)


def cohort_ltv(
    ds: Dataset,
    *,
    key: str,
    ts_col: str,
    value_col: str,
    value_decimals: int = 2,
    num_partitions: int = 64,
) -> Dataset:
    """Cohort lifetime-value curve: for each signup cohort (the day of
    a key's FIRST activity) and each age (days since cohort day with
    any activity), the cumulative value booked by the cohort and the
    cumulative value per cohort member — the revenue companion of
    :func:`cohort_retention` (which counts presence; this sums value).

    Exactness: values scale to 10^value_decimals integer units
    (half-away — the DuckDB ``round()`` twin), per-(key, day) and
    per-(cohort, age) sums stay exact int64, the running cumulative is
    an exact int64 cumsum over observed ages in order (== the twin's
    windowed sum), and the two outputs divide once at the end.

    Dataflow: per-batch (key, day, cents) combiner partials cross ONE
    key-hash exchange; each key-complete partition derives cohort =
    min(day) per key vectorized and folds (cohort, age) cells plus a
    per-cohort member-count marker; the ≤ cohorts·ages cell table
    merges and cumsums on one final partition.  Output:
    ``cohort_day (timestamp us), age_days (int64), n_users (int64),
    cum_value, cum_value_per_user`` — one row per OBSERVED
    (cohort, age) cell.
    """
    import pyarrow.compute as pc

    from .grouped import grouped_apply

    scale = float(10 ** value_decimals)
    day_us = 86_400_000_000

    def partial(t: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(t[ts_col], pa.timestamp("us")),
                     pa.int64()).to_numpy(zero_copy_only=False)
        d = us // day_us
        v = pc.cast(t[value_col], pa.float64()).to_numpy(
            zero_copy_only=False)
        cents = np.copysign(np.floor(np.abs(v) * scale + 0.5),
                            v).astype(np.int64)
        base = pa.table({key: t[key], "_d": pa.array(d),
                         "_c": pa.array(cents)})
        out = base.group_by([key, "_d"], use_threads=False).aggregate(
            [("_c", "sum")])
        return out.rename_columns([key, "_d", "_c"])

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        # cells: (_cd cohort day, _age, _c cents, _u member-marker)
        empty = pd.DataFrame({
            "_cd": pd.Series([], dtype="int64"),
            "_age": pd.Series([], dtype="int64"),
            "_c": pd.Series([], dtype="int64"),
            "_u": pd.Series([], dtype="int64")})
        if len(df) == 0:
            return empty
        m = df.groupby([key, "_d"], sort=False, as_index=False)["_c"].sum()
        cd = m.groupby(key, sort=False)["_d"].transform("min") \
            .to_numpy(np.int64)
        cells = pd.DataFrame({
            "_cd": cd,
            "_age": m["_d"].to_numpy(np.int64) - cd,
            "_c": m["_c"].to_numpy(np.int64)}) \
            .groupby(["_cd", "_age"], sort=False, as_index=False)["_c"] \
            .sum()
        cells["_u"] = np.int64(0)
        members = pd.DataFrame({
            "_cd": m.loc[m["_d"].to_numpy(np.int64) == cd, "_d"]
                   .to_numpy(np.int64)}) \
            .groupby("_cd", sort=False).size().reset_index(name="_n")
        marker = pd.DataFrame({
            "_cd": members["_cd"].astype(np.int64),
            "_age": np.full(len(members), -1, np.int64),
            "_c": np.zeros(len(members), np.int64),
            "_u": members["_n"].astype(np.int64)})
        return pd.concat([cells, marker], ignore_index=True)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "cohort_day": pd.Series([], dtype="datetime64[us]"),
            "age_days": pd.Series([], dtype="int64"),
            "n_users": pd.Series([], dtype="int64"),
            "cum_value": pd.Series([], dtype="float64"),
            "cum_value_per_user": pd.Series([], dtype="float64")})
        if len(df) == 0:
            return empty
        users = df[df["_age"] == -1].groupby("_cd", sort=False)["_u"] \
            .sum()
        cells = df[df["_age"] >= 0].groupby(["_cd", "_age"], sort=True,
                                            as_index=False)["_c"].sum()
        if len(cells) == 0:
            return empty
        cum = cells.groupby("_cd", sort=False)["_c"].cumsum() \
            .to_numpy(np.int64)
        nu = cells["_cd"].map(users).to_numpy(np.int64)
        val = cum.astype(np.float64) / scale
        return pd.DataFrame({
            "cohort_day": pd.Series(cells["_cd"].to_numpy(np.int64)
                                    * day_us).astype("datetime64[us]"),
            "age_days": cells["_age"].astype(np.int64),
            "n_users": nu,
            "cum_value": val,
            "cum_value_per_user": val / nu.astype(np.float64)})

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
    folded = grouped_apply(partials, keys=[key], fn=fold,
                           num_partitions=num_partitions,
                           whole_partition=True)
    return folded.repartition(1).map_batches(
        final, batch_format="pandas", batch_size=None)
