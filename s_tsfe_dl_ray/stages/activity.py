"""Active-user analytics: DAU / trailing-window WAU / stickiness, and
new-vs-returning user splits per day.

The product-analytics staples over event streams, and the trailing-
window sibling of the cohort matrix (stages/cohort.py): cohort asks
"users first seen on day c, active on day d"; these ask "how many
DISTINCT users were active in the trailing w-day window ending at d"
(WAU) and "of day d's actives, how many are brand new".  Reference
analog: the per-class segment bookkeeping the reference runs before
splitting MIT-BIH episodes (/root/reference/TSFEDL/data.py:99-154) is
a small-data distinct-count per (label, day)-like group; here it is
re-expressed as a distributed exchange.

Scale design — the same one-big-exchange shape as cohort_retention:

1. per-batch combiner: one pyarrow ``group_by`` collapses each batch to
   its distinct ``(key, day)`` pairs, so the key-hash shuffle carries
   one row per (key, active day, batch), never raw events;
2. per key-partition (a user's full day set co-located): WAU expands
   each pair to the ``window`` target days it keeps the user active for
   (day .. day+w-1) and dedups per (key, target) WITHIN the partition —
   exact, because the partition holds the user's complete day set; DAU
   and new/returning splits are direct per-partition counts over
   disjoint user sets;
3. per-partition counts are partials over disjoint users, so the final
   merge folds ~days tiny rows (sum) on one partition — no second
   hash exchange, no driver round-trip.

Exactness note: the trailing-distinct problem is the one window
aggregate pane composition cannot solve (distinct does not merge by
sum); the pair-expansion trick restores exactness at a ×window cost on
the (key, day) PAIRS — already orders of magnitude smaller than the
event stream.  For very long windows use the HLL panes in
stages/distinct.py instead.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data import Dataset

from ..functions.windows import TIER_US, window_start_us
from .rollup import _stable_pkey


def _pair_partial(key: str, ts_col: str, tier: str, num_partitions: int):
    def partial(t: pa.Table) -> pa.Table:
        day = window_start_us(t[ts_col], tier)
        base = pa.table({key: t[key], "_day": day})
        out = base.group_by([key, "_day"], use_threads=False).aggregate([])
        return out.append_column("_pkey", _stable_pkey(out[key], num_partitions))

    return partial


def active_users(
    ds: Dataset,
    *,
    key: str = "user_id",
    ts_col: str = "ts",
    tier: str = "1d",
    window: int = 7,
    num_partitions: int = 64,
) -> Dataset:
    """Per observed day: exact DAU, exact trailing-``window``-day WAU,
    and stickiness = DAU/WAU.

    Output: ``day (timestamp[us]), dau (int64), wau (int64),
    stickiness (float64)``, one row per day with at least one event.
    """
    if window < 1:
        raise ValueError("window must be >= 1")
    day_us = TIER_US[tier]

    def per_key_partition(df: pd.DataFrame) -> pd.DataFrame:
        pairs = df[[key, "_day"]].drop_duplicates()
        k = pairs[key].to_numpy()
        d = pairs["_day"].to_numpy().astype("datetime64[us]").astype(np.int64)
        # DAU partial: users are disjoint across partitions, so a plain
        # per-day pair count is an exact partial
        dau = pd.DataFrame({"_day": d}).groupby("_day").size().rename("_d")
        # WAU partial: each (key, day) keeps the key active for target
        # days day .. day+(w-1); dedup (key, target) within the
        # partition (the key's day set is complete here), then count
        tgt = (d[:, None] + np.arange(window, dtype=np.int64) * day_us).ravel()
        kk = np.repeat(k, window)
        wau = (
            pd.DataFrame({key: kk, "_t": tgt})
            .drop_duplicates()
            .groupby("_t")
            .size()
            .rename("_w")
        )
        out = pd.concat([dau, wau], axis=1).fillna(0).reset_index()
        out.columns = ["day", "_d", "_w"]
        out["_d"] = out["_d"].astype(np.int64)
        out["_w"] = out["_w"].astype(np.int64)
        return out

    def final_merge(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("day", sort=True)[["_d", "_w"]].sum().reset_index()
        # expansion reaches past the last observed day; report only days
        # that actually had events (dau > 0)
        out = out[out["_d"] > 0].reset_index(drop=True)
        res = pd.DataFrame(
            {
                "day": out["day"].astype("datetime64[us]"),
                "dau": out["_d"].astype(np.int64),
                "wau": out["_w"].astype(np.int64),
            }
        )
        res["stickiness"] = res["dau"].to_numpy() / res["wau"].to_numpy()
        return res

    return (
        ds.map_batches(
            _pair_partial(key, ts_col, tier, num_partitions),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("_pkey")
        .map_groups(per_key_partition, batch_format="pandas")
        .repartition(1)
        .map_batches(final_merge, batch_format="pandas", batch_size=None)
    )


def new_vs_returning(
    ds: Dataset,
    *,
    key: str = "user_id",
    ts_col: str = "ts",
    tier: str = "1d",
    num_partitions: int = 64,
) -> Dataset:
    """Per observed day: distinct users seen for the FIRST time that day
    vs distinct returning users (first seen on an earlier day).

    Output: ``day (timestamp[us]), new_users (int64),
    returning_users (int64)``.
    """

    def per_key_partition(df: pd.DataFrame) -> pd.DataFrame:
        pairs = df[[key, "_day"]].drop_duplicates()
        first = pairs.groupby(key, sort=False)["_day"].transform("min")
        is_new = (pairs["_day"] == first).to_numpy()
        g = pd.DataFrame({"day": pairs["_day"].to_numpy(), "_new": is_new})
        out = (
            g.groupby("day", sort=False)["_new"]
            .agg(_n="sum", _tot="size")
            .reset_index()
        )
        out["_n"] = out["_n"].astype(np.int64)
        out["_r"] = (out["_tot"] - out["_n"]).astype(np.int64)
        return out[["day", "_n", "_r"]]

    def final_merge(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("day", sort=True)[["_n", "_r"]].sum().reset_index()
        return pd.DataFrame(
            {
                "day": out["day"].astype("datetime64[us]"),
                "new_users": out["_n"].astype(np.int64),
                "returning_users": out["_r"].astype(np.int64),
            }
        )

    return (
        ds.map_batches(
            _pair_partial(key, ts_col, tier, num_partitions),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("_pkey")
        .map_groups(per_key_partition, batch_format="pandas")
        .repartition(1)
        .map_batches(final_merge, batch_format="pandas", batch_size=None)
    )


def active_users_approx(
    ds: Dataset,
    *,
    key: str = "user_id",
    ts_col: str = "ts",
    tier: str = "1d",
    window: int = 7,
    p: int = 12,
    num_partitions: int = 16,
    out_col: str = "wau_approx",
) -> Dataset:
    """HyperLogLog trailing-``window`` active users — the scale path for
    long windows where :func:`active_users`'s pair expansion (×window on
    the distinct (key, day) PAIRS) gets expensive.

    HLL registers merge by ``max`` (associative), so the trailing-window
    union IS pane composition: each day-pane's ``(bucket, rho)``
    register rows are replicated to the ``window`` target days they stay
    visible for — O(days × 2^p × window) tiny int rows, INDEPENDENT of
    user count — then one day-hash exchange and a vectorized max-merge +
    estimate per target day.  Relative error ≈ 1.04/sqrt(2^p) (~1.6% at
    p=12).  Only observed days (one with ≥1 event) are reported.

    Output: ``day (timestamp[us]), <out_col> (int64)``.
    """
    from .distinct import _hll_rho

    if window < 1:
        raise ValueError("window must be >= 1")
    day_us = TIER_US[tier]
    m = 1 << p
    alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1 + 1.079 / m))

    def partial(t: pa.Table) -> pa.Table:
        day = (
            window_start_us(t[ts_col], tier)
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        bucket, rho = _hll_rho(t[key], p)
        base = pa.table({"_day": day, "_bucket": bucket, "_rho": rho})
        regs = base.group_by(["_day", "_bucket"], use_threads=False).aggregate(
            [("_rho", "max")]
        ).rename_columns(["_day", "_bucket", "_rho"])
        d = regs["_day"].to_numpy()
        b = regs["_bucket"].to_numpy()
        r = regs["_rho"].to_numpy()
        w = np.arange(window, dtype=np.int64)
        tgt = (d[:, None] + w * day_us).ravel()
        obs = np.zeros((len(d), window), dtype=np.int64)
        obs[:, 0] = 1  # offset-0 rows mark the day as actually observed
        out = pa.table({
            "_t": pa.array(tgt),
            "_bucket": pa.array(np.repeat(b, window)),
            "_rho": pa.array(np.repeat(r, window)),
            "_obs": pa.array(obs.ravel()),
        })
        return out.append_column("_pkey", _stable_pkey(out["_t"], num_partitions))

    def estimate(df: pd.DataFrame) -> pd.DataFrame:
        regs = (
            df.groupby(["_t", "_bucket"], sort=True)
            .agg(_rho=("_rho", "max"), _obs=("_obs", "max"))
            .reset_index()
        )
        g = regs.groupby("_t", sort=True)
        inv = g["_rho"].apply(
            lambda r: np.sum(np.exp2(-r.to_numpy(dtype=np.float64))))
        nonzero = g.size()
        observed = g["_obs"].max() > 0
        z = (m - nonzero).astype(np.float64)
        est = alpha * m * m / (z + inv)
        lc = m * np.log(m / z.where(z > 0, np.nan))
        est = est.where(~((est <= 2.5 * m) & (z > 0)), lc)
        est = est[observed]
        return pd.DataFrame({
            "day": est.index.to_numpy().astype("datetime64[us]"),
            out_col: np.rint(est.to_numpy()).astype(np.int64),
        })

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_pkey")
        .map_groups(estimate, batch_format="pandas")
    )


def activity_gini(
    ds: Dataset,
    *,
    group_col: str = "event_type",
    key_col: str = "user_id",
    weight_col: str | None = None,
    num_partitions: int = 64,
) -> Dataset:
    """Gini coefficient of per-key activity inside each group — the
    inequality summary that complements the HHI concentration op
    (``events_daily_user_hhi``): HHI asks "is volume dominated by a few
    keys", Gini asks "how unequal is the whole distribution".

    Shape: one combiner pass folds events to (group, key, n) counts
    (grouped_aggregate — partials only cross the exchange), then each
    group's count vector is sorted WITHIN its partition (key-complete
    co-location) and the classic rank formula folds vectorized:

        G = 2·Σᵢ i·c₍ᵢ₎ / (n·Σc) − (n+1)/n        (c sorted asc, i = 1..n)

    Ties don't disturb the rank sum (swapping equal values leaves
    Σ i·c₍ᵢ₎ unchanged), so no tie-break is needed and the result is
    partition-invariant.  The rank sum rides as exact int64; only the
    final two divisions are float — the oracle mirrors the identical
    expression, so parity is bit-exact.  Output: ``{group_col},
    n_users, total_events, gini`` sorted by group.

    ``weight_col``: Gini over per-key SUMS of an integer weight instead
    of row counts (e.g. tokens per conversation within each role) —
    same exactness, sums stay int64.
    """
    from ..pipelines.relational import grouped_aggregate
    from .grouped import grouped_apply

    counts = grouped_aggregate(
        ds, keys=[group_col, key_col],
        aggs={"n": (key_col, "count") if weight_col is None
              else (weight_col, "sum")},
        num_partitions=num_partitions)

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                group_col: pd.Series([], dtype="object"),
                "n_users": pd.Series([], dtype="int64"),
                "total_events": pd.Series([], dtype="int64"),
                "gini": pd.Series([], dtype="float64"),
            })
        df = df.sort_values([group_col, "n"], kind="mergesort")
        g = df.groupby(group_col, sort=False)
        n = g["n"].transform("size").to_numpy(dtype=np.int64)
        rank = (df.groupby(group_col, sort=False).cumcount().to_numpy(
            dtype=np.int64) + 1)
        c = df["n"].to_numpy(dtype=np.int64)
        prod = rank * c
        agg = pd.DataFrame({
            group_col: df[group_col].to_numpy(),
            "_s1": prod, "_c": c, "_one": np.ones(len(df), dtype=np.int64),
        }).groupby(group_col, sort=False, as_index=False).agg(
            s1=("_s1", "sum"), tot=("_c", "sum"), nu=("_one", "sum"))
        nn = agg["nu"].to_numpy(dtype=np.float64)
        tot = agg["tot"].to_numpy(dtype=np.float64)
        s1 = agg["s1"].to_numpy(dtype=np.float64)
        gini = (2.0 * s1) / (nn * tot) - (nn + 1.0) / nn
        return pd.DataFrame({
            group_col: agg[group_col],
            "n_users": agg["nu"].astype("int64"),
            "total_events": agg["tot"].astype("int64"),
            "gini": gini,
        })

    return grouped_apply(
        counts, keys=[group_col], fn=fold,
        num_partitions=min(num_partitions, 16),
        whole_partition=True).sort(group_col)


def hour_entropy(
    ds: Dataset,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    num_partitions: int = 64,
) -> Dataset:
    """Timing-regularity entropy per key: Shannon entropy (nats) of the
    key's event distribution over hour-of-day.  0 = perfectly regular
    (one active hour); ln 24 ≈ 3.178 = uniformly spread — the
    behavioral-regularity score that separates cron-like traffic from
    human traffic, complementing :func:`activity_gini` (who is active)
    with WHEN they are active.

    Pure combiner: events fold per batch to (key, hour, count) — ≤ 24
    rows per key per batch cross the exchange — then one key-hash merge
    computes the entropy vectorized.  Output: ``{key_col}, n_events,
    n_hours_active, hour_entropy``.
    """
    from ..functions.windows import window_start_us

    def partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        hr = pc.cast(pc.divide(window_start_us(t[ts_col], "1h"),
                               pa.scalar(3_600_000_000, pa.int64())),
                     pa.int64())
        hour = pc.subtract(hr, pc.multiply(
            pc.if_else(pc.less(hr, 0),
                       pc.divide(pc.subtract(hr, pa.scalar(23, pa.int64())),
                                 pa.scalar(24, pa.int64())),
                       pc.divide(hr, pa.scalar(24, pa.int64()))),
            pa.scalar(24, pa.int64())))
        base = pa.table({key_col: t[key_col], "hour": hour})
        out = base.group_by([key_col, "hour"], use_threads=False).aggregate(
            [([], "count_all")])
        out = out.rename_columns([key_col, "hour", "c"])
        return out.append_column(
            "_pkey", _stable_pkey(out[key_col], num_partitions))

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=["_pkey"])
        if len(df) == 0:
            return pd.DataFrame({
                key_col: [], "n_events": pd.Series([], dtype="int64"),
                "n_hours_active": pd.Series([], dtype="int64"),
                "hour_entropy": pd.Series([], dtype="float64")})
        g = df.groupby([key_col, "hour"], sort=True, as_index=False)["c"].sum()
        n = g.groupby(key_col, sort=False)["c"].transform("sum").to_numpy(
            dtype=np.float64)
        p = g["c"].to_numpy(dtype=np.float64) / n
        term = p * np.log(p)
        out = pd.DataFrame({
            key_col: g[key_col].to_numpy(),
            "_n": g["c"].to_numpy(dtype=np.int64),
            "_h": np.ones(len(g), dtype=np.int64),
            "_t": term,
        }).groupby(key_col, sort=False, as_index=False).sum()
        return pd.DataFrame({
            key_col: out[key_col],
            "n_events": out["_n"].astype("int64"),
            "n_hours_active": out["_h"].astype("int64"),
            "hour_entropy": -out["_t"].to_numpy(),
        })

    return (ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("_pkey").map_groups(merge, batch_format="pandas"))


def user_lifetime(
    ds: Dataset,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    num_partitions: int = 64,
) -> Dataset:
    """Per-key lifetime summary: first/last event time, calendar tenure
    (inclusive days between first and last active day) and exact active
    day count — the per-user base table cohort/retention analyses join
    against (cohort asks about the population; this is the per-user
    row).

    One combiner pass: each batch folds to (key, day, min ts, max ts,
    n) — at most one row per key per active day per batch — and the
    key-hash merge computes distinct days as a vectorized nunique over
    the partials (exact: the partition holds the key's complete day
    set).  Output: ``{key_col}, n_events, first_seen, last_seen,
    tenure_days, active_days``.
    """

    def partial(t: pa.Table) -> pa.Table:
        day = window_start_us(t[ts_col], "1d")
        base = pa.table({key_col: t[key_col], "_day": day,
                         "_ts": t[ts_col]})
        out = base.group_by([key_col, "_day"], use_threads=False).aggregate(
            [("_ts", "min"), ("_ts", "max"), ("_ts", "count")])
        out = out.rename_columns([key_col, "_day", "_tmin", "_tmax", "_n"])
        return out.append_column(
            "_pkey", _stable_pkey(out[key_col], num_partitions))

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=["_pkey"])
        if len(df) == 0:
            return pd.DataFrame({
                key_col: [], "n_events": pd.Series([], dtype="int64"),
                "first_seen": pd.Series([], dtype="datetime64[us]"),
                "last_seen": pd.Series([], dtype="datetime64[us]"),
                "tenure_days": pd.Series([], dtype="int64"),
                "active_days": pd.Series([], dtype="int64")})
        g = df.groupby(key_col, sort=True).agg(
            n_events=("_n", "sum"),
            first_seen=("_tmin", "min"),
            last_seen=("_tmax", "max"),
            active_days=("_day", "nunique")).reset_index()
        f_us = g["first_seen"].to_numpy().astype(
            "datetime64[us]").astype(np.int64)
        l_us = g["last_seen"].to_numpy().astype(
            "datetime64[us]").astype(np.int64)
        g["tenure_days"] = (l_us // 86_400_000_000
                            - f_us // 86_400_000_000 + 1)
        return g[[key_col, "n_events", "first_seen", "last_seen",
                  "tenure_days", "active_days"]].astype(
            {"n_events": "int64", "tenure_days": "int64",
             "active_days": "int64"})

    return (ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("_pkey").map_groups(merge, batch_format="pandas")
            .sort(key_col))


def daily_mix_entropy(
    ds: Dataset,
    *,
    cat_col: str = "event_type",
    ts_col: str = "ts",
    num_partitions: int = 16,
) -> Dataset:
    """Traffic-mix diversity per day: Shannon entropy (nats) of the
    day's event-type distribution, plus the dominant type and its
    share — the one-line answer to "did the traffic mix collapse
    yesterday" (an entropy drop = one type took over; pairs with
    :func:`~.robust.psi_daily`, which watches the VALUE distribution).

    Pure combiner: (day, type) counts fold per batch; one small
    exchange; entropy + argmax vectorized over the days×types table.
    Output: ``day, n_events, n_types, mix_entropy, top_type,
    top_share``.
    """
    from ..functions.windows import window_start_us, window_to_timestamp

    def partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        day = window_start_us(t[ts_col], "1d")
        base = pa.table({"_day": day, cat_col: t[cat_col]})
        out = base.group_by(["_day", cat_col], use_threads=False).aggregate(
            [([], "count_all")])
        return out.rename_columns(["_day", cat_col, "c"])

    counts = (ds.map_batches(partial, batch_format="pyarrow",
                             zero_copy_batch=True)
              .groupby("_day").map_groups(
                  lambda df: df.groupby(["_day", cat_col], sort=True,
                                        as_index=False)["c"].sum(),
                  batch_format="pandas"))

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                "day": pd.Series([], dtype="datetime64[us]"),
                "n_events": pd.Series([], dtype="int64"),
                "n_types": pd.Series([], dtype="int64"),
                "mix_entropy": pd.Series([], dtype="float64"),
                "top_type": pd.Series([], dtype="object"),
                "top_share": pd.Series([], dtype="float64")})
        n = df.groupby("_day", sort=False)["c"].transform("sum").to_numpy(
            dtype=np.float64)
        p = df["c"].to_numpy(dtype=np.float64) / n
        term = p * np.log(p)
        # deterministic argmax: highest count, ties -> smallest type
        df2 = df.sort_values(["_day", "c", cat_col],
                             ascending=[True, False, True],
                             kind="mergesort")
        top = df2.groupby("_day", sort=True).first().reset_index()
        agg = pd.DataFrame({
            "_day": df["_day"].to_numpy(),
            "_n": df["c"].to_numpy(dtype=np.int64),
            "_one": np.ones(len(df), dtype=np.int64),
            "_t": term,
        }).groupby("_day", sort=True, as_index=False).sum()
        out = pd.DataFrame({
            "day": window_to_timestamp(
                pa.array(agg["_day"].to_numpy(dtype=np.int64))).to_pandas(),
            "n_events": agg["_n"].astype("int64"),
            "n_types": agg["_one"].astype("int64"),
            "mix_entropy": -agg["_t"].to_numpy(),
            "top_type": top[cat_col].to_numpy(),
            "top_share": top["c"].to_numpy(dtype=np.float64)
            / agg["_n"].to_numpy(dtype=np.float64),
        })
        return out

    return counts.repartition(1).map_batches(finish, batch_format="pandas")


def active_interval_counts(
    ds: Dataset,
    *,
    key: str,
    ts_col: str,
    tier: str = "1h",
    num_partitions: int = 8,
) -> Dataset:
    """Concurrency profile: per tumbling window, how many keys
    (conversations/sessions) were ACTIVE — where a key is active in
    every window between the window of its first and of its last
    observed row, inclusive.  The ops staple behind "peak concurrent
    conversations" capacity planning, which a per-window distinct count
    misses (a conversation idle for an hour mid-flight is still open).

    Dataflow: one combiner fold to (key → min ts, max ts) — key-count
    sized, exact int64 µs — then a vectorized expand of each key's
    window RANGE (bounded by time span, not row count: a key spanning
    a day adds 24 hourly rows regardless of its million turns) and a
    second tiny fold counting keys per window.  No sort, no driver
    loop; both exchanges carry key- or window-sized rows only.

    Output: ``window_start (timestamp), n_active (int64)`` per window
    that has at least one active key.

    Reference analog: the reference's stream experiment tracks one
    queue's occupancy (keras_experiment.py:41-47, queue 16); this is
    the distributed generalization over keyed intervals.
    """
    import pyarrow.compute as pc

    from ..functions.windows import _tier_us, window_to_timestamp
    from ..pipelines.relational import grouped_aggregate

    step = _tier_us(tier)

    def fold(t: pa.Table) -> pa.Table:
        return pa.table({
            key: t[key],
            "ts_us": pc.cast(pc.cast(t[ts_col], pa.timestamp("us")),
                             pa.int64()),
        })

    spans = grouped_aggregate(
        ds.map_batches(fold, batch_format="pyarrow", zero_copy_batch=True),
        keys=[key],
        aggs={"t0": ("ts_us", "min"), "t1": ("ts_us", "max")},
        num_partitions=num_partitions)

    def expand(t: pa.Table) -> pa.Table:
        t0 = t["t0"].to_numpy(zero_copy_only=False)
        t1 = t["t1"].to_numpy(zero_copy_only=False)
        # numpy // floors toward -inf, so this is a correct window floor
        # for pre-epoch timestamps too
        w0 = (t0 // step) * step
        w1 = (t1 // step) * step
        counts = ((w1 - w0) // step + 1).astype(np.int64)
        starts = np.repeat(w0, counts)
        offs = np.concatenate([np.arange(c, dtype=np.int64)
                               for c in counts]) if len(counts) else \
            np.array([], dtype=np.int64)
        return pa.table({
            "w": pa.array(starts + offs * step, pa.int64()),
            "one": pa.array(np.ones(len(starts), dtype=np.int64)),
        })

    per_window = grouped_aggregate(
        spans.map_batches(expand, batch_format="pyarrow",
                          zero_copy_batch=True),
        keys=["w"], aggs={"n_active": ("one", "sum")},
        num_partitions=num_partitions)

    def fin(t: pa.Table) -> pa.Table:
        return pa.table({
            "window_start": window_to_timestamp(pc.cast(t["w"], pa.int64())),
            "n_active": t["n_active"],
        })

    return per_window.map_batches(fin, batch_format="pyarrow").sort(
        "window_start")


def availability_profile(
    ds: Dataset,
    *,
    key: str,
    ts_col: str,
    tier: str = "1h",
    num_partitions: int = 64,
) -> Dataset:
    """Per-key presence profile on the tier grid: of the hours (windows)
    between a key's first and last activity, how many have ≥ 1 event —
    the SLO-style "availability" of a user/device/stream — plus the
    longest silent stretch.  The per-key refinement of
    :func:`active_users` (which counts keys per window) and the
    windowed cousin of the sessionizer's gap logic.

    Per key: m = distinct active windows, span = (last − first)/tier + 1
    windows, ``availability = m / span``, ``longest_gap`` = max
    consecutive missing windows between adjacent active ones (0 when
    m = 1).  All integers are exact; availability is one division.

    Dataflow: per-batch (key, window) dedup combiner — only distinct
    pairs cross the ONE key-hash exchange; each key-complete partition
    sorts once and takes vectorized diffs across ALL keys (boundaries
    masked), no per-key Python.  Output: ``key, n_active (int64),
    span (int64), availability, longest_gap (int64)``.
    """
    import pyarrow.compute as pc

    from .grouped import grouped_apply

    step = TIER_US[tier]

    def partial(t: pa.Table) -> pa.Table:
        w = window_start_us(t[ts_col], tier)
        out = pa.table({key: t[key], "_w": w}) \
            .group_by([key, "_w"], use_threads=False) \
            .aggregate([([], "count_all")])
        return out.drop_columns([out.column_names[-1]])

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            key: pd.Series([], dtype="object"),
            "n_active": pd.Series([], dtype="int64"),
            "span": pd.Series([], dtype="int64"),
            "availability": pd.Series([], dtype="float64"),
            "longest_gap": pd.Series([], dtype="int64")})
        if len(df) == 0:
            return empty
        m = df.drop_duplicates([key, "_w"]) \
            .sort_values([key, "_w"], kind="mergesort") \
            .reset_index(drop=True)
        widx = (m["_w"].astype("int64") // step).to_numpy(np.int64)
        firsts = m.groupby(key, sort=False).cumcount().to_numpy() == 0
        d = widx - np.roll(widx, 1)
        d[firsts] = 1                      # no gap before the first window
        gaps = d - 1
        g = m.assign(_g=gaps).groupby(key, sort=False, as_index=False) \
            .agg(n_active=("_w", "size"), _lo=("_w", "min"),
                 _hi=("_w", "max"), longest_gap=("_g", "max"))
        span = ((g["_hi"].astype("int64") - g["_lo"].astype("int64"))
                // step + 1).to_numpy(np.int64)
        n_act = g["n_active"].to_numpy(np.int64)
        return pd.DataFrame({
            key: g[key],
            "n_active": n_act,
            "span": span,
            "availability": n_act.astype(np.float64)
                            / span.astype(np.float64),
            "longest_gap": g["longest_gap"].astype(np.int64)})

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
    return grouped_apply(partials, keys=[key], fn=fold,
                         num_partitions=num_partitions,
                         whole_partition=True)


def lorenz_deciles(
    ds: Dataset,
    *,
    key_col: str = "user_id",
    num_partitions: int = 64,
) -> Dataset:
    """Activity concentration as a Lorenz table: rank keys by event
    count DESC, cut into 10 rank deciles, and report each decile's
    share and cumulative share of all events — the "top 10% of users
    produce X% of traffic" curve behind :func:`activity_gini`'s single
    number (Gini is twice the area above this curve).

    Exactness: per-key counts fold combiner-side; ranking breaks ties
    on ``key_col`` asc (row_number semantics, mirrored by the twin);
    decile = ((rank−1)·10) // n_keys + 1 in integer arithmetic; decile
    sums and the cumulative ride exact int64 and divide once.  Output:
    ``decile (int64), n_users, n_events, event_share, cum_share`` —
    ≤ 10 rows.

    Scale: the per-key count exchange carries (key, n) partials; the
    final rank-and-cut folds the key-count table on one partition (the
    gini precedent — counts, not events).
    """
    from ..pipelines.relational import grouped_aggregate

    counts = grouped_aggregate(
        ds, keys=[key_col], aggs={"n": (key_col, "count")},
        num_partitions=num_partitions)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "decile": pd.Series([], dtype="int64"),
            "n_users": pd.Series([], dtype="int64"),
            "n_events": pd.Series([], dtype="int64"),
            "event_share": pd.Series([], dtype="float64"),
            "cum_share": pd.Series([], dtype="float64")})
        if len(df) == 0:
            return empty
        m = df.sort_values(["n", key_col], ascending=[False, True],
                           kind="mergesort").reset_index(drop=True)
        nk = np.int64(len(m))
        rn = np.arange(1, nk + 1, dtype=np.int64)
        dec = (rn - 1) * 10 // nk + 1
        c = m["n"].to_numpy(np.int64)
        g = pd.DataFrame({"decile": dec, "_u": np.ones(len(m), np.int64),
                          "_c": c}).groupby("decile", sort=True,
                                            as_index=False).sum()
        total = np.float64(c.sum())
        ev = g["_c"].to_numpy(np.int64)
        cum = np.cumsum(ev)
        return pd.DataFrame({
            "decile": g["decile"].astype(np.int64),
            "n_users": g["_u"].astype(np.int64),
            "n_events": ev,
            "event_share": ev.astype(np.float64) / total,
            "cum_share": cum.astype(np.float64) / total})

    return counts.repartition(1).map_batches(
        final, batch_format="pandas", batch_size=None)


def activity_streaks(
    ds: Dataset,
    *,
    key: str,
    ts_col: str,
    num_partitions: int = 64,
) -> Dataset:
    """Consecutive-active-day streaks per key: the longest run of
    consecutive calendar days with ≥ 1 event, and the length of the
    LAST run (ending at the key's final active day) — the engagement
    "streak" mechanic, and the gaps-and-islands sibling of
    :func:`availability_profile` (which measures the share, not the
    runs).

    Distinct (key, day) pairs are exact; islands come from the classic
    ``day − row_number()`` grouping (vectorized across all keys of the
    partition); the last streak is the island holding the key's max
    day (struct_pack argmax in the twin).  Output: ``key,
    n_active_days (int64), longest_streak (int64),
    last_streak (int64)``.
    """
    import pyarrow.compute as pc

    from .grouped import grouped_apply

    def partial(t: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(t[ts_col], pa.timestamp("us")),
                     pa.int64()).to_numpy(zero_copy_only=False)
        base = pa.table({key: t[key],
                         "_d": pa.array(us // 86_400_000_000)})
        out = base.group_by([key, "_d"], use_threads=False) \
            .aggregate([([], "count_all")])
        return out.drop_columns([out.column_names[-1]])

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            key: pd.Series([], dtype="object"),
            "n_active_days": pd.Series([], dtype="int64"),
            "longest_streak": pd.Series([], dtype="int64"),
            "last_streak": pd.Series([], dtype="int64")})
        if len(df) == 0:
            return empty
        m = df.drop_duplicates([key, "_d"]) \
            .sort_values([key, "_d"], kind="mergesort") \
            .reset_index(drop=True)
        d = m["_d"].to_numpy(np.int64)
        rn = m.groupby(key, sort=False).cumcount().to_numpy(np.int64)
        m["_grp"] = d - rn
        runs = m.groupby([key, "_grp"], sort=False, as_index=False) \
            .agg(_len=("_d", "size"), _last=("_d", "max"))
        agg = runs.groupby(key, sort=True).agg(
            n_active_days=("_len", "sum"),
            longest_streak=("_len", "max"))
        last_idx = runs.groupby(key, sort=True)["_last"].idxmax()
        last = runs.loc[last_idx].set_index(key)["_len"]
        out = agg.join(last.rename("last_streak")).reset_index()
        for c in ("n_active_days", "longest_streak", "last_streak"):
            out[c] = out[c].astype(np.int64)
        return out

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
    return grouped_apply(partials, keys=[key], fn=fold,
                         num_partitions=num_partitions,
                         whole_partition=True)


def theil_contributions(
    ds: Dataset,
    *,
    key_col: str,
    value_col: str,
    num_partitions: int = 64,
) -> Dataset:
    """Per-key Theil-T inequality decomposition: each key's additive
    contribution ``(x_i/X)·ln(n·x_i/X)`` to the Theil index over an
    integer measure (revenue cents, token counts) — the third
    concentration lens beside :func:`activity_gini` (whole-distribution
    inequality) and HHI (dominance): Theil is the only one that
    DECOMPOSES additively, so per-key rows are the natural output and
    the cross-row float sum (the one thing a value hash can't pin)
    never happens inside the engine.

    Exactness: per-key sums ride the combiner exchange as int64; n and
    X come from one tiny reduced fold; the per-row expression
    ``(x/X)·ln((n·x)/X)`` is a fixed float tree over exact ints (ln =
    shared libm).  Keys with x ≤ 0 are excluded (ln undefined), same
    filter as the twin.  Output: ``key_col, value (int64), share,
    theil_term`` — the index itself is ``sum(theil_term)`` downstream
    if wanted.
    """
    from ..pipelines.relational import grouped_aggregate

    sums = grouped_aggregate(
        ds, keys=[key_col], aggs={"v": (value_col, "sum")},
        num_partitions=num_partitions).materialize()
    x_tot = sums.sum("v") or 0
    n_keys = sums.count()

    def score(t: pa.Table) -> pa.Table:
        v = t["v"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = v > 0
        vf = v[keep].astype(np.float64)
        xf = np.float64(x_tot)
        nf = np.float64(n_keys)
        share = vf / xf
        term = share * np.log((nf * vf) / xf)
        kept = t.filter(pa.array(keep))
        return pa.table({
            key_col: kept[key_col],
            "value": pa.array(v[keep]),
            "share": pa.array(share),
            "theil_term": pa.array(term)})

    if x_tot <= 0:
        import ray.data

        return ray.data.from_arrow(pa.table({
            key_col: pa.array([], pa.int64()),
            "value": pa.array([], pa.int64()),
            "share": pa.array([], pa.float64()),
            "theil_term": pa.array([], pa.float64())}))
    return sums.map_batches(score, batch_format="pyarrow").sort(key_col)
