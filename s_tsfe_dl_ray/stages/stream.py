"""Event-time streaming semantics over an out-of-order arrival log.

SURVEY §2.9's fifth pillar made executable end-to-end: tumbling-window
aggregation with a per-key WATERMARK — each key's stream is walked in
ARRIVAL order, the watermark is the running max event time seen so far,
and an event arriving more than ``allowed_lateness`` behind the
watermark is dropped from its window (and counted), exactly like a
streaming engine that has already emitted that window.  Reference
analog: the reader threads of
/root/reference/experiments/keras_experiment.py:41-47 consume windows in
strict arrival order from a bounded queue — arrival order IS the
processing order there too; this operator makes the event-time /
arrival-time split explicit.

Scale shape: one ``_pkey`` co-partition by key (key-complete
co-location is the only assumption — arrival replay needs the whole
key stream in one place, the same contract as stages/scan.py); inside
a partition the watermark is a cython ``groupby.cummax`` + ``shift``
over ALL keys at once, never per-key Python.  The output is
rollup-shaped partials, so a retention cascade can consume it
unchanged.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data import Dataset

from .rollup import _stable_pkey
from ..functions.windows import _tier_us


def watermark_rollup(
    ds: Dataset,
    *,
    key: str,
    ts_col: str,
    arrival_col: str,
    value_col: str | None = None,
    window: "str | int" = "1h",
    allowed_lateness_us: int = 120_000_000,
    num_partitions: int = 64,
) -> Dataset:
    """Tumbling event-time windows with late-data drop.

    For each key, walking rows by ``arrival_col``: watermark(t) =
    max(event time of all PRIOR arrivals); a row is late iff
    ``ts < watermark − allowed_lateness`` (strict, µs-exact).  On-time
    rows aggregate into their floor(ts, window) bucket; late rows are
    only counted.  The first arrival of a key is never late.

    Output: ``key, window_start, n_events, n_late_dropped`` and, when
    ``value_col`` is given, ``value_sum`` over on-time rows (NULL for
    windows whose every row was late).
    """
    size = _tier_us(window)

    def add_pkey(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        cols = {key: t[key], arrival_col: t[arrival_col]}
        ts = t[ts_col]
        if pa.types.is_timestamp(ts.type) and ts.type.unit != "us":
            ts = pc.cast(ts, pa.timestamp("us", tz=ts.type.tz))
        cols["_ts_us"] = pc.cast(ts, pa.int64())
        if value_col is not None:
            cols[value_col] = t[value_col]
        out = pa.table(cols)
        return out.append_column("_pkey", _stable_pkey(t[key], num_partitions))

    def body(df: pd.DataFrame) -> pd.DataFrame:
        base = {key: pd.Series([], dtype="object"),
                "window_start": pd.Series([], dtype="datetime64[us]"),
                "n_events": pd.Series([], dtype="int64"),
                "n_late_dropped": pd.Series([], dtype="int64")}
        if value_col is not None:
            base["value_sum"] = pd.Series([], dtype="float64")
        if len(df) == 0:
            return pd.DataFrame(base)
        df = df.drop(columns=["_pkey"]).sort_values(
            [key, arrival_col], kind="mergesort").reset_index(drop=True)
        ts = df["_ts_us"].to_numpy(dtype=np.int64)
        g = df.groupby(key, sort=False)["_ts_us"]
        wm = g.cummax().groupby(df[key], sort=False).shift(1).to_numpy()
        late = np.zeros(len(df), dtype=bool)
        seen = ~np.isnan(wm)
        late[seen] = ts[seen] < (wm[seen].astype(np.int64)
                                 - np.int64(allowed_lateness_us))
        win = ts - np.mod(np.mod(ts, size) + size, size)  # floor for any sign
        out = pd.DataFrame({key: df[key], "window_start": win,
                            "on": (~late).astype(np.int64),
                            "late": late.astype(np.int64)})
        aggs = {"on": "sum", "late": "sum"}
        if value_col is not None:
            v = df[value_col].to_numpy(dtype=np.float64)
            out["value_sum"] = np.where(late, np.nan, v)
            aggs["value_sum"] = "sum"
        grp = out.groupby([key, "window_start"], sort=False)
        res = grp.agg(aggs).reset_index()
        # pandas sum() of all-NaN gives 0.0; a window with zero on-time
        # rows must report NULL like SQL sum(CASE ...) does
        if value_col is not None:
            res.loc[res["on"] == 0, "value_sum"] = np.nan
        res = res.rename(columns={"on": "n_events",
                                  "late": "n_late_dropped"})
        res["window_start"] = pd.to_datetime(res["window_start"], unit="us")
        cols = [key, "window_start", "n_events", "n_late_dropped"]
        if value_col is not None:
            cols.append("value_sum")
        return res[cols]

    tagged = ds.map_batches(add_pkey, batch_format="pyarrow")
    return tagged.groupby("_pkey").map_groups(body, batch_format="pandas")


def peak_sliding_rate(
    ds: Dataset,
    *,
    key: str,
    ts_col: str,
    window_us: int = 3_600_000_000,
    num_partitions: int = 64,
) -> Dataset:
    """Per-key PEAK sliding-window event rate — the abuse/rate-limit
    audit number: the maximum count any ``window_us``-wide window ending
    at an event ever reaches, and when it first happens.  Semantics ==
    SQL ``count(*) OVER (... RANGE BETWEEN <window> PRECEDING AND
    CURRENT ROW)`` then argmax (ties → earliest), including the RANGE
    peer rule: rows sharing the current timestamp all count.

    The sliding count is two global ``searchsorted`` calls — per-key
    segments are lifted onto disjoint integer ranges (ts + gid·span) so
    ONE vectorized binary search handles every key at once; µs integers
    end-to-end, no floats anywhere.  One ``_pkey`` co-partition.
    Output: ``key, n_events, peak_count, peak_at``.
    """
    def add_pkey(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ts = t[ts_col]
        if pa.types.is_timestamp(ts.type) and ts.type.unit != "us":
            ts = pc.cast(ts, pa.timestamp("us", tz=ts.type.tz))
        out = pa.table({key: t[key], "_ts_us": pc.cast(ts, pa.int64())})
        return out.append_column("_pkey", _stable_pkey(t[key], num_partitions))

    def body(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({key: pd.Series([], dtype="object"),
                                 "n_events": pd.Series([], dtype="int64"),
                                 "peak_count": pd.Series([], dtype="int64"),
                                 "peak_at": pd.Series([],
                                                      dtype="datetime64[us]")})
        df = df.drop(columns=["_pkey"]).sort_values(
            [key, "_ts_us"], kind="mergesort").reset_index(drop=True)
        keys_all = df[key].to_numpy()
        ts = df["_ts_us"].to_numpy(dtype=np.int64)
        change = np.flatnonzero(keys_all[1:] != keys_all[:-1]) + 1
        gid = np.zeros(len(df), dtype=np.int64)
        gid[change] = 1
        gid = np.cumsum(gid)
        starts = np.concatenate([[0], change])
        nk = int(gid[-1]) + 1
        t0 = int(ts.min())
        span = int(ts.max()) - t0 + int(window_us) + 1
        rebased = ts - np.int64(t0)
        # lift each key's segment onto a disjoint range; process in key
        # blocks so gid·span never overflows int64 even at huge key counts
        keys_per_block = max(1, (2 ** 62) // span)
        cnt = np.empty(len(df), dtype=np.int64)
        for b0 in range(0, nk, keys_per_block):
            b1 = min(b0 + keys_per_block, nk)
            lo = starts[b0]
            hi = starts[b1] if b1 < nk else len(df)
            lifted = rebased[lo:hi] + (gid[lo:hi] - b0) * np.int64(span)
            right = np.searchsorted(lifted, lifted, side="right")
            left = np.searchsorted(lifted, lifted - np.int64(window_us),
                                   side="left")
            cnt[lo:hi] = right - left
        mx = np.zeros(nk, dtype=np.int64)
        np.maximum.at(mx, gid, cnt)
        cand = cnt == mx[gid]
        first_at = np.full(nk, np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(first_at, gid[cand], ts[cand])
        return pd.DataFrame({
            key: keys_all[starts],
            "n_events": np.bincount(gid, minlength=nk).astype(np.int64),
            "peak_count": mx,
            "peak_at": pd.to_datetime(first_at, unit="us"),
        })

    tagged = ds.map_batches(add_pkey, batch_format="pyarrow")
    return tagged.groupby("_pkey").map_groups(body, batch_format="pandas")


def rate_limit_drops(
    ds: Dataset,
    *,
    key: str,
    ts_col: str,
    tier: str = "1h",
    limit: int = 2,
    num_partitions: int = 8,
) -> Dataset:
    """Fixed-window rate-limiter audit: with a per-key budget of
    ``limit`` events per tumbling window, how many events WOULD be
    dropped, and where — the capacity-planning dry run before turning a
    throttle on (fixed-window semantics: the first ``limit`` events of
    each (key, window) pass, the rest drop).  Unlike a token bucket,
    this is fully vectorizable and partition-parallel: drops depend
    only on the (key, window) count, never on cross-window carried
    state — the semantics that still work as ONE combiner fold at
    100 TB.

    Output: ``key, window_start (timestamp), n_events, n_dropped`` for
    windows that drop at least one event (n_events > limit), sorted.

    Reference analog: the stream experiment's bounded reader queue
    (keras_experiment.py:41-47, queue 16) — backpressure by bounded
    admission, here audited per key × window.
    """
    import pyarrow.compute as pc

    from ..functions.windows import window_start_us, window_to_timestamp
    from ..pipelines.relational import grouped_aggregate

    def partial(t: pa.Table) -> pa.Table:
        return pa.table({
            key: t[key],
            "w": window_start_us(t[ts_col], tier),
            "one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
        })

    counts = grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True),
        keys=[key, "w"], aggs={"n_events": ("one", "sum")},
        num_partitions=num_partitions)

    lim = int(limit)

    def fin(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["n_events"], lim))
        return pa.table({
            key: t[key],
            "window_start": window_to_timestamp(pc.cast(t["w"], pa.int64())),
            "n_events": t["n_events"],
            "n_dropped": pc.subtract(t["n_events"],
                                     pa.scalar(lim, pa.int64())),
        })

    return counts.map_batches(fin, batch_format="pyarrow").sort(
        [key, "window_start"])
