"""Ordered funnel analysis: first time each key completes stage k of an
event-type sequence, each stage strictly after the previous one.

The product-analytics staple over event streams (view → click →
purchase), and the engine's ordered-sequence-match analog of the
reference's label-transition segmentation (get_mit_bih_segments walks a
beat-annotation sequence in order, data.py run-length logic) — here the
"pattern" is a staged subsequence per key, not a run.

Dataflow: one ``_pkey`` co-partition (hash of key), then per partition
ONE vectorized pandas pass per stage — each pass is a boolean filter +
``groupby().min()`` over the stage's rows, no per-key Python loop; state
between stages is a key-indexed Series of "earliest completion of the
previous stage".  len(stages) passes total, each O(partition).

Semantics (== the SQL twin's cascaded ``min(ts) WHERE ts > prev`` CTEs):
stage k's timestamp is the MINIMUM ts of a ``stages[k]``-typed row
STRICTLY after the key's stage-(k−1) timestamp; a tie at the same
microsecond does not advance the funnel.  Keys missing stage k have NULL
for it and all later stages.  Output: one row per key —
``key, ts_<stage>…, stages_reached``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data import Dataset

from .rollup import _stable_pkey


def funnel(
    ds: Dataset,
    *,
    key: str,
    ts_col: str,
    type_col: str,
    stages: list[str],
    max_gap_us: int | None = None,
    num_partitions: int = 64,
) -> Dataset:
    """``max_gap_us``: conversion window — stage k must occur within
    ``max_gap_us`` of stage k−1's completion (the 'purchase within 24h
    of click' form); ``None`` = unbounded.  See module docstring for
    semantics and dataflow."""
    if len(stages) < 2:
        raise ValueError("a funnel needs at least two stages")
    if len(set(stages)) != len(stages):
        raise ValueError("stage types must be distinct")
    out_cols = [f"ts_{s}" for s in stages]

    def add_pkey(t: pa.Table) -> pa.Table:
        return t.append_column("_pkey", _stable_pkey(t[key], num_partitions))

    def funnel_partition(df: pd.DataFrame) -> pd.DataFrame:
        all_keys = pd.Index(pd.unique(df[key]))
        ts = df[ts_col].astype("datetime64[us]")
        reached: list[pd.Series] = []
        # stage 0 probes against -inf: every first-stage row qualifies
        prev = pd.Series(pd.Timestamp.min, index=all_keys)
        for si, st in enumerate(stages):
            sub = df[df[type_col] == st]
            if len(sub):
                bar = prev.reindex(sub[key]).to_numpy()
                sub_ts = ts[sub.index].to_numpy()
                ok = sub_ts > bar
                # conversion window applies between stages, never to the
                # funnel entry (stage 0 has no previous completion)
                if max_gap_us is not None and si > 0:
                    ok &= sub_ts <= bar + np.timedelta64(max_gap_us, "us")
                firsts = sub[ok].groupby(key, sort=False)[ts_col].min()
            else:
                firsts = pd.Series(dtype="datetime64[us]")
            cur = firsts.reindex(all_keys)
            reached.append(cur)
            prev = cur.fillna(pd.Timestamp.max)  # NaT blocks later stages
        out = pd.DataFrame({key: all_keys})
        for c, s in zip(out_cols, reached):
            out[c] = s.to_numpy().astype("datetime64[us]")
        out["stages_reached"] = np.sum(
            [out[c].notna().to_numpy() for c in out_cols], axis=0
        ).astype(np.int64)
        return out

    tagged = ds.map_batches(add_pkey, batch_format="pyarrow")
    return tagged.groupby("_pkey").map_groups(funnel_partition, batch_format="pandas")


def funnel_latency(
    ds: Dataset,
    *,
    key: str,
    ts_col: str,
    type_col: str,
    stages: list[str],
    quantiles: tuple[float, ...] = (0.5, 0.9),
    max_gap_us: int | None = None,
    num_partitions: int = 64,
) -> Dataset:
    """Time-to-convert distribution per consecutive funnel stage pair:
    for keys that completed stage k, the latency ``ts_k − ts_{k−1}`` in
    microseconds, aggregated to count, exact mean, and exact
    ``quantile_disc`` quantiles.

    Composes :func:`funnel` (per-key stage timestamps, already one
    exchange) with a value-histogram reduce: per-batch
    ``(pair, lat_us) → count`` combiner partials cross ONE tiny
    stage-pair exchange (stages/quantile.py grouped_quantiles
    discipline; a pair's distinct-latency histogram concentrates in one
    partition — inherent to exact quantiles; the t-digest op is the
    very-hot-pair fallback).

    Output: one row per stage pair —
    ``stage_from, stage_to, n_converted (int64), mean_s (float64),
    q_<pct>_us (int64)…`` where ``mean_s`` is exact-integer-sum mean
    latency in seconds.
    """
    qcols = [f"q_{int(q * 100)}_us" for q in quantiles]
    per_key = funnel(
        ds, key=key, ts_col=ts_col, type_col=type_col,
        stages=stages, max_gap_us=max_gap_us,
        num_partitions=num_partitions,
    )
    pair_from = stages[:-1]
    pair_to = stages[1:]

    def to_latencies(t: pa.Table) -> pa.Table:
        frames = []
        for a, b in zip(pair_from, pair_to):
            ta = t[f"ts_{a}"].to_numpy(zero_copy_only=False)
            tb = t[f"ts_{b}"].to_numpy(zero_copy_only=False)
            ok = ~pd.isna(tb)
            lat = (
                tb[ok].astype("datetime64[us]").astype(np.int64)
                - ta[ok].astype("datetime64[us]").astype(np.int64)
            )
            if len(lat):
                g = pd.DataFrame({"lat_us": lat}).groupby("lat_us").size()
                frames.append(
                    pd.DataFrame(
                        {
                            "stage_from": a,
                            "stage_to": b,
                            "lat_us": g.index.to_numpy(),
                            "_cnt": g.to_numpy().astype(np.int64),
                        }
                    )
                )
        if not frames:
            return pa.table(
                {
                    "stage_from": pa.array([], pa.string()),
                    "stage_to": pa.array([], pa.string()),
                    "lat_us": pa.array([], pa.int64()),
                    "_cnt": pa.array([], pa.int64()),
                    "_pkey": pa.array([], pa.int64()),
                }
            )
        out = pa.Table.from_pandas(pd.concat(frames), preserve_index=False)
        return out.append_column("_pkey", _stable_pkey(out["stage_from"], 8))

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        h = (
            df.groupby(["stage_from", "stage_to", "lat_us"], sort=True)["_cnt"]
            .sum()
            .reset_index()
        )
        keys = ["stage_from", "stage_to"]
        h["_cum"] = h.groupby(keys, sort=False)["_cnt"].cumsum()
        tot = h.groupby(keys, sort=False)["_cnt"].sum().rename("_n")
        # exact integer sum -> one double division == DuckDB avg(BIGINT)
        ssum = (
            (h["lat_us"] * h["_cnt"]).groupby(
                [h["stage_from"], h["stage_to"]], sort=False
            ).sum().rename("_s")
        )
        out = h[keys].drop_duplicates().reset_index(drop=True)
        out = out.merge(tot, left_on=keys, right_index=True)
        out = out.merge(ssum, left_on=keys, right_index=True)
        h = h.merge(tot, left_on=keys, right_index=True)
        res = pd.DataFrame(
            {
                "stage_from": out["stage_from"],
                "stage_to": out["stage_to"],
                "n_converted": out["_n"].astype(np.int64),
                "mean_s": (out["_s"].astype(np.float64) / out["_n"].to_numpy())
                / 1e6,
            }
        )
        for q, col in zip(quantiles, qcols):
            # quantile_disc: element at sorted 0-based index ceil(n*q)-1
            # (stages/quantile.py parity, probed against DuckDB)
            target = np.maximum(np.ceil(h["_n"] * q), 1)
            hit = h[h["_cum"] >= target]
            picked = hit.groupby(keys, sort=False)["lat_us"].first().rename(col)
            res = res.merge(
                picked.reset_index(), on=keys, how="left"
            )
            res[col] = res[col].astype(np.int64)
        return res

    return (
        per_key.map_batches(to_latencies, batch_format="pyarrow")
        .groupby("_pkey")
        .map_groups(merge, batch_format="pandas")
    )


def linear_attribution(
    ds: Dataset,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
    touch_type: str = "click",
    convert_type: str = "purchase",
    window_us: int = 24 * 3_600_000_000,
    num_partitions: int = 64,
) -> Dataset:
    """Multi-touch LINEAR attribution by hour-of-day: every conversion
    splits one unit of credit equally across the user's touch events in
    the preceding ``window_us`` (strictly before the conversion,
    window-start inclusive), and credits aggregate by the TOUCH's
    hour-of-day — the equal-split counterpart of the last-touch
    click_attribution op (which gives the whole unit to the latest
    touch).  "Which hours' clicks actually drive purchases?"

    Exactness: pair finding is integer-µs interval arithmetic
    (searchsorted per user, vectorized); each credit is the float
    ``1.0 / k`` from an exact int64 k; the per-hour credit sums fold
    SEQUENTIALLY in (conversion id, touch id) order on both sides
    (engine segment loop == ``list_reduce(list(… ORDER BY pid, cid))``),
    so totals are bit-exact.  Conversions with zero in-window touches
    credit nothing (both sides).

    One user-hash exchange emits only (pid, cid, hour, k) pair rows —
    bounded by touches-per-window × conversions; the ≤pairs final
    partition sorts once and folds.  Output: ``hour (int64),
    n_credited_clicks (int64), total_credit``.
    """
    import pyarrow.compute as pc

    from .rollup import _stable_pkey

    def keep(t: pa.Table) -> pa.Table:
        m = pc.is_in(t[type_col],
                     value_set=pa.array([touch_type, convert_type]))
        t = t.filter(m)
        out = pa.table({
            user_col: t[user_col],
            "_us": pc.cast(pc.cast(t[ts_col], pa.timestamp("us")),
                           pa.int64()),
            id_col: pc.cast(t[id_col], pa.int64()),
            "_is_conv": pc.equal(t[type_col], convert_type)})
        return out.append_column(
            "_pkey", _stable_pkey(out[user_col], num_partitions))

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "_pid": pd.Series([], dtype="int64"),
            "_cid": pd.Series([], dtype="int64"),
            "hour": pd.Series([], dtype="int64"),
            "_k": pd.Series([], dtype="int64")})
        if len(df) == 0:
            return empty
        df = df.sort_values([user_col, "_us", id_col], kind="mergesort")
        out_p, out_c, out_h, out_k = [], [], [], []
        for _, g in df.groupby(user_col, sort=False):
            conv = g[g["_is_conv"]]
            touch = g[~g["_is_conv"]]
            if len(conv) == 0 or len(touch) == 0:
                continue
            tus = touch["_us"].to_numpy(np.int64)
            tid = touch[id_col].to_numpy(np.int64)
            pus = conv["_us"].to_numpy(np.int64)
            pid = conv[id_col].to_numpy(np.int64)
            lo = np.searchsorted(tus, pus - np.int64(window_us), "left")
            hi = np.searchsorted(tus, pus, "left")
            k = (hi - lo).astype(np.int64)
            m = k > 0
            if not m.any():
                continue
            reps = k[m]
            idx = np.concatenate([np.arange(a, b)
                                  for a, b in zip(lo[m], hi[m])])
            out_p.append(np.repeat(pid[m], reps))
            out_c.append(tid[idx])
            out_h.append((tus[idx] // 3_600_000_000) % 24)
            out_k.append(np.repeat(reps, reps))
        if not out_p:
            return empty
        return pd.DataFrame({
            "_pid": np.concatenate(out_p),
            "_cid": np.concatenate(out_c),
            "hour": np.concatenate(out_h).astype(np.int64),
            "_k": np.concatenate(out_k)})

    def final(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "hour": pd.Series([], dtype="int64"),
            "n_credited_clicks": pd.Series([], dtype="int64"),
            "total_credit": pd.Series([], dtype="float64")})
        if len(df) == 0:
            return empty
        m = df.sort_values(["hour", "_pid", "_cid"], kind="mergesort") \
            .reset_index(drop=True)
        credit = 1.0 / m["_k"].to_numpy(np.int64).astype(np.float64)
        hours = m["hour"].to_numpy(np.int64)
        starts = np.flatnonzero(np.diff(hours, prepend=-1))
        ends = np.append(starts[1:], len(hours))
        tot = np.empty(len(starts), np.float64)
        for i, (s0, e0) in enumerate(zip(starts, ends)):
            acc = credit[s0]
            for x in credit[s0 + 1:e0]:   # sequential == list_reduce
                acc = acc + x
            tot[i] = acc
        return pd.DataFrame({
            "hour": hours[starts],
            "n_credited_clicks": (ends - starts).astype(np.int64),
            "total_credit": tot})

    marked = ds.map_batches(keep, batch_format="pyarrow",
                            zero_copy_batch=True)
    pair_rows = marked.groupby("_pkey").map_groups(
        pairs, batch_format="pandas")
    return pair_rows.repartition(1).map_batches(
        final, batch_format="pandas", batch_size=None)
