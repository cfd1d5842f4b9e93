"""Exact distributed quantiles via value histograms.

Percentiles (p50/p95/p99 of token counts, document lengths, latencies)
are a staple of corpus-quality reporting at 100 TB, where a global sort
per percentile is unaffordable.  For discrete-valued columns the exact
answer needs only the VALUE HISTOGRAM — (value → count) — which is
orders of magnitude smaller than the data: the shuffle carries one row
per distinct (key, value), never raw rows.

Algorithm (all inside the dataset plan, no driver round-trips):

1. per-batch partial histogram: ``(keys…, value) → count`` via one
   vectorized pyarrow ``group_by`` per batch (the combiner);
2. hash-partition by key (``_pkey`` pattern, stages/rollup.py) so every
   key's full histogram lands in one partition; merge counts and select
   quantiles per key in the same vectorized pandas body.

Quantile semantics match DuckDB's ``quantile_disc``: the element at
sorted 0-based index ``ceil(n·q)−1`` — deterministic, exact for any dtype
(no interpolation, so integer columns stay integers and float columns
reproduce bit-exactly).

Reference analog: the reference reports score thresholds by sorting the
held-out score column and indexing (experiments/keras_experiment.py:
583-593 top-k thresholding) — the same select-by-rank, here distributed.

Scale note: per-key distinct-value counts bound partition memory.  A
continuous float column with ~all-distinct values degrades the histogram
to ~the key's row count — quantize upstream (e.g. ``round(x, 3)``) or
use a sketch when exactness isn't required.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data import Dataset

from .rollup import _stable_pkey


def grouped_quantiles(
    ds: Dataset,
    *,
    value_col: str,
    keys: list[str],
    quantiles: tuple[float, ...] = (0.5, 0.95, 0.99),
    num_partitions: int = 64,
) -> Dataset:
    """Exact per-key ``quantile_disc`` of ``value_col`` for each q.

    Returns one row per key group with columns ``keys… + q_<pct>`` (e.g.
    ``q_50, q_95, q_99``), dtype equal to the value column's.
    """
    if not keys:
        raise ValueError("keys must be non-empty (use a constant column "
                         "for a global quantile)")
    qcols = [
        f"q_{int(q * 100)}" if float(q * 100).is_integer()
        else f"q_{str(q * 100).replace('.', '_')}"
        for q in quantiles
    ]

    def partial_hist(t: pa.Table) -> pa.Table:
        # per-batch (keys, value) -> count combiner; one pyarrow group_by
        out = (
            t.select(keys + [value_col])
            .group_by(keys + [value_col], use_threads=False)
            .aggregate([([], "count_all")])
        )
        out = out.rename_columns(keys + [value_col, "_cnt"])
        return out.append_column("_pkey", _stable_pkey(out[keys[0]], num_partitions))

    def merge_and_select(df: pd.DataFrame) -> pd.DataFrame:
        h = (
            df.groupby(keys + [value_col], sort=True)["_cnt"]
            .sum()
            .reset_index()
        )
        # cumulative count within each key, values ascending
        h["_cum"] = h.groupby(keys, sort=False)["_cnt"].cumsum()
        totals = h.groupby(keys, sort=False)["_cnt"].sum().rename("_n")
        h = h.merge(totals, left_on=keys, right_index=True)
        out = h[keys].drop_duplicates().reset_index(drop=True)
        for q, col in zip(quantiles, qcols):
            # quantile_disc: element at sorted 0-based index ceil(n*q)-1
            # (probed against DuckDB across n/q combinations) — the first
            # value whose cumulative count reaches ceil(n*q); q=0 clamps
            # to the minimum
            target = np.maximum(np.ceil(h["_n"] * q), 1)
            hit = h[h["_cum"] >= target]
            picked = hit.groupby(keys, sort=False)[value_col].first().rename(col)
            out = out.merge(picked, left_on=keys, right_index=True)
        return out

    return (
        ds.map_batches(partial_hist, batch_format="pyarrow")
        .groupby("_pkey")
        .map_groups(merge_and_select, batch_format="pandas")
    )

def grouped_value_profile(
    ds: Dataset,
    *,
    value_col: str,
    keys: list[str],
    scale: int = 100,
    quantiles: tuple[float, ...] = (0.5, 0.9),
    num_partitions: int = 8,
) -> Dataset:
    """One-pass per-key profile of a fixed-point money/metric column:
    exact count, exact mean (int64 ``scale``-cents sum), share of
    negative values, and exact discrete quantiles — the "balance sheet
    by segment" readout that would otherwise take three passes
    (aggregate + filter-count + quantile) and a join.

    Same value-histogram shape as :func:`grouped_quantiles`: the shuffle
    carries one row per distinct ``(key, scaled_value)``; every final
    statistic derives from the merged histogram, so nothing here reads
    the raw rows twice.  Values scale to int64 via the exact
    half-away-from-zero recipe ``copysign(floor(|x|·scale + 0.5), x)``
    (== DuckDB ``round(x*scale)``), making the sums and quantile picks
    bit-exact against a SQL twin.

    Output: ``keys… , n (int64), mean, share_neg, q_<pct>…`` — quantile
    columns are back in original units (``cents / scale``).
    """
    if not keys:
        raise ValueError("keys must be non-empty")
    qcols = [
        f"q_{int(q * 100)}" if float(q * 100).is_integer()
        else f"q_{str(q * 100).replace('.', '_')}"
        for q in quantiles
    ]

    def partial_hist(t: pa.Table) -> pa.Table:
        v = t[value_col]
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        x = v.to_numpy(zero_copy_only=False).astype(np.float64)
        ci = np.copysign(np.floor(np.abs(x) * scale + 0.5), x).astype(
            np.int64)
        tbl = t.select(keys).append_column("_ci", pa.array(ci))
        out = (
            tbl.group_by(keys + ["_ci"], use_threads=False)
            .aggregate([([], "count_all")])
        )
        out = out.rename_columns(keys + ["_ci", "_cnt"])
        return out.append_column(
            "_pkey", _stable_pkey(out[keys[0]], num_partitions))

    def merge_and_profile(df: pd.DataFrame) -> pd.DataFrame:
        h = (
            df.groupby(keys + ["_ci"], sort=True)["_cnt"]
            .sum()
            .reset_index()
        )
        h["_cum"] = h.groupby(keys, sort=False)["_cnt"].cumsum()
        h["_prod"] = h["_ci"] * h["_cnt"]
        h["_negc"] = np.where(h["_ci"] < 0, h["_cnt"], 0)
        g = h.groupby(keys, sort=False)
        out = pd.DataFrame({
            "n": g["_cnt"].sum().astype("int64"),
        })
        out["mean"] = (g["_prod"].sum().astype(np.float64)
                       / np.float64(scale)
                       ) / out["n"].astype(np.float64)
        out["share_neg"] = (g["_negc"].sum().astype(np.float64)
                            / out["n"].astype(np.float64))
        h = h.merge(out["n"].rename("_n"), left_on=keys,
                    right_index=True)
        for q, col in zip(quantiles, qcols):
            target = np.maximum(np.ceil(h["_n"] * q), 1)
            hit = h[h["_cum"] >= target]
            picked = hit.groupby(keys, sort=False)["_ci"].first()
            out[col] = picked.astype(np.float64) / np.float64(scale)
        return out.reset_index()

    return (
        ds.map_batches(partial_hist, batch_format="pyarrow")
        .groupby("_pkey")
        .map_groups(merge_and_profile, batch_format="pandas")
    )


def grouped_ecdf_at(
    ds: Dataset,
    *,
    key: str,
    value_col: str,
    thresholds: tuple[float, ...],
    num_partitions: int = 64,
) -> Dataset:
    """Exact per-key empirical CDF evaluated at fixed probe points:
    ``P(value ≤ t)`` for each ``t`` in ``thresholds`` — the inverse view
    of :func:`grouped_quantiles` (value → rank instead of rank → value),
    and the fixed-grid distribution profile the reference reads off its
    sorted held-out scores (/root/reference/experiments/keras_experiment.py
    :583-593 top-k thresholding, here as shares at chosen cut points).

    Scale shape: the per-batch combiner folds each batch to ONE row per
    key — ``(key, n, n_le(t_0), …, n_le(t_K))`` exact int64 counts — so the
    single ``_pkey`` exchange carries K+2 integers per key per batch
    regardless of batch size or value cardinality (no value histogram
    needed, unlike the quantile op).  Counts merge by addition; the
    finalize emits the long (key, threshold) grid.

    Output: one row per (key, threshold) — ``key, threshold (float64),
    n_rows (int64), n_le (int64), ecdf (float64)``, thresholds in the
    given order per key.
    """
    if not thresholds:
        raise ValueError("thresholds must be non-empty")
    thr = np.asarray(thresholds, dtype=np.float64)
    lecols = [f"_le{i}" for i in range(len(thr))]

    def partial(t: pa.Table) -> pa.Table:
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        labs = t[key].combine_chunks() if isinstance(t[key], pa.ChunkedArray) else t[key]
        labs = labs.to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(labs, return_inverse=True)
        k = len(uniq)
        cols = {
            key: pa.array(uniq, type=t[key].type),
            "n": pa.array(np.bincount(inv, minlength=k).astype(np.int64)),
        }
        # NaN compares false on every <= — NaN rows count into n only,
        # matching SQL where (value <= t) is NULL-false under FILTER
        for i, tv in enumerate(thr):
            w = (v <= tv).astype(np.int64)
            cols[lecols[i]] = pa.array(
                np.bincount(inv, weights=w, minlength=k).astype(np.int64))
        out = pa.table(cols)
        return out.append_column("_pkey", _stable_pkey(out[key], num_partitions))

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(key, sort=True)[["n"] + lecols].sum().reset_index()
        kk = len(g)
        n = np.repeat(g["n"].to_numpy(dtype=np.int64), len(thr))
        n_le = g[lecols].to_numpy(dtype=np.int64).reshape(-1)
        with np.errstate(divide="ignore", invalid="ignore"):
            ecdf = np.where(n > 0, n_le / n, np.nan)
        return pd.DataFrame({
            key: np.repeat(g[key].to_numpy(), len(thr)),
            "threshold": np.tile(thr, kk),
            "n_rows": n,
            "n_le": n_le,
            "ecdf": ecdf,
        })

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_pkey")
        .map_groups(merge, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# approximate quantiles for CONTINUOUS columns (t-digest-style sketch)
# ---------------------------------------------------------------------------


def _digest_rows(df: pd.DataFrame, keys: list[str], delta: int) -> pd.DataFrame:
    """Compress (keys, _m, _w) rows — sorted by keys then _m — into
    ≤ ~delta centroids PER KEY on the t-digest k1 (arcsine) scale.
    Vectorized across all keys at once: grouped cumsums give each row's
    mid-quantile, the scale function gives its centroid bucket, and one
    grouped weighted mean collapses buckets.  Tails get fine centroids,
    the middle coarse ones — that asymmetry is what bounds tail error."""
    g = df.groupby(keys, sort=False)["_w"]
    cw = g.cumsum()
    tot = g.transform("sum")
    q_mid = ((cw - 0.5 * df["_w"]) / tot).to_numpy()
    q_mid = np.clip(q_mid, 1e-12, 1 - 1e-12)
    k = (delta / (2 * np.pi)) * np.arcsin(2 * q_mid - 1)
    df = df.assign(_idx=np.floor(k).astype(np.int64),
                   _wm=df["_w"].to_numpy() * df["_m"].to_numpy())
    out = df.groupby(keys + ["_idx"], sort=False).agg(
        _w=("_w", "sum"), _wm=("_wm", "sum")).reset_index()
    out["_m"] = out["_wm"] / out["_w"]
    return out[keys + ["_m", "_w"]]


def _estimate_rows(d: pd.DataFrame, keys: list[str],
                   quantiles: tuple[float, ...],
                   qcols: list[str]) -> pd.DataFrame:
    """Quantile estimates from merged digest rows (sorted by keys+_m) —
    vectorized per-key interpolation: offset-pack the centroid mid-rank
    axis so one searchsorted serves every key."""
    m = d["_m"].to_numpy()
    w = d["_w"].to_numpy()
    same = np.ones(len(d) - 1, dtype=bool)
    for kcol in keys:
        kv = d[kcol].to_numpy()
        same &= kv[1:] == kv[:-1]
    starts = np.concatenate([[0], np.flatnonzero(~same) + 1])
    ends = np.concatenate([starts[1:], [len(d)]])
    gid = np.zeros(len(d), dtype=np.int64)
    gid[starts[1:]] = 1
    gid = np.cumsum(gid)
    cw_all = np.cumsum(w)
    base = np.concatenate([[0.0], cw_all[ends[:-1] - 1]])
    cw = cw_all - base[gid]                 # per-key cumweight
    c_mid = cw - 0.5 * w                    # centroid mid-rank
    W = (cw_all[ends - 1] - base)           # per-key total weight
    BIG = float(W.max()) * 4.0 + 1.0
    packed_c = c_mid + gid * BIG
    out = d.iloc[starts][keys].reset_index(drop=True)
    ng = len(starts)
    for q, col in zip(quantiles, qcols):
        target = np.arange(ng) * BIG + q * W
        pos = np.searchsorted(packed_c, target)
        lo = np.clip(pos - 1, starts, ends - 1)
        hi = np.clip(pos, starts, ends - 1)
        denom = packed_c[hi] - packed_c[lo]
        t_frac = np.where(denom > 0, (target - packed_c[lo]) / np.where(
            denom > 0, denom, 1.0), 0.0)
        t_frac = np.clip(t_frac, 0.0, 1.0)
        out[col] = m[lo] + t_frac * (m[hi] - m[lo])
    return out


def grouped_quantiles_approx(
    ds: Dataset,
    *,
    value_col: str,
    keys: list[str],
    quantiles: tuple[float, ...] = (0.5, 0.95, 0.99),
    delta: int = 128,
    num_partitions: int = 64,
) -> Dataset:
    """Approximate per-key quantiles of a CONTINUOUS column — the sketch
    route :func:`grouped_quantiles` names for values where the exact
    value histogram degenerates to ~the row count.  t-digest-style:
    each batch compresses every key's values into ≤ ~``delta``
    (mean, weight) centroids; centroid sets merge associatively
    (concat → sort → re-compress), so the exchange carries
    O(keys × delta) rows per batch regardless of input size.  Rank
    error is O(1/delta) mid-range, tighter at the tails; the envelope
    test pins it empirically.  Estimates interpolate between centroid
    means (midpoint rule) — everything, compression and estimation,
    is vectorized across keys (no per-key Python loop).

    Output: one row per key group — ``keys… + q_<pct>`` (float64).  No
    SQL twin (estimates are sketch-state-dependent).
    """
    if not keys:
        raise ValueError("keys must be non-empty")
    qcols = [
        f"q_{int(q * 100)}" if float(q * 100).is_integer()
        else f"q_{str(q * 100).replace('.', '_')}"
        for q in quantiles
    ]

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({k: t[k].to_numpy(zero_copy_only=False) for k in keys})
        df["_m"] = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        df["_w"] = 1.0
        df = df.sort_values(keys + ["_m"], kind="mergesort").reset_index(drop=True)
        out = _digest_rows(df, keys, delta)
        tbl = pa.Table.from_pandas(out, preserve_index=False)
        return tbl.append_column("_pkey", _stable_pkey(tbl[keys[0]], num_partitions))

    def merge_and_estimate(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=["_pkey"]).sort_values(
            keys + ["_m"], kind="mergesort").reset_index(drop=True)
        d = _digest_rows(df, keys, delta)
        return _estimate_rows(d, keys, quantiles, qcols)

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_pkey")
        .map_groups(merge_and_estimate, batch_format="pandas")
    )


def fixed_histogram(
    ds: "Dataset",
    *,
    value_col: str,
    width: float,
    n_col: str = "n_rows",
    num_partitions: int = 64,
) -> "Dataset":
    """Global fixed-width histogram: ``bin = floor(value / width)`` →
    count, plus the bin's left edge — the O(bins) distribution summary
    that replaces "look at the data" at 100 TB (the first chart of any
    corpus-quality report; the reference's equivalent is the per-class
    count inspection before training, TSFEDL/data.py:99-154).

    Pure combiner: each batch reduces to its distinct (bin, count) rows
    via one vectorized floor-divide + pyarrow ``group_by``; the shuffle
    carries O(bins) rows per batch.  ``floor(value / width)`` uses the
    identical float ops as the SQL twin, so binning is bit-identical.
    Output: ``bin (int64), bin_lo (float64), n_col``.
    """
    import pyarrow.compute as pc

    from .dedup import _grouped_min

    def partial(t: pa.Table) -> pa.Table:
        v = pc.cast(t[value_col], pa.float64())
        b = pc.cast(pc.floor(pc.divide(v, width)), pa.int64())
        out = pa.table({"bin": b}).group_by(["bin"], use_threads=False) \
            .aggregate([([], "count_all")])
        return pa.table({"bin": out["bin"],
                         n_col: pc.cast(out["count_all"], pa.int64())})

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    merged = _grouped_min(partials, group_cols=["bin"],
                          agg_cols=[(n_col, "sum")], pkey_col="bin",
                          num_partitions=num_partitions)

    def fin(t: pa.Table) -> pa.Table:
        lo = pc.multiply(pc.cast(t["bin"], pa.float64()), width)
        return pa.table({"bin": t["bin"], "bin_lo": lo, n_col: t[n_col]})

    return merged.map_batches(fin, batch_format="pyarrow", zero_copy_batch=True)


def tiered_quantile_digest(
    ds: Dataset,
    *,
    ts_col: str,
    value_col: str,
    tiers: tuple[str, ...] = ("1m", "1h", "1d"),
    quantiles: tuple[float, ...] = (0.5, 0.95, 0.99),
    delta: int = 128,
    num_partitions: int = 64,
) -> "dict[str, Dataset]":
    """Continuous-aggregate PERCENTILES up the retention cascade — the
    sketch analogue of the sum/min/max tier cascade
    (stages/rollup.py): per-window t-digest state is built ONCE at the
    finest tier, and every coarser tier is produced by re-MERGING the
    finer tier's centroid state (concat → sort → re-compress) — the raw
    data is never re-read.  This is the property that makes percentile
    retention tiers affordable at 100 TB: the 1h tier's input is
    O(minutes × delta) centroid rows, not O(events).

    Mergeability is t-digest's defining contract (Dunning's sketch);
    the estimate bias from double-compression is bounded by the same
    O(1/delta) rank error — the cascade-vs-direct property test pins
    it.  Reference analog: the pooled downsample cascade
    (/root/reference/TSFEDL/models_keras.py pooling chains) re-reduces
    REDUCED state, never raw input.

    Returns {tier: Dataset(window_start, n_events, q_50, q_95, q_99)}.
    """
    import pyarrow.compute as pc

    from ..functions.windows import window_start_us, rewindow_us

    qcols = [
        f"q_{int(q * 100)}" if float(q * 100).is_integer()
        else f"q_{str(q * 100).replace('.', '_')}"
        for q in quantiles
    ]
    keys = ["window_start"]

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "window_start": np.asarray(window_start_us(t[ts_col], tiers[0])),
            "_m": t[value_col].to_numpy(zero_copy_only=False).astype(
                np.float64),
            "_w": 1.0,
        })
        df = df.sort_values(keys + ["_m"], kind="mergesort").reset_index(
            drop=True)
        out = _digest_rows(df, keys, delta)
        tbl = pa.Table.from_pandas(out, preserve_index=False)
        return tbl.append_column(
            "_pkey", _stable_pkey(tbl["window_start"], num_partitions))

    def merge_state(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=["_pkey"]).sort_values(
            keys + ["_m"], kind="mergesort").reset_index(drop=True)
        return _digest_rows(df, keys, delta)

    def estimate_block(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            cols = {"window_start": pd.Series([], dtype="datetime64[us]"),
                    "n_events": pd.Series([], dtype="int64")}
            for c in qcols:
                cols[c] = pd.Series([], dtype="float64")
            return pd.DataFrame(cols)
        df = df.sort_values(keys + ["_m"], kind="mergesort").reset_index(
            drop=True)
        out = _estimate_rows(df, keys, quantiles, qcols)
        n = df.groupby("window_start", sort=True)["_w"].sum()
        out.insert(1, "n_events",
                   n.reindex(out["window_start"]).to_numpy().astype(np.int64))
        out["window_start"] = pd.to_datetime(out["window_start"], unit="us")
        return out

    state = (ds.map_batches(partial, batch_format="pyarrow",
                            zero_copy_batch=True)
             .groupby("_pkey").map_groups(merge_state,
                                          batch_format="pandas"))
    result: dict[str, Dataset] = {}
    result[tiers[0]] = state.map_batches(estimate_block,
                                         batch_format="pandas",
                                         batch_size=None)
    for prev, tier in zip(tiers, tiers[1:]):
        def relabel(t: pa.Table, _tier=tier) -> pa.Table:
            win = rewindow_us(pc.cast(t["window_start"], pa.int64()), _tier)
            out = pa.table({"window_start": win, "_m": t["_m"],
                            "_w": t["_w"]})
            return out.append_column(
                "_pkey", _stable_pkey(win, num_partitions))

        state = (state.map_batches(relabel, batch_format="pyarrow")
                 .groupby("_pkey").map_groups(merge_state,
                                              batch_format="pandas"))
        result[tier] = state.map_batches(estimate_block,
                                         batch_format="pandas",
                                         batch_size=None)
    return result


def interarrival_quantiles(
    ds: "Dataset",
    *,
    key: str,
    ts_col: str,
    order_by: list[str],
    qs: tuple = (0.5, 0.9),
    num_partitions: int = 64,
) -> "Dataset":
    """Inter-arrival gap percentiles per key: the p50/p90 (by default)
    of the microsecond gaps between consecutive events in ``order_by``
    order — the traffic-burstiness profile per event type / device /
    tenant (tight p50 + huge p90 = bursty; both tight = steady drip).

    Exactness: gaps are exact integer microseconds (timestamp
    subtraction — never epoch floats, the date_diff recipe); each
    percentile is DuckDB ``quantile_disc`` semantics — the element at
    sorted 0-based index ceil(m·q)−1 — so the only float is the final
    µs→seconds division.  Keys with < 2 events emit nothing (no gap).

    One key-hash exchange; inside each key-complete partition the sort,
    diff and index picks are vectorized across ALL keys.  Output:
    ``key, n_gaps (int64), p{50}_gap_s, p{90}_gap_s`` (column names
    follow ``qs``).
    """
    from .grouped import grouped_apply

    names = [f"p{int(round(q * 100))}_gap_s" for q in qs]

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        cols = {key: pd.Series([], dtype="object"),
                "n_gaps": pd.Series([], dtype="int64")}
        for nm in names:
            cols[nm] = pd.Series([], dtype="float64")
        empty = pd.DataFrame(cols)
        if len(df) == 0:
            return empty
        m = df.sort_values([key, *order_by], kind="mergesort") \
            .reset_index(drop=True)
        us = m[ts_col].to_numpy("datetime64[us]").astype(np.int64)
        gap = us - np.roll(us, 1)
        firsts = m.groupby(key, sort=False).cumcount().to_numpy() == 0
        keep = ~firsts
        if not keep.any():
            return empty
        gk = pd.DataFrame({key: m[key].to_numpy()[keep],
                           "_g": gap[keep]})
        gk = gk.sort_values([key, "_g"], kind="mergesort") \
            .reset_index(drop=True)
        grp = gk.groupby(key, sort=False)
        sizes = grp.size().to_numpy(np.int64)
        keys_ = grp.size().index.to_numpy()
        offs = np.concatenate(([0], np.cumsum(sizes)[:-1]))
        vals = gk["_g"].to_numpy(np.int64)
        out = {key: keys_, "n_gaps": sizes}
        for q, nm in zip(qs, names):
            idx = np.maximum(np.ceil(sizes * q), 1).astype(np.int64) - 1
            out[nm] = vals[offs + idx].astype(np.float64) / 1_000_000.0
        return pd.DataFrame(out)

    return grouped_apply(ds, keys=[key], fn=fold,
                         num_partitions=num_partitions,
                         whole_partition=True)
