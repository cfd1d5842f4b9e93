"""Per-key linear trend (OLS fit) as a one-exchange sketch aggregate.

The distributed analog of fitting a tiny model per series — the engine's
re-expression of the reference's fit-one-model-per-unit loop shape (the
per-architecture train/eval loop, experiments/arrythmia_experiment.py:179
``for name, model in methods_dict.items()``): here the "model" is the
closed-form least-squares line value ~ time, fitted to every key in one
pass.  Drift/trend per key is the standard tier-timeseries
health signal (is this user's metric creeping up?).

Scale design: each batch reduces to ONE row of raw moments per key —
``(key, n, Σx, Σy, Σx², Σxy, Σy²)`` — so the exchange carries seven
numbers per key per batch regardless of batch size; moments merge by
addition (associative, exact for the integer-count part).  The closed-form
finalize runs once per key, vectorized.

Numerical note: raw-moment merging cancels catastrophically when x is an
absolute epoch (x² ≈ 1e30).  The operator therefore REQUIRES a reference
timestamp and regresses on days-since-ref (O(1..1e3) values), matching the
oracle's ``epoch(ts - ref)/86400.0``; with conditioned x the raw-moment
route is stable to ~1e-13 relative at any corpus size.  (For arbitrary
unconditioned x, switch the merge to Chan's pairwise mean/M2 form.)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from .rollup import _stable_pkey

_MOMS = ("n", "sx", "sy", "sxx", "sxy", "syy")


def grouped_linear_trend(
    ds: Dataset,
    *,
    key: str,
    ts_col: str,
    value_col: str,
    ref_ts_us: int,
    n_col: str = "n_events",
    num_partitions: int = 64,
) -> Dataset:
    """Per-key OLS of ``value_col`` on days-since-``ref_ts_us``.

    Output: one row per key — ``key, n_col, slope_per_day, intercept,
    corr_xy`` (intercept = fitted value at the reference timestamp).
    Degenerate keys (n < 2 or zero time variance) get NULL fit columns,
    matching SQL ``regr_slope``/``corr`` semantics.
    """

    def partial(t: pa.Table) -> pa.Table:
        ts = t[ts_col]
        if pa.types.is_timestamp(ts.type):
            ts = pc.cast(pc.cast(ts, pa.timestamp("us")), pa.int64())
        ts_us = ts.to_numpy(zero_copy_only=False).astype(np.int64)
        # mirror DuckDB epoch(ts - ref)/86400.0 exactly: µs → s → days
        x = (ts_us - ref_ts_us) / 1e6 / 86400.0
        y = pc.cast(t[value_col], pa.float64()).to_numpy(zero_copy_only=False)
        labs = t[key].combine_chunks() if isinstance(t[key], pa.ChunkedArray) else t[key]
        labs = labs.to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(labs, return_inverse=True)
        k = len(uniq)
        out = pa.table({
            key: pa.array(uniq, type=t[key].type),
            "n": pa.array(np.bincount(inv, minlength=k).astype(np.int64)),
            "sx": pa.array(np.bincount(inv, weights=x, minlength=k)),
            "sy": pa.array(np.bincount(inv, weights=y, minlength=k)),
            "sxx": pa.array(np.bincount(inv, weights=x * x, minlength=k)),
            "sxy": pa.array(np.bincount(inv, weights=x * y, minlength=k)),
            "syy": pa.array(np.bincount(inv, weights=y * y, minlength=k)),
        })
        return out.append_column("_pkey", _stable_pkey(out[key], num_partitions))

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(key, sort=False)[list(_MOMS)].sum().reset_index()
        n = g["n"].to_numpy(dtype=np.float64)
        sx, sy = g["sx"].to_numpy(), g["sy"].to_numpy()
        sxx, sxy, syy = g["sxx"].to_numpy(), g["sxy"].to_numpy(), g["syy"].to_numpy()
        with np.errstate(divide="ignore", invalid="ignore"):
            cov = sxy - sx * sy / n        # n·covar_pop
            varx = sxx - sx * sx / n       # n·var_pop(x)
            vary = syy - sy * sy / n
            slope = cov / varx
            intercept = (sy - slope * sx) / n
            corr = cov / np.sqrt(varx * vary)
        out = pd.DataFrame({
            key: g[key],
            n_col: g["n"].astype(np.int64),
            "slope_per_day": slope,
            "intercept": intercept,
            "corr_xy": corr,
        })
        # SQL regr_*/corr return NULL for degenerate groups
        for c in ("slope_per_day", "intercept", "corr_xy"):
            v = out[c].to_numpy()
            out[c] = np.where(np.isfinite(v), v, np.nan)
        return out

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_pkey")
        .map_groups(merge, batch_format="pandas")
    )


def grouped_ols_xy(
    ds: Dataset,
    *,
    key: str,
    x_col: str,
    y_col: str,
    n_col: str = "n_rows",
    num_partitions: int = 64,
) -> Dataset:
    """Per-key OLS of ``y_col`` on ``x_col`` — the generic two-column
    sibling of :func:`grouped_linear_trend` (which is pinned to x = time).
    Same moment-sum sketch: each batch reduces to ONE
    ``(key, n, Σx, Σy, Σx², Σxy, Σy²)`` row per key, merged by addition
    across the single ``_pkey`` exchange, closed-form finalize per key.

    The reference fits per-architecture regressions in a driver loop
    (/root/reference/experiments/arrythmia_experiment.py:179); here the
    per-group "fit" is the exact least-squares line, one pass, any key
    cardinality.  Conditioning caveat as in the module docstring: x must
    be O(1..1e6)-scaled (quantities, counts, token lengths), not absolute
    epochs.

    Output: one row per key — ``key, n_col, slope, intercept, corr_xy``
    (NULL fit for degenerate keys, matching SQL regr_*/corr semantics).
    """

    def partial(t: pa.Table) -> pa.Table:
        x = pc.cast(t[x_col], pa.float64()).to_numpy(zero_copy_only=False)
        y = pc.cast(t[y_col], pa.float64()).to_numpy(zero_copy_only=False)
        labs = t[key].combine_chunks() if isinstance(t[key], pa.ChunkedArray) else t[key]
        labs = labs.to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(labs, return_inverse=True)
        k = len(uniq)
        out = pa.table({
            key: pa.array(uniq, type=t[key].type),
            "n": pa.array(np.bincount(inv, minlength=k).astype(np.int64)),
            "sx": pa.array(np.bincount(inv, weights=x, minlength=k)),
            "sy": pa.array(np.bincount(inv, weights=y, minlength=k)),
            "sxx": pa.array(np.bincount(inv, weights=x * x, minlength=k)),
            "sxy": pa.array(np.bincount(inv, weights=x * y, minlength=k)),
            "syy": pa.array(np.bincount(inv, weights=y * y, minlength=k)),
        })
        return out.append_column("_pkey", _stable_pkey(out[key], num_partitions))

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(key, sort=False)[list(_MOMS)].sum().reset_index()
        n = g["n"].to_numpy(dtype=np.float64)
        sx, sy = g["sx"].to_numpy(), g["sy"].to_numpy()
        sxx, sxy, syy = g["sxx"].to_numpy(), g["sxy"].to_numpy(), g["syy"].to_numpy()
        with np.errstate(divide="ignore", invalid="ignore"):
            cov = sxy - sx * sy / n
            varx = sxx - sx * sx / n
            vary = syy - sy * sy / n
            slope = cov / varx
            intercept = (sy - slope * sx) / n
            corr = cov / np.sqrt(varx * vary)
        out = pd.DataFrame({
            key: g[key],
            n_col: g["n"].astype(np.int64),
            "slope": slope,
            "intercept": intercept,
            "corr_xy": corr,
        })
        for c in ("slope", "intercept", "corr_xy"):
            v = out[c].to_numpy()
            out[c] = np.where(np.isfinite(v), v, np.nan)
        return out

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_pkey")
        .map_groups(merge, batch_format="pandas")
    )


def seasonal_adjust(
    ds: Dataset,
    *,
    key: str,
    ts_col: str,
    value_col: str,
    period: str = "hour_of_day",
    mean_col: str = "seasonal_mean",
    resid_col: str = "residual",
    num_partitions: int = 64,
) -> Dataset:
    """Seasonal-profile adjustment: every row's value minus its key's own
    mean for that calendar phase (hour-of-day / day-of-week) — the
    classical seasonal-naive decomposition step (value = seasonal +
    residual), the de-seasonalized residual being what drift/anomaly
    detectors (cusum, trailing_zscore) should consume for daily-patterned
    series.

    One exchange: rows co-partition by hash(key), and because a
    partition then holds each of its keys' COMPLETE rows, the per
    (key, phase) profile computed inside the partition is already the
    exact global profile — fit and transform fuse into one vectorized
    body (groupby transform('mean')).  For mega-keys, pre-aggregate the
    profile with a combiner instead (the rollup pattern) and broadcast —
    documented trade-off, not needed while a key fits a partition.

    ``period``: ``hour_of_day`` (0–23) or ``day_of_week`` (0=Sunday…,
    matching SQL ``dayofweek``).  Output appends ``phase`` (int64),
    ``mean_col``, ``resid_col``.
    """
    import pyarrow as pa

    from .rollup import _stable_pkey

    if period not in ("hour_of_day", "day_of_week"):
        raise ValueError(f"unknown period {period!r}")

    def add_pkey(t: pa.Table) -> pa.Table:
        return t.append_column("_pkey", _stable_pkey(t[key], num_partitions))

    def adjust_partition(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=["_pkey"]).reset_index(drop=True)
        ts = df[ts_col].dt
        if period == "hour_of_day":
            phase = ts.hour.astype(np.int64)
        else:
            # SQL dayofweek: 0=Sunday … 6=Saturday; pandas: 0=Monday
            phase = ((ts.dayofweek + 1) % 7).astype(np.int64)
        df["phase"] = phase
        df[mean_col] = df.groupby([key, "phase"], sort=False)[value_col] \
            .transform("mean")
        df[resid_col] = df[value_col] - df[mean_col]
        return df

    tagged = ds.map_batches(add_pkey, batch_format="pyarrow")
    return tagged.groupby("_pkey").map_groups(adjust_partition, batch_format="pandas")


def pairwise_corr(
    ds: Dataset,
    *,
    cols: list[str],
    n_col: str = "n_rows",
    corr_col: str = "corr",
) -> Dataset:
    """Pairwise Pearson correlation matrix over numeric columns — the
    cross-series co-movement summary (do error counts rise with
    latency?), the engine's analog of the reference's multi-branch
    feature correlation inspection.

    Combiner discipline for the quadratic aggregate: each batch reduces
    to K(K−1)/2 pair rows carrying mergeable raw moments
    ``(n, Σa, Σb, Σa², Σb², Σab)`` — a K×K ``Xᵀ X`` matmul per batch, so
    the exchange carries ~K² scalars per batch regardless of rows.  The
    final merge is one tiny single-partition reduce.  Rows with a NULL
    in ANY of ``cols`` are dropped entirely (SQL ``corr`` twin over a
    NULL-free projection).

    Output: one row per unordered pair in ``cols`` order —
    ``col_a, col_b, n_col, corr_col`` (NULL corr for degenerate pairs).
    """
    if len(cols) < 2:
        raise ValueError("need at least two columns")
    k = len(cols)
    ia, ib = np.triu_indices(k, 1)

    def partial(t: pa.Table) -> pa.Table:
        x = np.column_stack([
            pc.cast(t[c], pa.float64()).to_numpy(zero_copy_only=False)
            for c in cols
        ])
        x = x[~np.isnan(x).any(axis=1)]
        n = len(x)
        s = x.sum(axis=0) if n else np.zeros(k)
        m = x.T @ x if n else np.zeros((k, k))
        return pa.table({
            "col_a": pa.array(np.array(cols, dtype=object)[ia]),
            "col_b": pa.array(np.array(cols, dtype=object)[ib]),
            "_n": pa.array(np.full(len(ia), n, dtype=np.int64)),
            "_sa": pa.array(s[ia]),
            "_sb": pa.array(s[ib]),
            "_saa": pa.array(m[ia, ia]),
            "_sbb": pa.array(m[ib, ib]),
            "_sab": pa.array(m[ia, ib]),
        })

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["col_a", "col_b"], sort=False)[
            ["_n", "_sa", "_sb", "_saa", "_sbb", "_sab"]
        ].sum().reset_index()
        n = g["_n"].to_numpy(dtype=np.float64)
        sa, sb = g["_sa"].to_numpy(), g["_sb"].to_numpy()
        saa, sbb, sab = g["_saa"].to_numpy(), g["_sbb"].to_numpy(), g["_sab"].to_numpy()
        with np.errstate(invalid="ignore", divide="ignore"):
            cov = sab - sa * sb / n
            corr = cov / np.sqrt((saa - sa * sa / n) * (sbb - sb * sb / n))
        corr = np.where(np.isfinite(corr), corr, np.nan)
        out = pd.DataFrame({
            "col_a": g["col_a"], "col_b": g["col_b"],
            n_col: g["_n"].astype(np.int64), corr_col: corr,
        })
        # deterministic output order: pair order as given in ``cols``
        order = {(cols[a], cols[b]): i for i, (a, b) in enumerate(zip(ia, ib))}
        out["_o"] = [order[(a, b)] for a, b in zip(out.col_a, out.col_b)]
        return out.sort_values("_o").drop(columns="_o").reset_index(drop=True)

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(1)
        # repartition(1) + batch_size=None ⇒ merge sees every pair row
        .map_batches(merge, batch_format="pandas", batch_size=None)
    )


def _key_groups(df: pd.DataFrame, key: str):
    """(keys_all, gid, starts) for a frame already sorted by key."""
    keys_all = df[key].to_numpy()
    change = np.flatnonzero(keys_all[1:] != keys_all[:-1]) + 1
    gid = np.zeros(len(df), dtype=np.int64)
    gid[change] = 1
    gid = np.cumsum(gid)
    starts = np.concatenate([[0], change])
    return keys_all, gid, starts


def interarrival_stats(
    ds: Dataset,
    *,
    key: str,
    ts_col: str,
    order_by: list[str] | None = None,
    num_partitions: int = 64,
) -> Dataset:
    """Per-key inter-event-time distribution: mean/std of the gaps (s)
    and the Goh–Barabási burstiness index B = (σ−µ)/(σ+µ) — B→−1 for a
    regular clock, 0 for Poisson, →1 for extreme bursts.  The standard
    first look at WHEN a series fires (the reference resamples on the
    assumption of a uniform clock; this op measures how far a key is
    from one).

    One co-partition; gaps/moments vectorized over key-change boundaries
    (no per-key loop).  Keys with <2 events are dropped (no gap exists);
    std is sample std (NULL when only one gap), burstiness uses
    population std to match its literature definition and is NULL when
    σ+µ = 0.  Output: ``key, n_gaps, gap_mean_s, gap_std_s, burstiness``.
    """
    import pyarrow as pa

    from .rollup import _stable_pkey

    order_by = order_by or [ts_col]

    def add_pkey(t: pa.Table) -> pa.Table:
        return t.append_column("_pkey", _stable_pkey(t[key], num_partitions))

    def stats_partition(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=["_pkey"]).sort_values(
            [key] + order_by, kind="mergesort").reset_index(drop=True)
        if len(df) == 0:
            return pd.DataFrame({key: [], "n_gaps": pd.Series([], dtype="int64"),
                                 "gap_mean_s": [], "gap_std_s": [],
                                 "burstiness": []})
        ts = df[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        keys_all, gid, starts = _key_groups(df, key)
        same = np.zeros(len(df), dtype=bool)
        same[1:] = keys_all[1:] == keys_all[:-1]
        gap = np.zeros(len(df))
        gap[1:] = (ts[1:] - ts[:-1]) / 1e6
        gap[~same] = 0.0
        w = same.astype(np.float64)
        k = int(gid[-1]) + 1
        n = np.bincount(gid, weights=w, minlength=k)
        s1 = np.bincount(gid, weights=gap, minlength=k)
        s2 = np.bincount(gid, weights=gap * gap, minlength=k)
        keep = n >= 1
        n, s1, s2 = n[keep], s1[keep], s2[keep]
        mean = s1 / n
        with np.errstate(invalid="ignore", divide="ignore"):
            var_pop = np.maximum(s2 - s1 * s1 / n, 0.0) / n
            std_pop = np.sqrt(var_pop)
            std_samp = np.where(
                n >= 2, np.sqrt(np.maximum(s2 - s1 * s1 / n, 0.0) / (n - 1.0)),
                np.nan)
            denom = std_pop + mean
            burst = np.where(denom > 0, (std_pop - mean) / np.where(
                denom > 0, denom, 1.0), np.nan)
        return pd.DataFrame({
            key: keys_all[starts][keep],
            "n_gaps": n.astype(np.int64),
            "gap_mean_s": mean,
            "gap_std_s": std_samp,
            "burstiness": burst,
        })

    tagged = ds.map_batches(add_pkey, batch_format="pyarrow")
    return tagged.groupby("_pkey").map_groups(stats_partition, batch_format="pandas")


def lag1_autocorr(
    ds: Dataset,
    *,
    key: str,
    value_col: str,
    order_by: list[str],
    num_partitions: int = 64,
) -> Dataset:
    """Per-key lag-1 autocorrelation: Pearson corr of (xᵢ, xᵢ₋₁) pairs in
    explicit order — the standard is-it-noise-or-momentum statistic
    (positive: trending/smooth series, ~0: white noise, negative:
    mean-reverting), the one-number sibling of the recurrent scan.

    Semantics == SQL ``corr(value, lag(value) OVER (...))`` including
    its NULL rules (keys with <3 rows or a constant side give NULL).
    One co-partition, moments via bincount over key-change boundaries.
    Output: ``key, n_pairs, autocorr``.
    """
    import pyarrow as pa

    from .rollup import _stable_pkey

    def add_pkey(t: pa.Table) -> pa.Table:
        return t.append_column("_pkey", _stable_pkey(t[key], num_partitions))

    def corr_partition(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=["_pkey"]).sort_values(
            [key] + order_by, kind="mergesort").reset_index(drop=True)
        if len(df) == 0:
            return pd.DataFrame({key: [], "n_pairs": pd.Series([], dtype="int64"),
                                 "autocorr": []})
        v = df[value_col].to_numpy(dtype=np.float64)
        keys_all, gid, starts = _key_groups(df, key)
        same = np.zeros(len(df), dtype=bool)
        same[1:] = keys_all[1:] == keys_all[:-1]
        x = np.zeros(len(df))  # previous value, where same key
        x[1:] = v[:-1]
        w = same.astype(np.float64)
        y = v * w
        x = x * w
        k = int(gid[-1]) + 1
        n = np.bincount(gid, weights=w, minlength=k)
        sx = np.bincount(gid, weights=x, minlength=k)
        sy = np.bincount(gid, weights=y, minlength=k)
        sxx = np.bincount(gid, weights=x * x, minlength=k)
        syy = np.bincount(gid, weights=y * y, minlength=k)
        sxy = np.bincount(gid, weights=x * y, minlength=k)
        keep = n >= 1
        with np.errstate(invalid="ignore", divide="ignore"):
            cov = sxy - sx * sy / n
            corr = cov / np.sqrt((sxx - sx * sx / n) * (syy - sy * sy / n))
        corr = np.where(np.isfinite(corr), corr, np.nan)
        return pd.DataFrame({
            key: keys_all[starts][keep],
            "n_pairs": n[keep].astype(np.int64),
            "autocorr": corr[keep],
        })

    tagged = ds.map_batches(add_pkey, batch_format="pyarrow")
    return tagged.groupby("_pkey").map_groups(corr_partition, batch_format="pandas")


def cross_series_corr(
    ds: Dataset,
    *,
    ts_col: str,
    type_col: str,
    type_a: str,
    type_b: str,
    tier: str = "1h",
    num_partitions: int = 64,
) -> Dataset:
    """Lead/lag coupling between two event types: build the per-window
    count series of ``type_a`` and ``type_b`` on the same tumbling grid,
    then report Pearson corr at lag 0 AND with ``type_a`` lagged one
    OBSERVED window (does a burst of A precede a burst of B?) — the
    cross-series sibling of :func:`lag1_autocorr` and the engine's
    two-branch analog of the reference's multi-lead coupling inspection
    (multi-branch concat, SURVEY.md §2.4).

    The lag steps over OBSERVED windows in time order (an empty-grid
    window is skipped, exactly like SQL ``lag() OVER (ORDER BY hr)``
    over the grouped result) — document gaps first with the gap-fill op
    if calendar-lag semantics are wanted.

    Dataflow: a per-batch (window, a_n, b_n) count combiner — O(windows)
    rows per batch — then ONE tiny ordered merge in a single final
    partition (the window-count series for years of hourly data is ~1e4
    rows).  Counts are exact int64, so both corr inputs are exact;
    output: one row — ``n_windows, corr_lag0, corr_lag1``.
    """
    from ..functions.windows import window_start_us

    def partial(t: pa.Table) -> pa.Table:
        w = window_start_us(t[ts_col], tier)
        is_a = pc.cast(pc.equal(t[type_col], type_a), pa.int64())
        is_b = pc.cast(pc.equal(t[type_col], type_b), pa.int64())
        out = pa.table({"w": w, "a_n": is_a, "b_n": is_b}) \
            .group_by(["w"], use_threads=False) \
            .aggregate([("a_n", "sum"), ("b_n", "sum")])
        return out.rename_columns(["w", "a_n", "b_n"])

    def _corr(x: np.ndarray, y: np.ndarray) -> float:
        n = float(len(x))
        if n < 2:
            return np.nan
        sx, sy = x.sum(), y.sum()
        with np.errstate(invalid="ignore", divide="ignore"):
            c = (np.dot(x, y) - sx * sy / n) / np.sqrt(
                (np.dot(x, x) - sx * sx / n) * (np.dot(y, y) - sy * sy / n))
        return float(c) if np.isfinite(c) else np.nan

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("w", sort=True)[["a_n", "b_n"]].sum()
        a = g["a_n"].to_numpy(dtype=np.float64)
        b = g["b_n"].to_numpy(dtype=np.float64)
        return pd.DataFrame({
            "n_windows": pd.Series([len(g)], dtype="int64"),
            "corr_lag0": [_corr(a, b)],
            # type_a leads: a[t] vs b[t+1] over observed windows
            "corr_lag1": [_corr(a[:-1], b[1:]) if len(g) >= 2 else np.nan],
        })

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return partials.repartition(1).map_batches(fin, batch_format="pandas",
                                               batch_size=None)


def granger_probe(
    ds: Dataset,
    *,
    ts_col: str,
    type_col: str,
    type_cause: str,
    type_effect: str,
    tier: str = "1h",
) -> Dataset:
    """Granger-style predictive probe on the tumbling-window count grid:
    does last window's ``type_cause`` count improve the prediction of this
    window's ``type_effect`` count beyond the effect's OWN last value?
    Fits the restricted AR(1) model ``y_t ~ y_{t-1}`` and the full model
    ``y_t ~ y_{t-1} + x_{t-1}`` over OBSERVED windows and reports the
    cross coefficient, the incremental R², and the single-restriction
    F statistic — the multivariate upgrade of
    :func:`cross_series_corr`'s lag-1 correlation (which cannot tell
    "x predicts y" from "y predicts itself and x rides along").

    Dataflow: the same per-batch ``(window, x_n, y_n)`` count combiner —
    O(windows) rows per batch, counts exact int64 — then ONE tiny ordered
    fold on a single partition (the hourly grid for years of data is
    ~1e4 rows).  All moment sums are exact integers; the finalize
    arithmetic is a fixed expression tree mirrored verbatim by the SQL
    twin, so both sides compute bit-identical doubles.  Degenerate inputs
    (n_pairs < 4, constant regressors, collinear lags, perfect fit)
    yield NULLs through 0-division on both sides.

    Output: one row — ``n_pairs (int64), b_self, b_cross, delta_r2,
    f_stat``.
    """
    from ..functions.windows import window_start_us

    def partial(t: pa.Table) -> pa.Table:
        w = window_start_us(t[ts_col], tier)
        is_x = pc.cast(pc.equal(t[type_col], type_cause), pa.int64())
        is_y = pc.cast(pc.equal(t[type_col], type_effect), pa.int64())
        out = pa.table({"w": w, "x_n": is_x, "y_n": is_y}) \
            .group_by(["w"], use_threads=False) \
            .aggregate([("x_n", "sum"), ("y_n", "sum")])
        return out.rename_columns(["w", "x_n", "y_n"])

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("w", sort=True)[["x_n", "y_n"]].sum()
        xs = g["x_n"].to_numpy(dtype=np.int64)
        ys = g["y_n"].to_numpy(dtype=np.int64)
        y, y1, x1 = ys[1:], ys[:-1], xs[:-1]
        n_pairs = len(y)
        if n_pairs == 0:
            return pd.DataFrame({
                "n_pairs": pd.Series([0], dtype="int64"),
                "b_self": [np.nan], "b_cross": [np.nan],
                "delta_r2": [np.nan], "f_stat": [np.nan]})
        # exact int64 moment sums → float64 once (same rounding as the
        # SQL twin's ::DOUBLE cast of its exact integer sums); np.float64
        # scalars so 0-division yields inf/nan (→ NULL) instead of raising
        # like Python floats would
        n = np.float64(n_pairs)
        sy, sy1 = np.float64(y.sum()), np.float64(y1.sum())
        sx1 = np.float64(x1.sum())
        syy = np.float64(np.dot(y, y))
        syy1 = np.float64(np.dot(y, y1))
        syx1 = np.float64(np.dot(y, x1))
        sy1y1 = np.float64(np.dot(y1, y1))
        sx1x1 = np.float64(np.dot(x1, x1))
        sy1x1 = np.float64(np.dot(y1, x1))
        # fixed expression tree — keep in lockstep with the SQL twin
        with np.errstate(invalid="ignore", divide="ignore"):
            cyy = syy - sy * sy / n
            cyy1 = syy1 - sy * sy1 / n
            cyx1 = syx1 - sy * sx1 / n
            cy1y1 = sy1y1 - sy1 * sy1 / n
            cx1x1 = sx1x1 - sx1 * sx1 / n
            cy1x1 = sy1x1 - sy1 * sx1 / n
            rss_r = cyy - cyy1 * cyy1 / cy1y1
            det = cy1y1 * cx1x1 - cy1x1 * cy1x1
            b_self = (cyy1 * cx1x1 - cyx1 * cy1x1) / det
            b_cross = (cy1y1 * cyx1 - cy1x1 * cyy1) / det
            rss_f = cyy - b_self * cyy1 - b_cross * cyx1
            delta_r2 = (rss_r - rss_f) / cyy
            f_stat = (rss_r - rss_f) * (n - 3.0) / rss_f
        vals = [b_self, b_cross, delta_r2, f_stat]
        vals = [v if np.isfinite(v) else np.nan for v in vals]
        return pd.DataFrame({
            "n_pairs": pd.Series([n_pairs], dtype="int64"),
            "b_self": [vals[0]], "b_cross": [vals[1]],
            "delta_r2": [vals[2]], "f_stat": [vals[3]]})

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return partials.repartition(1).map_batches(fin, batch_format="pandas",
                                               batch_size=None)


def hurst_rs(
    ds: Dataset,
    *,
    key: str,
    value_col: str,
    order_by: list[str],
    chunk_len: int = 32,
    value_decimals: int = 2,
    num_partitions: int = 64,
) -> Dataset:
    """Per-key Hurst exponent via the classic rescaled-range (R/S)
    statistic at ONE chunk scale: split each key's ordered series into
    consecutive full chunks of ``chunk_len``, compute R/S per chunk
    (range of the cumulative mean-deviation walk over the population
    std), and estimate H = ln(mean R/S) / ln(chunk_len) — the
    long-memory / trend-persistence probe (H≈0.5 random walk, >0.5
    persistent, <0.5 mean-reverting) complementing the ACF and
    Ljung-Box ops.  Single-scale by design: the multi-scale log-log fit
    needs series lengths this engine's per-key grids rarely reach, and
    one scale already ranks keys by persistence.

    Exactness: values are scaled to int 10^value_decimals units
    (half-away rounding, mirroring DuckDB ``round``), so chunk prefix
    sums and moment sums are exact integers; the per-chunk finalize is
    a fixed float expression tree mirrored by the SQL twin.  Zero-
    variance chunks are excluded from the mean (both sides filter
    sd > 0); keys with no full chunk emit no row, keys with no valid
    chunk report NULL mean_rs/hurst.

    One key-hash exchange; inside each partition one lexsort, then the
    full chunks fold as a (n_chunks × chunk_len) matrix — no per-key
    Python.  Output: ``{key}, n_chunks, n_valid, mean_rs, hurst``.
    """
    from .grouped import grouped_apply

    L = int(chunk_len)
    scale = float(10 ** value_decimals)

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            key: pd.Series([], dtype="object"),
            "n_chunks": pd.Series([], dtype="int64"),
            "n_valid": pd.Series([], dtype="int64"),
            "mean_rs": pd.Series([], dtype="float64"),
            "hurst": pd.Series([], dtype="float64")})
        if len(df) == 0:
            return empty
        df = df.sort_values([key] + order_by,
                            kind="mergesort").reset_index(drop=True)
        v = df[value_col].to_numpy(dtype=np.float64)
        cents = np.copysign(np.floor(np.abs(v) * scale + 0.5),
                            v).astype(np.int64)
        k = df[key].to_numpy()
        uniq, inv = np.unique(k, return_inverse=True)
        n = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        starts = np.concatenate([[0], np.cumsum(n)[:-1]])
        rank = np.arange(len(k)) - starts[inv]
        full = rank < (n[inv] // L) * L          # keep full chunks only
        if not full.any() or n.max() < L:
            return empty
        ki, cc = inv[full], cents[full]
        m = cc.reshape(-1, L)                     # chunk rows, time cols
        chunk_key = ki.reshape(-1, L)[:, 0]       # key index per chunk
        pref = np.cumsum(m, axis=1, dtype=np.int64).astype(np.float64)
        s = pref[:, -1]                           # exact chunk sums
        sxx = np.einsum("ij,ij->i", m, m).astype(np.float64)
        i1 = np.arange(1, L + 1, dtype=np.float64)
        # fixed expression tree — keep in lockstep with the SQL twin
        dev = pref - i1[None, :] * (s / float(L))[:, None]
        r = dev.max(axis=1) - dev.min(axis=1)
        with np.errstate(invalid="ignore", divide="ignore"):
            sd = np.sqrt((sxx - s * s / float(L)) / float(L))
            rs = r / sd
        valid = sd > 0
        nk = len(uniq)
        n_chunks = np.bincount(chunk_key, minlength=nk).astype(np.int64)
        n_valid = np.bincount(chunk_key, weights=valid,
                              minlength=nk).astype(np.int64)
        rs_sum = np.bincount(chunk_key, weights=np.where(valid, rs, 0.0),
                             minlength=nk)
        with np.errstate(invalid="ignore", divide="ignore"):
            mean_rs = np.where(n_valid > 0, rs_sum / n_valid, np.nan)
            hurst = np.where(mean_rs > 0, np.log(mean_rs) / np.log(float(L)),
                             np.nan)
        keep = n_chunks > 0
        return pd.DataFrame({
            key: uniq[keep],
            "n_chunks": n_chunks[keep],
            "n_valid": n_valid[keep],
            "mean_rs": mean_rs[keep],
            "hurst": hurst[keep]})

    return grouped_apply(ds, keys=[key], fn=fold,
                         num_partitions=num_partitions,
                         whole_partition=True).sort(key)


def acf(
    ds: Dataset,
    *,
    key: str,
    value_col: str,
    order_by: list[str],
    lags: tuple[int, ...] = (1, 2, 3),
    num_partitions: int = 64,
) -> Dataset:
    """Per-key autocorrelation function at multiple lags — the
    multi-lag generalization of :func:`lag1_autocorr` (is the series
    noise, momentum, or periodic?), long-format output so downstream
    code can pivot or threshold per lag.

    Semantics == SQL ``corr(value, lag(value, L) OVER (...))`` per lag,
    including NULL rules (fewer than 2 valid pairs, or a constant side)
    and the "every key emits a row per lag" shape (keys shorter than the
    lag report ``n_pairs = 0`` and NULL autocorr).

    One co-partition; each lag is one cython ``groupby.shift`` over the
    whole partition + bincount moments — no per-key Python, lags × keys
    rows out.  Output: ``key, lag, n_pairs, autocorr``.
    """
    import pyarrow as pa

    from .rollup import _stable_pkey

    def add_pkey(t: pa.Table) -> pa.Table:
        return t.append_column("_pkey", _stable_pkey(t[key], num_partitions))

    def acf_partition(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=["_pkey"]).sort_values(
            [key] + order_by, kind="mergesort").reset_index(drop=True)
        if len(df) == 0:
            return pd.DataFrame({key: [], "lag": pd.Series([], dtype="int64"),
                                 "n_pairs": pd.Series([], dtype="int64"),
                                 "autocorr": []})
        v = df[value_col].to_numpy(dtype=np.float64)
        keys_all, gid, starts = _key_groups(df, key)
        nk = int(gid[-1]) + 1
        g = df.groupby(key, sort=False)[value_col]
        frames = []
        for lag_ in lags:
            prev = g.shift(lag_).to_numpy(dtype=np.float64)
            w = (~np.isnan(prev)).astype(np.float64)
            x = np.where(np.isnan(prev), 0.0, prev)
            y = v * w
            n = np.bincount(gid, weights=w, minlength=nk)
            sx = np.bincount(gid, weights=x, minlength=nk)
            sy = np.bincount(gid, weights=y, minlength=nk)
            sxx = np.bincount(gid, weights=x * x, minlength=nk)
            syy = np.bincount(gid, weights=y * y, minlength=nk)
            sxy = np.bincount(gid, weights=x * y, minlength=nk)
            with np.errstate(invalid="ignore", divide="ignore"):
                cov = sxy - sx * sy / n
                corr = cov / np.sqrt((sxx - sx * sx / n) * (syy - sy * sy / n))
            corr = np.where(np.isfinite(corr), corr, np.nan)
            frames.append(pd.DataFrame({
                key: keys_all[starts],
                "lag": np.full(nk, lag_, dtype=np.int64),
                "n_pairs": n.astype(np.int64),
                "autocorr": corr,
            }))
        return pd.concat(frames, ignore_index=True)

    tagged = ds.map_batches(add_pkey, batch_format="pyarrow")
    return tagged.groupby("_pkey").map_groups(acf_partition, batch_format="pandas")


def dominant_period(
    ds: Dataset,
    *,
    key: str,
    value_col: str,
    order_by: list[str],
    max_lag: int = 24,
    num_partitions: int = 64,
) -> Dataset:
    """Per-key dominant period: the lag in ``1..max_lag`` with the
    highest autocorrelation (ties → smallest lag) — the cheap "does this
    series have a daily/weekly pulse, and at what period" detector built
    on :func:`acf` (a one-number seasonality probe before reaching for a
    full decomposition).

    Keys whose every lag is undefined (too short / constant) emit
    nothing.  The argmax runs per acf output block (each block holds ALL
    lags of its keys — acf computes lags inside one co-partition body),
    so no extra exchange is added.  Output: ``key, period, acf_peak``.
    """

    a = acf(ds, key=key, value_col=value_col, order_by=order_by,
            lags=tuple(range(1, max_lag + 1)), num_partitions=num_partitions)

    def argmax_block(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["autocorr"].notna()]
        if len(df) == 0:
            return pd.DataFrame({key: [], "period": pd.Series([], dtype="int64"),
                                 "acf_peak": []})
        df = df.sort_values([key, "autocorr", "lag"],
                            ascending=[True, False, True], kind="mergesort")
        top = df.drop_duplicates(subset=[key], keep="first")
        return pd.DataFrame({key: top[key].to_numpy(),
                             "period": top["lag"].to_numpy(dtype=np.int64),
                             "acf_peak": top["autocorr"].to_numpy()})

    return a.map_batches(argmax_block, batch_format="pandas", batch_size=None)


def ar2_yule_walker(
    ds: Dataset,
    *,
    key: str,
    value_col: str,
    order_by: list[str],
    num_partitions: int = 64,
) -> Dataset:
    """Per-key AR(2) fit by Yule–Walker — the classical linear-recurrence
    model behind the reference's recurrent layers (an LSTM/GRU cell IS a
    learned nonlinear autoregression over the ordered series,
    /root/reference/TSFEDL/blocks_pytorch.py RNN blocks); this is the
    closed-form linear baseline a feature pipeline ships next to ACF.

    Biased autocovariance sums over the mean-centered series
    (``s_L = Σ d_t · d_{t-L}``, d = x − mean(x)); the normalizer cancels
    in the Yule–Walker ratios so raw sums are compared directly:

        phi1 = s1·(s0 − s2) / (s0² − s1²)
        phi2 = (s2·s0 − s1²) / (s0² − s1²)

    NULL when the key has < 3 points or the denominator is exactly 0
    (constant series).  One ``_pkey`` co-partition, then bincount
    moments — no per-key Python.  Output: ``key, n_events, phi1, phi2``.
    """
    import pyarrow as pa

    from .rollup import _stable_pkey

    def add_pkey(t: pa.Table) -> pa.Table:
        return t.append_column("_pkey", _stable_pkey(t[key], num_partitions))

    def fit_partition(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=["_pkey"]).sort_values(
            [key] + order_by, kind="mergesort").reset_index(drop=True)
        if len(df) == 0:
            return pd.DataFrame({key: [],
                                 "n_events": pd.Series([], dtype="int64"),
                                 "phi1": [], "phi2": []})
        v = df[value_col].to_numpy(dtype=np.float64)
        keys_all, gid, starts = _key_groups(df, key)
        nk = int(gid[-1]) + 1
        n = np.bincount(gid, minlength=nk).astype(np.float64)
        mean = np.bincount(gid, weights=v, minlength=nk) / n
        d = v - mean[gid]
        s0 = np.bincount(gid, weights=d * d, minlength=nk)
        # lag products masked to same-key adjacency (gid equality)
        same1 = np.empty(len(d), dtype=bool)
        same1[0] = False
        same1[1:] = gid[1:] == gid[:-1]
        p1 = np.zeros(len(d))
        p1[1:] = d[1:] * d[:-1]
        s1 = np.bincount(gid, weights=np.where(same1, p1, 0.0), minlength=nk)
        same2 = np.zeros(len(d), dtype=bool)
        same2[2:] = gid[2:] == gid[:-2]
        p2 = np.zeros(len(d))
        p2[2:] = d[2:] * d[:-2]
        s2 = np.bincount(gid, weights=np.where(same2, p2, 0.0), minlength=nk)
        den = s0 * s0 - s1 * s1
        ok = (n >= 3) & (den != 0.0)
        with np.errstate(invalid="ignore", divide="ignore"):
            phi1 = np.where(ok, s1 * (s0 - s2) / den, np.nan)
            phi2 = np.where(ok, (s2 * s0 - s1 * s1) / den, np.nan)
        return pd.DataFrame({key: keys_all[starts],
                             "n_events": n.astype(np.int64),
                             "phi1": phi1, "phi2": phi2})

    tagged = ds.map_batches(add_pkey, batch_format="pyarrow")
    return tagged.groupby("_pkey").map_groups(fit_partition,
                                              batch_format="pandas")


def naive_forecast_ratio(
    ds: Dataset,
    *,
    key: str,
    order_by: list[str],
    value_col: str,
    season_lag: int = 24,
    out_col: str = "mase",
    num_partitions: int = 64,
) -> Dataset:
    """Per-key MASE-style seasonal-naive skill ratio:
    ``mean |yₜ − yₜ₋ₘ| / mean |yₜ − yₜ₋₁|`` over the key's ordered
    series — < 1 means the season-lag naive forecast beats the
    persistence forecast (the series has exploitable seasonality at lag
    m), the denominator being exactly MASE's scale term (Hyndman &
    Koehler 2006).  The forecast-quality sibling of
    :func:`lag1_autocorr` / :func:`acf`.

    Vectorized across keys: position-in-group via first-index
    subtraction, boundary-masked lag diffs, bincount folds — no per-key
    loop.  NULL when the key is too short for the seasonal lag or the
    persistence error is exactly 0 (SQL x/0 semantics).
    Output: ``key, n_events (int64), out_col``.
    """
    from .grouped import grouped_apply

    def part(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({key: [],
                                 "n_events": pd.Series([], dtype="int64"),
                                 out_col: []})
        df = df.sort_values([key] + order_by, kind="mergesort")
        y = df[value_col].to_numpy(dtype=np.float64)
        k = df[key].to_numpy()
        n = len(df)
        change = np.flatnonzero(k[1:] != k[:-1]) + 1
        gid = np.zeros(n, dtype=np.int64)
        gid[change] = 1
        gid = np.cumsum(gid)
        firsts = np.concatenate([[0], change])
        pos = np.arange(n) - firsts[gid]
        nk = int(gid[-1]) + 1

        def lag_fold(m: int):
            valid = pos >= m
            idx = np.flatnonzero(valid)
            d = np.abs(y[idx] - y[idx - m])
            s = np.bincount(gid[idx], weights=d, minlength=nk)
            c = np.bincount(gid[idx], minlength=nk)
            return s, c

        s1, c1 = lag_fold(1)
        sm, cm = lag_fold(season_lag)
        with np.errstate(divide="ignore", invalid="ignore"):
            e1 = s1 / c1
            em = sm / cm
            ratio = em / e1
        ratio = np.where(np.isfinite(ratio), ratio, np.nan)
        return pd.DataFrame({
            key: k[firsts],
            "n_events": np.bincount(gid, minlength=nk).astype(np.int64),
            out_col: ratio,
        })

    return grouped_apply(ds, keys=[key], fn=part,
                         num_partitions=num_partitions,
                         whole_partition=True)


def poincare_descriptors(
    ds: Dataset,
    *,
    key: str,
    order_by: list[str],
    ts_col: str,
    num_partitions: int = 64,
) -> Dataset:
    """Poincaré-plot descriptors SD1/SD2 of each key's inter-event
    intervals — THE heart-rate-variability summary of the reference's
    home domain (MIT-BIH RR-interval analysis; reference
    TSFEDL/data.py:10-80 walks exactly these beat-to-beat gaps), lifted
    to generic event streams: SD1 = short-term variability (width of
    the lag-1 scatter ellipse), SD2 = long-term variability (its
    length), from ``SD1² = var(Δ)/2``, ``SD2² = 2·var(x) − var(Δ)/2``
    over successive-interval differences Δ.

    Everything reduces to int64-µs moment sums folded per key with
    boundary-masked diffs (the :func:`naive_forecast_ratio`
    vectorization — no per-key loop); the SQL twin computes the same
    algebra from the same exact sums.  Output: ``key,
    n_intervals (int64), sd1_s, sd2_s`` (NULL when < 2 intervals).
    """
    from .grouped import grouped_apply

    def part(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({key: [],
                                 "n_intervals": pd.Series([], dtype="int64"),
                                 "sd1_s": [], "sd2_s": []})
        df = df.sort_values([key] + order_by, kind="mergesort")
        ts = df[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        k = df[key].to_numpy()
        n = len(df)
        change = np.flatnonzero(k[1:] != k[:-1]) + 1
        gid = np.zeros(n, dtype=np.int64)
        gid[change] = 1
        gid = np.cumsum(gid)
        firsts = np.concatenate([[0], change])
        pos = np.arange(n) - firsts[gid]
        nk = int(gid[-1]) + 1
        # intervals x (pos>=1) and successive differences d (pos>=2)
        iv = np.flatnonzero(pos >= 1)
        x = (ts[iv] - ts[iv - 1]) / 1e6
        gx = gid[iv]
        dv = np.flatnonzero(pos >= 2)
        d = (ts[dv] - ts[dv - 1]) / 1e6 - (ts[dv - 1] - ts[dv - 2]) / 1e6
        gd = gid[dv]
        cn = np.bincount(gx, minlength=nk)
        s1 = np.bincount(gx, weights=x, minlength=nk)
        s2 = np.bincount(gx, weights=x * x, minlength=nk)
        m = np.bincount(gd, minlength=nk)
        t2 = np.bincount(gd, weights=d * d, minlength=nk)
        t1 = np.bincount(gd, weights=d, minlength=nk)
        with np.errstate(divide="ignore", invalid="ignore"):
            var_x = s2 / cn - (s1 / cn) ** 2
            var_d = t2 / m - (t1 / m) ** 2
            sd1 = np.sqrt(var_d / 2.0)
            sd2 = np.sqrt(np.maximum(2.0 * var_x - var_d / 2.0, 0.0))
        ok = m >= 1
        sd1 = np.where(ok, sd1, np.nan)
        sd2 = np.where(ok, sd2, np.nan)
        keep = cn >= 1  # single-event keys have no intervals (SQL twin
        return pd.DataFrame({  # emits no row for them either)
            key: k[firsts][keep],
            "n_intervals": cn[keep].astype(np.int64),
            "sd1_s": sd1[keep],
            "sd2_s": sd2[keep],
        })

    return grouped_apply(ds, keys=[key], fn=part,
                         num_partitions=num_partitions,
                         whole_partition=True)


def hrv_stats(
    ds: Dataset,
    *,
    key: str,
    order_by: list[str],
    ts_col: str,
    pnn_threshold_s: float = 60.0,
    num_partitions: int = 64,
) -> Dataset:
    """RMSSD and pNN-style successive-difference statistics of per-key
    inter-event intervals — the time-domain HRV pair to
    :func:`poincare_descriptors` (RMSSD = √mean Δ², pNN = share of
    |Δ| exceeding a threshold; classically 50 ms on RR intervals, here
    parameterized for event streams).  Same boundary-masked moment
    vectorization; exact integer µs comparisons for the pNN count.

    Output: ``key, n_diffs (int64), rmssd_s, pnn_share`` — keys with no
    successive-difference pair emit no row (SQL twin semantics).
    """
    from .grouped import grouped_apply

    thr_us = int(round(pnn_threshold_s * 1e6))

    def part(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({key: [],
                                 "n_diffs": pd.Series([], dtype="int64"),
                                 "rmssd_s": [], "pnn_share": []})
        df = df.sort_values([key] + order_by, kind="mergesort")
        ts = df[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        k = df[key].to_numpy()
        n = len(df)
        change = np.flatnonzero(k[1:] != k[:-1]) + 1
        gid = np.zeros(n, dtype=np.int64)
        gid[change] = 1
        gid = np.cumsum(gid)
        firsts = np.concatenate([[0], change])
        pos = np.arange(n) - firsts[gid]
        nk = int(gid[-1]) + 1
        dv = np.flatnonzero(pos >= 2)
        d_us = (ts[dv] - ts[dv - 1]) - (ts[dv - 1] - ts[dv - 2])
        d = d_us / 1e6
        gd = gid[dv]
        m = np.bincount(gd, minlength=nk)
        t2 = np.bincount(gd, weights=d * d, minlength=nk)
        over = np.bincount(gd, weights=(np.abs(d_us) > thr_us)
                           .astype(np.float64), minlength=nk)
        with np.errstate(divide="ignore", invalid="ignore"):
            rmssd = np.sqrt(t2 / m)
            pnn = over / m
        keep = m >= 1
        return pd.DataFrame({
            key: k[firsts][keep],
            "n_diffs": m[keep].astype(np.int64),
            "rmssd_s": rmssd[keep],
            "pnn_share": pnn[keep],
        })

    return grouped_apply(ds, keys=[key], fn=part,
                         num_partitions=num_partitions,
                         whole_partition=True)


def stl_lite(
    ds: Dataset,
    *,
    key: str = "event_type",
    ts_col: str = "ts",
    period: int = 24,
    num_partitions: int = 16,
) -> Dataset:
    """Moving-average STL-lite decomposition of each key's hourly count
    series, reporting Hyndman-style trend / seasonal strength:

        y (dense hourly counts, gaps = 0)
        trend     = centered (period+1)-hour moving average (full
                    windows only)
        detrended = y − trend
        seasonal  = phase mean of detrended (phase = hour mod period)
        resid     = detrended − seasonal

        seasonal_strength = max(0, 1 − Var(resid)/Var(detrended))
        trend_strength    = max(0, 1 − Var(resid)/Var(y − seasonal))

    Unlike :func:`seasonal_adjust` (phase means on raw values — the
    seasonal-naive step), this removes the trend FIRST, so a drifting
    level doesn't contaminate the seasonal profile; the strengths say
    how forecastable each series is and whether by trend or by season.

    Scale shape: one combiner pass folds events to (key, hour) counts —
    partials only cross the exchange — then each key's dense series
    builds and decomposes vectorized inside its partition (key-complete
    co-location; series length = key's hour span, a per-key Python step
    over BOUNDED key cardinality — types, not users).  Exactness: window
    sums over int counts are exact int64 (cumsum differences), so the
    trend and everything downstream is reproducible bit-for-bit against
    the SQL twin.

    Reference analog: the trend/seasonality diagnostics a forecasting
    pipeline runs before choosing a model class — the reference hardwires
    the choice (one architecture per experiment, keras_experiment.py);
    a data engine must measure it.  Output: ``{key}, n_hours, n_valid,
    var_resid, seasonal_strength, trend_strength``.
    """
    import pyarrow.compute as pc

    from ..functions.windows import window_start_us
    from ..pipelines.relational import grouped_aggregate
    from .grouped import grouped_apply

    half = period // 2
    win = 2 * half + 1

    def hour_fold(t: pa.Table) -> pa.Table:
        hr = pc.divide(window_start_us(t[ts_col], "1h"),
                       pa.scalar(3_600_000_000, pa.int64()))
        return pa.table({key: t[key], "hr": hr})

    counts = grouped_aggregate(
        ds.map_batches(hour_fold, batch_format="pyarrow",
                       zero_copy_batch=True),
        keys=[key, "hr"], aggs={"n": ("hr", "count")},
        num_partitions=num_partitions)

    def decompose(df: pd.DataFrame) -> pd.DataFrame:
        cols = {key: [], "n_hours": [], "n_valid": [], "var_resid": [],
                "seasonal_strength": [], "trend_strength": []}
        for k, g in df.groupby(key, sort=False):
            hr = g["hr"].to_numpy(dtype=np.int64)
            cnt = g["n"].to_numpy(dtype=np.int64)
            h0, h1 = int(hr.min()), int(hr.max())
            n_hours = h1 - h0 + 1
            y = np.zeros(n_hours, dtype=np.int64)
            y[hr - h0] = cnt
            n_valid = n_hours - 2 * half
            if n_valid <= 0:
                row = (k, n_hours, 0, np.nan, np.nan, np.nan)
            else:
                cs = np.concatenate(([0], np.cumsum(y)))
                wsum = cs[win:] - cs[:-win]          # exact int64
                trend = wsum / float(win)
                yv = y[half:n_hours - half].astype(np.float64)
                d = yv - trend
                phase = (np.arange(h0 + half, h0 + half + n_valid,
                                   dtype=np.int64)) % period
                ssum = np.zeros(period)
                scnt = np.zeros(period, dtype=np.int64)
                np.add.at(ssum, phase, d)
                np.add.at(scnt, phase, 1)
                with np.errstate(invalid="ignore", divide="ignore"):
                    smean = ssum / scnt
                seas = smean[phase]
                resid = d - seas
                deseason = yv - seas

                def pvar(x: np.ndarray) -> float:
                    mu = x.sum() / len(x)
                    dev = x - mu
                    return float((dev * dev).sum() / len(x))

                var_d, var_r, var_des = pvar(d), pvar(resid), pvar(deseason)
                s_str = (max(0.0, 1.0 - var_r / var_d)
                         if var_d > 0 else np.nan)
                t_str = (max(0.0, 1.0 - var_r / var_des)
                         if var_des > 0 else np.nan)
                row = (k, n_hours, n_valid, var_r, s_str, t_str)
            for c, v in zip(cols, row):
                cols[c].append(v)
        out = pd.DataFrame(cols)
        return out.astype({"n_hours": "int64", "n_valid": "int64"})

    return grouped_apply(
        counts, keys=[key], fn=decompose,
        num_partitions=min(num_partitions, 8),
        whole_partition=True).sort(key)


def ljung_box(
    ds: Dataset,
    *,
    key: str,
    value_col: str,
    order_by: list[str],
    max_lag: int = 3,
    num_partitions: int = 64,
) -> Dataset:
    """Ljung–Box white-noise test per key: Q = n(n+2)·Σₖ rₖ²/(n−k),
    k = 1..max_lag, with the STANDARD autocorrelation estimator

        rₖ = Σₜ (xₜ−x̄)(xₜ₋ₖ−x̄) / Σₜ (xₜ−x̄)²

    (full-series mean and variance in the denominator — the time-series
    convention; note this is NOT the pairwise Pearson corr of
    :func:`acf`, which conditions both moments on the overlapping
    pairs).  High Q ⇒ the series is not white noise ⇒ the
    forecasting/AR ops (holt, ar2) have signal to work with — this is
    the gate in front of them.

    One key-hash co-partition, then everything vectorized across keys
    (bincount moment folds per lag, no per-key Python).  NULL rules
    mirror the SQL twin: rₖ is NULL when the key has ≤ k observations
    or zero variance; Q is NULL unless ALL max_lag lags exist.

    Output: ``{key}, n_obs, r1..r{max_lag}, q_stat``.
    """
    import pyarrow as pa

    from .rollup import _stable_pkey

    def add_pkey(t: pa.Table) -> pa.Table:
        return t.append_column("_pkey", _stable_pkey(t[key], num_partitions))

    def lb_partition(df: pd.DataFrame) -> pd.DataFrame:
        rcols = [f"r{k}" for k in range(1, max_lag + 1)]
        df = df.drop(columns=["_pkey"]).sort_values(
            [key] + order_by, kind="mergesort").reset_index(drop=True)
        if len(df) == 0:
            base = {key: [], "n_obs": pd.Series([], dtype="int64")}
            base.update({c: pd.Series([], dtype="float64") for c in rcols})
            base["q_stat"] = pd.Series([], dtype="float64")
            return pd.DataFrame(base)
        v = df[value_col].to_numpy(dtype=np.float64)
        keys_all, gid, starts = _key_groups(df, key)
        nk = int(gid[-1]) + 1
        n = np.bincount(gid, minlength=nk).astype(np.int64)
        mu = np.bincount(gid, weights=v, minlength=nk) / n
        d = v - mu[gid]
        s0 = np.bincount(gid, weights=d * d, minlength=nk)
        out = {key: keys_all[starts], "n_obs": n}
        with np.errstate(invalid="ignore", divide="ignore"):
            q = n * (n + 2.0) * 0.0
            q_valid = np.ones(nk, dtype=bool)
            for k in range(1, max_lag + 1):
                prev = np.concatenate([np.full(k, np.nan), d[:-k]]) \
                    if k < len(d) else np.full(len(d), np.nan)
                # zero out pairs that cross a key boundary
                same = np.concatenate([np.full(k, False),
                                       gid[k:] == gid[:-k]]) \
                    if k < len(d) else np.zeros(len(d), dtype=bool)
                prod = np.where(same, d * np.where(same, prev, 0.0), 0.0)
                sk = np.bincount(gid, weights=prod, minlength=nk)
                rk = sk / s0
                rk = np.where((n > k) & (s0 > 0), rk, np.nan)
                out[f"r{k}"] = rk
                q = q + np.where(np.isnan(rk), 0.0, rk * rk) / (n - k)
                q_valid &= ~np.isnan(rk)
            q = np.where(q_valid, n * (n + 2.0) * q, np.nan)
        out["q_stat"] = q
        return pd.DataFrame(out)

    tagged = ds.map_batches(add_pkey, batch_format="pyarrow")
    return tagged.groupby("_pkey").map_groups(
        lb_partition, batch_format="pandas")


def holt_winters(
    ds: Dataset,
    *,
    key: str = "event_type",
    ts_col: str = "ts",
    period: int = 24,
    alpha: float = 0.3,
    beta: float = 0.05,
    gamma: float = 0.2,
    horizons: tuple[int, ...] = (1, 2, 3),
    num_partitions: int = 16,
) -> Dataset:
    """Additive Holt–Winters (triple exponential smoothing) over each
    key's dense hourly count series — the seasonal completion of the
    forecasting ladder (seasonal-naive MASE → Holt level+trend → this).

        l' = α(y − s[p]) + (1−α)(l + b)
        b' = β(l' − l) + (1−β)b
        s'[p] = γ(y − l') + (1−γ)s[p]
        ŷ(+h) = l + h·b + s[(p + h) mod m]

    Classic initialization over the first two seasons (l₀ = mean of
    cycle 1, b₀ = (mean₂ − mean₁)/m, s₀ = cycle-1 deviations); keys
    whose span is shorter than 2·period emit NULL state.  Same
    two-stage shape as :func:`stl_lite`: a combiner folds events to
    (key, hour) counts — partials only cross the exchange — and the
    recurrence runs per key inside its partition.  The per-key step
    loop is over the HOURLY GRID (span/3600s iterations over bounded
    key cardinality), not over events; the state is affine in y, so the
    salted-carry composition the Holt op documents applies if a single
    key's grid ever outgrows a worker.

    Reference analog: the recurrent cell state the reference carries
    per series (models_keras.py:64 LSTM scan) — here with an
    interpretable 2+m-dim state.  Output: ``{key}, n_hours, level,
    trend, forecast_h{h}...``.
    """
    import pyarrow.compute as pc

    from ..functions.windows import window_start_us
    from ..pipelines.relational import grouped_aggregate
    from .grouped import grouped_apply

    m = period

    def hour_fold(t: pa.Table) -> pa.Table:
        hr = pc.divide(window_start_us(t[ts_col], "1h"),
                       pa.scalar(3_600_000_000, pa.int64()))
        return pa.table({key: t[key], "hr": hr})

    counts = grouped_aggregate(
        ds.map_batches(hour_fold, batch_format="pyarrow",
                       zero_copy_batch=True),
        keys=[key, "hr"], aggs={"n": ("hr", "count")},
        num_partitions=num_partitions)

    def fit(df: pd.DataFrame) -> pd.DataFrame:
        cols: dict[str, list] = {key: [], "n_hours": [], "level": [],
                                 "trend": []}
        for h in horizons:
            cols[f"forecast_h{h}"] = []
        for k, g in df.groupby(key, sort=False):
            hr = g["hr"].to_numpy(dtype=np.int64)
            cnt = g["n"].to_numpy(dtype=np.int64)
            h0, h1 = int(hr.min()), int(hr.max())
            n_hours = h1 - h0 + 1
            y = np.zeros(n_hours, dtype=np.float64)
            y[hr - h0] = cnt
            phases = (np.arange(h0, h1 + 1, dtype=np.int64)) % m
            if n_hours < 2 * m:
                vals = [np.nan, np.nan] + [np.nan] * len(horizons)
            else:
                mu1 = y[:m].sum() / m
                mu2 = y[m:2 * m].sum() / m
                l, b = mu1, (mu2 - mu1) / m
                s = np.empty(m)
                s[phases[:m]] = y[:m] - mu1
                for i in range(m, n_hours):
                    p = phases[i]
                    lp = alpha * (y[i] - s[p]) + (1.0 - alpha) * (l + b)
                    b = beta * (lp - l) + (1.0 - beta) * b
                    s[p] = gamma * (y[i] - lp) + (1.0 - gamma) * s[p]
                    l = lp
                last_p = phases[-1]
                vals = [l, b] + [l + h * b + s[(last_p + h) % m]
                                 for h in horizons]
            cols[key].append(k)
            cols["n_hours"].append(n_hours)
            cols["level"].append(vals[0])
            cols["trend"].append(vals[1])
            for h, v in zip(horizons, vals[2:]):
                cols[f"forecast_h{h}"].append(v)
        out = pd.DataFrame(cols)
        return out.astype({"n_hours": "int64"})

    return grouped_apply(
        counts, keys=[key], fn=fit,
        num_partitions=min(num_partitions, 8),
        whole_partition=True).sort(key)


def kleinberg_bursts(
    ds: Dataset,
    *,
    key: str = "event_type",
    ts_col: str = "ts",
    s: float = 3.0,
    gamma: float = 1.0,
    num_partitions: int = 16,
) -> Dataset:
    """Kleinberg two-state burst detection over each key's dense hourly
    count series (Kleinberg, KDD 2002 "Bursty and Hierarchical
    Structure in Streams"): a hidden automaton with a base state
    (expected rate λ₀ = the key's mean hourly count) and a burst state
    (λ₁ = s·λ₀), Poisson emission costs −ln P(count | λ), and an
    entry cost γ·ln(n) for climbing into the burst state; the Viterbi
    path marks the burst hours.

    Where the threshold ops (trailing z-score, CUSUM) flag single
    points, this labels coherent EPISODES — the burst segmentation a
    feed/alerting pipeline wants.  Same two-stage shape as
    :func:`stl_lite`: combiner hour counts, then a per-key DP whose
    step loop runs over the HOURLY GRID (bounded key cardinality ×
    span/3600 s), states vectorized.

    Rows-only by nature (a Viterbi argmin is not SQL-expressible);
    tests/test_trend.py plants a 10× burst and pins its recovery.
    Output: ``{key}, n_hours, n_bursts, burst_hours,
    longest_burst, peak_hour`` (peak_hour = start of the max-count
    burst hour, NULL when no burst).
    """
    import pyarrow.compute as pc

    from math import lgamma

    from ..functions.windows import window_start_us
    from ..pipelines.relational import grouped_aggregate
    from .grouped import grouped_apply

    def hour_fold(t: pa.Table) -> pa.Table:
        hr = pc.divide(window_start_us(t[ts_col], "1h"),
                       pa.scalar(3_600_000_000, pa.int64()))
        return pa.table({key: t[key], "hr": hr})

    counts = grouped_aggregate(
        ds.map_batches(hour_fold, batch_format="pyarrow",
                       zero_copy_batch=True),
        keys=[key, "hr"], aggs={"n": ("hr", "count")},
        num_partitions=num_partitions)

    def detect(df: pd.DataFrame) -> pd.DataFrame:
        cols = {key: [], "n_hours": [], "n_bursts": [],
                "burst_hours": [], "longest_burst": [], "peak_hour": []}
        for k, g in df.groupby(key, sort=False):
            hr = g["hr"].to_numpy(dtype=np.int64)
            cnt = g["n"].to_numpy(dtype=np.int64)
            h0, h1 = int(hr.min()), int(hr.max())
            n_hours = h1 - h0 + 1
            y = np.zeros(n_hours, dtype=np.int64)
            y[hr - h0] = cnt
            lam0 = max(y.sum() / n_hours, 1e-9)
            lam1 = s * lam0
            # Poisson negative log-likelihood per state, vectorized over t
            lg = np.array([lgamma(v + 1.0) for v in
                           range(int(y.max()) + 1)])
            nll0 = lam0 - y * np.log(lam0) + lg[y]
            nll1 = lam1 - y * np.log(lam1) + lg[y]
            climb = gamma * np.log(max(n_hours, 2))
            # 2-state Viterbi
            c_prev = np.array([nll0[0], nll1[0] + climb])
            back = np.zeros((n_hours, 2), dtype=np.int8)
            for t in range(1, n_hours):
                stay0 = c_prev[0]
                down = c_prev[1]
                if down < stay0:
                    back[t, 0] = 1
                    base = down
                else:
                    base = stay0
                up = c_prev[0] + climb
                stay1 = c_prev[1]
                if up < stay1:
                    back[t, 1] = 0
                    high = up
                else:
                    back[t, 1] = 1
                    high = stay1
                c_prev = np.array([base + nll0[t], high + nll1[t]])
            state = np.zeros(n_hours, dtype=np.int8)
            state[-1] = int(c_prev[1] < c_prev[0])
            for t in range(n_hours - 1, 0, -1):
                state[t - 1] = back[t, state[t]]
            burst = state == 1
            # episodes
            edges = np.flatnonzero(np.diff(np.concatenate(
                [[0], burst.view(np.int8), [0]])) == 1)
            ends = np.flatnonzero(np.diff(np.concatenate(
                [[0], burst.view(np.int8), [0]])) == -1)
            n_bursts = len(edges)
            longest = int((ends - edges).max()) if n_bursts else 0
            if burst.any():
                peak_idx = int(np.flatnonzero(burst)[
                    np.argmax(y[burst])])
                peak = pd.Timestamp((h0 + peak_idx) * 3_600_000_000,
                                    unit="us")
            else:
                peak = pd.NaT
            cols[key].append(k)
            cols["n_hours"].append(n_hours)
            cols["n_bursts"].append(n_bursts)
            cols["burst_hours"].append(int(burst.sum()))
            cols["longest_burst"].append(longest)
            cols["peak_hour"].append(peak)
        out = pd.DataFrame(cols)
        return out.astype({"n_hours": "int64", "n_bursts": "int64",
                           "burst_hours": "int64",
                           "longest_burst": "int64"})

    return grouped_apply(
        counts, keys=[key], fn=detect,
        num_partitions=min(num_partitions, 8),
        whole_partition=True).sort(key)


def dtw_to_mean(
    ds: Dataset,
    *,
    key: str = "event_type",
    ts_col: str = "ts",
    band: int = 12,
    num_partitions: int = 16,
) -> Dataset:
    """Banded Dynamic Time Warping distance from each key's hourly count
    series to the corpus MEAN series — the classic elastic time-series
    distance (Sakoe–Chiba band), answering "which series' SHAPE
    deviates from the fleet" where Euclidean/correlation ops punish
    small phase shifts.

    Three stages: (1) combiner hour counts per key; (2) the mean series
    folds from per-(hour) partials over a common grid (the corpus span)
    and broadcasts via ``ray.put`` (grid-sized, not data-sized); (3)
    each key's z-normalized series runs the O(n·band) DP inside its
    partition (loop over the SERIES length — bounded key cardinality,
    same accepted cost class as holt_winters/stl).  Both series
    z-normalize first so the distance is shape-only.

    Rows-only by nature (a DP argmin is not SQL-expressible);
    tests/test_trend.py pins DTW(x, x) = 0, the shift-tolerance
    property Euclidean lacks, and blocking invariance.
    Output: ``{key}, n_hours, dtw_dist, dtw_per_step``.
    """
    import pyarrow.compute as pc

    from ..functions.windows import window_start_us
    from ..pipelines.relational import grouped_aggregate
    from .grouped import grouped_apply

    def hour_fold(t: pa.Table) -> pa.Table:
        hr = pc.divide(window_start_us(t[ts_col], "1h"),
                       pa.scalar(3_600_000_000, pa.int64()))
        return pa.table({key: t[key], "hr": hr})

    counts = grouped_aggregate(
        ds.map_batches(hour_fold, batch_format="pyarrow",
                       zero_copy_batch=True),
        keys=[key, "hr"], aggs={"n": ("hr", "count")},
        num_partitions=num_partitions).materialize()

    # corpus grid + mean series (grid-sized driver pull, broadcast once)
    pdf = counts.to_pandas()
    if len(pdf) == 0:
        import ray.data

        return ray.data.from_pandas(pd.DataFrame({
            key: pd.Series([], dtype="object"),
            "n_hours": pd.Series([], dtype="int64"),
            "dtw_dist": pd.Series([], dtype="float64"),
            "dtw_per_step": pd.Series([], dtype="float64")}))
    h0, h1 = int(pdf["hr"].min()), int(pdf["hr"].max())
    span = h1 - h0 + 1
    nk = pdf[key].nunique()
    mean = np.zeros(span)
    np.add.at(mean, pdf["hr"].to_numpy(dtype=np.int64) - h0,
              pdf["n"].to_numpy(dtype=np.float64))
    mean /= nk

    def znorm(x: np.ndarray) -> np.ndarray:
        mu = x.mean()
        sd = x.std()
        return (x - mu) / sd if sd > 0 else x - mu

    mz = znorm(mean)

    import ray

    ref = ray.put(mz)

    def dtw(df: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(ref)
        rows = {key: [], "n_hours": [], "dtw_dist": [],
                "dtw_per_step": []}
        for k, g in df.groupby(key, sort=False):
            y = np.zeros(span)
            y[g["hr"].to_numpy(dtype=np.int64) - h0] = \
                g["n"].to_numpy(dtype=np.float64)
            yz = znorm(y)
            n = span
            w = max(band, 1)
            INF = np.inf
            prev = np.full(n + 1, INF)
            prev[0] = 0.0
            for i in range(1, n + 1):
                cur = np.full(n + 1, INF)
                lo = max(1, i - w)
                hi = min(n, i + w)
                d = np.abs(yz[i - 1] - m[lo - 1:hi])
                # cur[j] = d + min(prev[j], prev[j-1], cur[j-1]) — the
                # cur[j-1] term forces a sequential scan over the band
                base = np.minimum(prev[lo:hi + 1], prev[lo - 1:hi])
                run = INF
                for jj in range(lo, hi + 1):
                    run = d[jj - lo] + min(base[jj - lo], run)
                    cur[jj] = run
                prev = cur
            dist = float(prev[n])
            rows[key].append(k)
            rows["n_hours"].append(n)
            rows["dtw_dist"].append(dist)
            rows["dtw_per_step"].append(dist / n)
        out = pd.DataFrame(rows)
        return out.astype({"n_hours": "int64"})

    return grouped_apply(counts, keys=[key], fn=dtw,
                         num_partitions=min(num_partitions, 8),
                         whole_partition=True).sort(key)


def markov_stationary(
    ds: Dataset,
    *,
    key: str,
    state_col: str,
    order_by: list[str],
    n_iter: int = 50,
    num_partitions: int = 64,
) -> Dataset:
    """Per-key stationary distribution of the first-order Markov chain
    over ``state_col`` transitions — the LONG-RUN behavior mix each
    key's dynamics converge to, complementing the observed-frequency
    mix (which ignores dynamics) and the transition-matrix ops (which
    show one step).  The reference's fit-one-tiny-model-per-unit loop
    shape (experiments/arrythmia_experiment.py:179), here a V×V chain
    per key with the power iteration BATCHED across all keys of a
    partition (one einsum per iteration, no per-key Python).

    Conventions: states = the key's own observed vocabulary mapped onto
    the partition-global sorted vocab; a from-state with no outgoing
    transition (each series' last state, if unique) gets a uniform row
    so every matrix stays stochastic; keys with < 2 rows emit nothing
    (no transitions).  Power iteration from the uniform vector;
    ``n_iter`` fixed for determinism (blocking-invariant: counts are
    exact, iteration is the same driver-free arithmetic everywhere).

    Output: ``{key}, state, stationary (float64)`` — one row per
    (key, observed-vocab state), shares summing to 1 per key.  No SQL
    twin (eigenvector); tests pin closed-form two-state chains and
    mass conservation.
    """
    from .grouped import grouped_apply

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            key: pd.Series([], dtype="object"),
            "state": pd.Series([], dtype="object"),
            "stationary": pd.Series([], dtype="float64")})
        if len(df) == 0:
            return empty
        df = df.sort_values([key] + order_by,
                            kind="mergesort").reset_index(drop=True)
        kk = df[key].to_numpy()
        st = df[state_col].to_numpy()
        vocab, sidx = np.unique(st, return_inverse=True)
        v = len(vocab)
        uniq, kidx = np.unique(kk, return_inverse=True)
        same = kk[1:] == kk[:-1]
        f, t = sidx[:-1][same], sidx[1:][same]
        ku = kidx[1:][same]
        if len(ku) == 0:
            return empty
        # only keys with >= 1 transition participate
        used, ku = np.unique(ku, return_inverse=True)
        nk = len(used)
        cnt = np.bincount(ku * v * v + f * v + t,
                          minlength=nk * v * v).reshape(nk, v, v)
        # each key's chain lives on its OWN observed vocabulary: mask to
        # observed states so results don't depend on what other keys in
        # the partition observed (blocking invariance)
        old2used = np.full(len(uniq), -1, dtype=np.int64)
        old2used[used] = np.arange(nk)
        ko = old2used[kidx]
        obs = np.zeros((nk, v), dtype=bool)
        sel = ko >= 0
        obs[ko[sel], sidx[sel]] = True
        nobs = obs.sum(axis=1).astype(np.float64)
        rows = cnt.sum(axis=2, keepdims=True)
        uni = obs / nobs[:, None]                  # uniform over observed
        p = np.where(rows > 0, cnt / np.maximum(rows, 1),
                     uni[:, None, :])
        # dead rows for unobserved from-states never receive mass (x
        # starts on observed states; counts only target observed states)
        x = uni.copy()
        for _ in range(n_iter):
            x = np.einsum("uv,uvw->uw", x, p)
        keep = obs.reshape(-1)
        return pd.DataFrame({
            key: np.repeat(uniq[used], v)[keep],
            "state": np.tile(vocab, nk)[keep],
            "stationary": x.reshape(-1)[keep]})

    return grouped_apply(ds, keys=[key], fn=fold,
                         num_partitions=num_partitions,
                         whole_partition=True).sort([key, "state"])


def lead_lag_xcorr(
    ds: Dataset,
    *,
    ts_col: str,
    type_col: str,
    type_a: str,
    type_b: str,
    tier: str = "1h",
    max_lag: int = 3,
) -> Dataset:
    """Lead-lag cross-correlation sweep on the DENSE tumbling-window
    count grid: Pearson r between the ``type_a`` count series and the
    ``type_b`` series shifted by every lag in [-max_lag, +max_lag]
    windows (positive lag = a leads b) — the standard "which signal
    moves first, and by how much" diagnostic that
    :func:`cross_series_corr` (observed-hours, lags 0/1 only) and
    :func:`granger_probe` (one fixed lag) cannot answer.  Missing
    windows count as zero, exactly like the SQL twin's
    ``generate_series`` grid.

    Dataflow: the granger-style per-batch (window, a_n, b_n) count
    combiner — O(windows) rows per batch, exact int64 — then ONE tiny
    ordered fold on a single partition (the dense grid for years of
    hourly data is ~1e4 rows; it scales with time span, not row count).
    Per lag, r derives from six exact integer sums cast to float64 once
    — a fixed expression tree mirrored verbatim by the SQL twin, so
    both sides compute bit-identical doubles.  Lags with an empty
    overlap (grid shorter than the lag) emit no row on either side;
    zero-variance overlaps go NULL via 0-division.

    Output: one row per surviving lag — ``lag (int64), n_windows
    (int64), r (float64)``.

    Reference analog: the cross-signal alignment the reference's
    multi-lead MIT-BIH reader sets up (data.py:99-154 aligns two leads
    on sample index) — here as a first-class lagged-coupling operator.
    """
    from ..functions.windows import _tier_us, window_start_us

    step = _tier_us(tier)

    def partial(t: pa.Table) -> pa.Table:
        w = window_start_us(t[ts_col], tier)
        is_a = pc.cast(pc.equal(t[type_col], type_a), pa.int64())
        is_b = pc.cast(pc.equal(t[type_col], type_b), pa.int64())
        out = pa.table({"w": w, "a_n": is_a, "b_n": is_b}) \
            .group_by(["w"], use_threads=False) \
            .aggregate([("a_n", "sum"), ("b_n", "sum")])
        return out.rename_columns(["w", "a_n", "b_n"])

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "lag": pd.Series([], dtype="int64"),
            "n_windows": pd.Series([], dtype="int64"),
            "r": pd.Series([], dtype="float64")})
        if len(df) == 0:
            return empty
        g = df.groupby("w", sort=True)[["a_n", "b_n"]].sum()
        w = g.index.to_numpy(dtype=np.int64)
        horizon = int((w[-1] - w[0]) // step) + 1
        x = np.zeros(horizon, dtype=np.int64)
        y = np.zeros(horizon, dtype=np.int64)
        idx = (w - w[0]) // step
        x[idx] = g["a_n"].to_numpy(dtype=np.int64)
        y[idx] = g["b_n"].to_numpy(dtype=np.int64)
        lags, ns, rs = [], [], []
        for lag in range(-max_lag, max_lag + 1):
            n = horizon - abs(lag)
            if n <= 0:
                # no overlap: the SQL twin's shifted join produces no
                # pairs either (and a negative python slice like
                # y[:horizon+lag] would silently wrap)
                continue
            if lag >= 0:
                xa, yb = x[:horizon - lag], y[lag:]
            else:
                xa, yb = x[-lag:], y[:horizon + lag]
            # exact int64 sums → float64 once; fixed expression tree —
            # keep in lockstep with the SQL twin
            nf = np.float64(n)
            sx, sy = np.float64(xa.sum()), np.float64(yb.sum())
            sxy = np.float64(np.dot(xa, yb))
            sxx = np.float64(np.dot(xa, xa))
            syy = np.float64(np.dot(yb, yb))
            with np.errstate(invalid="ignore", divide="ignore"):
                r = (nf * sxy - sx * sy) / np.sqrt(
                    (nf * sxx - sx * sx) * (nf * syy - sy * sy))
            lags.append(lag)
            ns.append(n)
            rs.append(r if np.isfinite(r) else np.nan)
        return pd.DataFrame({
            "lag": pd.Series(lags, dtype="int64"),
            "n_windows": pd.Series(ns, dtype="int64"),
            "r": pd.Series(rs, dtype="float64")})

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
    return partials.repartition(1).map_batches(fin, batch_format="pandas",
                                               batch_size=None)


def adf_test(
    ds: Dataset,
    *,
    key: str,
    value_col: str,
    order_by: list[str],
    value_decimals: int = 2,
    num_partitions: int = 64,
) -> Dataset:
    """Per-key Dickey–Fuller stationarity probe (lag-0 ADF): regress the
    first difference ``Δx_t`` on the lagged level ``x_{t−1}`` with
    intercept and report the unit-root coefficient γ and its t-statistic
    ``DF = γ / se(γ)`` — strongly negative DF means shocks decay (the
    series mean-reverts and is safe to model with the engine's AR /
    ACF / Holt features), DF ≈ 0 means a random walk where those
    features are spurious.  The stationarity gate in front of
    :func:`ar2_yule_walker` / :func:`acf`, exactly like the
    stationarity checks run before fitting the reference's recurrent
    models (/root/reference/TSFEDL/blocks_pytorch.py RNN blocks learn
    differenced dynamics only when they exist).

    Closed form from six sufficient statistics per key over the pairs
    ``(y=Δx_t, z=x_{t−1})``::

        γ = (nΣzy − ΣzΣy) / (nΣzz − (Σz)²)
        α = (Σy − γΣz) / n
        RSS = Σyy − αΣy − γΣzy ;  s² = RSS/(n−2)
        se(γ) = sqrt(s²·n / (nΣzz − (Σz)²))

    Exactness: values scale to 10^value_decimals integer units
    (half-away rounding == DuckDB ``round``), so y/z and every moment
    sum are exact int64 (``np.add.reduceat`` segment sums); the
    finalize casts each moment to float64 once and runs a fixed
    expression tree mirrored by the SQL twin (γ and DF are
    scale-invariant, so the cent scaling never leaves the moments).
    Keys with < 4 points (n_pairs < 3), constant levels (zero z
    variance) or a perfect fit (RSS ≤ 0) yield NULLs through the same
    guarded branches both sides.  One ``_pkey`` exchange, vectorized
    segment folds — no per-key Python.  Output: ``key, n_pairs (int64),
    gamma, df_t``.
    """
    from .grouped import grouped_apply

    scale = float(10 ** value_decimals)

    def fit(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            key: pd.Series([], dtype="object"),
            "n_pairs": pd.Series([], dtype="int64"),
            "gamma": pd.Series([], dtype="float64"),
            "df_t": pd.Series([], dtype="float64")})
        if len(df) == 0:
            return empty
        df = df.sort_values([key] + order_by,
                            kind="mergesort").reset_index(drop=True)
        v = df[value_col].to_numpy(dtype=np.float64)
        cents = np.copysign(np.floor(np.abs(v) * scale + 0.5),
                            v).astype(np.int64)
        k = df[key].to_numpy()
        n_all = len(k)
        change = np.flatnonzero(k[1:] != k[:-1]) + 1
        starts = np.concatenate([[0], change])
        gid = np.zeros(n_all, dtype=np.int64)
        gid[change] = 1
        gid = np.cumsum(gid)
        pos = np.arange(n_all) - starts[gid]
        valid = pos >= 1                       # pair rows: t ≥ 2
        y = np.zeros(n_all, dtype=np.int64)
        z = np.zeros(n_all, dtype=np.int64)
        y[1:] = cents[1:] - cents[:-1]
        z[1:] = cents[:-1]
        y[~valid] = 0
        z[~valid] = 0

        def seg(a: np.ndarray) -> np.ndarray:
            return np.add.reduceat(a, starts)  # exact int64 per key

        n = seg(valid.astype(np.int64)).astype(np.float64)
        sy = seg(y).astype(np.float64)
        sz = seg(z).astype(np.float64)
        syy = seg(y * y).astype(np.float64)
        szz = seg(z * z).astype(np.float64)
        szy = seg(z * y).astype(np.float64)
        # fixed expression tree — keep in lockstep with the SQL twin
        with np.errstate(invalid="ignore", divide="ignore"):
            den = n * szz - sz * sz
            gamma = (n * szy - sz * sy) / den
            alpha = (sy - gamma * sz) / n
            rss = syy - alpha * sy - gamma * szy
            s2 = rss / (n - 2.0)
            var_g = s2 * n / den
            df_t = np.where(var_g > 0, gamma / np.sqrt(var_g), np.nan)
        ok = (n >= 3) & (den != 0.0)
        gamma = np.where(ok & np.isfinite(gamma), gamma, np.nan)
        df_t = np.where(ok & np.isfinite(df_t), df_t, np.nan)
        return pd.DataFrame({
            key: k[starts],
            "n_pairs": n.astype(np.int64),
            "gamma": gamma,
            "df_t": df_t})

    return grouped_apply(ds, keys=[key], fn=fit,
                         num_partitions=num_partitions, whole_partition=True)


def cointegration_probe(
    ds: Dataset,
    *,
    ts_col: str,
    type_col: str,
    type_x: str,
    type_y: str,
    tier: str = "1h",
) -> Dataset:
    """Engle–Granger cointegration probe on the tumbling-window count
    grid: do the ``type_x`` and ``type_y`` activity series share a
    common stochastic trend?  Step 1 fits the long-run relation
    ``y_w = α + β·x_w`` by OLS over observed windows; step 2 runs the
    lag-0 Dickey–Fuller regression ``Δe_t = ρ·e_{t−1}`` (no intercept)
    on the residuals — a strongly negative ``df_t`` means the residual
    spread mean-reverts, i.e. the two series are cointegrated and
    spread-based monitoring/pairs logic is sound; ρ ≈ 0 means any
    apparent relation is spurious trend-chasing.  The two-series
    companion of :func:`adf_test` (single-series stationarity) and
    :func:`granger_probe` (short-run prediction).

    Dataflow: the same per-batch ``(window, x_n, y_n)`` count combiner
    as :func:`granger_probe` — O(windows) rows per batch, exact int64 —
    then ONE tiny ordered fold on a single partition.  Step-1 moments
    are exact integers cast to float64 once; residuals are a per-row
    fixed expression tree (bit-identical both sides); the step-2
    residual moment sums are float with ~1e-16 relative reassociation
    noise, reported only through the ratio statistics ρ and df_t where
    that noise is far below 6-decimal rounding (α/β themselves are
    bit-exact).  Degenerate inputs (n < 3 windows, constant x, < 2
    residual pairs, zero residual variance, perfect fit) yield NULLs
    through guarded 0-divisions mirrored by the SQL twin.

    Output: one row — ``n_windows (int64), beta, alpha, rho, df_t``.
    """
    from ..functions.windows import window_start_us

    def partial(t: pa.Table) -> pa.Table:
        w = window_start_us(t[ts_col], tier)
        is_x = pc.cast(pc.equal(t[type_col], type_x), pa.int64())
        is_y = pc.cast(pc.equal(t[type_col], type_y), pa.int64())
        out = pa.table({"w": w, "x_n": is_x, "y_n": is_y}) \
            .group_by(["w"], use_threads=False) \
            .aggregate([("x_n", "sum"), ("y_n", "sum")])
        return out.rename_columns(["w", "x_n", "y_n"])

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("w", sort=True)[["x_n", "y_n"]].sum()
        xs = g["x_n"].to_numpy(dtype=np.int64)
        ys = g["y_n"].to_numpy(dtype=np.int64)
        nw = len(g)
        nulls = pd.DataFrame({
            "n_windows": pd.Series([nw], dtype="int64"),
            "beta": [np.nan], "alpha": [np.nan],
            "rho": [np.nan], "df_t": [np.nan]})
        if nw < 3:
            return nulls
        # exact int64 step-1 moments → float64 once
        n = np.float64(nw)
        sx, sy = np.float64(xs.sum()), np.float64(ys.sum())
        sxx = np.float64(np.dot(xs, xs))
        sxy = np.float64(np.dot(xs, ys))
        with np.errstate(invalid="ignore", divide="ignore"):
            den = n * sxx - sx * sx
            beta = (n * sxy - sx * sy) / den
            alpha = (sy - beta * sx) / n
            if not (np.isfinite(beta) and np.isfinite(alpha)):
                return nulls
            # per-row fixed tree: (y − α) − β·x, bit-identical both sides
            e = ys.astype(np.float64) - alpha - beta * xs.astype(np.float64)
            z, d = e[:-1], e[1:] - e[:-1]
            m = np.float64(len(z))
            szd = np.float64(np.dot(z, d))
            szz = np.float64(np.dot(z, z))
            sdd = np.float64(np.dot(d, d))
            rho = szd / szz
            s2 = (sdd - rho * szd) / (m - 1.0)
            var_rho = s2 / szz
            df_t = rho / np.sqrt(var_rho) if var_rho > 0 else np.nan
        vals = [v if np.isfinite(v) else np.nan
                for v in (beta, alpha, rho, df_t)]
        return pd.DataFrame({
            "n_windows": pd.Series([nw], dtype="int64"),
            "beta": [vals[0]], "alpha": [vals[1]],
            "rho": [vals[2]], "df_t": [vals[3]]})

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
    return partials.repartition(1).map_batches(fin, batch_format="pandas",
                                               batch_size=None)


def croston_forecast(
    ds: Dataset,
    *,
    key: str,
    ts_col: str,
    alpha: float = 0.3,
    tier: str = "1d",
    num_partitions: int = 64,
) -> Dataset:
    """Croston's method (1972) for INTERMITTENT demand — the standard
    forecast when most periods are empty (per-user purchase days,
    spare-part orders), where plain EWMA/Holt decay toward 0 between
    demands and systematically under-forecast.  Two SES chains over the
    key's NONZERO demand periods only::

        z_k = α·d_k + (1−α)·z_{k−1}   (demand size;   z_1 = d_1)
        p_k = α·q_k + (1−α)·p_{k−1}   (inter-demand interval, periods;
                                       q_1 = 1 by convention)
        forecast per period = z_K / p_K

    The intermittent-demand member of the forecasting family
    (:func:`~s_tsfe_dl_ray.stages.transform.ewma` → Holt →
    Holt–Winters), same reference analog (moving-average pre-filtering,
    experiments/IGN_experiment.py:190-205).

    Dataflow: per-batch (key, period-window) count combiner — observed
    (nonzero) periods ONLY cross the one exchange, which is exactly
    Croston's input; each key-complete partition runs both recursions
    with pandas' grouped ``ewm(adjust=False)`` C kernel (bit-identical
    to the naive float64 recurrence — the EWMA stage's verified
    contract), no per-key Python.  Output: one row per key —
    ``key, n_demand_periods (int64), z_hat, p_hat, forecast_per_period``
    (keys with zero events emit nothing; a single demand period gives
    z=d_1, p=1, forecast=d_1).
    """
    from ..functions.windows import window_start_us
    from .grouped import grouped_apply

    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    period_us = {"1h": 3_600_000_000, "1d": 86_400_000_000}[tier]

    def partial(t: pa.Table) -> pa.Table:
        w = window_start_us(t[ts_col], tier)
        out = pa.table({key: t[key], "_w": w}) \
            .group_by([key, "_w"], use_threads=False) \
            .aggregate([([], "count_all")])
        return out.rename_columns([key, "_w", "_d"])

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            key: pd.Series([], dtype="object"),
            "n_demand_periods": pd.Series([], dtype="int64"),
            "z_hat": pd.Series([], dtype="float64"),
            "p_hat": pd.Series([], dtype="float64"),
            "forecast_per_period": pd.Series([], dtype="float64")})
        if len(df) == 0:
            return empty
        # merge same-(key, window) partials from different batches first
        m = df.groupby([key, "_w"], sort=False, as_index=False)["_d"].sum()
        m = m.sort_values([key, "_w"], kind="mergesort") \
            .reset_index(drop=True)
        g = m.groupby(key, sort=False)
        widx = (m["_w"].astype("int64") // period_us).to_numpy(np.int64)
        q = widx - np.roll(widx, 1)
        firsts = g.cumcount().to_numpy() == 0
        q[firsts] = 1                      # q_1 = 1 by convention
        m["_q"] = q.astype(np.float64)
        m["_df"] = m["_d"].astype(np.float64)
        # grouped C-speed ewm kernels; m is key-sorted so the grouped
        # result aligns with row order positionally
        m["_z"] = m.groupby(key, sort=False)["_df"].ewm(
            alpha=alpha, adjust=False).mean().to_numpy()
        m["_p"] = m.groupby(key, sort=False)["_q"].ewm(
            alpha=alpha, adjust=False).mean().to_numpy()
        last = m.groupby(key, sort=False, as_index=False).agg(
            n_demand_periods=("_d", "size"), _z=("_z", "last"),
            _p=("_p", "last"))
        zl = last["_z"].to_numpy(np.float64)
        pl = last["_p"].to_numpy(np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            f = zl / pl
        return pd.DataFrame({
            key: last[key],
            "n_demand_periods": last["n_demand_periods"].astype(np.int64),
            "z_hat": zl, "p_hat": pl,
            "forecast_per_period": np.where(np.isfinite(f), f, np.nan)})

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
    return grouped_apply(partials, keys=[key], fn=fold,
                         num_partitions=num_partitions,
                         whole_partition=True)


def rolling_grid_corr(
    ds: Dataset,
    *,
    ts_col: str,
    type_col: str,
    type_a: str,
    type_b: str,
    tier: str = "1h",
    window: int = 24,
) -> Dataset:
    """Trailing Pearson correlation between two event types' counts on
    the DENSE tumbling-window grid: for every full ``window``-wide
    trailing span, how coupled were the two activity series?  The
    time-resolved refinement of the single-number type correlation and
    the windowed companion of :func:`granger_probe` /
    :func:`cointegration_probe` — a monitoring pipeline watches this
    series for decoupling events.

    The grid is dense (hours with NO events are true zero counts from
    the min to the max observed window — the SQL twin generates the
    same series), so the correlation reflects real silence, not just
    observed hours.  All window moments (Σa, Σb, Σab, Σa², Σb²) are
    exact int64 trailing-prefix differences; the correlation

        (W·Σab − Σa·Σb) / (√(W·Σa² − (Σa)²) · √(W·Σb² − (Σb)²))

    is one fixed float tree, NULL when either side's window variance is
    0 (the twin's x/0).  Only full windows emit (the first W−1 grid
    positions are warm-up).  Output: ``window_start (timestamp us — the
    window's LAST tier cell), corr``.

    Scale: the same per-batch (window, a_n, b_n) count combiner as
    granger_probe, one tiny ordered fold on the grid.
    """
    from ..functions.windows import TIER_US, window_start_us

    step = TIER_US[tier]
    if window < 2:
        raise ValueError("window must be >= 2")

    def partial(t: pa.Table) -> pa.Table:
        w = window_start_us(t[ts_col], tier)
        is_a = pc.cast(pc.equal(t[type_col], type_a), pa.int64())
        is_b = pc.cast(pc.equal(t[type_col], type_b), pa.int64())
        out = pa.table({"w": w, "a_n": is_a, "b_n": is_b}) \
            .group_by(["w"], use_threads=False) \
            .aggregate([("a_n", "sum"), ("b_n", "sum")])
        return out.rename_columns(["w", "a_n", "b_n"])

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "window_start": pd.Series([], dtype="datetime64[us]"),
            "corr": pd.Series([], dtype="float64")})
        if len(df) == 0:
            return empty
        g = df.groupby("w", sort=True)[["a_n", "b_n"]].sum()
        lo = int(g.index[0]) // step
        hi = int(g.index[-1]) // step
        m = hi - lo + 1
        if m < window:
            return empty
        a = np.zeros(m, np.int64)
        b = np.zeros(m, np.int64)
        pos = (g.index.to_numpy(np.int64) // step) - lo
        a[pos] = g["a_n"].to_numpy(np.int64)
        b[pos] = g["b_n"].to_numpy(np.int64)

        def trail(x: np.ndarray) -> np.ndarray:
            c = np.concatenate(([np.int64(0)], np.cumsum(x)))
            return c[window:] - c[:-window]

        sa, sb = trail(a), trail(b)
        sab, saa, sbb = trail(a * b), trail(a * a), trail(b * b)
        W = np.int64(window)
        num = (W * sab - sa * sb).astype(np.float64)
        va = (W * saa - sa * sa).astype(np.float64)
        vb = (W * sbb - sb * sb).astype(np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            corr = num / (np.sqrt(va) * np.sqrt(vb))
        ends = (np.arange(window - 1, m, dtype=np.int64) + lo) * step
        return pd.DataFrame({
            "window_start": pd.Series(ends).astype("datetime64[us]"),
            "corr": np.where(np.isfinite(corr), corr, np.nan)})

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
    return partials.repartition(1).map_batches(fin, batch_format="pandas",
                                               batch_size=None)


def theta_forecast(
    ds: Dataset,
    *,
    key: str,
    ts_col: str,
    alpha: float = 0.3,
    tier: str = "1d",
    num_partitions: int = 64,
) -> Dataset:
    """Theta-style one-step demand forecast per key: simple exponential
    smoothing PLUS half the linear drift — the decomposition behind the
    M3-winning Theta method (SES of the theta(0)/theta(2) lines
    averages to ``SES_level + slope/2``).  Completes the engine's
    forecasting family: EWMA (level), Holt (level+trend), Croston
    (intermittent), Theta (drift-damped SES)::

        z_T   = SES(x; α)                 over the key's observed periods
        b     = OLS slope of x on the INTEGER period index (exact moments)
        f_1   = z_T + b/2

    Periods are the key's OBSERVED (activity) ``tier`` windows with
    their event counts; the period index is days/hours since the key's
    first period, so gaps count in the drift but not in the SES chain
    (document the convention, it is mirrored by the twin).  SES uses
    the verified pandas grouped ewm(adjust=False) kernel ==
    ``list_reduce`` bit-exact recipe; the slope is one fixed float tree
    over exact int64 moments.  Keys with one period yield NULL slope
    and forecast.  Output: ``key, n_periods (int64), level, slope,
    theta_forecast``.
    """
    from ..functions.windows import TIER_US, window_start_us
    from .grouped import grouped_apply

    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    step = TIER_US[tier]

    def partial(t: pa.Table) -> pa.Table:
        w = window_start_us(t[ts_col], tier)
        out = pa.table({key: t[key], "_w": w}) \
            .group_by([key, "_w"], use_threads=False) \
            .aggregate([([], "count_all")])
        return out.rename_columns([key, "_w", "_d"])

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            key: pd.Series([], dtype="object"),
            "n_periods": pd.Series([], dtype="int64"),
            "level": pd.Series([], dtype="float64"),
            "slope": pd.Series([], dtype="float64"),
            "theta_forecast": pd.Series([], dtype="float64")})
        if len(df) == 0:
            return empty
        m = df.groupby([key, "_w"], sort=False, as_index=False)["_d"] \
            .sum()
        m = m.sort_values([key, "_w"], kind="mergesort") \
            .reset_index(drop=True)
        widx = (m["_w"].astype("int64") // step).to_numpy(np.int64)
        t0 = m.groupby(key, sort=False)["_w"].transform("min") \
            .astype("int64").to_numpy() // step
        ti = widx - t0
        d = m["_d"].to_numpy(np.int64)
        m["_x"] = d.astype(np.float64)
        m["_z"] = m.groupby(key, sort=False)["_x"].ewm(
            alpha=alpha, adjust=False).mean().to_numpy()
        # exact int64 slope moments per key
        mom = pd.DataFrame({
            key: m[key], "_t": ti, "_tt": ti * ti, "_tx": ti * d,
            "_xs": d}).groupby(key, sort=False, as_index=False).sum()
        last = m.groupby(key, sort=False, as_index=False).agg(
            n_periods=("_d", "size"), _z=("_z", "last"))
        nn = last["n_periods"].to_numpy(np.int64).astype(np.float64)
        st = mom["_t"].to_numpy(np.int64).astype(np.float64)
        stt = mom["_tt"].to_numpy(np.int64).astype(np.float64)
        stx = mom["_tx"].to_numpy(np.int64).astype(np.float64)
        sx = mom["_xs"].to_numpy(np.int64).astype(np.float64)
        z = last["_z"].to_numpy(np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            b = (nn * stx - st * sx) / (nn * stt - st * st)
            f = z + b / 2.0
        return pd.DataFrame({
            key: last[key],
            "n_periods": last["n_periods"].astype(np.int64),
            "level": z,
            "slope": np.where(np.isfinite(b), b, np.nan),
            "theta_forecast": np.where(np.isfinite(f), f, np.nan)})

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
    return grouped_apply(partials, keys=[key], fn=fold,
                         num_partitions=num_partitions,
                         whole_partition=True)


def grid_lag_autocorr(
    ds: Dataset,
    *,
    ts_col: str,
    tier: str = "1d",
    lag: int = 7,
) -> Dataset:
    """Corpus-level lag autocorrelation of activity counts on the DENSE
    tumbling grid — lag 7 on the daily grid is the weekly-seasonality
    strength number ("is traffic weekly-periodic?"), the corpus-level
    companion of the per-key :func:`acf` (values per user) and the
    fixed-lag sibling of :func:`rolling_grid_corr` (two series,
    trailing window).

    The grid is dense (missing periods are true zero counts between the
    observed min and max — the twin generates the same series); the
    Pearson correlation of (x_t, x_{t+lag}) over all full pairs uses
    exact int64 moment sums cast to float once, one fixed tree, NULL
    when either side's variance is 0 or fewer than 2 pairs exist.
    Output: one row — ``n_periods (int64), n_pairs (int64), lag_corr``.
    """
    from ..functions.windows import TIER_US, window_start_us

    step = TIER_US[tier]
    if lag < 1:
        raise ValueError("lag must be >= 1")

    def partial(t: pa.Table) -> pa.Table:
        w = window_start_us(t[ts_col], tier)
        out = pa.table({"w": w}).group_by(["w"], use_threads=False) \
            .aggregate([([], "count_all")])
        return out.rename_columns(["w", "c"])

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        nulls = pd.DataFrame({
            "n_periods": pd.Series([0], dtype="int64"),
            "n_pairs": pd.Series([0], dtype="int64"),
            "lag_corr": [np.nan]})
        if len(df) == 0:
            return nulls.iloc[:0]
        g = df.groupby("w", sort=True)["c"].sum()
        lo = int(g.index[0]) // step
        hi = int(g.index[-1]) // step
        m = hi - lo + 1
        x = np.zeros(m, np.int64)
        x[(g.index.to_numpy(np.int64) // step) - lo] = \
            g.to_numpy(np.int64)
        npairs = m - lag
        out = pd.DataFrame({
            "n_periods": pd.Series([m], dtype="int64"),
            "n_pairs": pd.Series([max(npairs, 0)], dtype="int64"),
            "lag_corr": [np.nan]})
        if npairs < 2:
            return out
        a, b = x[:-lag], x[lag:]
        n = np.float64(npairs)
        sa, sb = np.float64(a.sum()), np.float64(b.sum())
        sab = np.float64(np.dot(a, b))
        saa = np.float64(np.dot(a, a))
        sbb = np.float64(np.dot(b, b))
        with np.errstate(invalid="ignore", divide="ignore"):
            corr = (n * sab - sa * sb) / (
                np.sqrt(n * saa - sa * sa) * np.sqrt(n * sbb - sb * sb))
        out["lag_corr"] = [corr if np.isfinite(corr) else np.nan]
        return out

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
    return partials.repartition(1).map_batches(fin, batch_format="pandas",
                                               batch_size=None)


def forecast_backtest(
    ds: Dataset,
    *,
    ts_col: str,
    key_col: str,
    tier: str = "1d",
    alpha: float = 0.3,
) -> Dataset:
    """One-step-ahead forecast backtest per key on the DENSE tumbling
    grid: walk the key's count series forward, predicting each period
    with (a) the EWMA of everything before it and (b) the naive
    last-value carry, and report both MAEs plus the skill ratio
    (< 1: the smoother beats persistence; the honest "is EWMA even
    helping" check behind the engine's forecasting family).

    Exactness: the grid and naive errors are exact int64; the EWMA
    prediction per step is the prefix fold of the verified
    pandas-ewm == list_reduce tree (the croston recipe, including the
    equal-skip branch), and the |error| sums fold SEQUENTIALLY in
    period order on both sides — so every float is bit-identical to
    the twin's prefix-window ``list_reduce``.  Keys with < 2 grid
    periods emit nothing (no step to score — both sides).  Output per
    key: ``key_col, n_steps (int64), mae_naive, mae_ewma,
    skill_ratio``.
    """
    from ..functions.windows import TIER_US, window_start_us

    step = TIER_US[tier]
    one_m = 1.0 - alpha
    den = (1.0 - alpha) + alpha

    def partial(t: pa.Table) -> pa.Table:
        w = window_start_us(t[ts_col], tier)
        out = pa.table({key_col: t[key_col], "w": w}) \
            .group_by([key_col, "w"], use_threads=False) \
            .aggregate([([], "count_all")])
        return out.rename_columns([key_col, "w", "c"])

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            key_col: pd.Series([], dtype="object"),
            "n_steps": pd.Series([], dtype="int64"),
            "mae_naive": pd.Series([], dtype="float64"),
            "mae_ewma": pd.Series([], dtype="float64"),
            "skill_ratio": pd.Series([], dtype="float64")})
        if len(df) == 0:
            return empty
        g = df.groupby([key_col, "w"], sort=True, as_index=False)["c"] \
            .sum()
        rows = []
        for kval, grp in g.groupby(key_col, sort=True):
            widx = grp["w"].to_numpy(np.int64) // step
            cnt = dict(zip(widx, grp["c"].to_numpy(np.int64)))
            lo, hi = int(widx.min()), int(widx.max())
            x = np.array([cnt.get(i, 0) for i in range(lo, hi + 1)],
                         np.int64)
            m = len(x)
            if m < 2:
                continue        # no step to score — emit nothing (twin)
            sn = np.int64(0)
            se = np.float64(0.0)
            z = np.float64(x[0])
            for t in range(1, m):
                xt = np.float64(x[t])
                se = se + np.abs(xt - z)
                sn += abs(int(x[t]) - int(x[t - 1]))
                # the verified pandas-ewm tree, equal-skip included
                if z != xt:
                    z = (one_m * z + alpha * xt) / den
            n = np.float64(m - 1)
            with np.errstate(invalid="ignore", divide="ignore"):
                mae_n = np.float64(sn) / n
                mae_e = se / n
                ratio = mae_e / mae_n
            rows.append((kval, m - 1,
                         mae_n if np.isfinite(mae_n) else np.nan,
                         mae_e if np.isfinite(mae_e) else np.nan,
                         ratio if np.isfinite(ratio) else np.nan))
        out = pd.DataFrame(rows, columns=[key_col, "n_steps",
                                          "mae_naive", "mae_ewma",
                                          "skill_ratio"])
        out["n_steps"] = out["n_steps"].astype(np.int64)
        return out

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
    return partials.repartition(1).map_batches(fin, batch_format="pandas",
                                               batch_size=None)
