"""Per-series and global transforms from the reference's preprocessing
surface (SURVEY.md §2.2).

- ``rolling_mean``   — windowed moving average per key in explicit order
                       (reference: moving_average, np.convolve/w applied
                       5×, experiments/IGN_experiment.py:190-205, 213-218)
- ``standardize``    — global (mean, std) fit + scale
                       (reference: StandardScaler fit_transform,
                       experiments/keras_experiment.py:20; BatchNorm
                       two-pass analog, models_keras.py:203-205)
- ``one_hot``        — categorical → indicator columns
                       (reference: oneHotEncode, experiments/utils.py:87-107)
- ``binarize_label`` — collapse all non-normal classes to 1
                       (reference: keras_experiment.py:28-32)
- ``hash_split``     — deterministic train/test assignment by stable
                       content hash (reference: seeded train_test_split,
                       test_keras.py:50-53 — distributed version must not
                       depend on row order, so it hashes the id)

All vectorized; ``standardize`` is the canonical two-pass global
aggregate → broadcast → map pattern.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset


class _RollingGroup:
    def __init__(self, col: str, out_col: str, window: int, order_by: list[str],
                 stat: str = "mean"):
        self.col, self.out_col, self.window, self.order_by = col, out_col, window, order_by
        self.stat = stat

    def __call__(self, g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(self.order_by, kind="mergesort")
        g[self.out_col] = (
            g[self.col].rolling(self.window, min_periods=1).agg(self.stat)
        )
        return g


def rolling_mean(
    ds: Dataset,
    *,
    keys: list[str],
    order_by: list[str],
    col: str,
    window: int,
    out_col: str | None = None,
    salt_every_us: int | None = None,
) -> Dataset:
    """Trailing moving average over the ``window`` most recent rows per
    key (min_periods=1: partial windows at the head are averaged over
    what exists — the reference's 'same'-edge behavior).

    ``salt_every_us``: mega-key mode (stages/salted.py) — each time chunk
    carries only the previous chunks' last ``window-1`` values as its
    summary, so no partition ever holds a hot key's full history.  Values
    agree with the unsalted path to float64 rolling precision (pandas'
    sliding-sum accumulator starts at a different offset per chunk)."""
    out_col = out_col or f"{col}_ma{window}"
    return _rolling(ds, keys=keys, order_by=order_by, col=col, window=window,
                    out_col=out_col, stat="mean", salt_every_us=salt_every_us)


def rolling_median(
    ds: Dataset,
    *,
    keys: list[str],
    order_by: list[str],
    col: str,
    window: int,
    out_col: str | None = None,
    salt_every_us: int | None = None,
) -> Dataset:
    """Trailing rolling MEDIAN over the ``window`` most recent rows per
    key (min_periods=1) — the robust (outlier-immune) sibling of
    :func:`rolling_mean`, the despiking smoother timeseries cleaning
    reaches for when a mean would chase glitches.  Even windows
    interpolate (mean of the two middle order statistics), matching SQL
    ``median``.  Same dataflow and mega-key ``salt_every_us`` mode; the
    salted output is EXACTLY equal to the unsalted one (order statistics
    have no accumulator drift)."""
    out_col = out_col or f"{col}_med{window}"
    return _rolling(ds, keys=keys, order_by=order_by, col=col, window=window,
                    out_col=out_col, stat="median", salt_every_us=salt_every_us)


def _disc_quantile_windows(v: np.ndarray, w: int, q: float,
                           n_prefix: int = 0) -> np.ndarray:
    """Exact quantile_disc per trailing window of ``v``, returning one
    value per position ``v[n_prefix:]`` (len(v) − n_prefix values).
    The first ``n_prefix`` values of ``v`` are carried history that only
    seeds windows; requires ``n_prefix ≤ w−1`` and at least one output
    position.  Index = ceil(m·q)−1 over the m non-NaN values of each
    window (partial head windows NaN-padded; NaNs sort last and shrink
    m, matching SQL NULL skipping)."""
    a = np.concatenate([np.full(w - 1 - n_prefix, np.nan), v])
    m2 = np.lib.stride_tricks.sliding_window_view(a, w)
    s = np.sort(m2, axis=1)                    # NaNs sort last
    m = w - np.isnan(m2).sum(axis=1)           # non-null count per window
    idx = np.maximum(np.ceil(m * q), 1).astype(np.int64) - 1
    out = s[np.arange(len(s)), np.minimum(idx, w - 1)]
    return np.where(m > 0, out, np.nan)


class _RollingQuantileGroup:
    """Trailing discrete quantile per row: sort each trailing window
    (strided view, one vectorized sort per key) and pick the exact
    ``quantile_disc`` order statistic — index ceil(m·q)−1 over the m
    non-null values in the window (partial head windows included,
    matching SQL ``ROWS w-1 PRECEDING``; NULLs sort last and shrink m,
    matching SQL aggregate NULL-skipping)."""

    def __init__(self, col: str, out_col: str, window: int,
                 order_by: list[str], q: float):
        self.col, self.out_col = col, out_col
        self.window, self.order_by, self.q = window, order_by, q

    def __call__(self, g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(self.order_by, kind="mergesort")
        v = g[self.col].to_numpy(dtype=np.float64)
        if len(v) == 0:
            g[self.out_col] = np.array([], dtype=np.float64)
            return g
        g[self.out_col] = _disc_quantile_windows(v, self.window, self.q)
        return g


def rolling_quantile(
    ds: Dataset,
    *,
    keys: list[str],
    order_by: list[str],
    col: str,
    window: int,
    q: float = 0.9,
    out_col: str | None = None,
    salt_every_us: int | None = None,
) -> Dataset:
    """Trailing rolling DISCRETE quantile over the ``window`` most recent
    rows per key (min_periods=1) — the order-statistic generalization of
    :func:`rolling_median` (p90/p99 spike envelopes for alerting
    thresholds).  Semantics == SQL ``quantile_disc(col, q) OVER (ROWS
    window-1 PRECEDING AND CURRENT ROW)`` including partial head windows
    and NULL skipping; values are reproduced exactly (selection, no
    arithmetic).  One ``_pkey`` exchange; inside each key one strided
    window sort, O(n·w log w).

    ``salt_every_us``: mega-key mode (stages/salted.py) — each time chunk
    carries only the previous chunks' last ``window−1`` values, so no
    partition holds a hot key's full history; order statistics have no
    accumulator drift, so the salted output is EXACTLY the unsalted one.
    """
    out_col = out_col or f"{col}_p{int(q * 100)}w{window}"
    if salt_every_us is None:
        from .grouped import grouped_apply

        return grouped_apply(ds, keys=keys,
                             fn=_RollingQuantileGroup(col, out_col, window,
                                                      order_by, q))

    if len(keys) != 1:
        raise ValueError("salted rolling requires a single key")
    from .salted import salted_scan

    keep = window - 1

    def summarize(g: pd.DataFrame) -> dict:
        return {"tail": [float(v) for v in g[col].to_numpy()[-keep:]]
                if keep else []}

    def step(carry: dict | None, s: dict) -> dict:
        prev = carry["tail"] if carry else []
        return {"tail": (prev + s["tail"])[-keep:] if keep else []}

    def apply(g: pd.DataFrame, carry: dict | None) -> pd.DataFrame:
        if len(g) == 0:
            return g
        g = g.sort_values(order_by, kind="mergesort")
        prev = np.asarray(carry["tail"] if carry else [], dtype=np.float64)
        v = np.concatenate([prev, g[col].to_numpy(dtype=np.float64)])
        # windows align to the current chunk's rows (one per v[len(prev):])
        g[out_col] = _disc_quantile_windows(v, window, q, len(prev))
        return g

    return salted_scan(
        ds, key=keys[0], ts_col=order_by[0], salt_every_us=salt_every_us,
        summarize=summarize, step=step, apply=apply, order_by=order_by,
    )


def _rolling(
    ds: Dataset,
    *,
    keys: list[str],
    order_by: list[str],
    col: str,
    window: int,
    out_col: str,
    stat: str,
    salt_every_us: int | None,
) -> Dataset:
    if salt_every_us is None:
        inst = _RollingGroup(col, out_col, window, order_by, stat)
        from .grouped import grouped_apply

        return grouped_apply(ds, keys=keys, fn=inst)

    if len(keys) != 1:
        raise ValueError("salted rolling requires a single key")
    from .salted import salted_scan

    ts_col = order_by[0]
    keep = window - 1

    def summarize(g: pd.DataFrame) -> dict:
        return {"tail": [float(v) for v in g[col].to_numpy()[-keep:]] if keep else []}

    def step(carry: dict | None, s: dict) -> dict:
        prev = carry["tail"] if carry else []
        return {"tail": (prev + s["tail"])[-keep:] if keep else []}

    def apply(g: pd.DataFrame, carry: dict | None) -> pd.DataFrame:
        if len(g) == 0:
            return g
        g = g.sort_values(order_by, kind="mergesort")
        prev = carry["tail"] if carry else []
        s = pd.concat(
            [pd.Series(prev, dtype="float64"), g[col].astype("float64")],
            ignore_index=True,
        )
        r = s.rolling(window, min_periods=1).agg(stat)
        g[out_col] = r.iloc[len(prev):].to_numpy()
        return g

    return salted_scan(
        ds, key=keys[0], ts_col=ts_col, salt_every_us=salt_every_us,
        summarize=summarize, step=step, apply=apply, order_by=order_by,
    )


class _EwmaGroup:
    def __init__(self, col: str, out_col: str, alpha: float, order_by: list[str]):
        self.col, self.out_col, self.alpha, self.order_by = col, out_col, alpha, order_by

    def __call__(self, g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(self.order_by, kind="mergesort")
        g[self.out_col] = (
            g[self.col].astype("float64").ewm(alpha=self.alpha, adjust=False).mean()
        )
        return g


def ewma(
    ds: Dataset,
    *,
    keys: list[str],
    order_by: list[str],
    col: str,
    alpha: float,
    out_col: str | None = None,
    salt_every_us: int | None = None,
) -> Dataset:
    """Exponentially-weighted moving average per key in explicit order:
    ``y_0 = x_0; y_i = alpha*x_i + (1-alpha)*y_{i-1}`` (pandas
    ``ewm(adjust=False)`` — verified bitwise-identical to the naive
    float64 recurrence AND to a DuckDB recursive-CTE twin computing
    ``alpha*x + (1-alpha)*ewma``, so the op is oracle-checkable despite
    being non-windowed SQL).  The recency-weighted smoother the reference
    applies as ``moving_average`` pre-filtering
    (experiments/IGN_experiment.py:190-205) — the infinite-impulse
    variant, standard for drift/anomaly baselines over event streams.

    ``salt_every_us``: mega-key mode (stages/salted.py).  Each chunk's
    summary is the linear decomposition (v, w) of the recurrence
    (``y_end = v + w·y_in``; w = (1-alpha)^n), so no partition ever holds
    a hot key's full history.  The carry fold reassociates float
    products, so salted output agrees with the unsalted path to float64
    precision (same caveat as salted ``rolling_mean``), not bitwise.
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    out_col = out_col or f"{col}_ewma"
    if salt_every_us is None:
        inst = _EwmaGroup(col, out_col, alpha, order_by)
        from .grouped import grouped_apply

        return grouped_apply(ds, keys=keys, fn=inst)

    if len(keys) != 1:
        raise ValueError("salted ewma requires a single key")
    from .salted import salted_scan

    ts_col = order_by[0]
    one_m = 1.0 - alpha

    def summarize(g: pd.DataFrame) -> dict:
        x = g[col].astype("float64")
        # v: the recurrence seeded with y_in = 0 (pure input contribution,
        # via a prepended synthetic 0 row); v0: seeded with y_0 = x_0 (the
        # value if this is the key's FIRST chunk).  y_end = v + w*y_in for
        # continuation chunks.  Both vectorized pandas ewm.
        z = pd.concat([pd.Series([0.0]), x], ignore_index=True)
        v = float(z.ewm(alpha=alpha, adjust=False).mean().iloc[-1])
        v0 = float(x.ewm(alpha=alpha, adjust=False).mean().iloc[-1])
        return {"v": v, "w": float(one_m ** len(x)), "v0": v0}

    def step(carry: dict | None, s: dict) -> dict:
        if carry is None:
            return {"y": s["v0"]}
        return {"y": s["v"] + s["w"] * carry["y"]}

    def apply(g: pd.DataFrame, carry: dict | None) -> pd.DataFrame:
        if len(g) == 0:
            return g
        g = g.sort_values(order_by, kind="mergesort")
        x = g[col].astype("float64")
        if carry is None:
            g[out_col] = x.ewm(alpha=alpha, adjust=False).mean()
        else:
            # prepend the carried y so pandas' recurrence seeds from it,
            # then drop the synthetic first row
            s = pd.concat(
                [pd.Series([carry["y"]], dtype="float64"), x], ignore_index=True
            )
            g[out_col] = s.ewm(alpha=alpha, adjust=False).mean().iloc[1:].to_numpy()
        return g

    return salted_scan(
        ds, key=keys[0], ts_col=ts_col, salt_every_us=salt_every_us,
        summarize=summarize, step=step, apply=apply, order_by=order_by,
    )


def standardize(ds: Dataset, *, cols: list[str], suffix: str = "_z") -> Dataset:
    """Two-pass global standardization: tiny aggregate (mean/std via
    per-batch partial sums — one small shuffle), then a broadcast scale
    map.  std is the population std (ddof=0), matching DuckDB
    ``stddev_pop``."""

    def partial(t: pa.Table) -> pa.Table:
        out = {"_n": pa.array([t.num_rows], pa.int64())}
        for c in cols:
            v = pc.cast(t[c], pa.float64())
            out[f"{c}_s"] = pa.array([pc.sum(v).as_py() or 0.0])
            out[f"{c}_s2"] = pa.array([pc.sum(pc.multiply(v, v)).as_py() or 0.0])
        return pa.table(out)

    stats = ds.map_batches(partial, batch_format="pyarrow").to_pandas().sum()
    n = float(stats["_n"])
    params = {}
    for c in cols:
        mean = stats[f"{c}_s"] / n
        var = max(stats[f"{c}_s2"] / n - mean * mean, 0.0)
        params[c] = (mean, np.sqrt(var))

    def scale(t: pa.Table) -> pa.Table:
        for c in cols:
            mean, std = params[c]
            z = pc.divide(
                pc.subtract(pc.cast(t[c], pa.float64()), pa.scalar(mean)),
                pa.scalar(std if std > 0 else 1.0),
            )
            t = t.append_column(f"{c}{suffix}", z)
        return t

    return ds.map_batches(scale, batch_format="pyarrow", zero_copy_batch=True)


def one_hot(ds: Dataset, *, col: str, categories: list[str], prefix: str | None = None) -> Dataset:
    """Indicator column per category (explicit category list → stable
    schema across blocks; unknown values get all-zeros)."""
    prefix = prefix or col

    def encode(t: pa.Table) -> pa.Table:
        for cat in categories:
            t = t.append_column(
                f"{prefix}_{cat}", pc.cast(pc.equal(t[col], cat), pa.int64())
            )
        return t

    return ds.map_batches(encode, batch_format="pyarrow", zero_copy_batch=True)


def binarize_label(ds: Dataset, *, col: str, normal_value, out_col: str = "label_bin") -> Dataset:
    """0 where ``col == normal_value``, else 1."""

    def encode(t: pa.Table) -> pa.Table:
        return t.append_column(
            out_col, pc.cast(pc.not_equal(t[col], normal_value), pa.int64())
        )

    return ds.map_batches(encode, batch_format="pyarrow", zero_copy_batch=True)


def hash_split(
    ds: Dataset, *, id_col: str, test_fraction: float = 0.2, out_col: str = "split"
) -> Dataset:
    """Deterministic, order-independent train/test assignment: a row is
    'test' when the first 4 hex digits of md5(id) fall below the
    fraction.  Stable across cluster sizes and reruns (md5, not
    PYTHONHASHSEED-dependent) and SQL-mirrorable."""
    cut = int(test_fraction * 65536)

    def assign(b: pd.DataFrame) -> pd.DataFrame:
        h = b[id_col].astype(str).map(
            lambda s: int(hashlib.md5(s.encode()).hexdigest()[:4], 16)
        )
        b = b.copy()
        b[out_col] = np.where(h < cut, "test", "train")
        return b

    return ds.map_batches(assign, batch_format="pandas")


def mixture_sample(
    ds: Dataset,
    *,
    id_col: str,
    source_col: str,
    rates: dict[str, float],
    default_rate: float = 1.0,
) -> Dataset:
    """Deterministic source-mixture downsampling — the data-mixing step of
    an LLM training pipeline (hit a target corpus mix by keeping each
    source at its own rate).  A row survives iff the first 4 hex digits
    of ``md5(source || '|' || id)`` fall below its source's rate, so the
    sample is order-independent, stable across cluster sizes and reruns,
    exactly reproducible row-by-row (not just in expectation), and
    SQL-mirrorable with the same hex-threshold idiom as ``hash_split``.
    Salting with the source makes rates independent across sources.
    Stateless per row → embarrassingly parallel; no shuffle at any scale.

    ``rates``: source value → keep rate in [0, 1]; sources not listed get
    ``default_rate``.  Rate ≥ 1.0 keeps every row of that source.
    """
    for s, r in rates.items():
        if not 0.0 <= r:
            raise ValueError(f"rate for {s!r} must be >= 0, got {r}")
    cuts = {s: min(int(r * 65536), 65536) for s, r in rates.items()}
    default_cut = min(int(default_rate * 65536), 65536)

    def keep(b: pd.DataFrame) -> pd.DataFrame:
        salted = b[source_col].astype(str) + "|" + b[id_col].astype(str)
        h = salted.map(
            lambda s: int(hashlib.md5(s.encode()).hexdigest()[:4], 16)
        ).to_numpy()
        cut = b[source_col].map(lambda s: cuts.get(s, default_cut)).to_numpy()
        return b[h < cut]

    return ds.map_batches(keep, batch_format="pandas")


def stratified_hash_split(
    ds: Dataset,
    *,
    id_col: str,
    strata_col: str,
    test_fraction: float = 0.2,
    out_col: str = "split",
) -> Dataset:
    """Deterministic STRATIFIED train/test assignment (reference analog:
    ``train_test_split(..., stratify=y)``, test_keras.py:50-53).

    The hash is salted with the stratum (``md5(stratum || '|' || id)``),
    so the test indicator is independent across strata — each class hits
    the test fraction in expectation regardless of any correlation
    between id hashes and class.  Stateless per row → embarrassingly
    parallel at any scale, stable across cluster sizes, SQL-mirrorable.
    """
    cut = int(test_fraction * 65536)

    def assign(b: pd.DataFrame) -> pd.DataFrame:
        salted = b[strata_col].astype(str) + "|" + b[id_col].astype(str)
        h = salted.map(lambda s: int(hashlib.md5(s.encode()).hexdigest()[:4], 16))
        b = b.copy()
        b[out_col] = np.where(h < cut, "test", "train")
        return b

    return ds.map_batches(assign, batch_format="pandas")


def unpivot(
    ds: Dataset,
    *,
    keys: list[str],
    value_cols: list[str],
    var_col: str = "variable",
    value_col: str = "value",
    cast_to: "pa.DataType | None" = None,
) -> Dataset:
    """Wide→long UNPIVOT (melt): one output row per (input row ×
    value column) — the inverse of ``pipelines/relational.pivot_wide``
    and the engine's reshape for feeding wide feature tables into long
    per-metric pipelines (the reference reshapes the same way when
    flattening channel axes, data.py:copy-to-channel layouts).

    Pure per-batch kernel, no shuffle, no Python row loop: each value
    column becomes one zero-copy column slice + a constant label column;
    the per-column slices concat into the long batch.  ``cast_to``
    unifies heterogeneous value-column dtypes (melting int and float
    columns together requires a common type — pass e.g.
    ``pa.float64()``); without it the dtypes must already agree.
    """
    if not value_cols:
        raise ValueError("value_cols must be non-empty")

    def melt(t: pa.Table) -> pa.Table:
        parts = []
        for c in value_cols:
            v = t[c]
            if cast_to is not None:
                v = pc.cast(v, cast_to)
            cols = {k: t[k] for k in keys}
            cols[var_col] = pa.array([c] * t.num_rows, pa.string())
            cols[value_col] = v
            parts.append(pa.table(cols))
        return pa.concat_tables(parts)

    return ds.map_batches(melt, batch_format="pyarrow", zero_copy_batch=True)


def winsorize(
    ds: Dataset,
    *,
    key: str,
    value_col: str,
    q: float = 0.95,
    out_col: str | None = None,
    num_partitions: int = 64,
) -> Dataset:
    """Per-key quantile clipping (one-sided winsorization): values above
    the key's own ``q`` quantile are clamped to it — the standard
    outlier-robust cleaning step before means/trends (the reference
    clips activations the same way, functions scalar clip;
    experiments/utils.py en_loss clip).

    Quantile semantics are ``quantile_disc`` (element at sorted 0-based
    index ⌈n·q⌉−1, the same contract as stages/quantile.py), so integer
    columns stay integers and the SQL twin reproduces bit-exactly.

    One exchange: rows co-partition by hash(key); a partition holds each
    key's complete rows, so the per-key quantile computed inside it is
    the global one — fit and clip fuse into one vectorized body (sort +
    per-group rank index, no per-key loop).
    """
    if not 0.0 < q <= 1.0:
        raise ValueError(f"q must be in (0, 1], got {q}")
    out_col = out_col or f"{value_col}_w{int(q * 100)}"

    def add_pkey(t: pa.Table) -> pa.Table:
        from .rollup import _stable_pkey

        return t.append_column("_pkey", _stable_pkey(t[key], num_partitions))

    def clip_partition(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=["_pkey"]).reset_index(drop=True)
        # quantile_disc per key, vectorized: sort by (key, value), then
        # the key's quantile element sits at group_start + ceil(n·q) − 1
        s = df.sort_values([key, value_col], kind="mergesort")
        keys_sorted = s[key].to_numpy()
        vals_sorted = s[value_col].to_numpy()
        change = np.flatnonzero(keys_sorted[1:] != keys_sorted[:-1]) + 1
        starts = np.concatenate([[0], change])
        ends = np.concatenate([change, [len(s)]])
        n = ends - starts
        idx = starts + np.maximum(np.ceil(n * q), 1).astype(np.int64) - 1
        cuts = pd.Series(vals_sorted[idx], index=keys_sorted[starts])
        cut_per_row = cuts.reindex(df[key]).to_numpy()
        df[out_col] = np.minimum(df[value_col].to_numpy(), cut_per_row)
        return df

    tagged = ds.map_batches(add_pkey, batch_format="pyarrow")
    return tagged.groupby("_pkey").map_groups(clip_partition, batch_format="pandas")


def sample_per_key(
    ds: Dataset,
    *,
    key: str,
    id_col: str,
    n: int,
    num_partitions: int = 64,
) -> Dataset:
    """Deterministic balanced subsample: the ``n`` rows of each key with
    the smallest ``md5(id)`` — the order-independent way to build
    fixed-size per-stratum eval sets (the reference's seeded
    train_test_split analog, test_keras.py:50-53, but stable across
    cluster sizes, reruns, and row order because rank comes from a
    content hash, not a position or RNG stream).

    Ties are impossible in practice (md5 over distinct ids); exact ties
    break by id ascending.  One ``_pkey`` co-partition; per partition a
    single sort + grouped cumcount — no per-key loop.  SQL twin:
    ``row_number() OVER (PARTITION BY key ORDER BY md5(id::VARCHAR), id)
    <= n``.
    """
    if n < 1:
        raise ValueError("n must be >= 1")

    def add_rank(t: pa.Table) -> pa.Table:
        from .rollup import _stable_pkey

        ids = t[id_col].to_numpy(zero_copy_only=False)
        h = np.array([hashlib.md5(str(v).encode()).hexdigest() for v in ids],
                     dtype=object)
        t = t.append_column("_h", pa.array(h, pa.string()))
        return t.append_column("_pkey", _stable_pkey(t[key], num_partitions))

    def pick_partition(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, "_h", id_col], kind="mergesort")
        r = df.groupby(key, sort=False).cumcount()
        return df[r < n].drop(columns=["_h", "_pkey"]).reset_index(drop=True)

    tagged = ds.map_batches(add_rank, batch_format="pyarrow")
    return tagged.groupby("_pkey").map_groups(pick_partition, batch_format="pandas")


def percent_rank(
    ds: Dataset,
    *,
    key: str,
    value_col: str,
    out_col: str = "pct_rank",
    num_partitions: int = 64,
) -> Dataset:
    """Per-key empirical-CDF rank transform: SQL ``percent_rank() OVER
    (PARTITION BY key ORDER BY value)`` = (rank − 1)/(n − 1) with ties
    sharing their MINIMUM rank — the robust, distribution-free
    normalization (uniform output whatever the input law), the
    rank-based sibling of ``standardize`` (reference analog: score
    thresholding by sorted rank position,
    experiments/keras_experiment.py:583-593 — the same
    select-by-rank, here emitted as a per-row feature).

    One co-partition; ranks vectorized: one sort by (key, value), run
    starts (key or value change) propagated with a cumulative max — no
    per-key loop.  Single-row keys get 0 (SQL convention).
    """

    def add_pkey(t: pa.Table) -> pa.Table:
        from .rollup import _stable_pkey

        return t.append_column("_pkey", _stable_pkey(t[key], num_partitions))

    def rank_partition(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=["_pkey"]).sort_values(
            [key, value_col], kind="mergesort").reset_index(drop=True)
        if len(df) == 0:
            df[out_col] = pd.Series([], dtype="float64")
            return df
        keys_all = df[key].to_numpy()
        vals = df[value_col].to_numpy()
        i = np.arange(len(df))
        key_change = np.zeros(len(df), dtype=bool)
        key_change[0] = True
        key_change[1:] = keys_all[1:] != keys_all[:-1]
        new_run = key_change.copy()
        new_run[1:] |= vals[1:] != vals[:-1]
        key_start = np.maximum.accumulate(np.where(key_change, i, 0))
        run_start = np.maximum.accumulate(np.where(new_run, i, 0))
        # n per key: next key start − key start
        starts = i[key_change]
        ends = np.concatenate([starts[1:], [len(df)]])
        n = (ends - starts)  # per group
        gid = np.cumsum(key_change) - 1
        n_row = n[gid].astype(np.float64)
        rank0 = (run_start - key_start).astype(np.float64)
        df[out_col] = np.where(n_row > 1, rank0 / (n_row - 1.0), 0.0)
        return df

    tagged = ds.map_batches(add_pkey, batch_format="pyarrow")
    return tagged.groupby("_pkey").map_groups(rank_partition, batch_format="pandas")


def impute_mean(
    ds: Dataset,
    *,
    key: str,
    value_col: str,
    out_col: str | None = None,
    num_partitions: int = 64,
) -> Dataset:
    """Missing-value imputation with the key's own mean: NULLs in
    ``value_col`` become ``avg(value)`` over the key's non-null rows —
    the standard gap-repair step before models that cannot consume NaN
    (the reference zero-pads or truncates incomplete segments for the
    same reason, reference TSFEDL/data.py:78-80; mean-fill is the
    value-column analog of that repair).

    SQL twin: ``coalesce(value, avg(value) OVER (PARTITION BY key))``.
    Keys whose values are ALL null stay null (SQL avg over nothing).
    One key-hash co-partition, fit+fill fused (grouped transform)."""
    out_col = out_col or f"{value_col}_filled"

    def add_pkey(t: pa.Table) -> pa.Table:
        from .rollup import _stable_pkey

        return t.append_column("_pkey", _stable_pkey(t[key], num_partitions))

    def fill_partition(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=["_pkey"]).reset_index(drop=True)
        means = df.groupby(key, sort=False)[value_col].transform("mean")
        df[out_col] = df[value_col].fillna(means)
        return df

    tagged = ds.map_batches(add_pkey, batch_format="pyarrow")
    return tagged.groupby("_pkey").map_groups(fill_partition, batch_format="pandas")


def holt_smooth(
    ds: Dataset,
    *,
    keys: list[str],
    order_by: list[str],
    col: str,
    alpha: float,
    beta: float,
    level_col: str = "holt_level",
    trend_col: str = "holt_trend",
    forecast_col: str = "holt_forecast",
    salt_every_us: int | None = None,
) -> Dataset:
    """Holt double-exponential smoothing per key in explicit order — the
    classical level+trend forecast baseline (the second-order sibling of
    :func:`ewma`):

        l₀ = x₀, b₀ = 0
        lᵢ = α·xᵢ + (1−α)(lᵢ₋₁ + bᵢ₋₁)
        bᵢ = β(lᵢ − lᵢ₋₁) + (1−β)bᵢ₋₁

    Emits the smoothed level, the trend estimate, and the one-step-ahead
    forecast ``l + b`` per row.  Every DL forecaster in the reference is
    benchmarked against exactly this class of classical baseline; the
    engine ships it as a first-class scan.

    The recurrence is a per-row fold (like the codec control loops,
    state/gorilla.py — same accepted cost class; vectorize via prefix
    matrix products if it ever leads a profile).  ``salt_every_us``:
    mega-key mode — state (l, b) evolves AFFINELY (sᵢ = A sᵢ₋₁ + cᵢ with
    constant A), so a chunk's effect is the composed affine map
    ``s_end = A^n s_in + v``: the summary is 6 floats (A^n in closed
    form via matrix power + the zero-state fold v) regardless of chunk
    size, and carries compose exactly; salted output equals unsalted to
    float64 association.
    """
    if not (0.0 < alpha <= 1.0 and 0.0 <= beta <= 1.0):
        raise ValueError(f"need 0<alpha<=1, 0<=beta<=1; got {alpha}, {beta}")

    A = np.array([[1 - alpha, 1 - alpha],
                  [-alpha * beta, 1 - alpha * beta]])

    def _fold(x: np.ndarray, s0: tuple[float, float] | None):
        """Run the recurrence; s0 None ⇒ series start (l=x0, b=0).
        Returns (levels, trends)."""
        n = len(x)
        l_out = np.empty(n)
        b_out = np.empty(n)
        if s0 is None:
            l, b = float(x[0]), 0.0
            l_out[0], b_out[0] = l, b
            start = 1
        else:
            l, b = s0
            start = 0
        for i in range(start, n):
            l_new = alpha * x[i] + (1 - alpha) * (l + b)
            b = beta * (l_new - l) + (1 - beta) * b
            l = l_new
            l_out[i], b_out[i] = l, b
        return l_out, b_out

    def _emit(g: pd.DataFrame, levels, trends) -> pd.DataFrame:
        g[level_col] = levels
        g[trend_col] = trends
        g[forecast_col] = levels + trends
        return g

    if salt_every_us is None:
        def holt_group(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values(order_by, kind="mergesort")
            levels, trends = _fold(g[col].to_numpy(dtype=np.float64), None)
            return _emit(g, levels, trends)

        from .grouped import grouped_apply

        return grouped_apply(ds, keys=keys, fn=holt_group)

    if len(keys) != 1:
        raise ValueError("salted holt_smooth requires a single key")
    from .salted import salted_scan

    ts_col = order_by[0]

    def summarize(g: pd.DataFrame) -> dict:
        x = g.sort_values(order_by, kind="mergesort")[col] \
            .to_numpy(dtype=np.float64)
        n = len(x)
        lv, tv = _fold(x, (0.0, 0.0))        # v = zero-state fold
        lf, tf = _fold(x, None)              # series-start variant
        M = np.linalg.matrix_power(A, n)
        return {"M": M.ravel().tolist(), "v": [lv[-1], tv[-1]],
                "first": [lf[-1], tf[-1]]}

    def step(carry: dict | None, s: dict) -> dict:
        if carry is None:
            return {"s": s["first"]}
        M = np.array(s["M"]).reshape(2, 2)
        out = M @ np.array(carry["s"]) + np.array(s["v"])
        return {"s": out.tolist()}

    def apply(g: pd.DataFrame, carry: dict | None) -> pd.DataFrame:
        if len(g) == 0:
            return g
        g = g.sort_values(order_by, kind="mergesort").reset_index(drop=True)
        s0 = tuple(carry["s"]) if carry else None
        levels, trends = _fold(g[col].to_numpy(dtype=np.float64), s0)
        return _emit(g, levels, trends)

    return salted_scan(
        ds, key=keys[0], ts_col=ts_col, salt_every_us=salt_every_us,
        summarize=summarize, step=step, apply=apply, order_by=order_by,
    )


def json_extract_scalar(
    ds: Dataset,
    *,
    col: str,
    path: str,
    out_col: str,
    cast_to: "pa.DataType | None" = None,
    keep_input: bool = False,
) -> Dataset:
    """Schema-flexible ingestion: extract a scalar JSON path from a
    string column (semi-structured event payloads — the ``props``
    pattern) as a vectorized kernel (polars' Rust ``json_path_match``;
    never a per-row ``json.loads`` loop).  Missing keys and malformed
    documents yield NULL (lenient, unlike SQL ``json_extract`` which
    errors on malformed input — quarantine bad rows upstream when that
    distinction matters).  ``cast_to`` casts the extracted string (e.g.
    ``pa.int64()``); failed casts raise (use a string target + derive
    for try-cast semantics).
    """
    import polars as pl

    def extract(t: pa.Table) -> pa.Table:
        s = pl.Series(t[col].combine_chunks())
        v = s.str.json_path_match(path).to_arrow()
        if cast_to is not None:
            v = pc.cast(v, cast_to)
        if not keep_input:
            t = t.drop_columns([col])
        return t.append_column(out_col, pc.cast(v, v.type))

    return ds.map_batches(extract, batch_format="pyarrow", zero_copy_batch=True)


def top_n_per_key(
    ds: Dataset,
    *,
    key: str,
    score_col: str,
    n: int,
    tiebreak_col: str | None = None,
    num_partitions: int = 64,
) -> Dataset:
    """The ``n`` highest-``score_col`` rows of each key (full rows) —
    the generic per-stratum selection (top documents per source, worst
    latencies per service); the score-ranked sibling of
    :func:`sample_per_key` and the row-level generalization of the
    count-based ``distinct.grouped_top_k``.  Ties rank by
    ``tiebreak_col`` ascending (required for determinism when scores
    can repeat).  One co-partition; sort + grouped cumcount, no per-key
    loop.  SQL twin: ``row_number() OVER (PARTITION BY key ORDER BY
    score DESC, tiebreak) <= n``."""
    if n < 1:
        raise ValueError("n must be >= 1")

    def add_pkey(t: pa.Table) -> pa.Table:
        from .rollup import _stable_pkey

        return t.append_column("_pkey", _stable_pkey(t[key], num_partitions))

    order = [key, score_col] + ([tiebreak_col] if tiebreak_col else [])
    asc = [True, False] + ([True] if tiebreak_col else [])

    def pick_partition(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(order, ascending=asc, kind="mergesort")
        r = df.groupby(key, sort=False).cumcount()
        return df[r < n].drop(columns=["_pkey"]).reset_index(drop=True)

    tagged = ds.map_batches(add_pkey, batch_format="pyarrow")
    return tagged.groupby("_pkey").map_groups(pick_partition, batch_format="pandas")


def standardize_per_key(
    ds: Dataset,
    *,
    key: str,
    value_col: str,
    out_col: str | None = None,
    num_partitions: int = 64,
) -> Dataset:
    """Per-key z-score: ``(value − key mean) / key stddev_samp`` — the
    grouped sibling of the global :func:`standardize` (each series
    normalized against ITSELF, the right scaling when keys live on
    different magnitudes).  NULL where the key has n < 2 or zero
    variance (SQL ``stddev_samp`` /0 semantics).  One key-hash
    co-partition, fit+scale fused (grouped transforms)."""
    out_col = out_col or f"{value_col}_zk"

    def add_pkey(t: pa.Table) -> pa.Table:
        from .rollup import _stable_pkey

        return t.append_column("_pkey", _stable_pkey(t[key], num_partitions))

    def scale_partition(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=["_pkey"]).reset_index(drop=True)
        g = df.groupby(key, sort=False)[value_col]
        mu = g.transform("mean")
        sd = g.transform("std")  # pandas std = sample std, ddof=1
        z = (df[value_col] - mu) / sd
        df[out_col] = np.where(np.isfinite(z), z, np.nan)
        return df

    tagged = ds.map_batches(add_pkey, batch_format="pyarrow")
    return tagged.groupby("_pkey").map_groups(scale_partition, batch_format="pandas")


def bollinger_bands(
    ds: Dataset,
    *,
    keys: list[str],
    order_by: list[str],
    col: str,
    window: int = 5,
    k: float = 2.0,
    num_partitions: int = 64,
    salt_every_us: int | None = None,
) -> Dataset:
    """Trailing Bollinger bands per key: rolling mean, rolling SAMPLE
    std and mean ± k·std over the ``window`` most recent rows
    (min_periods=1) — the volatility envelope version of
    :func:`rolling_mean` (reference moving_average,
    experiments/IGN_experiment.py:190-205, with a dispersion channel).

    Exactness discipline: the window stats are computed TWO-PASS from an
    explicit per-key shift matrix (window ≤ ~16), not a sliding
    accumulator — a constant window yields std exactly 0.0 (matching SQL
    ``stddev_samp`` zero-variance == 0.0; pandas' rolling accumulator
    can leak ~1e-6 cancellation noise there, which a 6-decimal
    comparator sees).  n == 1 windows give NULL std/bands (``stddev_samp``
    NULL for n < 2).  Appends ``bb_mean, bb_std, bb_upper, bb_lower``.

    One key-hash co-partition; the shift matrix is built with cython
    ``groupby.shift`` across all keys at once — no per-key Python.

    ``salt_every_us``: mega-key mode (stages/salted.py) — each time
    chunk carries only the previous chunks' last ``window−1`` values, so
    no partition ever holds a hot key's full history.  Output is EXACTLY
    equal to the unsalted path (every window sees identical contents and
    the stats are deterministic two-pass — no accumulator drift).
    """
    from .grouped import grouped_apply

    def _stats(m: np.ndarray, df: pd.DataFrame) -> pd.DataFrame:
        valid = ~np.isnan(m)
        n = valid.sum(axis=1).astype(np.float64)
        mean = np.nansum(m, axis=1) / n
        dev = m - mean[:, None]
        ss = np.nansum(dev * dev, axis=1)
        # constant window → EXACTLY 0 variance: the two-pass mean of k
        # identical floats need not be exact (mean([0.1]*3) ≠ 0.1), which
        # leaks ~1e-17 into ss, while SQL's Welford update is exactly 0
        # for identical values (delta = 0 every step)
        ss = np.where(np.nanmin(m, axis=1) == np.nanmax(m, axis=1), 0.0, ss)
        with np.errstate(invalid="ignore", divide="ignore"):
            std = np.where(n >= 2, np.sqrt(ss / np.maximum(n - 1.0, 1.0)), np.nan)
        df["bb_mean"] = mean
        df["bb_std"] = std
        df["bb_upper"] = mean + k * std
        df["bb_lower"] = mean - k * std
        return df

    if salt_every_us is not None:
        if len(keys) != 1:
            raise ValueError("salted bollinger requires a single key")
        from .salted import salted_scan

        ts_col = order_by[0]
        keep = window - 1

        def summarize(g: pd.DataFrame) -> dict:
            return {"tail": [float(v) for v in g[col].to_numpy()[-keep:]]
                    if keep else []}

        def step(carry: dict | None, s: dict) -> dict:
            prev = carry["tail"] if carry else []
            return {"tail": (prev + s["tail"])[-keep:] if keep else []}

        def apply(g: pd.DataFrame, carry: dict | None) -> pd.DataFrame:
            if len(g) == 0:
                return g
            g = g.sort_values(order_by, kind="mergesort")
            prev = np.asarray(carry["tail"] if carry else [], dtype=np.float64)
            v = np.concatenate([prev, g[col].to_numpy(dtype=np.float64)])

            def shifted(i: int) -> np.ndarray:
                if i >= len(v):
                    return np.full(len(v), np.nan)
                return np.concatenate([np.full(i, np.nan), v[:len(v) - i]])

            m = np.column_stack(
                [shifted(i) for i in range(window - 1, -1, -1)])[len(prev):]
            return _stats(m, g)

        return salted_scan(
            ds, key=keys[0], ts_col=ts_col, salt_every_us=salt_every_us,
            summarize=summarize, step=step, apply=apply, order_by=order_by,
        )

    def bb_partition(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(keys + order_by, kind="mergesort").reset_index(drop=True)
        if len(df) == 0:
            for c in ("bb_mean", "bb_std", "bb_upper", "bb_lower"):
                df[c] = pd.Series([], dtype="float64")
            return df
        g = df.groupby(keys, sort=False)[col]
        m = np.column_stack(
            [g.shift(i).to_numpy(dtype=np.float64) for i in range(window - 1, -1, -1)]
        )  # (n, window): oldest … current, NaN where the key lacks history
        return _stats(m, df)

    return grouped_apply(ds, keys=keys, fn=bb_partition,
                         num_partitions=num_partitions, whole_partition=True)


def priority_sample(
    ds: Dataset,
    *,
    id_col: str,
    k: int = 100,
    priority_col: str = "priority",
) -> Dataset:
    """Deterministic distributed uniform sample WITHOUT replacement:
    the ``k`` rows with the smallest ``md5(str(id))`` priority — the
    top-k-by-hash formulation of reservoir sampling, which (unlike an
    actual reservoir) is associative, so it runs as per-batch partial
    top-k + one tiny final merge, and the SAME rows are drawn at any
    cluster size, block layout, or rerun (md5, not a process-seeded
    hash — the :func:`hash_split` determinism contract).

    Output: the sampled input rows + ``priority_col`` (md5 hex),
    sorted by priority.  Per-row md5 is a Python map (no Arrow kernel
    exists); it touches at most ``batch`` rows before the partial
    top-k trims to k.
    """
    import hashlib

    def partial_topk(df: pd.DataFrame) -> pd.DataFrame:
        pr = df[id_col].map(
            lambda v: hashlib.md5(str(v).encode()).hexdigest())
        df = df.assign(**{priority_col: pr})
        # nsmallest rejects object dtype; hex strings sort lexicographically
        return df.sort_values(priority_col, kind="mergesort").head(k)

    def final_topk(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(priority_col, kind="mergesort").head(k) \
                 .reset_index(drop=True)

    return (
        ds.map_batches(partial_topk, batch_format="pandas")
        .repartition(1)
        .map_batches(final_topk, batch_format="pandas", batch_size=None)
    )


def loo_target_encoding(
    ds: Dataset,
    *,
    key_col: str,
    value_col: str,
    id_col: str,
    out_col: str = "loo_enc",
) -> Dataset:
    """Leave-one-out target encoding — the training-data feature op that
    replaces a categorical with the mean target of all OTHER rows in
    its category (plain category means leak the row's own label into
    its feature; LOO is the standard fix).  Rows with a NULL key are
    dropped (no category to encode); a NULL value yields a NULL
    encoding; a category with a single observed value yields NULL
    (nothing to leave out).

    Shape: one combiner fold to (category → int-cent sum, non-null
    count) — category-count-sized, collected once to the driver and
    shipped as a broadcast closure (the engine's small-side-lookup
    rule; categorical cardinality is bounded by design) — then a
    shuffle-free vectorized map over the fact rows.  Exactness: values
    fold as int cents (round-half-away, the house scaling), the
    per-row subtraction ``sum - cents`` is exact in float64 (both
    operands integer-valued < 2^53), and the two divisions mirror the
    SQL twin's expression tree; n−1 = 0 goes NULL via 0-division.

    Output: ``id_col, key_col, out_col`` per surviving input row.

    Reference analog: label-aware per-row derived features feeding the
    models (oneHotEncode in data.py — the leak-free numeric sibling).
    """
    import pyarrow.parquet  # noqa: F401  (keeps import graph explicit)

    from ..pipelines.relational import grouped_aggregate

    def fold(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t[key_col]))
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        cents = np.copysign(np.floor(np.abs(v) * 100.0 + 0.5), v)
        # NULL values contribute nothing to the sum (SQL sum skips them;
        # a NaN would poison the distributed float64 fold)
        cents = np.where(np.isnan(cents), 0.0, cents)
        return pa.table({
            key_col: t[key_col],
            "sum_c": pa.array(cents, pa.float64()),
            "n_v": pc.cast(pc.is_valid(t[value_col]), pa.int64()),
        })

    folded = grouped_aggregate(
        ds.map_batches(fold, batch_format="pyarrow", zero_copy_batch=True),
        keys=[key_col],
        aggs={"sum_c": ("sum_c", "sum"), "n_v": ("n_v", "sum")},
        num_partitions=4).take_all()
    sum_map = {r[key_col]: np.float64(r["sum_c"]) for r in folded}
    n_map = {r[key_col]: np.float64(r["n_v"]) for r in folded}

    def enc(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df[key_col].notna()]
        v = df[value_col].to_numpy(dtype=np.float64)
        cents = np.copysign(np.floor(np.abs(v) * 100.0 + 0.5), v)
        sums = df[key_col].map(sum_map).to_numpy(dtype=np.float64)
        ns = df[key_col].map(n_map).to_numpy(dtype=np.float64)
        # fixed expression tree — keep in lockstep with the SQL twin
        with np.errstate(invalid="ignore", divide="ignore"):
            out = ((sums - cents) / (ns - 1.0)) / 100.0
        out[~np.isfinite(out)] = np.nan
        return pd.DataFrame({
            id_col: df[id_col].to_numpy(),
            key_col: df[key_col].to_numpy(),
            out_col: out,
        })

    return ds.map_batches(enc, batch_format="pandas")
