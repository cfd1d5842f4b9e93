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
    def __init__(self, col: str, out_col: str, window: int, order_by: list[str]):
        self.col, self.out_col, self.window, self.order_by = col, out_col, window, order_by

    def __call__(self, g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(self.order_by, kind="mergesort")
        g[self.out_col] = (
            g[self.col].rolling(self.window, min_periods=1).mean()
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
    if salt_every_us is None:
        inst = _RollingGroup(col, out_col, window, order_by)
        from .grouped import grouped_apply

        return grouped_apply(ds, keys=keys, fn=inst)

    if len(keys) != 1:
        raise ValueError("salted rolling_mean requires a single key")
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
        r = s.rolling(window, min_periods=1).mean()
        g[out_col] = r.iloc[len(prev):].to_numpy()
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
