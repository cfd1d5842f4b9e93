"""Per-key linear trend (OLS fit) as a one-exchange sketch aggregate.

The distributed analog of fitting a tiny model per series — the engine's
re-expression of the reference's per-recording training loop shape (one
model per patient record, experiments/keras_experiment.py:420-447): here
the "model" is the closed-form least-squares line value ~ time, fitted to
every key in one pass.  Drift/trend per key is the standard tier-timeseries
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
