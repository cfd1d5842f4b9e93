"""M4 visualization downsample: per (key, window) min/max/first/last
with the timestamps where they occur.

The reference's pooled downsample cascade keeps only a pooled statistic
per window (models_keras.py:59-63 MaxPooling1D); plotting and anomaly
triage additionally need WHERE the extreme happened.  M4 (Jugel et al.,
VLDB 2014) is the published error-free line-chart downsample: keeping
(first, last, min, max) per pixel-column reproduces the rendered line
exactly while reducing a 100 TB series to screen-width rows.

Scale design: one exchange.  Each batch reduces to one row per
(key, window) carrying the four (value, ts) extreme PAIRS; pairs merge
lexicographically (min/max over tuples is associative), so the combiner
output is exact under any batching/partitioning.

Determinism under ties (mirrors the oracle's ``min/max(struct(v, t))`` /
``min/max(struct(t, v))`` lexicographic semantics):

- ``ts_at_min``: earliest ts among rows attaining the window min;
- ``ts_at_max``: latest ts among rows attaining the window max;
- ``v_first``/``v_last``: smallest/largest value among rows sharing the
  earliest/latest ts.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data import Dataset

from ..functions.windows import window_start_us
from .rollup import _stable_pkey

_PAIR_COLS = [
    "v_min", "ts_at_min", "v_max", "ts_at_max",
    "v_first", "ts_first", "v_last", "ts_last",
]


def _extreme_pairs(df: pd.DataFrame, keys: list[str]) -> pd.DataFrame:
    """Vectorized per-group extreme pairs via sort + first/last — no
    Python per-key loop (three stable C sorts per table)."""
    by_v = df.sort_values(["_v", "_t"], kind="mergesort")
    g = by_v.groupby(keys, sort=False)
    vmin = g[["_v", "_t"]].first().rename(columns={"_v": "v_min", "_t": "ts_at_min"})
    vmax = g[["_v", "_t"]].last().rename(columns={"_v": "v_max", "_t": "ts_at_max"})
    by_t = df.sort_values(["_t", "_v"], kind="mergesort")
    g = by_t.groupby(keys, sort=False)
    first = g[["_v", "_t"]].first().rename(columns={"_v": "v_first", "_t": "ts_first"})
    last = g[["_v", "_t"]].last().rename(columns={"_v": "v_last", "_t": "ts_last"})
    n = df.groupby(keys, sort=False).size().rename("n_rows")
    out = pd.concat([n, vmin, vmax, first, last], axis=1).reset_index()
    return out


def m4_downsample(
    ds: Dataset,
    *,
    key: str,
    ts_col: str,
    value_col: str,
    tier: str = "1h",
    num_partitions: int = 64,
) -> Dataset:
    """M4 downsample of ``value_col`` to one row per (key, ``tier`` window).

    Output columns: ``key, window_start (timestamp[us]), n_rows`` + the
    four (value, ts) extreme pairs (``v_min, ts_at_min, v_max, ts_at_max,
    v_first, ts_first, v_last, ts_last``).
    """
    keys = [key, "window_start"]

    def partial(t: pa.Table) -> pa.Table:
        ws = window_start_us(t[ts_col], tier)
        df = pd.DataFrame({
            key: t[key].to_numpy(zero_copy_only=False),
            "window_start": ws.to_numpy(zero_copy_only=False),
            "_v": t[value_col].to_numpy(zero_copy_only=False).astype(np.float64),
            "_t": t[ts_col].to_numpy(zero_copy_only=False)
                  .astype("datetime64[us]").astype(np.int64),
        })
        out = _extreme_pairs(df, keys)
        tbl = pa.Table.from_pandas(out, preserve_index=False)
        return tbl.append_column("_pkey", _stable_pkey(tbl[key], num_partitions))

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        # re-reduce partial extreme pairs: stack each pair kind into the
        # same (_v, _t) long layout and reuse the batch kernel — the merge
        # is exact because lexicographic min/max over pairs is associative
        parts = {
            "v_min": ("v_min", "ts_at_min"), "v_max": ("v_max", "ts_at_max"),
            "v_first": ("v_first", "ts_first"), "v_last": ("v_last", "ts_last"),
        }
        merged: dict[str, pd.DataFrame] = {}
        for kind, (vc, tc) in parts.items():
            sub = df[keys + [vc, tc]].rename(columns={vc: "_v", tc: "_t"})
            if kind == "v_min":
                s = sub.sort_values(["_v", "_t"], kind="mergesort")
                picked = s.groupby(keys, sort=False).first()
            elif kind == "v_max":
                s = sub.sort_values(["_v", "_t"], kind="mergesort")
                picked = s.groupby(keys, sort=False).last()
            elif kind == "v_first":
                s = sub.sort_values(["_t", "_v"], kind="mergesort")
                picked = s.groupby(keys, sort=False).first()
            else:
                s = sub.sort_values(["_t", "_v"], kind="mergesort")
                picked = s.groupby(keys, sort=False).last()
            merged[kind] = picked.rename(columns={"_v": parts[kind][0],
                                                  "_t": parts[kind][1]})
        n = df.groupby(keys, sort=False)["n_rows"].sum()
        out = pd.concat([n] + list(merged.values()), axis=1).reset_index()
        out["window_start"] = out["window_start"].astype("datetime64[us]")
        for c in ("ts_at_min", "ts_at_max", "ts_first", "ts_last"):
            out[c] = out[c].astype("datetime64[us]")
        return out[keys + ["n_rows"] + _PAIR_COLS]

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_pkey")
        .map_groups(merge, batch_format="pandas")
    )
