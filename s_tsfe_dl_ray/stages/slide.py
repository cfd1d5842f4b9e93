"""Sliding-window feature extraction: the reference's window generator
re-expressed as a per-key batch operator.

Reference semantics (timeseries_batch_generator.py:186-299): cut windows
of ``length`` from each ordered series with ``stride`` between window
starts and ``sampling_rate`` dilation WITHIN the window (every r-th
timestep), full windows only; the engine emits one ROW per window
instance with vectorized summary features instead of a (B, L, V) tensor
— the windowed-convolution view of the same computation
(models_keras.py:137-142).

Execution shape: one coarse ``_pkey`` shuffle co-locates each key's rows
(``stages/grouped.grouped_apply``), then pandas ``rolling`` computes all
window stats vectorized and a stride mask selects the emitted windows —
never one Python call per window.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from ray.data import Dataset


class _SlideGroup:
    def __init__(self, order_by, value_col, length, stride, sampling_rate, stats):
        self.order_by = order_by
        self.value_col = value_col
        self.length = length
        self.stride = stride
        self.sampling_rate = sampling_rate
        self.stats = stats

    def __call__(self, g: pd.DataFrame) -> pd.DataFrame:
        L, S, r = self.length, self.stride, self.sampling_rate
        g = g.sort_values(self.order_by, kind="mergesort").reset_index(drop=True)
        v = g[self.value_col].astype("float64")
        span = (L - 1) * r + 1  # rows covered by a dilated window
        n = len(g)
        pos = np.arange(n)
        # window END positions: full windows only, every S-th start
        keep = (pos >= span - 1) & ((pos - (span - 1)) % S == 0)
        if r == 1:
            roll = v.rolling(L)
            feats = {s: getattr(roll, s)().to_numpy() for s in self.stats}
        else:
            # dilated window = every r-th element of the span, ending at pos:
            # stack the r phase-shifted strided views and reduce vectorized
            vv = v.to_numpy()
            idx_end = pos[keep]
            take = idx_end[:, None] - np.arange(L - 1, -1, -1)[None, :] * r
            windows = vv[take]  # (n_windows, L)
            agg = {"mean": np.mean, "min": np.min, "max": np.max,
                   "sum": np.sum, "std": lambda a, axis: np.std(a, axis=axis, ddof=1)}
            feats_sel = {s: agg[s](windows, axis=1) for s in self.stats}
        out = g.loc[keep, [c for c in g.columns if c != self.value_col]].copy()
        out["window_end_" + self.value_col] = v.to_numpy()[keep]
        for s in self.stats:
            col = f"{self.value_col}_w{s}"
            out[col] = feats[s][keep] if r == 1 else feats_sel[s]
        return out.reset_index(drop=True)


_NP_AGG = {"mean": np.mean, "min": np.min, "max": np.max, "sum": np.sum,
           "std": lambda a, axis: np.std(a, axis=axis, ddof=1)}


def sliding_window_features(
    ds: Dataset,
    *,
    keys: list[str],
    order_by: list[str],
    value_col: str,
    length: int,
    stride: int = 1,
    sampling_rate: int = 1,
    stats: tuple[str, ...] = ("mean", "min", "max"),
    salt_every_us: int | None = None,
) -> Dataset:
    """Per-key sliding windows → one feature row per window instance.

    ``length``/``stride``/``sampling_rate`` follow the reference's window
    generator exactly: windows end at ordered positions
    ``span-1, span-1+stride, ...`` with ``span = (length-1)*sampling_rate
    + 1`` (full windows only); dilation takes every ``sampling_rate``-th
    row within the span.  ``stats`` ⊆ {mean, min, max, sum, std}.

    ``salt_every_us``: mega-key mode (stages/salted.py) — no partition
    ever holds a whole key.  Windows whose span crosses chunk boundaries
    read their earlier values from a HALO carried by the per-key fold:
    the carry is the running row count (window emission positions are
    global) plus the last ``span−1`` values seen so far, so a chunk
    shorter than a window still works.  Requires a single key whose
    first ``order_by`` column is the timestamp.  The mean/std kernels in
    this mode are numpy reductions — identical to the unsalted
    ``sampling_rate>1`` path; vs the unsalted ``sampling_rate==1``
    pandas-rolling path they can differ in the last float64 ulp.
    """
    inst = _SlideGroup(order_by, value_col, length, stride, sampling_rate, stats)
    if salt_every_us is None:
        from .grouped import grouped_apply

        return grouped_apply(ds, keys=keys, fn=inst)

    if len(keys) != 1:
        raise ValueError("salted sliding_window_features requires a single key")
    from .salted import salted_scan

    L, S, r = length, stride, sampling_rate
    span = (L - 1) * r + 1
    ts_col = order_by[0]

    def summarize(g: pd.DataFrame) -> dict:
        v = g[value_col].astype("float64")
        return {"n": int(len(g)),
                "tail": v.iloc[-(span - 1):].tolist() if span > 1 else []}

    def step(carry: dict | None, s: dict) -> dict:
        prev = carry or {"n": 0, "tail": []}
        tail = (prev["tail"] + s["tail"])[-(span - 1):] if span > 1 else []
        return {"n": prev["n"] + s["n"], "tail": tail}

    def apply(g: pd.DataFrame, carry: dict | None) -> pd.DataFrame:
        g = g.sort_values(order_by, kind="mergesort").reset_index(drop=True)
        n_before = carry["n"] if carry else 0
        tail = np.asarray(carry["tail"], dtype="float64") if carry else np.empty(0)
        v = g[value_col].astype("float64").to_numpy()
        vv = np.concatenate([tail, v])
        off = len(tail)
        gpos = n_before + np.arange(len(g))
        keep = (gpos >= span - 1) & ((gpos - (span - 1)) % S == 0)
        idx_end = np.flatnonzero(keep)
        take = (off + idx_end)[:, None] - np.arange(L - 1, -1, -1)[None, :] * r
        windows = vv[take]  # (n_windows, L)
        out = g.loc[keep, [c for c in g.columns if c != value_col]].copy()
        out["window_end_" + value_col] = v[idx_end]
        for s in stats:
            out[f"{value_col}_w{s}"] = _NP_AGG[s](windows, axis=1)
        return out.reset_index(drop=True)

    return salted_scan(
        ds, key=keys[0], ts_col=ts_col, salt_every_us=salt_every_us,
        summarize=summarize, step=step, apply=apply, order_by=order_by,
    )


class _ReverseGroup:
    def __init__(self, order_by):
        self.order_by = order_by

    def __call__(self, g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(self.order_by, kind="mergesort")
        g = g.iloc[::-1].reset_index(drop=True)
        g["rev_idx"] = np.arange(len(g), dtype=np.int64)
        return g


def reverse_series(ds: Dataset, *, keys: list[str], order_by: list[str]) -> Dataset:
    """Reverse each key's series (reference ``samples[:, ::-1, ...]``,
    timeseries_batch_generator.py:296-298): rows re-emitted in reverse
    ``order_by`` order with an explicit ``rev_idx`` position column (the
    engine never relies on block arrival order, so the reversal is
    carried as data)."""
    from .grouped import grouped_apply

    return grouped_apply(ds, keys=keys, fn=_ReverseGroup(order_by))


def window_pairs(
    ds: Dataset,
    *,
    keys: list[str],
    order_by: list[str],
    value_col: str | None = None,
    value_cols: list[str] | None = None,
    length: int,
    length_target: int,
    stride: int = 1,
    sampling_rate: int = 1,
    num_partitions: int = 64,
) -> Dataset:
    """Supervised (input-window, label-window) pair generator — the
    reference's forecasting batch generator re-expressed as a Dataset
    fan-out (timeseries_batch_generator.py:186-299): per key, order the
    series by ``order_by`` and for every anchor position ``p`` (0-based
    within the key) with ``length <= p <= n - 1 - length_target`` (the
    reference's ``end_index = len(data) - 1 - length_target`` bound —
    it deliberately leaves the final timestep out of every label) and
    ``(p - length) % stride == 0``, emit

        input_win  = v[p - length : p : sampling_rate]
        label_win  = v[p : p + length_target : sampling_rate]

    exactly the reference's ``data[row-length:row:r]`` /
    ``targets[row:row+length_target:r]`` slices — the aligned
    feature/label window pairs a downstream trainer consumes, carried as
    Arrow ``list`` columns instead of a driver-held (B, L, V) tensor.

    ``value_cols`` (multi-feature series — the reference's V-wide
    timestep): one ``input_<col>`` / ``label_<col>`` list-column pair
    per feature.  With the single ``value_col`` form the output keeps
    the ``input_win`` / ``label_win`` names.  ``length_target=0`` is
    the reference's autoencoder behaviour (``length_target`` forced to
    0, targets = the input windows): label columns equal the input
    windows and anchors run to the end of the series.

    Execution shape: ONE ``_pkey`` exchange co-locates each key's rows
    (``grouped_apply`` whole-partition), then anchor selection and both
    window gathers are single vectorized numpy ``take`` matrices across
    ALL keys of the partition — no per-key or per-window Python.  Memory
    per partition is O(rows · length/stride) for the emitted pairs
    (inherent to the fan-out; pick ``stride`` ≥ 1 to bound it, exactly
    like the reference's stride argument).

    Output: ``keys…, anchor_idx, input_win, label_win`` with window
    values in series order.  Keys shorter than ``length +
    length_target`` emit no rows (no partial windows, matching the
    reference's ``start_index > end_index`` guard).
    """
    from .grouped import grouped_apply

    L, Lt, S, r = length, length_target, stride, sampling_rate
    if L < 1 or Lt < 0 or S < 1 or r < 1:
        raise ValueError("length >= 1, length_target >= 0, stride and "
                         "sampling_rate >= 1 required")
    if (value_col is None) == (value_cols is None):
        raise ValueError("pass exactly one of value_col / value_cols")
    single = value_cols is None
    vcols = [value_col] if single else list(value_cols)
    names = ([("input_win", "label_win")] if single
             else [(f"input_{c}", f"label_{c}") for c in vcols])
    key = keys[0]

    def pairs_partition(df: pd.DataFrame) -> pd.DataFrame:
        return window_pairs_frame(
            df, keys=keys, order_by=order_by, vcols=vcols, names=names,
            length=L, length_target=Lt, stride=S, sampling_rate=r)

    return grouped_apply(ds, keys=[key], fn=pairs_partition,
                         num_partitions=num_partitions,
                         whole_partition=True)


def window_pairs_frame(
    df: pd.DataFrame,
    *,
    keys: list[str],
    order_by: list[str],
    vcols: list[str],
    names: list[tuple[str, str]],
    length: int,
    length_target: int,
    stride: int,
    sampling_rate: int,
) -> pd.DataFrame:
    """The key-complete window-pair kernel shared by the
    :func:`window_pairs` stage (behind its ``_pkey`` exchange) and the
    durable export job (whose bucket grouping already co-locates each
    key's rows) — one vectorized pass over ALL keys of the frame."""
    L, Lt, S, r = length, length_target, stride, sampling_rate
    key = keys[0]
    empty = pd.DataFrame({
        **{k: pd.Series([], dtype=df[k].dtype if k in df else "object")
           for k in keys},
        "anchor_idx": pd.Series([], dtype="int64"),
        **{n: pd.Series([], dtype="object")
           for pair in names for n in pair}})
    if len(df) == 0:
        return empty
    df = df.sort_values(keys + order_by, kind="mergesort")
    k_all = df[key].to_numpy()
    change = np.flatnonzero(k_all[1:] != k_all[:-1]) + 1
    starts = np.concatenate([[0], change, [len(df)]])
    gid = np.repeat(np.arange(len(starts) - 1), np.diff(starts))
    pos = np.arange(len(df)) - starts[:-1][gid]       # key-local 0-based
    nloc = np.diff(starts)[gid]                        # key length
    # reference bound: p <= n - 1 - Lt (end_index excludes the final
    # timestep from labels; for Lt = 0 this is simply p <= n - 1)
    anchors = np.flatnonzero(
        (pos >= L) & (pos + Lt < nloc) & ((pos - L) % S == 0))
    if len(anchors) == 0:
        return empty
    in_take = anchors[:, None] + np.arange(-L, 0, r)[None, :]
    lab_take = (in_take if Lt == 0 else
                anchors[:, None] + np.arange(0, Lt, r)[None, :])
    out = df.iloc[anchors][keys].reset_index(drop=True)
    out["anchor_idx"] = pos[anchors]
    for c, (in_name, lab_name) in zip(vcols, names):
        v = df[c].to_numpy()
        out[in_name] = list(v[in_take])
        out[lab_name] = list(v[lab_take])
    return out
