"""Symbolic / piecewise series compression: PAA and SAX.

The reference compresses series with pooling layers (AvgPooling1D tier
downsampling, TSFEDL/blocks_keras.py:96 — mean per fixed-length window);
PAA (Piecewise Aggregate Approximation) is exactly that operation as a
data transform, and SAX (Symbolic Aggregate approXimation, Lin et al.
2003) quantizes the PAA means into a small gaussian-breakpoint alphabet —
the standard symbolic form for motif mining / cheap similarity over
massive series corpora.

Scale design: one ``_pkey`` co-partition by series key; segment ids,
segment means and per-key z-normalization are all cython/numpy kernels
over the whole partition (no per-key Python).  The output is ~n/seg_len
rows per key — PAA is itself the downsample you run BEFORE quadratic
per-key ops (stages/robust.theil_sen, DTW-style matchers).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from ray.data import Dataset

from .grouped import grouped_apply

# gaussian quartile breakpoints for a 4-symbol alphabet: norm.ppf(q) for
# q = 1/4, 2/4, 3/4 — written as literals so the SQL twin can embed the
# identical constants
BREAKPOINTS_4 = (-0.6744897501960817, 0.0, 0.6744897501960817)
ALPHABET_4 = ("a", "b", "c", "d")


def _sorted_with_segments(df: pd.DataFrame, key: str, order_by: list[str],
                          seg_len: int) -> tuple[pd.DataFrame, np.ndarray]:
    df = df.sort_values([key] + order_by, kind="mergesort")
    pos = df.groupby(key, sort=False).cumcount().to_numpy()
    return df, pos // seg_len


def paa(
    ds: Dataset,
    *,
    key: str,
    order_by: list[str],
    value_col: str,
    seg_len: int,
    num_partitions: int = 64,
) -> Dataset:
    """Piecewise Aggregate Approximation: per key in explicit order,
    chunk rows into consecutive segments of ``seg_len`` and emit each
    segment's mean (the trailing ragged segment keeps its partial count —
    'same'-edge behavior, like the reference's pooling with partial final
    window).  Output: ``key, seg, n_in_seg, seg_mean``.
    """

    def paa_partition(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({key: [], "seg": pd.Series([], dtype="int64"),
                                 "n_in_seg": pd.Series([], dtype="int64"),
                                 "seg_mean": []})
        df, seg = _sorted_with_segments(df, key, order_by, seg_len)
        out = (
            df.assign(seg=seg)
            .groupby([key, "seg"], sort=False)[value_col]
            .agg(n_in_seg="size", seg_mean="mean")
            .reset_index()
        )
        out["seg"] = out["seg"].astype(np.int64)
        out["n_in_seg"] = out["n_in_seg"].astype(np.int64)
        return out

    return grouped_apply(ds, keys=[key], fn=paa_partition,
                         num_partitions=num_partitions, whole_partition=True)


def sax(
    ds: Dataset,
    *,
    key: str,
    order_by: list[str],
    value_col: str,
    seg_len: int,
    num_partitions: int = 64,
) -> Dataset:
    """SAX symbols: z-normalize each key's series by its OWN mean and
    sample std, PAA it, and bin each segment mean at the gaussian
    quartile breakpoints into letters ``a<b<c<d``.

    Keys that cannot be z-normalized (n < 2 → sample std NULL, or zero
    variance → x/0) yield NULL symbols — mirroring SQL ``stddev_samp``
    NULL-for-n<2 / float-division-by-zero-is-NULL semantics, with the
    NULL propagated explicitly (never falling through to the last
    alphabet bucket).  Output: ``key, seg, n_in_seg, symbol``.
    """
    b1, b2, b3 = BREAKPOINTS_4

    def sax_partition(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({key: [], "seg": pd.Series([], dtype="int64"),
                                 "n_in_seg": pd.Series([], dtype="int64"),
                                 "symbol": pd.Series([], dtype="object")})
        df, seg = _sorted_with_segments(df, key, order_by, seg_len)
        g = df.groupby(key, sort=False)[value_col]
        mean = df[key].map(g.mean())
        std = df[key].map(g.std(ddof=1))  # sample std; NaN for n<2
        out = (
            df.assign(seg=seg, _mean=mean.to_numpy(), _std=std.to_numpy())
            .groupby([key, "seg"], sort=False)
            .agg(n_in_seg=(value_col, "size"), seg_mean=(value_col, "mean"),
                 _mean=("_mean", "first"), _std=("_std", "first"))
            .reset_index()
        )
        std = out["_std"].to_numpy()
        with np.errstate(invalid="ignore", divide="ignore"):
            z = (out["seg_mean"].to_numpy() - out["_mean"].to_numpy()) / std
        sym = np.full(len(z), ALPHABET_4[3], dtype=object)
        sym[z < b3] = ALPHABET_4[2]
        sym[z < b2] = ALPHABET_4[1]
        sym[z < b1] = ALPHABET_4[0]
        # n<2 (std NaN) or zero variance (x/0 → SQL NULL): explicit NULL,
        # never the last alphabet bucket
        sym[np.isnan(std) | (std == 0.0)] = None
        return pd.DataFrame({
            key: out[key],
            "seg": out["seg"].astype(np.int64),
            "n_in_seg": out["n_in_seg"].astype(np.int64),
            "symbol": sym,
        })

    return grouped_apply(ds, keys=[key], fn=sax_partition,
                         num_partitions=num_partitions, whole_partition=True)


def lttb(
    ds: Dataset,
    *,
    key: str,
    ts_col: str,
    value_col: str,
    n_out: int,
    id_col: str | None = None,
    num_partitions: int = 64,
) -> Dataset:
    """Largest-Triangle-Three-Buckets downsampling per key (Steinarsson
    2013): keep ``n_out`` visually-representative points — first and last
    anchored, each interior bucket contributing the point with the
    largest triangle area against the previously kept point and the next
    bucket's centroid.  THE standard series-downsample for dashboards /
    previews over tier rollups (where PAA's means would flatten spikes,
    LTTB keeps them).

    Keys with n ≤ n_out pass through unchanged.  Output: the original
    rows (all columns) of the selected points.

    One ``_pkey`` co-partition; buckets loop n_out−2 times per key with
    vectorized area math inside each bucket — O(n) per key total.  Like
    every viz downsample it is deliberately NOT SQL-expressible (the
    selected point depends recursively on the previous selection), so it
    is property-tested (anchors kept, count exact, spike retention)
    rather than oracle-paired.
    """
    if n_out < 3:
        raise ValueError("n_out must be >= 3 (first + last + 1 bucket)")
    order_by = [ts_col] + ([id_col] if id_col else [])

    def lttb_partition(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return df
        df = df.sort_values([key] + order_by, kind="mergesort").reset_index(drop=True)
        k_all = df[key].to_numpy()
        change = np.flatnonzero(k_all[1:] != k_all[:-1]) + 1
        starts = np.concatenate([[0], change, [len(df)]])
        ts = df[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        v = df[value_col].to_numpy(dtype=np.float64)
        keep_idx: list[int] = []
        for s, e in zip(starts[:-1], starts[1:]):
            n = e - s
            if n <= n_out:
                keep_idx.extend(range(s, e))
                continue
            x = (ts[s:e] - ts[s]) / 1e6
            y = v[s:e]
            # bucket b covers [edges[b], edges[b+1]) of the interior points
            edges = np.linspace(1, n - 1, n_out - 1).astype(np.int64)
            sel = [0]
            a = 0
            for b in range(n_out - 2):
                lo, hi = edges[b], edges[b + 1]
                # next-bucket centroid (last bucket's "next" is the final point)
                if b < n_out - 3:
                    cx = x[edges[b + 1]:edges[b + 2]].mean()
                    cy = y[edges[b + 1]:edges[b + 2]].mean()
                else:
                    cx, cy = x[n - 1], y[n - 1]
                area = np.abs((x[a] - cx) * (y[lo:hi] - y[a])
                              - (x[a] - x[lo:hi]) * (cy - y[a]))
                a = lo + int(np.argmax(area))
                sel.append(a)
            sel.append(n - 1)
            keep_idx.extend(s + np.asarray(sel, dtype=np.int64))
        return df.iloc[np.asarray(sorted(keep_idx), dtype=np.int64)] \
            .reset_index(drop=True)

    return grouped_apply(ds, keys=[key], fn=lttb_partition,
                         num_partitions=num_partitions, whole_partition=True)
