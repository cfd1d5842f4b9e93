"""Gap-fill over tier tables: ffill + linear interpolation of empty windows.

The reference *excludes* windows that straddle discontinuities
(timeseries_batch_generator.py:231-256 ``filter_indices`` →
``_extend_indices`` removes every window touching a jump) and zero-pads
series edges (data.py:79-84).  The engine makes gaps first-class instead:
every tier window between a key's first and last observed window exists in
the output, flagged by ``fill_method``:

- ``observed`` — the window had input rows; stats as aggregated.
- ``ffill``    — empty window; carried columns copied from the most recent
                 observed window (forward fill).
- ``interp``   — empty window; carried columns linearly interpolated
                 between the neighboring observed windows by window
                 position (both neighbors always exist: the grid spans
                 min→max observed).

Count columns are 0 and sum columns 0 on gap windows (true facts);
min/max columns are NULL (no observations).  "Carried" columns (means,
rates — the continuous signals) get the fill treatment.

Scale: runs per key over *tier* rows (one row per window), not raw rows —
group size is bounded by the retention horizon (e.g. ≤ 1440 rows per conv
for a day of 1m windows), so ``groupby(key).map_groups`` is safe even for
hot keys.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from ray.data import Dataset

from ..functions.windows import TIER_US


def gapfill_frame(
    df: pd.DataFrame,
    *,
    keys: list[str],
    window_col: str,
    tier_us: int,
    count_cols: list[str],
    sum_cols: list[str],
    null_cols: list[str],
    carry_cols: list[str],
    mode: str,
) -> pd.DataFrame:
    """Grid completion + fill for ALL keys in one frame, fully vectorized
    (no per-key Python call — VERDICT r3 #6: the per-conversation pandas
    ``apply`` was the job-embedded gapfill's cost).

    Exactly the per-group semantics of the historical per-key kernel, run
    over every key segment at once:

    - sort by (keys, window); key segments found by consecutive compare;
    - the concatenated grid is built with one ``repeat``/``arange`` pass
      (grid row → segment via ``np.repeat``; window = seg_lo + pos·tier);
    - observed rows scatter into their exact grid slots (windows are
      tier-aligned, so the slot index is ``(ws - seg_lo) / tier``);
    - ffill uses a global last-observed-index ``maximum.accumulate`` and
      interp a global prev/next ``searchsorted`` — both are segment-safe
      WITHOUT masks because every segment's first and last grid rows are
      observed by construction (the grid spans min→max observed), so a
      fill can never reach across a key boundary;
    - interp arithmetic is the exact SQL-oracle shape
      (``prev + (next-prev)·Δ/Δtot`` in epoch seconds), unchanged.

    Rows come back in (keys, window) sorted order (the historical kernel
    preserved first-appearance key order; every consumer sorts or compares
    order-insensitively).  Gap rows: counts/sums 0, min/max-style
    ``null_cols`` NaN (float64), ``carry_cols`` filled per ``mode``.
    """
    w = window_col
    if len(df) == 0:
        out = df.copy()
        out["fill_method"] = pd.Series(dtype="object")
        return out
    ws_in = df[w].astype("datetime64[us]").astype("int64").to_numpy()
    order = np.lexsort((ws_in, *[df[k].to_numpy() for k in reversed(keys)]))
    df = df.iloc[order]
    ws = ws_in[order]
    kvals = [df[k].to_numpy() for k in keys]
    n = len(df)
    newseg = np.zeros(n, dtype=bool)
    newseg[0] = True
    for v in kvals:
        newseg[1:] |= v[1:] != v[:-1]
    seg_id = np.cumsum(newseg) - 1
    seg_starts = np.flatnonzero(newseg)
    seg_ends = np.append(seg_starts[1:], n) - 1
    lo, hi = ws[seg_starts], ws[seg_ends]
    m = (hi - lo) // tier_us + 1  # grid rows per segment
    offs = np.concatenate([[0], np.cumsum(m)])
    total = int(offs[-1])
    gseg = np.repeat(np.arange(len(seg_starts)), m)
    gws = lo[gseg] + (np.arange(total) - offs[gseg]) * tier_us
    slot = offs[seg_id] + (ws - lo[seg_id]) // tier_us
    observed = np.zeros(total, dtype=bool)
    observed[slot] = True

    def scatter(v: np.ndarray, fill, dtype) -> np.ndarray:
        out = np.full(total, fill, dtype=dtype)
        out[slot] = v
        return out

    cols: dict[str, np.ndarray] = {}
    for k, v in zip(keys, kvals):
        cols[k] = v[np.repeat(seg_starts, m)]
    filled_carry: dict[str, np.ndarray] = {}
    carry_vals = {c: scatter(df[c].astype("float64").to_numpy(), np.nan, "float64")
                  for c in carry_cols}
    if mode == "ffill":
        last_obs = np.where(observed, np.arange(total), 0)
        np.maximum.accumulate(last_obs, out=last_obs)
        for c, v in carry_vals.items():
            filled_carry[c] = v[last_obs]
    elif mode == "interp":
        gidx = np.arange(total)
        obs_idx = gidx[observed]
        prev_i = obs_idx[np.searchsorted(obs_idx, gidx, side="right") - 1]
        next_i = obs_idx[np.searchsorted(obs_idx, gidx, side="left")]
        w_sec = gws / 1e6
        dw = w_sec - w_sec[prev_i]
        dwtot = w_sec[next_i] - w_sec[prev_i]
        dwtot_safe = np.where(observed, 1.0, dwtot)
        for c, v in carry_vals.items():
            prev_v, next_v = v[prev_i], v[next_i]
            filled_carry[c] = np.where(
                observed, v, prev_v + (next_v - prev_v) * dw / dwtot_safe
            )
    else:
        raise ValueError(f"unknown gap-fill mode {mode!r}")

    out = pd.DataFrame(index=pd.RangeIndex(total))
    for c in df.columns:  # preserve the input column order
        if c == w:
            out[c] = pd.to_datetime(gws, unit="us")
        elif c in keys:
            out[c] = cols[c]
        elif c in carry_cols:
            out[c] = filled_carry[c]
        elif c in count_cols or c in sum_cols:
            dt = "int64" if df[c].dtype.kind in "iu" else df[c].dtype
            out[c] = scatter(df[c].to_numpy(), 0, dt)
        else:  # null_cols and any ride-along column: NaN on gaps
            out[c] = scatter(df[c].astype("float64").to_numpy(), np.nan, "float64")
    out["fill_method"] = np.where(observed, "observed", mode)
    return out


class _GapFillGroup:
    """Per-key grid completion + fill (pandas, vectorized within group)."""

    def __init__(
        self,
        keys: list[str],
        window_col: str,
        tier_us: int,
        count_cols: list[str],
        sum_cols: list[str],
        null_cols: list[str],
        carry_cols: list[str],
        mode: str,
    ):
        self.keys = keys
        self.window_col = window_col
        self.tier_us = tier_us
        self.count_cols = count_cols
        self.sum_cols = sum_cols
        self.null_cols = null_cols
        self.carry_cols = carry_cols
        self.mode = mode

    def __call__(self, g: pd.DataFrame) -> pd.DataFrame:
        # single shared kernel (a one-key group is one segment of it)
        return gapfill_frame(
            g,
            keys=self.keys,
            window_col=self.window_col,
            tier_us=self.tier_us,
            count_cols=self.count_cols,
            sum_cols=self.sum_cols,
            null_cols=self.null_cols,
            carry_cols=self.carry_cols,
            mode=self.mode,
        )


def gapfill(
    tier_ds: Dataset,
    *,
    keys: list[str],
    tier: str,
    window_col: str = "window_start",
    count_cols: list[str],
    sum_cols: list[str],
    null_cols: list[str],
    carry_cols: list[str],
    mode: str = "ffill",
    salt_every_us: int | None = None,
) -> Dataset:
    """Complete each key's window grid and fill gaps (see module doc).

    ``salt_every_us``: mega-key mode (stages/salted.py).  When set, no
    partition ever holds more than one time-chunk of a key: each chunk
    fills its own slice of the global grid, anchored by its nearest
    observed neighbors OUTSIDE the chunk (previous chunk's last observed
    row and next chunk's first — both directions, because ``interp``
    needs lookahead), which travel as tiny fold carries.  Time ranges a
    gap spans entirely (chunks with zero input rows) are emitted by the
    fold so their grid rows still exist.  Output equals the unsalted
    operator exactly (same neighbor windows → bit-identical interp
    arithmetic).  Requires a single key.
    """
    if mode not in ("ffill", "interp"):
        raise ValueError(f"unknown gap-fill mode {mode!r}; expected 'ffill' or 'interp'")
    tier_us = TIER_US[tier]
    inst = _GapFillGroup(
        keys, window_col, tier_us, count_cols, sum_cols, null_cols, carry_cols, mode
    )
    if salt_every_us is None:
        from .grouped import grouped_apply

        # whole_partition: ONE vectorized gapfill_frame call per partition
        # (all of its keys at once) instead of a pandas groupby.apply
        # Python call per key
        return grouped_apply(tier_ds, keys=keys, fn=inst, whole_partition=True)

    if len(keys) != 1:
        raise ValueError("salted gapfill requires a single key")
    import pyarrow as pa
    import pyarrow.compute as pc

    from .salted import salted_scan

    key, w = keys[0], window_col

    def to_us(t: pa.Table) -> pa.Table:
        # _chunk_tag casts the ts column to int64 verbatim — a
        # ns-precision window column would mis-chunk by 1000×
        i = t.column_names.index(w)
        return t.set_column(i, w, pc.cast(t[w], pa.timestamp("us")))

    tier_ds = tier_ds.map_batches(to_us, batch_format="pyarrow")

    def _vals(row: pd.Series) -> dict:
        return {c: (None if pd.isna(row[c]) else float(row[c])) for c in carry_cols}

    def summarize(g: pd.DataFrame) -> dict:
        wus = g[w].astype("datetime64[us]").astype("int64")
        return {
            "fw": int(wus.iloc[0]), "lw": int(wus.iloc[-1]),
            "fv": _vals(g.iloc[0]), "lv": _vals(g.iloc[-1]),
        }

    def fold(salts: list[int], summaries: list[dict]) -> dict:
        lo = summaries[0]["fw"]
        hi = summaries[-1]["lw"]
        out: dict[int, dict] = {}
        present = dict(zip(salts, summaries))
        s_lo = lo // salt_every_us
        s_hi = hi // salt_every_us
        # walk every chunk the key's grid touches; prev/next anchors are
        # the neighboring PRESENT chunks' boundary rows
        import bisect

        for s in range(s_lo, s_hi + 1):
            i = bisect.bisect_left(salts, s)
            prev_s = salts[i - 1] if i > 0 else None
            in_present = i < len(salts) and salts[i] == s
            next_s = (salts[i + 1] if i + 1 < len(salts) else None) \
                if in_present else (salts[i] if i < len(salts) else None)
            out[s] = {
                "lo": lo, "hi": hi,
                "pw": present[prev_s]["lw"] if prev_s is not None else None,
                "pv": present[prev_s]["lv"] if prev_s is not None else None,
                "nw": present[next_s]["fw"] if next_s is not None else None,
                "nv": present[next_s]["fv"] if next_s is not None else None,
            }
        return out

    def apply(g: pd.DataFrame, carry: dict, k, s) -> pd.DataFrame:
        anchors = []
        for wv, vv in (("pw", "pv"), ("nw", "nv")):
            if carry[wv] is not None:
                row = {key: k, w: pd.to_datetime(carry[wv], unit="us")}
                for c in count_cols + sum_cols:
                    row[c] = 0
                for c in null_cols:
                    row[c] = np.nan
                row.update({c: carry[vv][c] for c in carry_cols})
                anchors.append((carry[wv], row))
        before = [r for wv_us, r in anchors if wv_us < s * salt_every_us]
        after = [r for wv_us, r in anchors if wv_us >= (s + 1) * salt_every_us]
        aug = pd.concat(
            [pd.DataFrame(before), g, pd.DataFrame(after)], ignore_index=True,
        )
        if len(aug) == 0:
            return g.assign(fill_method=pd.Series(dtype="object"))
        # anchor dict column order differs from the tier table's — restore
        # it so every partition's output blocks share one schema
        aug = aug[list(g.columns)]
        filled = inst(aug)
        wout = filled[w].astype("datetime64[us]").astype("int64")
        lo_b = max(s * salt_every_us, carry["lo"])
        hi_b = min((s + 1) * salt_every_us - 1, carry["hi"])
        return filled[(wout >= lo_b) & (wout <= hi_b)].reset_index(drop=True)

    return salted_scan(
        tier_ds, key=key, ts_col=w, salt_every_us=salt_every_us,
        summarize=summarize, fold=fold, apply=apply, order_by=[w],
    )


def resample_locf(
    ds: "Dataset",
    *,
    key: str,
    ts_col: str,
    value_col: str,
    id_col: str,
    tier: str = "1h",
    out_ts_col: str = "sample_ts",
    out_col: str = "value_locf",
    num_partitions: int = 64,
) -> "Dataset":
    """Resample an IRREGULAR event stream onto the regular tier grid by
    last-observation-carried-forward: for every grid point between each
    key's first and last event (grid = tier-floored span), emit the most
    recent value at-or-before that instant — the classic as-of sampler
    that turns raw events into an aligned series WITHOUT aggregating
    (unlike the rollup, which summarizes a window; this samples a
    point).  Sensor-alignment semantics: the reference assumes a uniform
    clock (timeseries_batch_generator.py:186-221); this op manufactures
    one.

    Tie rule: a grid point equal to an event's timestamp takes that
    event (latest by ``(ts, id_col)`` among equals).  Grid points before
    a key's first event yield NULL.  One ``_pkey`` exchange; per key one
    ``np.searchsorted`` of the grid against the sorted event times.
    Output: ``key, out_ts_col, out_col``.
    """
    import numpy as np

    from ..functions.windows import TIER_US
    from .grouped import grouped_apply

    size = TIER_US[tier]

    def locf_partition(df: "pd.DataFrame") -> "pd.DataFrame":
        import pandas as pd

        if len(df) == 0:
            return pd.DataFrame({key: [], out_ts_col: pd.Series(
                [], dtype="datetime64[us]"), out_col: []})
        df = df.sort_values([key, ts_col, id_col], kind="mergesort")
        k_all = df[key].to_numpy()
        ts = df[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        v = df[value_col].to_numpy(dtype=np.float64)
        change = np.flatnonzero(k_all[1:] != k_all[:-1]) + 1
        starts = np.concatenate([[0], change, [len(df)]])
        keys_out, ts_out, v_out = [], [], []
        for s, e in zip(starts[:-1], starts[1:]):
            t = ts[s:e]
            g0 = (t[0] // size) * size  # non-negative epochs in practice
            g1 = (t[-1] // size) * size
            grid = np.arange(g0, g1 + size, size, dtype=np.int64)
            idx = np.searchsorted(t, grid, side="right") - 1
            val = np.where(idx >= 0, v[s:e][np.maximum(idx, 0)], np.nan)
            keys_out.append(np.repeat(k_all[s], len(grid)))
            ts_out.append(grid)
            v_out.append(val)
        return pd.DataFrame({
            key: np.concatenate(keys_out),
            out_ts_col: np.concatenate(ts_out).astype("datetime64[us]"),
            out_col: np.concatenate(v_out),
        })

    cols = ds.map_batches(
        lambda t: t.select([key, ts_col, value_col, id_col]),
        batch_format="pyarrow", zero_copy_batch=True)
    return grouped_apply(cols, keys=[key], fn=locf_partition,
                         num_partitions=num_partitions, whole_partition=True)
