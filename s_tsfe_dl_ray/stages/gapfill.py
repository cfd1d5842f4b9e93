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
        w = self.window_col
        # Normalize to µs explicitly: arrow→pandas may deliver ns-precision
        # datetimes, and a silent ns int64 would build a 1000×-too-fine grid.
        ws = g[w].astype("datetime64[us]").astype("int64")  # µs since epoch
        lo, hi = ws.min(), ws.max()
        grid = np.arange(lo, hi + 1, self.tier_us)
        g = g.set_index(ws)
        out = g.reindex(grid)
        observed = out[w].notna().to_numpy()
        out[w] = pd.to_datetime(out.index, unit="us")
        for k in self.keys:
            out[k] = g[k].iloc[0]  # constant within the group
        for c in self.count_cols + self.sum_cols:
            out[c] = out[c].fillna(0).astype("int64" if g[c].dtype.kind in "iu" else g[c].dtype)
        # null_cols (min/max) stay NaN on gaps
        if self.mode == "ffill":
            for c in self.carry_cols:
                out[c] = out[c].ffill()
        elif self.mode == "interp":
            # Explicit linear interpolation in epoch SECONDS with the exact
            # arithmetic shape of the SQL oracle — prev + (next-prev)*Δ/Δtot
            # — so last-ulp differences can't flip the 6-decimal rounding.
            idx = np.arange(len(grid))
            obs_idx = idx[observed]
            # grid spans min→max observed ⇒ first/last rows are observed,
            # so every gap row has both neighbors.
            prev_i = obs_idx[np.searchsorted(obs_idx, idx, side="right") - 1]
            next_i = obs_idx[np.searchsorted(obs_idx, idx, side="left")]
            w_sec = grid / 1e6
            dw = w_sec - w_sec[prev_i]
            dwtot = w_sec[next_i] - w_sec[prev_i]
            dwtot_safe = np.where(observed, 1.0, dwtot)
            for c in self.carry_cols:
                v = out[c].astype("float64").to_numpy()
                prev_v, next_v = v[prev_i], v[next_i]
                filled = prev_v + (next_v - prev_v) * dw / dwtot_safe
                out[c] = np.where(observed, v, filled)
        else:
            raise ValueError(f"unknown gap-fill mode {self.mode!r}")
        out["fill_method"] = np.where(observed, "observed", self.mode)
        return out.reset_index(drop=True)


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
) -> Dataset:
    """Complete each key's window grid and fill gaps (see module doc)."""
    if mode not in ("ffill", "interp"):
        raise ValueError(f"unknown gap-fill mode {mode!r}; expected 'ffill' or 'interp'")
    inst = _GapFillGroup(
        keys, window_col, TIER_US[tier], count_cols, sum_cols, null_cols, carry_cols, mode
    )
    from .grouped import grouped_apply

    return grouped_apply(tier_ds, keys=keys, fn=inst)
