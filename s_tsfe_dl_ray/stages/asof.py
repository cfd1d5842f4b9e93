"""As-of (most-recent-at-or-before) alignment within keys.

The reference's annotation×signal alignment locates sparse event rows
against a sample index (data.py:62-76) — an as-of lookup.  The engine
expresses it as: co-partition both sides by key (ONE groupby shuffle of
the union), sort within the group, and run a vectorized
``pd.merge_asof`` per key partition (SURVEY.md §2.4: "sort +
map_groups merge within key — no shuffle join needed").
"""

from __future__ import annotations

import pandas as pd
from ray.data import Dataset


def asof_join_self(
    ds: Dataset,
    *,
    key: str,
    ts_col: str,
    left_filter: tuple[str, str],
    right_filter: tuple[str, str],
    right_value_cols: list[str],
    order_tiebreak: str | None = None,
    suffix: str = "_asof",
) -> Dataset:
    """Within each key: for every LEFT row (``left_filter`` col==value),
    attach the most recent RIGHT row (``right_filter``) with
    ``right.ts <= left.ts``.

    Self-join form (both sides come from ``ds``) — the common transcript
    question "for each tool call, what was the last user turn".  Rows
    with no earlier match keep NULLs.
    """
    lcol, lval = left_filter
    rcol, rval = right_filter

    class _AsofGroup:
        def __call__(self, g: pd.DataFrame) -> pd.DataFrame:
            order = [ts_col] + ([order_tiebreak] if order_tiebreak else [])
            left = g[g[lcol] == lval].sort_values(order, kind="mergesort")
            right = g[g[rcol] == rval].sort_values(order, kind="mergesort")
            right_sel = right[[ts_col] + right_value_cols].rename(
                columns={c: f"{c}{suffix}" for c in [ts_col] + right_value_cols}
            )
            out = pd.merge_asof(
                left,
                right_sel,
                left_on=ts_col,
                right_on=f"{ts_col}{suffix}",
                direction="backward",
                allow_exact_matches=True,
            )
            return out

    inst = _AsofGroup()

    def asof_group(g):
        return inst(g)

    return ds.groupby([key]).map_groups(asof_group, batch_format="pandas")
