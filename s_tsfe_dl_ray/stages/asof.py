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

    Execution shape: ONE coarse ``_pkey`` hash shuffle co-locates each
    key's rows, then a single vectorized ``pd.merge_asof(..., by=key)``
    per PARTITION handles every key in that partition at once — never one
    group-UDF call per key (the 5-20×-overhead pattern grouped.py bans).
    """
    lcol, lval = left_filter
    rcol, rval = right_filter

    from .rollup import _stable_pkey

    def add_pkey(t):
        import pyarrow as _pa

        return t.append_column("_pkey", _stable_pkey(t[key], 64))

    order = [ts_col] + ([order_tiebreak] if order_tiebreak else [])

    def asof_partition(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["_pkey"])
        # merge_asof(by=key) needs both sides sorted by the ON column only;
        # the tiebreak makes the within-ts order deterministic.
        left = g[g[lcol] == lval].sort_values(order, kind="mergesort")
        right = g[g[rcol] == rval].sort_values(order, kind="mergesort")
        right_sel = right[[key, ts_col] + right_value_cols].rename(
            columns={c: f"{c}{suffix}" for c in [ts_col] + right_value_cols}
        )
        return pd.merge_asof(
            left,
            right_sel,
            left_on=ts_col,
            right_on=f"{ts_col}{suffix}",
            by=key,
            direction="backward",
            allow_exact_matches=True,
        )

    tagged = ds.map_batches(add_pkey, batch_format="pyarrow")
    return tagged.groupby("_pkey").map_groups(asof_partition, batch_format="pandas")
