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
    direction: str = "backward",
    tolerance_us: int | None = None,
) -> Dataset:
    """Within each key: for every LEFT row (``left_filter`` col==value),
    attach the most recent RIGHT row (``right_filter``) with
    ``right.ts <= left.ts`` (``direction='backward'``), the NEXT right
    row with ``right.ts >= left.ts`` (``'forward'`` — the what-happened-
    next lookup), or whichever is closest in time (``'nearest'``).
    ``tolerance_us`` bounds the match distance (matches farther than the
    tolerance become NULL) — the standard staleness guard for sensor
    alignment.

    Self-join form (both sides come from ``ds``) — the common transcript
    question "for each tool call, what was the last user turn".  Rows
    with no earlier match keep NULLs.

    Execution shape: ONE coarse ``_pkey`` hash shuffle co-locates each
    key's rows, then a single vectorized ``pd.merge_asof(..., by=key)``
    per PARTITION handles every key in that partition at once — never one
    group-UDF call per key (the 5-20×-overhead pattern grouped.py bans).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unsupported direction {direction!r}")
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
            direction=direction,
            allow_exact_matches=True,
            tolerance=(pd.Timedelta(microseconds=tolerance_us)
                       if tolerance_us is not None else None),
        )

    tagged = ds.map_batches(add_pkey, batch_format="pyarrow")
    return tagged.groupby("_pkey").map_groups(asof_partition, batch_format="pandas")


def interval_join(
    points: Dataset,
    intervals: Dataset,
    *,
    key: str,
    point_ts: str,
    start_col: str,
    end_col: str,
    interval_cols: list[str] | None = None,
    how: str = "left",
    num_partitions: int = 64,
) -> Dataset:
    """Attach to each point row the most recently STARTED interval of the
    same key (``start <= ts``) **if it is still active** (``ts <= end``);
    otherwise NULL interval columns (``how='left'``) or drop the point
    (``how='inner'``).

    The attribution-window shape ("which purchase window was this click
    inside?"): a range predicate Ray Data has no native join for.  Same
    execution as ``asof_join_self`` — one coarse ``_pkey`` co-partition of
    the tagged union, one vectorized ``pd.merge_asof`` per partition, then
    a vectorized expiry mask; never a per-key UDF, no driver round-trip.

    Semantics note (overlapping intervals): the candidate is the
    latest-started interval only — a point inside an *earlier* interval
    but past the latest one resolves to NULL.  For sessions/attribution
    windows (non-overlapping or newest-wins) this is the intended answer;
    true multi-overlap containment needs a per-point expansion instead.

    Nullable widening: points columns come back unchanged; interval
    columns become nullable on ``how='left'`` (pandas widens missing ints
    to float — keep interval payloads timestamp/float or cast downstream).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"unsupported join type {how!r}")
    interval_cols = list(interval_cols or [])

    import pyarrow as pa

    from .join import _schema_of
    from .rollup import _stable_pkey

    point_schema = _schema_of(points)
    point_cols = [f.name for f in point_schema]
    itv_keep = [start_col, end_col] + interval_cols
    itv_schema = _schema_of(intervals)
    itv_types = {f.name: f.type for f in itv_schema}
    clash = set(point_cols) & set(itv_keep)
    if clash:
        raise ValueError(f"interval columns clash with point columns: {clash}")
    ordered = point_cols + itv_keep

    def tag_points(t: pa.Table) -> pa.Table:
        for name in itv_keep:
            t = t.append_column(name, pa.nulls(t.num_rows, itv_types[name]))
        t = t.select(ordered)
        t = t.append_column("_pkey", _stable_pkey(t[key], num_partitions))
        return t.append_column("_side", pa.array(["p"] * t.num_rows, pa.string()))

    def tag_intervals(t: pa.Table) -> pa.Table:
        t = t.select([key] + itv_keep)
        for f in point_schema:
            if f.name != key:
                t = t.append_column(f.name, pa.nulls(t.num_rows, f.type))
        t = t.select(ordered)
        t = t.append_column("_pkey", _stable_pkey(t[key], num_partitions))
        return t.append_column("_side", pa.array(["i"] * t.num_rows, pa.string()))

    tagged = (
        points.map_batches(tag_points, batch_format="pyarrow")
        .union(intervals.map_batches(tag_intervals, batch_format="pyarrow"))
        .repartition(num_partitions, shuffle=False)
    )

    def join_partition(g: pd.DataFrame) -> pd.DataFrame:
        pts = (
            g[g["_side"] == "p"][point_cols]
            .sort_values(point_ts, kind="mergesort")
        )
        itv = (
            g[g["_side"] == "i"][[key] + itv_keep]
            .sort_values(start_col, kind="mergesort")
        )
        m = pd.merge_asof(
            pts, itv, left_on=point_ts, right_on=start_col, by=key,
            direction="backward", allow_exact_matches=True,
        )
        expired = m[end_col].notna() & (m[end_col] < m[point_ts])
        if how == "inner":
            return m[m[start_col].notna() & ~expired]
        m.loc[expired, itv_keep] = None
        return m

    want = {f.name: f.type for f in point_schema}
    want.update({n: itv_types[n] for n in itv_keep})

    def restore_types(t: pa.Table) -> pa.Table:
        # the union null-pads each side for the other's columns, so pandas
        # widens e.g. int64 point ids to float64 — cast everything back to
        # its declared Arrow type (NaN → null first for float→int casts)
        import pyarrow.compute as pc

        cols = {}
        for name in t.column_names:
            c, w = t[name], want.get(name)
            if w is not None and c.type != w:
                if pa.types.is_floating(c.type) and not pa.types.is_floating(w):
                    c = pc.if_else(pc.is_nan(c), pa.nulls(len(c), c.type), c)
                c = pc.cast(c, w)
            cols[name] = c
        return pa.table(cols)

    return (
        tagged.groupby("_pkey")
        .map_groups(join_partition, batch_format="pandas")
        .map_batches(restore_types, batch_format="pyarrow")
    )
