"""Sessionization: split each key's ordered stream on inactivity gaps.

The engine analog of the reference's run-length segmentation of annotation
streams (data.py:50-57: consecutive-equal-symbol runs become segments) and
its discontinuity detection (timeseries_batch_generator.py:125-141
``_check_time_jumps``): a new segment starts where the stream "jumps".

Semantics: within each key ordered by (ts, tiebreaker), a new session
starts when ts - prev_ts > gap.  Output: one row per session with
start/end/row-count/duration.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from ray.data import Dataset


class _SessionizeGroup:
    def __init__(self, key_cols: list[str], ts_col: str, order_by: list[str], gap_us: int):
        self.key_cols = key_cols
        self.ts_col = ts_col
        self.order_by = order_by
        self.gap_us = gap_us

    def __call__(self, g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(self.order_by, kind="mergesort")
        ts = g[self.ts_col]
        gap = ts.diff().dt.total_seconds() * 1e6 > self.gap_us
        session_id = gap.cumsum().astype("int64")
        out = (
            g.assign(session_id=session_id)
            .groupby("session_id", sort=True)
            .agg(
                session_start=(self.ts_col, "min"),
                session_end=(self.ts_col, "max"),
                n_rows=(self.ts_col, "size"),
            )
            .reset_index()
        )
        for k in self.key_cols:
            out[k] = g[k].iloc[0]
        out["duration_sec"] = (
            out["session_end"] - out["session_start"]
        ).dt.total_seconds()
        return out[self.key_cols + ["session_id", "session_start", "session_end", "n_rows", "duration_sec"]]


def segment_runs(
    ds: Dataset,
    *,
    keys: list[str],
    value_col: str,
    ts_col: str,
    order_by: list[str] | None = None,
) -> Dataset:
    """Run-length segmentation: within each key's ordered stream, a new
    segment starts whenever ``value_col`` changes.

    This is the reference's annotation segmentation verbatim in stream
    form (data.py:50-57: consecutive-equal annotation symbols become one
    segment, then sliced with offsets).  Output: one row per run with
    (keys..., run_id, <value_col>, run_start, run_end, n_rows).
    """
    order_by = order_by or [ts_col]

    class _RunsGroup:
        def __call__(self, g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values(order_by, kind="mergesort")
            change = (g[value_col] != g[value_col].shift()).cumsum() - 1
            out = (
                g.assign(run_id=change.astype("int64"))
                .groupby("run_id", sort=True)
                .agg(
                    **{
                        value_col: (value_col, "first"),
                        "run_start": (ts_col, "min"),
                        "run_end": (ts_col, "max"),
                        "n_rows": (ts_col, "size"),
                    }
                )
                .reset_index()
            )
            for k in keys:
                out[k] = g[k].iloc[0]
            return out[keys + ["run_id", value_col, "run_start", "run_end", "n_rows"]]

    inst = _RunsGroup()
    from .grouped import grouped_apply

    return grouped_apply(ds, keys=keys, fn=inst)


def sessionize(
    ds: Dataset,
    *,
    keys: list[str],
    ts_col: str,
    order_by: list[str] | None = None,
    gap: str | int = "30m",
    salt_every_us: int | None = None,
) -> Dataset:
    """Session windows per key with inactivity threshold ``gap``
    (seconds if int, or '30m'/'1h' shorthand).

    ``salt_every_us``: mega-key mode (stages/salted.py).  Each time chunk
    sessionizes locally with globally-correct session ids derived from a
    per-key fold of (first_ts, last_ts, n_sessions) chunk summaries; a
    session spanning a chunk boundary appears as partial rows sharing one
    session_id and is merged by a final vectorized per-key reduce.  No
    partition ever holds a hot key's full history; output equals the
    unsalted path."""
    if isinstance(gap, str):
        unit = gap[-1]
        mult = {"s": 1, "m": 60, "h": 3600, "d": 86400}[unit]
        gap_us = int(gap[:-1]) * mult * 1_000_000
    else:
        gap_us = int(gap) * 1_000_000
    order_by = order_by or [ts_col]
    if salt_every_us is None:
        inst = _SessionizeGroup(keys, ts_col, order_by, gap_us)
        from .grouped import grouped_apply

        return grouped_apply(ds, keys=keys, fn=inst)

    if len(keys) != 1:
        raise ValueError("salted sessionize requires a single key")
    key = keys[0]
    from .salted import salted_scan

    def _ts_int(g: pd.DataFrame) -> pd.Series:
        return g[ts_col].astype("datetime64[us]").astype("int64")

    def summarize(g: pd.DataFrame) -> dict:
        ts = _ts_int(g)
        n_sessions = int((ts.diff() > gap_us).sum()) + 1
        return {"first_ts": int(ts.iloc[0]), "last_ts": int(ts.iloc[-1]),
                "n_sessions": n_sessions}

    def step(carry: dict | None, s: dict) -> dict:
        if carry is None:
            return {"last_ts": s["last_ts"], "next_id": s["n_sessions"]}
        merged = (s["first_ts"] - carry["last_ts"]) <= gap_us
        base = carry["next_id"] - (1 if merged else 0)
        return {"last_ts": s["last_ts"], "next_id": base + s["n_sessions"]}

    def apply(g: pd.DataFrame, carry: dict | None) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({
                key: pd.Series(dtype="object"),
                "session_id": pd.Series(dtype="int64"),
                "session_start": pd.Series(dtype="datetime64[us]"),
                "session_end": pd.Series(dtype="datetime64[us]"),
                "n_rows": pd.Series(dtype="int64"),
            })
        g = g.sort_values(order_by, kind="mergesort")
        ts = _ts_int(g)
        local_sid = (ts.diff() > gap_us).cumsum().astype("int64")
        if carry is not None:
            # the chunk's first session either continues the previous
            # chunk's last session (same id) or opens the next id
            merged = (int(ts.iloc[0]) - carry["last_ts"]) <= gap_us
            local_sid = local_sid + (carry["next_id"] - 1 if merged else carry["next_id"])
        out = (
            g.assign(session_id=local_sid)
            .groupby("session_id", sort=True)
            .agg(session_start=(ts_col, "min"), session_end=(ts_col, "max"),
                 n_rows=(ts_col, "size"))
            .reset_index()
        )
        out[key] = g[key].iloc[0]
        return out[[key, "session_id", "session_start", "session_end", "n_rows"]]

    partial = salted_scan(
        ds, key=key, ts_col=ts_col, salt_every_us=salt_every_us,
        summarize=summarize, step=step, apply=apply, order_by=order_by,
    )
    # boundary sessions span chunks as partial rows with one session_id
    from .dedup import _grouped_min

    merged = _grouped_min(
        partial, group_cols=[key, "session_id"],
        agg_cols=[("session_start", "min"), ("session_end", "max"), ("n_rows", "sum")],
        pkey_col=key,
    )

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["duration_sec"] = (b["session_end"] - b["session_start"]).dt.total_seconds()
        return b[[key, "session_id", "session_start", "session_end", "n_rows",
                  "duration_sec"]]

    return merged.map_batches(finish, batch_format="pandas")


def debounce(
    ds: Dataset,
    *,
    key: str,
    ts_col: str,
    min_gap_us: int,
    order_by: list[str] | None = None,
    num_partitions: int = 64,
) -> Dataset:
    """Greedy min-gap throttle (alert deduplication / debounce): within
    each key, keep an event only if at least ``min_gap_us`` has passed
    since the last KEPT event; the first event of a key always survives.
    The standard notification/alert hygiene primitive — a SESSION-aware
    dedup (unlike first_per_key, suppression resets once the gap
    elapses).

    Greedy keep-chains have no prefix-parallel closed form (each
    decision depends on the previous SURVIVOR, not the previous row), so
    the partition body walks survivors via ``searchsorted`` jumps — the
    loop count is the OUTPUT size (kept events), not the input size,
    which is exactly the regime where throttling is used (dense bursts,
    sparse survivors).  Not SQL-expressible (recursive); tests pin the
    literal greedy fold and blocking invariance.
    """
    import numpy as np
    import pyarrow as pa

    from .rollup import _stable_pkey

    if min_gap_us < 1:
        raise ValueError("min_gap_us must be >= 1 (a 0 gap keeps every "
                         "row — drop the stage instead)")
    order_by = order_by or [ts_col]

    def add_pkey(t: pa.Table) -> pa.Table:
        return t.append_column("_pkey", _stable_pkey(t[key], num_partitions))

    def keep_partition(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=["_pkey"]).sort_values(
            [key] + order_by, kind="mergesort").reset_index(drop=True)
        if len(df) == 0:
            return df
        ts = df[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        keys_all = df[key].to_numpy()
        change = np.flatnonzero(keys_all[1:] != keys_all[:-1]) + 1
        starts = np.concatenate([[0], change])
        ends = np.concatenate([change, [len(df)]])
        kept = []
        for lo, hi in zip(starts, ends):
            i = lo
            while i < hi:
                kept.append(i)
                # next survivor: first event >= kept_ts + gap (the +1
                # floor guards duplicate timestamps at min_gap_us == 0)
                i = max(i + 1,
                        lo + np.searchsorted(ts[lo:hi], ts[i] + min_gap_us,
                                             side="left"))
        return df.iloc[kept].reset_index(drop=True)

    tagged = ds.map_batches(add_pkey, batch_format="pyarrow")
    return tagged.groupby("_pkey").map_groups(keep_partition, batch_format="pandas")


def session_conversion(
    ds: Dataset,
    *,
    keys: list[str],
    ts_col: str,
    type_col: str,
    target: str,
    order_by: list[str] | None = None,
    gap: str | int = "30m",
    num_partitions: int = 64,
) -> Dataset:
    """Corpus conversion rate at SESSION grain: share of inactivity-gap
    sessions that contain at least one ``target``-typed event — the
    product metric :func:`sessionize` feeds ("what % of visits
    purchase").

    Same island derivation as sessionize (key-complete partition, one
    vectorized break-scan, no per-key loop), but folded straight to
    per-partition ``(n_sessions, n_converted)`` partials — session rows
    never materialize.  Output: one row — ``n_sessions (int64),
    n_converted (int64), conversion_rate (float64)``.
    """
    from .grouped import grouped_apply

    if isinstance(gap, str):
        unit = gap[-1]
        mult = {"s": 1, "m": 60, "h": 3600, "d": 86400}[unit]
        gap_us = int(gap[:-1]) * mult * 1_000_000
    else:
        gap_us = int(gap) * 1_000_000
    order_by = order_by or [ts_col]

    def part(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"_s": pd.Series([], dtype="int64"),
                                 "_c": pd.Series([], dtype="int64")})
        df = df.sort_values(keys + order_by, kind="mergesort")
        ts = df[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        kk = df[keys[0]].to_numpy()
        same = np.ones(len(df), dtype=bool)
        same[1:] = kk[1:] == kk[:-1]
        for k in keys[1:]:
            kv = df[k].to_numpy()
            same[1:] &= kv[1:] == kv[:-1]
        brk = ~same
        brk[1:] |= (ts[1:] - ts[:-1]) > gap_us
        brk[0] = True
        sid = np.cumsum(brk) - 1
        hit = (df[type_col].to_numpy() == target)
        n_sessions = int(sid[-1]) + 1
        conv = np.zeros(n_sessions, dtype=bool)
        np.logical_or.at(conv, sid[hit], True)
        return pd.DataFrame({"_s": pd.Series([n_sessions], dtype="int64"),
                             "_c": pd.Series([int(conv.sum())], dtype="int64")})

    partials = grouped_apply(ds, keys=[keys[0]], fn=part,
                             num_partitions=num_partitions,
                             whole_partition=True)

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        s = int(df["_s"].sum())
        c = int(df["_c"].sum())
        return pd.DataFrame({
            "n_sessions": pd.Series([s], dtype="int64"),
            "n_converted": pd.Series([c], dtype="int64"),
            "conversion_rate": [c / s if s else float("nan")],
        })

    return partials.repartition(1).map_batches(
        fold, batch_format="pandas", batch_size=None)


def label_sessions(
    ds: Dataset,
    *,
    key: str,
    ts_col: str,
    order_by: list[str],
    gap: str | int = "30m",
    out_col: str = "session_id",
    num_partitions: int = 64,
) -> Dataset:
    """Per-ROW session labels (the labeling half of :func:`sessionize`,
    which emits session summaries): every event keeps its columns and
    gains ``out_col`` — the 0-based session ordinal within its key,
    incremented wherever the gap to the previous event exceeds ``gap``.

    What downstream compositions need when the session is the GROUPING
    key rather than the result — e.g. session-scoped co-occurrence
    (which event types appear in the same session) or per-session
    funnels.  One key-hash exchange; gap detection and the cumulative
    label are vectorized across all keys of a partition (diff + boundary
    mask + cumsum, no per-key Python).
    """
    import pyarrow as pa

    from .rollup import _stable_pkey

    if isinstance(gap, str):
        unit = gap[-1]
        mult = {"s": 1, "m": 60, "h": 3600, "d": 86400}[unit]
        gap_us = int(gap[:-1]) * mult * 1_000_000
    else:
        gap_us = int(gap) * 1_000_000

    def add_pkey(t: pa.Table) -> pa.Table:
        return t.append_column("_pkey", _stable_pkey(t[key], num_partitions))

    def label(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=["_pkey"]).sort_values(
            [key] + order_by, kind="mergesort").reset_index(drop=True)
        if len(df) == 0:
            df[out_col] = pd.Series([], dtype="int64")
            return df
        ts = df[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        first = df[key].ne(df[key].shift(1)).to_numpy()
        gap_brk = np.concatenate([[False], (ts[1:] - ts[:-1]) > gap_us])
        new_sess = (~first) & gap_brk
        # cumulative within key: global cumsum minus the key's offset
        cs = np.cumsum(new_sess.astype(np.int64))
        offset = np.zeros(len(df), dtype=np.int64)
        offset[first] = cs[first]
        df[out_col] = cs - np.maximum.accumulate(offset)
        return df

    tagged = ds.map_batches(add_pkey, batch_format="pyarrow")
    return tagged.groupby("_pkey").map_groups(label, batch_format="pandas")


def session_paths(
    ds: Dataset,
    *,
    key: str,
    ts_col: str,
    type_col: str,
    order_by: list[str] | None = None,
    gap: str | int = "30m",
    max_steps: int = 5,
    k: int = 20,
    num_partitions: int = 64,
) -> Dataset:
    """Top-k session entry paths — user-journey mining: sessionize by
    inactivity ``gap``, take each session's first ``max_steps`` event
    types in time order, join them into a ``a>b>c`` path string, and
    count sessions per path.  The "what do sessions LOOK like"
    complement to :func:`session_conversion` (did they convert) and
    session_type_pairs (what co-occurred, unordered).

    Dataflow: ONE key-hash exchange; inside each partition the gap
    detection, session labeling, and step ranking are fully vectorized
    (diff + boundary cumsum + first-index offsets); only the path join
    per session is a string op (C-level ``str.join`` over ≤ max_steps
    tokens).  Path strings then fold through the standard combiner
    count; top-k cuts on the (count desc, path asc) TOTAL order so the
    result is deterministic under any partitioning.

    Output: ``path (string), n_sessions (int64)``, top ``k``.

    Reference analog: get_mit_bih_segments' run boundaries
    (data.py:99-154) generalized to inactivity-gap sessions with an
    ordered categorical payload.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..pipelines.relational import grouped_aggregate
    from .grouped import grouped_apply

    if isinstance(gap, str):
        unit = gap[-1]
        mult = {"s": 1, "m": 60, "h": 3600, "d": 86400}[unit]
        gap_us = int(gap[:-1]) * mult * 1_000_000
    else:
        gap_us = int(gap) * 1_000_000
    order_by = order_by or [ts_col]

    def part(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"path": pd.Series([], dtype="object")})
        df = df.sort_values([key] + order_by, kind="mergesort")
        ts = df[ts_col].to_numpy(dtype="datetime64[us]").astype(np.int64)
        kv = df[key].to_numpy()
        new_key = np.empty(len(df), dtype=bool)
        new_key[0] = True
        new_key[1:] = kv[1:] != kv[:-1]
        gap_break = np.empty(len(df), dtype=bool)
        gap_break[0] = True
        gap_break[1:] = (ts[1:] - ts[:-1]) > gap_us
        sid = np.cumsum(new_key | gap_break) - 1
        firsts = np.flatnonzero(np.concatenate(
            [[True], sid[1:] != sid[:-1]]))
        rank = np.arange(len(df)) - np.repeat(
            firsts, np.diff(np.concatenate([firsts, [len(df)]])))
        keep = rank < max_steps
        types = df[type_col].to_numpy()[keep]
        sk = sid[keep]
        paths = pd.Series(types).groupby(sk, sort=False).agg(">".join)
        return pd.DataFrame({"path": paths.to_numpy()})

    paths_ds = grouped_apply(ds, keys=[key], fn=part,
                             num_partitions=num_partitions,
                             whole_partition=True)

    counted = grouped_aggregate(
        paths_ds.map_batches(
            lambda t: pa.table({
                "path": t["path"],
                "one": pc.cast(pc.is_valid(t["path"]), pa.int64())}),
            batch_format="pyarrow"),
        keys=["path"], aggs={"n_sessions": ("one", "sum")},
        num_partitions=8)
    return counted.sort(["n_sessions", "path"],
                        descending=[True, False]).limit(k)
