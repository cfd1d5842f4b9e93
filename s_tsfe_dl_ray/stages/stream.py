"""Event-time streaming semantics over an out-of-order arrival log.

SURVEY §2.9's fifth pillar made executable end-to-end: tumbling-window
aggregation with a per-key WATERMARK — each key's stream is walked in
ARRIVAL order, the watermark is the running max event time seen so far,
and an event arriving more than ``allowed_lateness`` behind the
watermark is dropped from its window (and counted), exactly like a
streaming engine that has already emitted that window.  Reference
analog: the reader threads of
/root/reference/experiments/keras_experiment.py:41-47 consume windows in
strict arrival order from a bounded queue — arrival order IS the
processing order there too; this operator makes the event-time /
arrival-time split explicit.

Scale shape: one ``_pkey`` co-partition by key (key-complete
co-location is the only assumption — arrival replay needs the whole
key stream in one place, the same contract as stages/scan.py); inside
a partition the watermark is a cython ``groupby.cummax`` + ``shift``
over ALL keys at once, never per-key Python.  The output is
rollup-shaped partials, so a retention cascade can consume it
unchanged.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data import Dataset

from .rollup import _stable_pkey
from ..functions.windows import _tier_us


def watermark_rollup(
    ds: Dataset,
    *,
    key: str,
    ts_col: str,
    arrival_col: str,
    value_col: str | None = None,
    window: "str | int" = "1h",
    allowed_lateness_us: int = 120_000_000,
    num_partitions: int = 64,
) -> Dataset:
    """Tumbling event-time windows with late-data drop.

    For each key, walking rows by ``arrival_col``: watermark(t) =
    max(event time of all PRIOR arrivals); a row is late iff
    ``ts < watermark − allowed_lateness`` (strict, µs-exact).  On-time
    rows aggregate into their floor(ts, window) bucket; late rows are
    only counted.  The first arrival of a key is never late.

    Output: ``key, window_start, n_events, n_late_dropped`` and, when
    ``value_col`` is given, ``value_sum`` over on-time rows (NULL for
    windows whose every row was late).
    """
    size = _tier_us(window)

    def add_pkey(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        cols = {key: t[key], arrival_col: t[arrival_col]}
        ts = t[ts_col]
        if pa.types.is_timestamp(ts.type) and ts.type.unit != "us":
            ts = pc.cast(ts, pa.timestamp("us", tz=ts.type.tz))
        cols["_ts_us"] = pc.cast(ts, pa.int64())
        if value_col is not None:
            cols[value_col] = t[value_col]
        out = pa.table(cols)
        return out.append_column("_pkey", _stable_pkey(t[key], num_partitions))

    def body(df: pd.DataFrame) -> pd.DataFrame:
        base = {key: pd.Series([], dtype="object"),
                "window_start": pd.Series([], dtype="datetime64[us]"),
                "n_events": pd.Series([], dtype="int64"),
                "n_late_dropped": pd.Series([], dtype="int64")}
        if value_col is not None:
            base["value_sum"] = pd.Series([], dtype="float64")
        if len(df) == 0:
            return pd.DataFrame(base)
        df = df.drop(columns=["_pkey"]).sort_values(
            [key, arrival_col], kind="mergesort").reset_index(drop=True)
        ts = df["_ts_us"].to_numpy(dtype=np.int64)
        g = df.groupby(key, sort=False)["_ts_us"]
        wm = g.cummax().groupby(df[key], sort=False).shift(1).to_numpy()
        late = np.zeros(len(df), dtype=bool)
        seen = ~np.isnan(wm)
        late[seen] = ts[seen] < (wm[seen].astype(np.int64)
                                 - np.int64(allowed_lateness_us))
        win = ts - np.mod(np.mod(ts, size) + size, size)  # floor for any sign
        out = pd.DataFrame({key: df[key], "window_start": win,
                            "on": (~late).astype(np.int64),
                            "late": late.astype(np.int64)})
        aggs = {"on": "sum", "late": "sum"}
        if value_col is not None:
            v = df[value_col].to_numpy(dtype=np.float64)
            out["value_sum"] = np.where(late, np.nan, v)
            aggs["value_sum"] = "sum"
        grp = out.groupby([key, "window_start"], sort=False)
        res = grp.agg(aggs).reset_index()
        # pandas sum() of all-NaN gives 0.0; a window with zero on-time
        # rows must report NULL like SQL sum(CASE ...) does
        if value_col is not None:
            res.loc[res["on"] == 0, "value_sum"] = np.nan
        res = res.rename(columns={"on": "n_events",
                                  "late": "n_late_dropped"})
        res["window_start"] = pd.to_datetime(res["window_start"], unit="us")
        cols = [key, "window_start", "n_events", "n_late_dropped"]
        if value_col is not None:
            cols.append("value_sum")
        return res[cols]

    tagged = ds.map_batches(add_pkey, batch_format="pyarrow")
    return tagged.groupby("_pkey").map_groups(body, batch_format="pandas")
