"""Per-key ordered stateful scans (running aggregates).

The engine analog of the reference's recurrent state carried in timestep
order within each series (LSTM/GRU scans: models_keras.py:64, 141-142;
models_pytorch.py:204, 460).  Semantics: within each key, establish the
explicit order (the engine never relies on block arrival order —
SURVEY.md §7.4), then compute running aggregates left-to-right.

Implemented as ``groupby(key).map_groups`` with a vectorized pandas body
(sort + cumsum/cummax...).  The shuffle co-locates each key's rows; the
scan itself is O(group) vectorized.  For hot keys whose full history
exceeds a worker's heap, the salted variant would scan per (key, salt)
and stitch boundary state via the manifest — the codec stages
(state/encode.py) demonstrate that pattern.
"""

from __future__ import annotations

import pandas as pd
from ray.data import Dataset

_SCAN_FNS = {
    "cumsum": lambda s: s.cumsum(),
    "cummax": lambda s: s.cummax(),
    "cummin": lambda s: s.cummin(),
    "cumcount": lambda s: pd.Series(range(1, len(s) + 1), index=s.index),
    # previous-row value / first difference within the key (SQL lag/diff);
    # first row of a key yields NULL (NaN) like the SQL twin
    "lag": lambda s: s.shift(1),
    "delta": lambda s: s - s.shift(1),
}


class _ScanGroup:
    def __init__(self, order_by: list[str], scans: dict[str, tuple[str, str]]):
        self.order_by = order_by
        self.scans = scans

    def __call__(self, g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(self.order_by, kind="mergesort")  # stable
        for out_col, (col, kind) in self.scans.items():
            g[out_col] = _SCAN_FNS[kind](g[col])
        return g


def order_fingerprint(
    ds: Dataset,
    *,
    key: str,
    order_by: list[str],
    col: str,
    num_partitions: int = 64,
) -> Dataset:
    """Per-key order-sensitive content fingerprint — the engine's
    **per-turn text equality under stable turn ordering** invariant
    (BASELINE.json input_hint).

    Within each key, rows are sorted by ``order_by`` and the fingerprint
    is the md5 hex digest of the ``chr(31)``-joined ``col`` values in that
    order.  Two runs at ANY parallelism / blocking produce identical
    fingerprints iff every row's content and its order agree — so this
    op is the cheap cross-cluster-size equality check (fingerprints are
    one row per key; comparing them never moves the text itself,
    SURVEY.md §7.4 "wide text rows") — and it is SQL-checkable:
    ``md5(string_agg(col, chr(31) ORDER BY ...))``.
    """
    import hashlib

    import numpy as np
    import pyarrow as pa

    from ..stages.rollup import _stable_pkey

    def add_pkey(t: pa.Table) -> pa.Table:
        return t.append_column("_pkey", _stable_pkey(t[key], num_partitions))

    SEP = "\x1f"

    def fingerprint_partition(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key] + order_by, kind="mergesort")
        texts = df[col].astype(str).to_numpy()
        keys_all = df[key].to_numpy()
        change = np.flatnonzero(keys_all[1:] != keys_all[:-1]) + 1
        bounds = np.concatenate([[0], change, [len(df)]])
        out_k, out_fp, out_n = [], [], []
        for lo, hi in zip(bounds[:-1], bounds[1:]):
            blob = SEP.join(texts[lo:hi])  # join + md5 both run in C
            out_k.append(keys_all[lo])
            out_fp.append(hashlib.md5(blob.encode()).hexdigest())
            out_n.append(int(hi - lo))
        return pd.DataFrame({key: out_k, "fingerprint": out_fp, "n_rows": out_n})

    tagged = ds.map_batches(add_pkey, batch_format="pyarrow")
    return tagged.groupby("_pkey").map_groups(fingerprint_partition, batch_format="pandas")


def trailing_agg(
    ds: Dataset,
    *,
    key: str,
    ts_col: str,
    value_col: str,
    window_us: int,
    sum_col: str = "value_sum_w",
    count_col: str = "n_rows_w",
    num_partitions: int = 64,
    salt_every_us: int | None = None,
) -> Dataset:
    """Trailing time-RANGE window aggregate: for every row, the sum and
    count of ``value_col`` over the same key's rows with
    ``ts ∈ [row.ts − window, row.ts]`` — SQL ``RANGE BETWEEN INTERVAL w
    PRECEDING AND CURRENT ROW`` (peers included), the continuous sibling
    of the tumbling rollup (rows-based rolling lives in transform.py).

    Vectorization: one ``_pkey`` co-partition, then per partition every
    key is handled in a SINGLE pair of ``searchsorted`` calls — timestamps
    are offset-packed per key group (offset > any key's span + window) so
    group boundaries can never be crossed by a window probe.  O(n log n)
    per partition, no per-key Python loop.

    ``salt_every_us`` (must be ≥ ``window_us``): mega-key mode — no
    partition ever holds a whole key (stages/salted.py time-chunking).
    The carry is a HALO: the previous chunk's rows within the trailing
    ``window_us`` of its end boundary, so each chunk computes its rows'
    windows from (halo + chunk) alone; rows older than one window never
    matter by construction.  Halo size is bounded by the key's row rate ×
    window — the inherent state of a trailing window — not by history.

    Float note: sums come from prefix-sum differences — associativity
    differs from a sequential fold by ≤ a few ulps of the key's prefix
    magnitude (same residual-association risk class as the rollup's float
    sums; exact for integer/decimal inputs).
    """
    import numpy as np
    import pyarrow as pa

    from .rollup import _stable_pkey

    if salt_every_us is not None:
        if salt_every_us < window_us:
            raise ValueError("salt_every_us must be >= window_us (the halo "
                             "spans at most one chunk boundary)")
        from .salted import salted_scan

        salt = int(salt_every_us)

        def summarize(g: pd.DataFrame) -> dict:
            ts = g[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
            end = (int(ts[0]) // salt + 1) * salt
            keep = ts >= end - window_us
            return {"end": end, "tail_ts": ts[keep].tolist(),
                    "tail_v": g[value_col].to_numpy(dtype=np.float64)[keep].tolist()}

        def step(carry: dict | None, s: dict) -> dict:
            # salt >= window ⇒ only the immediately preceding chunk's tail
            # can reach into the next chunk; older tails age out by time
            return s

        def apply(g: pd.DataFrame, carry: dict | None) -> pd.DataFrame:
            if len(g) == 0:
                return g
            g = g.sort_values([ts_col], kind="mergesort").reset_index(drop=True)
            ts = g[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
            v = g[value_col].to_numpy(dtype=np.float64)
            start = (int(ts[0]) // salt) * salt
            if carry is not None:
                c_ts = np.asarray(carry["tail_ts"], dtype=np.int64)
                c_v = np.asarray(carry["tail_v"], dtype=np.float64)
                live = c_ts >= start - window_us  # drop aged-out halo rows
                all_ts = np.concatenate([c_ts[live], ts])
                all_v = np.concatenate([c_v[live], v])
            else:
                all_ts, all_v = ts, v
            prefix = np.concatenate([[0.0], np.cumsum(all_v)])
            lo = np.searchsorted(all_ts, ts - window_us, side="left")
            hi = np.searchsorted(all_ts, ts, side="right")
            g[sum_col] = prefix[hi] - prefix[lo]
            g[count_col] = (hi - lo).astype(np.int64)
            return g

        return salted_scan(
            ds, key=key, ts_col=ts_col, salt_every_us=salt_every_us,
            summarize=summarize, step=step, apply=apply, order_by=[ts_col],
        )

    def add_pkey(t: pa.Table) -> pa.Table:
        return t.append_column("_pkey", _stable_pkey(t[key], num_partitions))

    def window_partition(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=["_pkey"]).sort_values(
            [key, ts_col], kind="mergesort"
        ).reset_index(drop=True)
        ts = df[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        keys_all = df[key].to_numpy()
        change = np.flatnonzero(keys_all[1:] != keys_all[:-1]) + 1
        starts = np.concatenate([[0], change])
        gid = np.zeros(len(df), dtype=np.int64)
        gid[change] = 1
        gid = np.cumsum(gid)
        # pack each key group onto a disjoint integer axis: rebase to the
        # group's min ts, then add gid * (max span + window + 2) so a
        # probe at (t - window) stays inside its own group
        base = ts[starts][gid]
        rel = ts - base
        span = int(rel.max(initial=0)) + int(window_us) + 2
        packed = rel + gid * span
        lo = np.searchsorted(packed, packed - window_us, side="left")
        hi = np.searchsorted(packed, packed, side="right")  # include peers
        v = df[value_col].to_numpy(dtype=np.float64)
        prefix = np.concatenate([[0.0], np.cumsum(v)])
        df[sum_col] = prefix[hi] - prefix[lo]
        df[count_col] = hi - lo
        return df

    tagged = ds.map_batches(add_pkey, batch_format="pyarrow")
    return tagged.groupby("_pkey").map_groups(window_partition, batch_format="pandas")


def trailing_zscore(
    ds: Dataset,
    *,
    key: str,
    ts_col: str,
    value_col: str,
    window_us: int,
    mean_col: str = "trailing_mean",
    std_col: str = "trailing_std",
    z_col: str = "zscore",
    num_partitions: int = 64,
    salt_every_us: int | None = None,
) -> Dataset:
    """Trailing-window anomaly score: each row's value standardized
    against its OWN key's last ``window_us`` (peers included) — the
    streaming analog of the reference's reconstruction-error anomaly
    thresholding (experiments/keras_experiment.py:583-599 scores windows and
    thresholds them against the score distribution).

    Adds ``mean_col``/``std_col`` (sample std, SQL ``stddev_samp``) and
    ``z_col = (value − mean)/std``; std and z are NULL for windows with
    n < 2 or zero variance, matching the SQL twin.

    Same dataflow as :func:`trailing_agg` (one co-partition, offset-packed
    searchsorted, prefix sums over value and value²); ``salt_every_us``
    enables the identical halo-carry mega-key mode.  Float note: variance
    via prefix-of-squares differences cancels when windows are
    near-constant relative to prefix magnitude — negative residue is
    clamped to 0 (std NULL), the documented residual-association risk.
    """
    import numpy as np
    import pyarrow as pa

    from .rollup import _stable_pkey

    def _derive(g: pd.DataFrame, all_ts, all_v, ts, v) -> pd.DataFrame:
        # center before the prefix sums: variance is shift-invariant, and
        # centered prefixes keep the cancellation error ~O(window) instead
        # of ~O(whole-partition magnitude) on tiny-variance windows
        c = float(all_v.mean()) if len(all_v) else 0.0
        av = (all_v - c).astype(np.longdouble)
        # extended-precision (80-bit on x86) prefixes: the prefix-difference
        # trick loses ~log10(partition/window) digits to cancellation; the
        # extra mantissa bits put the result back at float64 accuracy
        p1 = np.concatenate([np.zeros(1, np.longdouble), np.cumsum(av)])
        p2 = np.concatenate([np.zeros(1, np.longdouble), np.cumsum(av * av)])
        lo = np.searchsorted(all_ts, ts - window_us, side="left")
        hi = np.searchsorted(all_ts, ts, side="right")
        n = (hi - lo).astype(np.float64)
        s = (p1[hi] - p1[lo]).astype(np.float64)
        ss = (p2[hi] - p2[lo]).astype(np.float64)
        mean = c + s / n
        with np.errstate(invalid="ignore", divide="ignore"):
            var = np.maximum(ss - s * s / n, 0.0) / (n - 1.0)
            # SQL twin semantics: stddev_samp is NULL for n<2 but 0.0 for
            # a zero-variance window; division by that 0 makes z NULL
            std = np.where(n < 2, np.nan, np.sqrt(var))
            z = np.where(std == 0.0, np.nan, (v - mean) / std)
        g[mean_col] = mean
        g[std_col] = std
        g[z_col] = z
        return g

    if salt_every_us is not None:
        if salt_every_us < window_us:
            raise ValueError("salt_every_us must be >= window_us")
        from .salted import salted_scan

        salt = int(salt_every_us)

        def summarize(g: pd.DataFrame) -> dict:
            ts = g[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
            end = (int(ts[0]) // salt + 1) * salt
            keep = ts >= end - window_us
            return {"tail_ts": ts[keep].tolist(),
                    "tail_v": g[value_col].to_numpy(dtype=np.float64)[keep].tolist()}

        def step(carry: dict | None, s: dict) -> dict:
            return s

        def apply(g: pd.DataFrame, carry: dict | None) -> pd.DataFrame:
            if len(g) == 0:
                return g
            g = g.sort_values([ts_col], kind="mergesort").reset_index(drop=True)
            ts = g[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
            v = g[value_col].to_numpy(dtype=np.float64)
            start = (int(ts[0]) // salt) * salt
            if carry is not None:
                c_ts = np.asarray(carry["tail_ts"], dtype=np.int64)
                c_v = np.asarray(carry["tail_v"], dtype=np.float64)
                live = c_ts >= start - window_us
                all_ts = np.concatenate([c_ts[live], ts])
                all_v = np.concatenate([c_v[live], v])
            else:
                all_ts, all_v = ts, v
            return _derive(g, all_ts, all_v, ts, v)

        return salted_scan(
            ds, key=key, ts_col=ts_col, salt_every_us=salt_every_us,
            summarize=summarize, step=step, apply=apply, order_by=[ts_col],
        )

    def add_pkey(t: pa.Table) -> pa.Table:
        return t.append_column("_pkey", _stable_pkey(t[key], num_partitions))

    def window_partition(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=["_pkey"]).sort_values(
            [key, ts_col], kind="mergesort"
        ).reset_index(drop=True)
        ts = df[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        keys_all = df[key].to_numpy()
        change = np.flatnonzero(keys_all[1:] != keys_all[:-1]) + 1
        starts = np.concatenate([[0], change])
        gid = np.zeros(len(df), dtype=np.int64)
        gid[change] = 1
        gid = np.cumsum(gid)
        base = ts[starts][gid]
        rel = ts - base
        span = int(rel.max(initial=0)) + int(window_us) + 2
        packed = rel + gid * span
        v = df[value_col].to_numpy(dtype=np.float64)
        return _derive(df, packed, v, packed, v)

    tagged = ds.map_batches(add_pkey, batch_format="pyarrow")
    return tagged.groupby("_pkey").map_groups(window_partition, batch_format="pandas")


def ordered_scan(
    ds: Dataset,
    *,
    keys: list[str],
    order_by: list[str],
    scans: dict[str, tuple[str, str]],
    salt_every_us: int | None = None,
) -> Dataset:
    """Add running-aggregate columns per key.

    ``scans``: out_col -> (input_col, kind) with kind in
    {cumsum, cummax, cummin, cumcount}.  ``order_by`` must be a total
    order within each key (include a tiebreaker column, e.g. event_id).

    ``salt_every_us``: mega-key mode.  When set, no partition ever holds
    more than one time-chunk of a key — the scan runs as a two-pass
    salted prefix (stages/salted.py): chunk-local scans, a per-key fold
    of tiny chunk summaries (sum/max/min/count), then a second pass that
    adds each chunk's carry.  Output equals the unsalted scan exactly
    (integer/monotone combiners).  Requires a single key whose first
    ``order_by`` column is the timestamp.
    """
    if salt_every_us is None:
        inst = _ScanGroup(order_by, scans)
        from .grouped import grouped_apply

        return grouped_apply(ds, keys=keys, fn=inst)

    if len(keys) != 1:
        raise ValueError("salted ordered_scan requires a single key")
    import numpy as np

    from .salted import salted_scan

    ts_col = order_by[0]

    def summarize(g: pd.DataFrame) -> dict:
        out = {}
        for out_col, (col, kind) in scans.items():
            if kind == "cumsum":
                out[out_col] = g[col].sum().item()
            elif kind == "cummax":
                out[out_col] = g[col].max().item()
            elif kind == "cummin":
                out[out_col] = g[col].min().item()
            elif kind in ("lag", "delta"):
                # boundary carry = the chunk's LAST value in time order
                out[out_col] = g[col].iloc[-1]
            else:  # cumcount
                out[out_col] = int(len(g))
        return out

    def step(carry: dict | None, s: dict) -> dict:
        if carry is None:
            return s
        out = {}
        for out_col, (col, kind) in scans.items():
            a, b = carry[out_col], s[out_col]
            if kind in ("cumsum", "cumcount"):
                out[out_col] = a + b
            elif kind == "cummax":
                out[out_col] = max(a, b)
            elif kind in ("lag", "delta"):
                out[out_col] = b  # newest chunk's last value wins
            else:
                out[out_col] = min(a, b)
        return out

    def apply(g: pd.DataFrame, carry: dict | None) -> pd.DataFrame:
        if len(g) == 0:
            return g
        g = g.sort_values(order_by, kind="mergesort")
        for out_col, (col, kind) in scans.items():
            if kind in ("lag", "delta"):
                prev = g[col].shift(1)
                if carry is not None:
                    prev.iloc[0] = carry[out_col]
                g[out_col] = prev if kind == "lag" else g[col] - prev
                continue
            local = _SCAN_FNS[kind](g[col])
            if carry is not None:
                c = carry[out_col]
                if kind in ("cumsum", "cumcount"):
                    local = local + c
                elif kind == "cummax":
                    local = np.maximum(local, c)
                else:
                    local = np.minimum(local, c)
            g[out_col] = local
        return g

    return salted_scan(
        ds, key=keys[0], ts_col=ts_col, salt_every_us=salt_every_us,
        summarize=summarize, step=step, apply=apply, order_by=order_by,
    )


def time_weighted_mean(
    ds: Dataset,
    *,
    key: str,
    ts_col: str,
    value_col: str,
    order_by: list[str] | None = None,
    out_col: str = "twa",
    n_col: str = "n_segments",
    num_partitions: int = 64,
) -> Dataset:
    """Per-key duration-weighted (LOCF) mean: each observation holds its
    value until the key's next observation, so
    ``twa = Σ vᵢ·(tᵢ₊₁ − tᵢ) / (t_last − t_first)`` — the time-weighted
    average of timeseries databases, the correct mean for irregularly
    sampled series where the arithmetic mean over-weights bursts (the
    reference resamples to a uniform grid for the same reason,
    timeseries_batch_generator.py sampling_rate).

    Keys with fewer than two observations have no held segment and are
    dropped (SQL twin: ``WHERE lead(ts) IS NOT NULL``).

    Dataflow: one ``_pkey`` co-partition; per partition the lead/diff/
    weighted-sum runs over key-change boundaries vectorized — no per-key
    loop.  Output: ``key, n_col, out_col`` (one row per surviving key).
    """
    import numpy as np
    import pyarrow as pa

    from .rollup import _stable_pkey

    order_by = order_by or [ts_col]

    def add_pkey(t: pa.Table) -> pa.Table:
        return t.append_column("_pkey", _stable_pkey(t[key], num_partitions))

    def twa_partition(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=["_pkey"]).sort_values(
            [key] + order_by, kind="mergesort"
        ).reset_index(drop=True)
        if len(df) == 0:
            return pd.DataFrame({key: [], n_col: pd.Series([], dtype="int64"),
                                 out_col: pd.Series([], dtype="float64")})
        ts = df[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        v = df[value_col].to_numpy(dtype=np.float64)
        keys_all = df[key].to_numpy()
        same_next = np.zeros(len(df), dtype=bool)
        same_next[:-1] = keys_all[1:] == keys_all[:-1]
        # segment i: value v[i] held for (ts[i+1] - ts[i]) µs → seconds
        dur = np.zeros(len(df))
        dur[:-1] = (ts[1:] - ts[:-1]) / 1e6
        dur[~same_next] = 0.0
        change = np.flatnonzero(keys_all[1:] != keys_all[:-1]) + 1
        gid = np.zeros(len(df), dtype=np.int64)
        gid[change] = 1
        gid = np.cumsum(gid)
        k = int(gid[-1]) + 1
        wsum = np.bincount(gid, weights=v * dur, minlength=k)
        tsum = np.bincount(gid, weights=dur, minlength=k)
        nseg = np.bincount(gid, weights=same_next.astype(np.float64),
                           minlength=k).astype(np.int64)
        starts = np.concatenate([[0], change])
        # keys with >=2 rows survive even if every interval is 0 µs wide
        # (twa NULL then) — mirrors the SQL twin's WHERE lead IS NOT NULL
        keep = nseg > 0
        with np.errstate(invalid="ignore", divide="ignore"):
            twa = np.where(tsum > 0, wsum / np.where(tsum > 0, tsum, 1.0), np.nan)
        return pd.DataFrame({
            key: keys_all[starts][keep],
            n_col: nseg[keep],
            out_col: twa[keep],
        })

    tagged = ds.map_batches(add_pkey, batch_format="pyarrow")
    return tagged.groupby("_pkey").map_groups(twa_partition, batch_format="pandas")


def cusum(
    ds: Dataset,
    *,
    key: str,
    order_by: list[str],
    value_col: str,
    target: float = 0.0,
    out_col: str = "cusum",
    num_partitions: int = 64,
    salt_every_us: int | None = None,
) -> Dataset:
    """One-sided CUSUM drift statistic per key in explicit order:
    ``s₀ = 0; sᵢ = max(0, sᵢ₋₁ + (xᵢ − target))`` — the classic
    sequential change-point detector (Page 1954), the engine's streaming
    analog of the reference's anomaly-score thresholding over a scored
    sequence (experiments/keras_experiment.py:583-599).  Alarm when the
    statistic crosses a threshold: drift above ``target`` accumulates,
    noise resets to 0.

    Vectorization — no per-row recurrence: by the reflected-walk
    identity, ``sᵢ = cᵢ − min(0, min_{j≤i} cⱼ)`` with ``c`` the running
    sum of ``x − target``; both terms are grouped cumulative kernels
    (groupby cumsum + cummin), which is also exactly the SQL twin
    (``sum OVER`` / ``min OVER`` unbounded-preceding windows).

    ``salt_every_us``: mega-key mode.  A chunk's carry is the scalar
    ``s_end``; composition uses
    ``s_end = max(c_n − min_j cⱼ, s_in + c_n)`` — the chunk summary
    ``(c_n, min_j cⱼ)`` is O(1) regardless of chunk size, and the salted
    output equals the unsalted one to float64 association (cumsum starts
    at a per-chunk offset).
    """
    import numpy as np
    import pyarrow as pa

    from .rollup import _stable_pkey

    def _chunk_stat(g: pd.DataFrame, s0: float) -> np.ndarray:
        y = g[value_col].to_numpy(dtype=np.float64) - target
        c = np.cumsum(y)
        m = np.minimum.accumulate(c)
        return np.maximum(c - m, s0 + c)

    if salt_every_us is not None:
        from .salted import salted_scan

        def summarize(g: pd.DataFrame) -> dict:
            y = g[value_col].to_numpy(dtype=np.float64) - target
            c = np.cumsum(y)
            return {"total": float(c[-1]), "minc": float(np.min(c))}

        def step(carry: dict | None, s: dict) -> dict:
            s_in = carry["s"] if carry else 0.0
            s_end = max(s["total"] - s["minc"], s_in + s["total"])
            return {"s": float(max(s_end, 0.0))}

        def apply(g: pd.DataFrame, carry: dict | None) -> pd.DataFrame:
            if len(g) == 0:
                return g
            g = g.sort_values(order_by, kind="mergesort").reset_index(drop=True)
            s0 = carry["s"] if carry else 0.0
            g[out_col] = _chunk_stat(g, s0)
            return g

        return salted_scan(
            ds, key=key, ts_col=order_by[0], salt_every_us=salt_every_us,
            summarize=summarize, step=step, apply=apply, order_by=order_by,
        )

    def add_pkey(t: pa.Table) -> pa.Table:
        return t.append_column("_pkey", _stable_pkey(t[key], num_partitions))

    def scan_partition(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=["_pkey"]).sort_values(
            [key] + order_by, kind="mergesort"
        ).reset_index(drop=True)
        y = df[value_col].astype("float64") - target
        # attach the running sum, then its grouped running min — both
        # scans are C-speed grouped kernels
        df["_c"] = y.groupby(df[key], sort=False).cumsum()
        df["_m"] = df.groupby(key, sort=False)["_c"].cummin()
        df[out_col] = np.maximum(
            df["_c"].to_numpy() - np.minimum(df["_m"].to_numpy(), 0.0),
            0.0,
        )
        return df.drop(columns=["_c", "_m"])

    tagged = ds.map_batches(add_pkey, batch_format="pyarrow")
    return tagged.groupby("_pkey").map_groups(scan_partition, batch_format="pandas")


def record_highs(
    ds: Dataset,
    *,
    key_col: str = "user_id",
    order_by: list[str] | None = None,
    value_col: str = "value",
    num_partitions: int = 64,
) -> Dataset:
    """Record statistics per key: how many events set a new all-time
    high (value strictly above the running max of all PRIOR events in
    ``order_by`` order; the first event is a record by definition), when
    the last record fell, and the standing record value.

    One key-hash exchange (key-complete co-location), then everything
    is vectorized across keys in each partition: stable sort by (key,
    order), per-key shifted ``cummax``, boolean fold.  Same salting
    escape hatch as the other ordered scans for pathological hot keys.

    Record counts grow ~ln(n) for exchangeable series, so a key whose
    record count tracks its event count is trending — the cheap
    monotonic-drift probe next to the heavier CUSUM/changepoint ops.

    Reference analog: the running peak detection inside the reference's
    R-peak segmenting loop (/root/reference/TSFEDL/data.py:50-76).
    Output: ``{key_col}, n_events, n_records, last_record_ts,
    record_value``.
    """
    import numpy as np
    import pyarrow as pa

    from .grouped import grouped_apply

    order_by = order_by or ["ts", "event_id"]

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                key_col: pd.Series([], dtype="object"),
                "n_events": pd.Series([], dtype="int64"),
                "n_records": pd.Series([], dtype="int64"),
                "last_record_ts": pd.Series([], dtype="datetime64[us]"),
                "record_value": pd.Series([], dtype="float64"),
            })
        df = df.sort_values([key_col, *order_by], kind="mergesort")
        g = df.groupby(key_col, sort=False)
        # shifted per-key cummax without a per-key Python crossing:
        # cython GroupBy.cummax, global shift, first-row-of-key mask
        prevmax = g[value_col].cummax().shift(1)
        first = df[key_col].ne(df[key_col].shift(1)).to_numpy()
        v = df[value_col].to_numpy(dtype=np.float64)
        is_rec = first | (v > prevmax.to_numpy(dtype=np.float64))
        out = pd.DataFrame({
            key_col: df[key_col].to_numpy(),
            "_one": np.ones(len(df), dtype=np.int64),
            "_rec": is_rec.astype(np.int64),
            "_rts": df[order_by[0]].where(is_rec),
            "_val": v,
        }).groupby(key_col, sort=False, as_index=False).agg(
            n_events=("_one", "sum"), n_records=("_rec", "sum"),
            last_record_ts=("_rts", "max"), record_value=("_val", "max"))
        return out.rename(columns={out.columns[0]: key_col})

    return grouped_apply(
        ds, keys=[key_col], fn=fold, num_partitions=num_partitions,
        whole_partition=True).sort(key_col)


def out_of_order_stats(
    ds: Dataset,
    *,
    key_col: str = "user_id",
    seq_col: str = "event_id",
    ts_col: str = "ts",
    num_partitions: int = 64,
) -> Dataset:
    """Ingestion-order audit per key: in ARRIVAL order (``seq_col``),
    how many events carry an event-time earlier than the running
    maximum event-time already seen for that key — i.e. would be "late"
    to any watermark — and how late is the worst one.

    The measurement that feeds watermark tuning
    (:func:`~.stream.watermark_rollup`'s ``allowed_lateness``): the
    p100 lateness here is the smallest allowed-lateness that drops
    nothing.  Same vectorized shifted-cummax shape as
    :func:`record_highs`, but over µs timestamps in sequence order —
    lateness rides as exact int64 µs, converted to seconds only in the
    output.  Output: ``{key_col}, n_events, n_late, late_share,
    max_lateness_s`` (max_lateness NULL when nothing is late).
    """
    import numpy as np
    import pyarrow as pa

    from .grouped import grouped_apply

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                key_col: pd.Series([], dtype="object"),
                "n_events": pd.Series([], dtype="int64"),
                "n_late": pd.Series([], dtype="int64"),
                "late_share": pd.Series([], dtype="float64"),
                "max_lateness_s": pd.Series([], dtype="float64"),
            })
        df = df.sort_values([key_col, seq_col], kind="mergesort")
        ts = df[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        work = pd.DataFrame({key_col: df[key_col].to_numpy(), "_ts": ts})
        g = work.groupby(key_col, sort=False)
        prevmax = g["_ts"].cummax().shift(1)
        first = work[key_col].ne(work[key_col].shift(1)).to_numpy()
        pm = prevmax.to_numpy(dtype=np.float64)
        late_us = np.where(first, 0.0, pm - ts)
        is_late = ~first & (late_us > 0)
        out = pd.DataFrame({
            key_col: work[key_col].to_numpy(),
            "_one": np.ones(len(work), dtype=np.int64),
            "_late": is_late.astype(np.int64),
            "_lat_us": np.where(is_late, late_us, np.nan),
        }).groupby(key_col, sort=False, as_index=False).agg(
            n_events=("_one", "sum"), n_late=("_late", "sum"),
            _max_us=("_lat_us", "max"))
        out["late_share"] = (out["n_late"].to_numpy(dtype=np.float64)
                             / out["n_events"].to_numpy(dtype=np.float64))
        out["max_lateness_s"] = out["_max_us"].to_numpy() / 1e6
        return out.drop(columns=["_max_us"])

    return grouped_apply(
        ds, keys=[key_col], fn=fold, num_partitions=num_partitions,
        whole_partition=True).sort(key_col)


def peak_detect(
    ds: Dataset,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    q: float = 0.9,
    min_gap_us: int = 60_000_000,
    num_partitions: int = 64,
) -> Dataset:
    """Peak detection per key — the engine analog of the reference's
    R-peak segmentation loop (/root/reference/TSFEDL/data.py:50-76,
    where QRS peaks anchor every training window): a row is a PEAK if
    it is a strict interior local maximum (greater than both ordered
    neighbors), above the key's exact ``q``-quantile
    (``quantile_disc`` — element at ⌈n·q⌉−1), and at least
    ``min_gap_us`` after the previously KEPT peak (greedy refractory
    period, exactly :func:`~.sessionize.debounce`'s keep-chain run on
    the candidate set).

    One key-hash exchange; neighbor compares and the quantile threshold
    are vectorized across all keys of a partition; the greedy
    separation walks survivors per key (loop length = peaks out, the
    throttling regime).  Output: the peak rows ``{key_col}, {id_col},
    {ts_col}, {value_col}``.
    """
    import numpy as np
    import pyarrow as pa

    from .rollup import _stable_pkey

    def add_pkey(t: pa.Table) -> pa.Table:
        return t.append_column("_pkey",
                               _stable_pkey(t[key_col], num_partitions))

    cols = [key_col, id_col, ts_col, value_col]

    def fold(t: pa.Table) -> pa.Table:
        # arrow in/out so a zero-peak partition (e.g. a constant series —
        # no strict local maxima exist) still carries its typed schema
        # through Ray's empty-block path
        out_schema = pa.schema([t.schema.field(c) for c in cols])
        df = t.to_pandas().drop(columns=["_pkey"]).sort_values(
            [key_col, ts_col, id_col], kind="mergesort").reset_index(
            drop=True)
        if len(df) == 0:
            return out_schema.empty_table()
        v = df[value_col].to_numpy(dtype=np.float64)
        k = df[key_col].to_numpy()
        same_prev = np.concatenate([[False], k[1:] == k[:-1]])
        same_next = np.concatenate([k[1:] == k[:-1], [False]])
        pv = np.concatenate([[np.nan], v[:-1]])
        nv = np.concatenate([v[1:], [np.nan]])
        local_max = same_prev & same_next & (v > pv) & (v > nv)
        # exact per-key q-quantile (lower-element convention)
        order = np.lexsort((v, k))
        ks, vs = k[order], v[order]
        change = np.flatnonzero(ks[1:] != ks[:-1]) + 1
        starts = np.concatenate([[0], change])
        ends = np.concatenate([change, [len(ks)]])
        n_per = ends - starts
        qi = starts + np.ceil(n_per * q).astype(np.int64) - 1
        uniq, inv = np.unique(k, return_inverse=True)
        thr = vs[qi][inv]
        cand = local_max & (v > thr)
        idx = np.flatnonzero(cand)
        if len(idx) == 0:
            return out_schema.empty_table()
        ts = df[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        ck, cts = k[idx], ts[idx]
        change2 = np.flatnonzero(ck[1:] != ck[:-1]) + 1
        st2 = np.concatenate([[0], change2])
        en2 = np.concatenate([change2, [len(ck)]])
        kept = []
        for lo, hi in zip(st2, en2):
            i = lo
            while i < hi:
                kept.append(idx[i])
                i = max(i + 1,
                        lo + np.searchsorted(cts[lo:hi],
                                             cts[i] + min_gap_us,
                                             side="left"))
        out = df.iloc[kept][cols].reset_index(drop=True)
        return pa.Table.from_pandas(out, schema=out_schema,
                                    preserve_index=False)

    tagged = ds.map_batches(add_pkey, batch_format="pyarrow")
    return tagged.groupby("_pkey").map_groups(fold, batch_format="pyarrow")


def peak_intervals(
    ds: Dataset,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    q: float = 0.9,
    min_gap_us: int = 60_000_000,
    num_partitions: int = 64,
) -> Dataset:
    """Peak-to-peak interval statistics — the reference's literal
    pipeline (R-peak detection → RR intervals → HRV summary,
    /root/reference/TSFEDL/data.py:50-76 feeding every arrhythmia
    model) as a two-stage composition: :func:`peak_detect` finds the
    peaks, then per key the successive peak gaps fold to mean interval
    and RMSSD (root-mean-square of successive differences — computed on
    the INTERVALS, i.e. second differences of peak times).

    Exactness: gaps ride as exact int64 µs (the date_diff recipe) and
    convert to seconds only inside the final expressions.  Keys need
    ≥ 2 peaks for ``mean_rr_s`` and ≥ 3 for ``rmssd_s`` (NULL below).
    Output: ``{key_col}, n_peaks, mean_rr_s, rmssd_s``.
    """
    import numpy as np
    import pyarrow as pa

    from .grouped import grouped_apply

    peaks = peak_detect(
        ds, key_col=key_col, ts_col=ts_col, id_col=id_col,
        value_col=value_col, q=q, min_gap_us=min_gap_us,
        num_partitions=num_partitions)

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                key_col: pd.Series([], dtype="object"),
                "n_peaks": pd.Series([], dtype="int64"),
                "mean_rr_s": pd.Series([], dtype="float64"),
                "rmssd_s": pd.Series([], dtype="float64")})
        df = df.sort_values([key_col, ts_col, id_col], kind="mergesort")
        ts = df[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        k = df[key_col].to_numpy()
        same = np.concatenate([[False], k[1:] == k[:-1]])
        gap_us = np.where(same, ts - np.concatenate([[0], ts[:-1]]), 0)
        uniq, inv = np.unique(k, return_inverse=True)
        n = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        gsum = np.bincount(inv, weights=gap_us.astype(np.float64),
                           minlength=len(uniq))
        # successive differences of the gaps (within key, gaps only)
        gk, gv = k[same], gap_us[same].astype(np.float64)
        same2 = np.concatenate([[False], gk[1:] == gk[:-1]])
        d2 = np.where(same2, gv - np.concatenate([[0.0], gv[:-1]]), 0.0)
        u2, inv2 = np.unique(gk, return_inverse=True)
        nd = np.bincount(inv2, weights=same2.astype(np.float64),
                         minlength=len(u2))
        ssq = np.bincount(inv2, weights=np.where(same2, d2 * d2, 0.0),
                          minlength=len(u2))
        with np.errstate(invalid="ignore", divide="ignore"):
            mean_rr = np.where(n >= 2, (gsum / 1e6) / np.maximum(n - 1, 1),
                               np.nan)
            rms = np.full(len(uniq), np.nan)
            pos = np.searchsorted(uniq, u2)
            rms[pos] = np.where(nd >= 1, np.sqrt(ssq / 1e12
                                                 / np.maximum(nd, 1)),
                                np.nan)
        return pd.DataFrame({
            key_col: uniq, "n_peaks": n,
            "mean_rr_s": mean_rr, "rmssd_s": rms})

    return grouped_apply(peaks, keys=[key_col], fn=fold,
                         num_partitions=num_partitions,
                         whole_partition=True).sort(key_col)


def type_persistence(
    ds: Dataset,
    *,
    key: str,
    type_col: str,
    order_by: list[str],
    num_partitions: int = 64,
) -> Dataset:
    """Per-key behavioral stickiness: of each key's consecutive event
    pairs (in ``order_by`` order), what share repeats the SAME type —
    the diagonal mass of the key's own transition matrix, the per-key
    scalar behind the corpus-level role/type transition matrices (high
    share = streaky sessions, low = alternating behavior).

    Exact int64 counts, one division.  Keys with < 2 events emit
    nothing.  One key-hash exchange; the fold is a vectorized shift
    across all keys of the partition.  Output: ``key, n_transitions
    (int64), n_repeats (int64), repeat_share``.
    """
    import numpy as np

    from .grouped import grouped_apply

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            key: pd.Series([], dtype="object"),
            "n_transitions": pd.Series([], dtype="int64"),
            "n_repeats": pd.Series([], dtype="int64"),
            "repeat_share": pd.Series([], dtype="float64")})
        if len(df) == 0:
            return empty
        m = df.sort_values([key, *order_by], kind="mergesort") \
            .reset_index(drop=True)
        same_key = m[key].eq(m[key].shift()).to_numpy()
        same_type = m[type_col].eq(m[type_col].shift()).to_numpy()
        trans = same_key
        reps = same_key & same_type
        g = pd.DataFrame({key: m[key],
                          "_t": trans.astype(np.int64),
                          "_r": reps.astype(np.int64)}) \
            .groupby(key, sort=True, as_index=False)[["_t", "_r"]].sum()
        g = g[g["_t"] > 0]
        if len(g) == 0:
            return empty
        t = g["_t"].to_numpy(np.int64)
        r = g["_r"].to_numpy(np.int64)
        return pd.DataFrame({
            key: g[key],
            "n_transitions": t,
            "n_repeats": r,
            "repeat_share": r.astype(np.float64) / t.astype(np.float64)})

    return grouped_apply(ds, keys=[key], fn=fold,
                         num_partitions=num_partitions,
                         whole_partition=True)
