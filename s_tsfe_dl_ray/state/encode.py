"""Compression stages: per-key Gorilla/delta-of-delta encode + exact decode.

Pipeline shape (SURVEY.md §7.2 step 6):

    repartition-by-hash(key) [the groupby shuffle] →
    per-key ordered encode (sort by order_by inside the group, then run the
    carried-state codecs) → one compact row per key:

        (key, n_rows, ts_blob:binary, val_blob:binary,
         ts_hash, val_hash, raw_bytes, enc_bytes)

The codec objects are built once per worker process (module-level
singletons) — the load-once pattern of the reference's trained-model
scorers (SURVEY.md §2.3).  The carried state (previous value / previous
delta) lives inside the per-key encode call; state hashes go to the
lineage manifest so a resumed job can verify partition identity.

Hot-key note (SURVEY.md §7.4): a conversation too large for one worker's
heap is SALTED into (key, time-range) sub-streams via
``salt_every_us`` — the salt is a pure function of ``ts`` (stateless →
computable before the shuffle), each contiguous time chunk is encoded
independently, and decode stitches chunks back in (key, chunk_salt)
order.  Encoded bytes differ from the unsalted form (each chunk restarts
codec state) but the DECODED series is identical (tested); no single
partition ever has to hold a hot key's full history.
"""

from __future__ import annotations

import pandas as pd
from ray.data import Dataset

from .deltadelta import DeltaDeltaCodec
from .gorilla import GorillaCodec

# one codec pair per worker process (codecs are stateless objects; the
# per-series state lives inside each encode call)
_GOR = GorillaCodec()
_DOD = DeltaDeltaCodec()


def encode_series(
    ds: Dataset,
    *,
    key: str,
    ts_col: str,
    value_col: str,
    order_by: list[str] | None = None,
    num_partitions: int = 64,
    salt_every_us: int | None = None,
) -> Dataset:
    """Compress each key's (ts, value) series into Gorilla/delta-of-delta
    blobs.  Ordering is established explicitly inside the group (never
    block-arrival order).

    Executed partition-wise: ONE coarse hash shuffle co-locates each key's
    rows (``_pkey = hash(key) % num_partitions``), then each partition
    sorts once and encodes every key's series in a tight loop — not one
    Ray group-UDF call per key (measured: 100k per-key map_groups calls
    cost more than the codecs themselves).

    ``salt_every_us``: hot-key salting.  When set, rows are sub-streamed
    by (key, floor(ts / salt_every_us)) — the salt is computed BEFORE the
    shuffle from ``ts`` alone, so a conversation bigger than a worker's
    heap spreads its time chunks across partitions.  Output then carries
    a ``chunk_salt`` column (one row per (key, chunk)); decoding rows in
    (key, chunk_salt) order reproduces the exact unsalted series."""
    order_by = order_by or [ts_col]

    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..stages.rollup import _stable_pkey

    salted = salt_every_us is not None

    def add_pkey(t: pa.Table) -> pa.Table:
        if not salted:
            return t.append_column("_pkey", _stable_pkey(t[key], num_partitions))
        import polars as pl

        arr = t[key].combine_chunks() if isinstance(t[key], pa.ChunkedArray) else t[key]
        h = pl.Series(arr).hash(seed=0).to_numpy()
        ts_us = pc.cast(t[ts_col], pa.int64()).to_numpy(zero_copy_only=False)
        salt = np.floor_divide(ts_us, salt_every_us)
        pk = (
            (h + salt.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
            % np.uint64(num_partitions)
        ).astype(np.int64)
        t = t.append_column("chunk_salt", pa.array(salt.astype(np.int64)))
        return t.append_column("_pkey", pa.array(pk))

    group_cols = [key] + (["chunk_salt"] if salted else [])

    def encode_partition(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(group_cols + order_by, kind="mergesort")
        ts_series = df[ts_col]
        if ts_series.dtype.kind == "M":
            # normalize to µs regardless of the frame's datetime resolution
            ts_series = ts_series.astype("datetime64[us]")
        ts_all = ts_series.astype("int64").to_numpy()
        val_all = df[value_col].astype("float64").to_numpy()
        keys_all = df[key].to_numpy()
        # group boundaries within the sorted partition
        changed = keys_all[1:] != keys_all[:-1]
        if salted:
            salt_all = df["chunk_salt"].to_numpy()
            changed = changed | (salt_all[1:] != salt_all[:-1])
        change = np.flatnonzero(changed) + 1
        bounds = np.concatenate([[0], change, [len(df)]])
        rows: dict[str, list] = {k: [] for k in (
            key, *(["chunk_salt"] if salted else []),
            "n_rows", "ts_blob", "val_blob", "ts_hash", "val_hash",
            "raw_bytes", "enc_bytes",
        )}
        for lo, hi in zip(bounds[:-1], bounds[1:]):
            ts_blob = _DOD.encode(ts_all[lo:hi])
            val_blob = _GOR.encode(val_all[lo:hi])
            rows[key].append(keys_all[lo])
            if salted:
                rows["chunk_salt"].append(int(salt_all[lo]))
            rows["n_rows"].append(int(hi - lo))
            rows["ts_blob"].append(ts_blob)
            rows["val_blob"].append(val_blob)
            rows["ts_hash"].append(DeltaDeltaCodec.state_hash(ts_blob))
            rows["val_hash"].append(GorillaCodec.state_hash(val_blob))
            rows["raw_bytes"].append(int(hi - lo) * 16)
            rows["enc_bytes"].append(len(ts_blob) + len(val_blob))
        return pd.DataFrame(rows)

    tagged = ds.map_batches(add_pkey, batch_format="pyarrow")
    return tagged.groupby("_pkey").map_groups(encode_partition, batch_format="pandas")


def decode_series(encoded: Dataset, *, key: str, ts_col: str, value_col: str) -> Dataset:
    """Exact inverse of :func:`encode_series` (row order = encode order)."""

    def decode_batch(b: pd.DataFrame) -> pd.DataFrame:
        keys, tss, vals = [], [], []
        for k, ts_blob, val_blob, n in zip(
            b[key], b["ts_blob"], b["val_blob"], b["n_rows"]
        ):
            ts = _DOD.decode(bytes(ts_blob))
            v = _GOR.decode(bytes(val_blob))
            assert len(ts) == len(v) == n
            keys.extend([k] * int(n))
            tss.append(ts)
            vals.append(v)
        import numpy as np

        return pd.DataFrame({
            key: keys,
            ts_col: pd.to_datetime(
                np.concatenate(tss) if tss else np.empty(0, "int64"), unit="us"
            ),
            value_col: np.concatenate(vals) if vals else np.empty(0, "float64"),
        })

    return encoded.map_batches(decode_batch, batch_format="pandas")
