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

Hot-key note: a conversation too large for one group would be salted into
(key, salt) sub-streams, each encoded independently with its boundary
state recorded in the manifest (SURVEY.md §7.4); the synthetic corpus'
hot convs (100× median) still encode comfortably in-group, so salting
lives at the rollup layer where it is exact for free.
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
) -> Dataset:
    """Compress each key's (ts, value) series into Gorilla/delta-of-delta
    blobs.  Ordering is established explicitly inside the group (never
    block-arrival order)."""
    order_by = order_by or [ts_col]

    def encode_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order_by, kind="mergesort")
        ts_series = g[ts_col]
        if ts_series.dtype.kind == "M":
            # normalize to µs regardless of the frame's datetime resolution
            ts_series = ts_series.astype("datetime64[us]")
        ts = ts_series.astype("int64").to_numpy()
        vals = g[value_col].astype("float64").to_numpy()
        ts_blob = _DOD.encode(ts)
        val_blob = _GOR.encode(vals)
        return pd.DataFrame({
            key: [g[key].iloc[0]],
            "n_rows": [len(g)],
            "ts_blob": [ts_blob],
            "val_blob": [val_blob],
            "ts_hash": [DeltaDeltaCodec.state_hash(ts_blob)],
            "val_hash": [GorillaCodec.state_hash(val_blob)],
            "raw_bytes": [len(g) * 16],
            "enc_bytes": [len(ts_blob) + len(val_blob)],
        })

    return ds.groupby(key).map_groups(encode_group, batch_format="pandas")


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
