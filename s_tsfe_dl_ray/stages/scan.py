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


def ordered_scan(
    ds: Dataset,
    *,
    keys: list[str],
    order_by: list[str],
    scans: dict[str, tuple[str, str]],
) -> Dataset:
    """Add running-aggregate columns per key.

    ``scans``: out_col -> (input_col, kind) with kind in
    {cumsum, cummax, cummin, cumcount}.  ``order_by`` must be a total
    order within each key (include a tiebreaker column, e.g. event_id).
    """
    inst = _ScanGroup(order_by, scans)
    from .grouped import grouped_apply

    return grouped_apply(ds, keys=keys, fn=inst)
