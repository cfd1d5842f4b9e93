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

    def scan_group(g):
        return inst(g)

    return ds.groupby(keys).map_groups(scan_group, batch_format="pandas")
