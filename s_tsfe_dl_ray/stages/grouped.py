"""Partition-wise per-key apply — the engine's standard execution shape
for "do X within each key's ordered group".

``Dataset.groupby(keys).map_groups(fn)`` invokes the UDF once per key;
with 10⁵+ keys the Ray per-group machinery costs more than the work
(measured on the codec and LSH paths: 5-20× overhead).  ``grouped_apply``
instead shuffles ONCE by a coarse stable hash of the primary key and runs
``pandas.groupby(keys).apply`` inside each partition — same semantics
(each key is complete within exactly one partition), two orders of
magnitude fewer UDF crossings.

Used by gap-fill, sessionize, run-length segmentation, ordered scans and
rolling means; key-complete co-location is the ONLY partitioning
assumption (documented per SURVEY.md custom-operator rule).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
from ray.data import Dataset

from .rollup import _stable_pkey


def grouped_apply(
    ds: Dataset,
    *,
    keys: list[str],
    fn,
    num_partitions: int = 64,
    whole_partition: bool = False,
) -> Dataset:
    """Apply ``fn(group_df) -> df`` to every key group, partition-wise.

    ``whole_partition=True``: ``fn`` is vectorized across keys and receives
    the ENTIRE partition frame (every key it holds, still key-complete) in
    ONE call — no per-key pandas ``groupby.apply`` crossing at all.  Used
    by kernels like :func:`stages.gapfill.gapfill_frame` that handle all
    key segments at once."""

    def add_pkey(t: pa.Table) -> pa.Table:
        return t.append_column("_pkey", _stable_pkey(t[keys[0]], num_partitions))

    def apply_partition(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=["_pkey"])
        if whole_partition or len(df) == 0:
            return fn(df)
        out = df.groupby(keys, group_keys=False, sort=False)[df.columns.tolist()].apply(fn)
        return out.reset_index(drop=True)

    tagged = ds.map_batches(add_pkey, batch_format="pyarrow")
    return tagged.groupby("_pkey").map_groups(apply_partition, batch_format="pandas")
