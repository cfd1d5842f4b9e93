"""GROUPING SETS: several aggregation granularities in ONE input pass.

The warehouse staple (per-(user, type), per-user, grand total in one
query) and the engine's generalization of its tier cascade: instead of
re-aggregating one granularity into the next, every requested set gets
its combiner partial from the same batch scan, so the input is read and
the exchange paid once for all granularities together.  Reference
analog: the evaluation tail derives five summary metrics at once from
ONE prediction pass (reference experiments/keras_experiment.py:595-599
— accuracy/auc/f1/precision/recall from the same scores array); here
the per-pass fan-out is aggregation granularities instead of metrics.

Scale design: per batch, one vectorized pyarrow ``group_by`` PER SET
(sets are few; rows are many) emits partials tagged with the SQL
``GROUPING()`` bitmask; rolled-up key columns carry caller-chosen
sentinels (not NULL) so the output hashes deterministically across
engines — the bitmask, not the sentinel, is the authoritative "this
column is aggregated away" signal.  Partials merge by sum under the
standard ``_pkey`` hash partition.

Output: ``keys… (sentinel-coalesced), grouping_id, count_alias,
{value}_sum``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data import Dataset

from .rollup import _stable_pkey


def grouping_sets(
    ds: Dataset,
    *,
    keys: list[str],
    sets: list[list[str]],
    value_col: str,
    sentinels: dict[str, object],
    count_alias: str = "n_rows",
    num_partitions: int = 64,
) -> Dataset:
    """Aggregate ``value_col`` (count + sum) at every granularity in
    ``sets`` in one pass.  ``grouping_id`` uses SQL ``GROUPING(keys…)``
    bit order (leftmost key = highest bit; bit set ⇔ key rolled up).
    Every key needs a sentinel (a value that cannot occur in the data)
    for its rolled-up rows."""
    for s in sets:
        unknown = set(s) - set(keys)
        if unknown:
            raise ValueError(f"set {s} has non-key columns {unknown}")
    missing = set(keys) - set(sentinels)
    if missing:
        raise ValueError(f"sentinel required for every key; missing {missing}")

    gids = [
        sum((k not in s) << (len(keys) - 1 - i) for i, k in enumerate(keys))
        for s in sets
    ]
    sum_col = f"{value_col}_sum"

    def partial(t: pa.Table) -> pa.Table:
        parts = []
        for s, gid in zip(sets, gids):
            if s:
                agg = t.select(s + [value_col]).group_by(
                    s, use_threads=False
                ).aggregate([(value_col, "count"), (value_col, "sum")])
                cols = {k: agg[k] for k in s}
                n = agg[f"{value_col}_count"]
                v = agg[f"{value_col}_sum"]
                size = agg.num_rows
            else:
                import pyarrow.compute as pc

                cols = {}
                # count NON-NULL values, matching the keyed sets' count
                # semantics (pyarrow group_by count skips nulls)
                n = pa.array([pc.count(t[value_col]).as_py()], pa.int64())
                sv = pc.sum(t[value_col]).as_py()
                v = pa.array([0.0 if sv is None else float(sv)], pa.float64())
                size = 1
            for k in keys:
                if k not in cols:
                    cols[k] = pa.array([sentinels[k]] * size, t[k].type)
            out_cols = {k: cols[k] for k in keys}
            out_cols["grouping_id"] = pa.array(
                np.full(size, gid, dtype=np.int64))
            import pyarrow.compute as pc

            out_cols["_n"] = pc.cast(n, pa.int64())
            out_cols["_s"] = pc.cast(v, pa.float64())
            parts.append(pa.table(out_cols))
        out = pa.concat_tables(parts)
        return out.append_column(
            "_pkey", _stable_pkey(out[keys[0]], num_partitions))

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(keys + ["grouping_id"], sort=False).agg(
            _n=("_n", "sum"), _s=("_s", "sum")).reset_index()
        g = g.rename(columns={"_n": count_alias, "_s": sum_col})
        g[count_alias] = g[count_alias].astype(np.int64)
        return g

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_pkey")
        .map_groups(merge, batch_format="pandas")
    )
