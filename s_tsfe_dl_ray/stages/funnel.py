"""Ordered funnel analysis: first time each key completes stage k of an
event-type sequence, each stage strictly after the previous one.

The product-analytics staple over event streams (view → click →
purchase), and the engine's ordered-sequence-match analog of the
reference's label-transition segmentation (get_mit_bih_segments walks a
beat-annotation sequence in order, data.py run-length logic) — here the
"pattern" is a staged subsequence per key, not a run.

Dataflow: one ``_pkey`` co-partition (hash of key), then per partition
ONE vectorized pandas pass per stage — each pass is a boolean filter +
``groupby().min()`` over the stage's rows, no per-key Python loop; state
between stages is a key-indexed Series of "earliest completion of the
previous stage".  len(stages) passes total, each O(partition).

Semantics (== the SQL twin's cascaded ``min(ts) WHERE ts > prev`` CTEs):
stage k's timestamp is the MINIMUM ts of a ``stages[k]``-typed row
STRICTLY after the key's stage-(k−1) timestamp; a tie at the same
microsecond does not advance the funnel.  Keys missing stage k have NULL
for it and all later stages.  Output: one row per key —
``key, ts_<stage>…, stages_reached``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data import Dataset

from .rollup import _stable_pkey


def funnel(
    ds: Dataset,
    *,
    key: str,
    ts_col: str,
    type_col: str,
    stages: list[str],
    max_gap_us: int | None = None,
    num_partitions: int = 64,
) -> Dataset:
    """``max_gap_us``: conversion window — stage k must occur within
    ``max_gap_us`` of stage k−1's completion (the 'purchase within 24h
    of click' form); ``None`` = unbounded.  See module docstring for
    semantics and dataflow."""
    if len(stages) < 2:
        raise ValueError("a funnel needs at least two stages")
    if len(set(stages)) != len(stages):
        raise ValueError("stage types must be distinct")
    out_cols = [f"ts_{s}" for s in stages]

    def add_pkey(t: pa.Table) -> pa.Table:
        return t.append_column("_pkey", _stable_pkey(t[key], num_partitions))

    def funnel_partition(df: pd.DataFrame) -> pd.DataFrame:
        all_keys = pd.Index(pd.unique(df[key]))
        ts = df[ts_col].astype("datetime64[us]")
        reached: list[pd.Series] = []
        # stage 0 probes against -inf: every first-stage row qualifies
        prev = pd.Series(pd.Timestamp.min, index=all_keys)
        for si, st in enumerate(stages):
            sub = df[df[type_col] == st]
            if len(sub):
                bar = prev.reindex(sub[key]).to_numpy()
                sub_ts = ts[sub.index].to_numpy()
                ok = sub_ts > bar
                # conversion window applies between stages, never to the
                # funnel entry (stage 0 has no previous completion)
                if max_gap_us is not None and si > 0:
                    ok &= sub_ts <= bar + np.timedelta64(max_gap_us, "us")
                firsts = sub[ok].groupby(key, sort=False)[ts_col].min()
            else:
                firsts = pd.Series(dtype="datetime64[us]")
            cur = firsts.reindex(all_keys)
            reached.append(cur)
            prev = cur.fillna(pd.Timestamp.max)  # NaT blocks later stages
        out = pd.DataFrame({key: all_keys})
        for c, s in zip(out_cols, reached):
            out[c] = s.to_numpy().astype("datetime64[us]")
        out["stages_reached"] = np.sum(
            [out[c].notna().to_numpy() for c in out_cols], axis=0
        ).astype(np.int64)
        return out

    tagged = ds.map_batches(add_pkey, batch_format="pyarrow")
    return tagged.groupby("_pkey").map_groups(funnel_partition, batch_format="pandas")
