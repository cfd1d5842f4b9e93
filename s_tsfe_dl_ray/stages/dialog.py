"""Conversation-structure metrics over transcript turns.

The transcripts axis of the engine: operators whose unit is a
conversation of ordered role-tagged turns (conv_id, turn_idx, ts, role)
— the same per-series ordered-scan discipline as the tier ops
(stages/scan.py), instantiated for dialog analytics.  Reference analog:
the annotation×signal alignment walk (reference TSFEDL/data.py:10-80
pairs each beat annotation with its surrounding signal window in record
order); here the "annotation" is a user turn and the "signal" is the
assistant's reply.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data import Dataset

from .rollup import _stable_pkey


def reply_latency(
    ds: Dataset,
    *,
    conv_col: str = "conv_id",
    ts_col: str = "ts",
    order_by: list[str] | None = None,
    role_col: str = "role",
    from_role: str = "user",
    to_role: str = "assistant",
    num_partitions: int = 64,
) -> Dataset:
    """Per-conversation reply-latency distribution: for every
    ``from_role`` turn, the time until the NEXT ``to_role`` turn in
    order (any later position, SQL ``ROWS 1 FOLLOWING … UNBOUNDED``);
    aggregated to ``n_replies, mean_reply_s, max_reply_s`` per
    conversation.  The first-order dialog health metric (how fast does
    the assistant answer?).

    Vectorized, no per-conversation loop: one co-partition, then the
    "next to_role ts after each row" is a REVERSED running minimum over
    the to_role rows of the packed order axis — the mirror of the
    forward scans.  ``from_role`` turns with no later ``to_role`` turn
    (conversation tail) are excluded, matching the SQL twin's NULL
    filter; conversations with no such pair at all are dropped.
    """
    order_by = order_by or [ts_col]

    def add_pkey(t: pa.Table) -> pa.Table:
        return t.append_column("_pkey", _stable_pkey(t[conv_col], num_partitions))

    def latency_partition(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=["_pkey"]).sort_values(
            [conv_col] + order_by, kind="mergesort").reset_index(drop=True)
        if len(df) == 0:
            return pd.DataFrame({conv_col: [],
                                 "n_replies": pd.Series([], dtype="int64"),
                                 "mean_reply_s": [], "max_reply_s": []})
        ts = df[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        convs = df[conv_col].to_numpy()
        roles = df[role_col].to_numpy()
        n = len(df)
        change = np.flatnonzero(convs[1:] != convs[:-1]) + 1
        starts = np.concatenate([[0], change])
        gid = np.zeros(n, dtype=np.int64)
        gid[change] = 1
        gid = np.cumsum(gid)
        ends = np.concatenate([change, [n]])
        # next to_role ts STRICTLY AFTER each position, within the conv:
        # a conv-local REVERSED running min (grouped cummin over the
        # reversed axis — C-speed), shifted by one position
        INF = np.int64(np.iinfo(np.int64).max)
        to_ts = np.where(roles == to_role, ts, INF)
        rev_gid = gid[::-1]
        seg_change = np.ones(n, dtype=bool)
        seg_change[1:] = rev_gid[1:] != rev_gid[:-1]
        seg_idx = np.cumsum(seg_change) - 1
        run_min = pd.Series(to_ts[::-1]).groupby(seg_idx).cummin().to_numpy()
        suffix_min = run_min[::-1]                   # min over [i, conv_end)
        nxt = np.full(n, INF, dtype=np.int64)
        nxt[:-1] = suffix_min[1:]                    # min over (i, conv_end)
        nxt[ends - 1] = INF                          # last row of each conv
        is_from = roles == from_role
        valid = is_from & (nxt != INF)
        gap = np.where(valid, (nxt - ts) / 1e6, 0.0)
        k = int(gid[-1]) + 1
        cnt = np.bincount(gid, weights=valid.astype(np.float64), minlength=k)
        ssum = np.bincount(gid, weights=gap, minlength=k)
        gmax = np.full(k, -np.inf)
        np.maximum.at(gmax, gid[valid], gap[valid])
        keep = cnt > 0
        return pd.DataFrame({
            conv_col: convs[starts][keep],
            "n_replies": cnt[keep].astype(np.int64),
            "mean_reply_s": ssum[keep] / cnt[keep],
            "max_reply_s": gmax[keep],
        })

    tagged = ds.map_batches(add_pkey, batch_format="pyarrow")
    return tagged.groupby("_pkey").map_groups(latency_partition, batch_format="pandas")
