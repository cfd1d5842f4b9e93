"""Exact distributed quantiles via value histograms.

Percentiles (p50/p95/p99 of token counts, document lengths, latencies)
are a staple of corpus-quality reporting at 100 TB, where a global sort
per percentile is unaffordable.  For discrete-valued columns the exact
answer needs only the VALUE HISTOGRAM — (value → count) — which is
orders of magnitude smaller than the data: the shuffle carries one row
per distinct (key, value), never raw rows.

Algorithm (all inside the dataset plan, no driver round-trips):

1. per-batch partial histogram: ``(keys…, value) → count`` via one
   vectorized pyarrow ``group_by`` per batch (the combiner);
2. hash-partition by key (``_pkey`` pattern, stages/rollup.py) so every
   key's full histogram lands in one partition; merge counts and select
   quantiles per key in the same vectorized pandas body.

Quantile semantics match DuckDB's ``quantile_disc``: the element at
sorted 0-based index ``ceil(n·q)−1`` — deterministic, exact for any dtype
(no interpolation, so integer columns stay integers and float columns
reproduce bit-exactly).

Reference analog: the reference reports score thresholds by sorting the
held-out score column and indexing (experiments/keras_experiment.py:
583-593 top-k thresholding) — the same select-by-rank, here distributed.

Scale note: per-key distinct-value counts bound partition memory.  A
continuous float column with ~all-distinct values degrades the histogram
to ~the key's row count — quantize upstream (e.g. ``round(x, 3)``) or
use a sketch when exactness isn't required.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data import Dataset

from .rollup import _stable_pkey


def grouped_quantiles(
    ds: Dataset,
    *,
    value_col: str,
    keys: list[str],
    quantiles: tuple[float, ...] = (0.5, 0.95, 0.99),
    num_partitions: int = 64,
) -> Dataset:
    """Exact per-key ``quantile_disc`` of ``value_col`` for each q.

    Returns one row per key group with columns ``keys… + q_<pct>`` (e.g.
    ``q_50, q_95, q_99``), dtype equal to the value column's.
    """
    if not keys:
        raise ValueError("keys must be non-empty (use a constant column "
                         "for a global quantile)")
    qcols = [
        f"q_{int(q * 100)}" if float(q * 100).is_integer()
        else f"q_{str(q * 100).replace('.', '_')}"
        for q in quantiles
    ]

    def partial_hist(t: pa.Table) -> pa.Table:
        # per-batch (keys, value) -> count combiner; one pyarrow group_by
        out = (
            t.select(keys + [value_col])
            .group_by(keys + [value_col], use_threads=False)
            .aggregate([([], "count_all")])
        )
        out = out.rename_columns(keys + [value_col, "_cnt"])
        return out.append_column("_pkey", _stable_pkey(out[keys[0]], num_partitions))

    def merge_and_select(df: pd.DataFrame) -> pd.DataFrame:
        h = (
            df.groupby(keys + [value_col], sort=True)["_cnt"]
            .sum()
            .reset_index()
        )
        # cumulative count within each key, values ascending
        h["_cum"] = h.groupby(keys, sort=False)["_cnt"].cumsum()
        totals = h.groupby(keys, sort=False)["_cnt"].sum().rename("_n")
        h = h.merge(totals, left_on=keys, right_index=True)
        out = h[keys].drop_duplicates().reset_index(drop=True)
        for q, col in zip(quantiles, qcols):
            # quantile_disc: element at sorted 0-based index ceil(n*q)-1
            # (probed against DuckDB across n/q combinations) — the first
            # value whose cumulative count reaches ceil(n*q); q=0 clamps
            # to the minimum
            target = np.maximum(np.ceil(h["_n"] * q), 1)
            hit = h[h["_cum"] >= target]
            picked = hit.groupby(keys, sort=False)[value_col].first().rename(col)
            out = out.merge(picked, left_on=keys, right_index=True)
        return out

    return (
        ds.map_batches(partial_hist, batch_format="pyarrow")
        .groupby("_pkey")
        .map_groups(merge_and_select, batch_format="pandas")
    )
