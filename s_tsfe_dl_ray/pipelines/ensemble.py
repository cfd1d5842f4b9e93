"""Ensemble execution: N independent scorers over ONE input, union of
tagged outputs.

The engine analog of the reference's KimMinGu ensemble
(models_keras.py:1169-1242): several independently-parameterized models
score the same input stream and their outputs are combined.  Ray-Data
shape: each member is its own actor pool ``map_batches`` stage over the
SAME (lazy) Dataset — the streaming executor runs the member pipelines
concurrently — and the member outputs are unioned with a ``member`` tag
column.  An optional reducer then aggregates per-row votes/means across
members (a grouped aggregate keyed by the row id).
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd
import pyarrow as pa
from ray.data import Dataset


def ensemble_scores(
    ds: Dataset,
    members: dict[str, tuple[type | Callable, dict]],
    *,
    batch_format: str = "pandas",
    concurrency: int | tuple[int, int] = (1, 4),
) -> Dataset:
    """Run every member scorer over ``ds``; union outputs tagged by
    ``member``.

    ``members``: name -> (callable_class, constructor_kwargs).  Each class
    is an actor-pool stage (state built once per actor in ``__init__``,
    scored per batch in ``__call__``) — the load-once-score-many pattern
    (SURVEY.md §2.3).
    """
    if not members:
        raise ValueError("members must be non-empty")
    parts: list[Dataset] = []
    for name, (cls, kwargs) in members.items():
        scored = ds.map_batches(
            cls,
            fn_constructor_kwargs=kwargs,
            batch_format=batch_format,
            concurrency=concurrency,
        )

        def tag(b: pd.DataFrame, _name=name) -> pd.DataFrame:
            b = b.copy()
            b["member"] = _name
            return b

        parts.append(scored.map_batches(tag, batch_format="pandas"))
    return parts[0] if len(parts) == 1 else parts[0].union(*parts[1:])


def ensemble_mean(
    scored: Dataset, *, id_cols: list[str], score_col: str = "score"
) -> Dataset:
    """Combine member scores per row id: mean score + member count
    (the ensemble's soft vote)."""
    from .relational import grouped_aggregate

    return grouped_aggregate(
        scored.select_columns(id_cols + [score_col]),
        keys=id_cols,
        aggs={
            "score_mean": (score_col, "mean"),
            "n_members": (score_col, "count"),
        },
    )
